from .codec import (  # noqa: F401
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)

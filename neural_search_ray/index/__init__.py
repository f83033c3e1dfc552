from .codec import (  # noqa: F401
    decode_postings,
    decoder_for,
    encode_postings,
    for_decode,
    for_encode,
    varint_decode,
    varint_encode,
)

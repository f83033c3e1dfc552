from .chunkers import (  # noqa: F401
    chunk_delimiter,
    chunk_fixed_char_length,
    chunk_fixed_token_length,
)
from .prune import prune_sparse_vector, split_sparse_vector  # noqa: F401
from .quantize import byte_quantize, feature_decode, feature_encode  # noqa: F401

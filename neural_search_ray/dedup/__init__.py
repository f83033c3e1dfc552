from .exact import exact_dedup  # noqa: F401
from .minhash import MinHasher, minhash_lsh_candidates  # noqa: F401
from .ngram import ngram_jaccard  # noqa: F401
from .simhash import simhash32  # noqa: F401

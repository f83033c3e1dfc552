from .combine import COMBINATION_TECHNIQUES, combine_scores  # noqa: F401
from .normalize import NORMALIZATION_TECHNIQUES, normalize_scores  # noqa: F401

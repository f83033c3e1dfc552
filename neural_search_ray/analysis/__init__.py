from .analyzer import (  # noqa: F401
    ENGLISH_STOPWORDS,
    analyze,
    analyze_column,
    tokenize,
)

from .langid import langid_stopword_profile  # noqa: F401
from .quality import quality_stats_stage  # noqa: F401

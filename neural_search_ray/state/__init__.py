from .stats import StatsRegistry, stats  # noqa: F401

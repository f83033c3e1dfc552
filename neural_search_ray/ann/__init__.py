from .brute import BruteForceKNNStage, knn_brute_force  # noqa: F401
from .ivf import IVFIndex  # noqa: F401

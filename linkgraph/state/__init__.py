from .engine import GraphEngine, degree_balanced_bounds  # noqa: F401
from .partition import GraphShard  # noqa: F401

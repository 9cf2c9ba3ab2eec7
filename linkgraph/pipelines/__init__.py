from .hierarchy import compose_hierarchy  # noqa: F401
from .ingest import ingest  # noqa: F401

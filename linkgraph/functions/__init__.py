from .quality import (  # noqa: F401
    QUALITY_FUNCTIONS,
    Modularity,
    QualityContext,
    QualityFn,
    community_aggregates,
    condora_weighting,
    dp_weighting,
)

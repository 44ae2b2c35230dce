from . import (  # noqa: F401
    analytics,
    cleanse,
    dedup,
    multimodal,
    relational,
    sessionize,
    similarity,
    text,
)

from . import analytics, cleanse, relational, sessionize  # noqa: F401

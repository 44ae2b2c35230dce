from .scale import register_views, salted_join, write_bucketed  # noqa: F401

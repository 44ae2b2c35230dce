from .driver import (
    run_all_analyses,
    run_pipeline,
    start_stateful_sessions,
    start_stream,
)
from .sessions import stateful_session_metrics, windowed_active_users, windowed_counts
from .sinks import ConsoleSink, JdbcSink, MemorySink, NoopSink, ParquetSink, Sink
from .stateful import stateful_sessionize

__all__ = [
    "run_all_analyses",
    "run_pipeline",
    "start_stateful_sessions",
    "start_stream",
    "stateful_sessionize",
    "stateful_session_metrics",
    "windowed_counts",
    "windowed_active_users",
    "Sink",
    "JdbcSink",
    "NoopSink",
    "ParquetSink",
    "ConsoleSink",
    "MemorySink",
]

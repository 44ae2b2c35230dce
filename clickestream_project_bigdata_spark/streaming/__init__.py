from .driver import run_all_analyses, start_stream
from .sessions import stateful_session_metrics, windowed_active_users, windowed_counts
from .sinks import ConsoleSink, JdbcSink, MemorySink, ParquetSink, Sink

__all__ = [
    "run_all_analyses",
    "start_stream",
    "stateful_session_metrics",
    "windowed_counts",
    "windowed_active_users",
    "Sink",
    "JdbcSink",
    "ParquetSink",
    "ConsoleSink",
    "MemorySink",
]

"""Pluggable sinks for the per-batch analysis fan-out.

The reference hard-codes ten ``df.write.jdbc(..., mode="append")`` calls to
PostgreSQL (`stream_processor.py:131-136` and nine siblings). Here a sink is
an injected strategy so the same driver runs against JDBC, Parquet, console,
or an in-memory store (tests). JDBC append is at-least-once under retries
(the reference's duplicates-on-replay problem, SURVEY §4); the Parquet sink
gets idempotence by writing batch-id-keyed partitions, and the JDBC sink
documents the upsert contract.
"""

from __future__ import annotations

import threading
from typing import Protocol

from pyspark.sql import DataFrame


class Sink(Protocol):
    def write(self, df: DataFrame, table: str, batch_id: int | None = None) -> None: ...


class JdbcSink:
    """`df.write.jdbc` per output table — the reference's sink (S6).

    mode="append" reproduces reference semantics (at-least-once). For
    effectively-once under foreachBatch retries, pre-delete rows of this
    batch_id inside a transaction, or use a staging table + MERGE — both
    require a `batch_id` column, which `run_all_analyses` provides.
    """

    def __init__(self, url: str, properties: dict[str, str], mode: str = "append"):
        self.url = url
        self.properties = properties
        self.mode = mode

    def write(self, df: DataFrame, table: str, batch_id: int | None = None) -> None:
        df.write.jdbc(url=self.url, table=table, mode=self.mode, properties=self.properties)


class ParquetSink:
    """Idempotent file sink: one partition directory per (table, batch_id);
    a retried batch overwrites its own partition, nothing else (dynamic
    partition overwrite)."""

    def __init__(self, base_path: str):
        self.base_path = base_path

    def write(self, df: DataFrame, table: str, batch_id: int | None = None) -> None:
        if batch_id is None:
            df.write.mode("append").parquet(f"{self.base_path}/{table}")
            return
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{self.base_path}/{table}/batch_id={batch_id}")
        )


class ConsoleSink:
    """Debug tap (reference `consumer.py:10-19` / S7)."""

    def __init__(self, num_rows: int = 20):
        self.num_rows = num_rows

    def write(self, df: DataFrame, table: str, batch_id: int | None = None) -> None:
        print(f"=== {table} (batch {batch_id}) ===")
        df.show(self.num_rows, truncate=False)


class NoopSink:
    """Benchmark sink: full distributed materialization of every analysis
    (Spark's `noop` source executes the plan and discards rows) with zero
    I/O cost — isolates compute + shuffle time."""

    def write(self, df: DataFrame, table: str, batch_id: int | None = None) -> None:
        df.write.format("noop").mode("overwrite").save()


class MemorySink:
    """Test sink: collects every batch's rows per table (thread-safe — Spark
    may run foreachBatch callbacks from different threads across restarts)."""

    def __init__(self) -> None:
        self.tables: dict[str, list] = {}
        self._lock = threading.Lock()

    def write(self, df: DataFrame, table: str, batch_id: int | None = None) -> None:
        rows = df.collect()
        with self._lock:
            self.tables.setdefault(table, []).extend(rows)

    def rows(self, table: str) -> list:
        return self.tables.get(table, [])

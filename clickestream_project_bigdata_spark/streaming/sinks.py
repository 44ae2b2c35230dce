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

    ``idempotent=False`` reproduces reference semantics: plain
    ``mode="append"``, which is at-least-once — a retried foreachBatch
    duplicates rows (the reference's known flaw,
    `stream_processor.py:131-136`, SURVEY §4).

    ``idempotent=True`` is the engine's fix — **batch-keyed
    delete-and-insert through a staging table**:

    1. the batch (stamped with a ``batch_id`` column) is written by the
       executors to ``<table>__staging`` with ``mode="overwrite"`` — scratch
       space, safe to clobber on retry;
    2. the target table is created empty on first use (Spark's own DDL
       mapping, ``mode="ignore"`` with a LIMIT-0 frame);
    3. one driver-side JDBC transaction atomically publishes:
       ``DELETE FROM t WHERE batch_id = N; INSERT INTO t SELECT * FROM
       staging; COMMIT``.

    A replayed batch deletes exactly its own previous rows before
    re-inserting them — effectively-once, any number of retries, on any
    JDBC backend with transactional DDL-free DML (Postgres/MySQL/Derby).
    The Spark executors never need cross-partition transactions; atomicity
    lives in the single final publish statement pair.
    """

    def __init__(
        self,
        url: str,
        properties: dict[str, str],
        mode: str = "append",
        idempotent: bool = False,
        batch_id_col: str = "batch_id",
        array_mode: str = "native",
    ):
        self.url = url
        self.properties = properties
        self.mode = mode
        self.idempotent = idempotent
        self.batch_id_col = batch_id_col
        #: "native" maps array columns through the JDBC dialect (Postgres —
        #: the reference's target — supports them); "json" serializes them
        #: to JSON strings for backends without array types (MySQL, Derby).
        self.array_mode = array_mode

    def write(self, df: DataFrame, table: str, batch_id: int | None = None) -> None:
        if self.array_mode == "json":
            from pyspark.sql import functions as F
            from pyspark.sql.types import ArrayType

            for field in df.schema.fields:
                if isinstance(field.dataType, ArrayType):
                    df = df.withColumn(field.name, F.to_json(F.col(field.name)))
        if not self.idempotent or batch_id is None:
            df.write.jdbc(url=self.url, table=table, mode=self.mode, properties=self.properties)
            return

        from pyspark.sql import functions as F

        if self.batch_id_col not in df.columns:
            df = df.withColumn(self.batch_id_col, F.lit(int(batch_id)))
        staging = f"{table}__staging"
        df.write.jdbc(url=self.url, table=staging, mode="overwrite", properties=self.properties)
        # ensure the target exists with the same Spark-generated schema
        df.limit(0).write.jdbc(url=self.url, table=table, mode="ignore", properties=self.properties)
        self._publish(df.sparkSession, table, staging, int(batch_id))

    def _publish(self, spark, table: str, staging: str, batch_id: int) -> None:
        """One transaction on one driver-side connection: delete this
        batch's previous rows (no-op on first delivery), insert the staged
        rows, commit. The identifiers come from our own sink call sites and
        batch_id is an int — nothing user-controlled is interpolated."""
        jvm = spark._jvm
        driver = self.properties.get("driver")
        if driver:
            jvm.java.lang.Class.forName(driver)
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            conn.setAutoCommit(False)
            st = conn.createStatement()
            # Spark's JDBC writer creates columns as QUOTED (case-sensitive)
            # identifiers; quote to match (ANSI — Derby/Postgres; MySQL needs
            # ANSI_QUOTES). Table names are passed through unquoted, same as
            # Spark does.
            st.executeUpdate(
                f'DELETE FROM {table} WHERE "{self.batch_id_col}" = {batch_id}'
            )
            st.executeUpdate(f"INSERT INTO {table} SELECT * FROM {staging}")
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()


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

"""The micro-batch analysis driver — reference `run_all_analyses` re-expressed.

The reference (`/root/reference/stream_processor.py:385-398`) runs 10 analyses
per micro-batch inside ``foreachBatch``, each ending in its own JDBC write.
Two deliberate improvements over the reference, both flagged in SURVEY §3.3/§4:

* the sessionized frame feeds three sinks (sessions, user_paths,
  funnel_analysis) — the reference recomputes its lineage three times (no
  cache); we ``persist()`` it once and unpersist after the fan-out;
* sinks are injected (`streaming/sinks.py`) instead of hard-coded JDBC, so
  the same driver runs in tests (MemorySink), local files (ParquetSink), or
  production (JdbcSink).

Sink order matches the reference exactly (T1, `stream_processor.py:388-398`):
events_per_minute, active_users, event_type_distribution, top_items,
bounce_rate, sessions, user_paths, funnel_analysis, item_interactions,
most_viewed_items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import analytics
from ..operators.sessionize import DEFAULT_GAP_SECONDS, session_metrics, sessionize
from .sinks import Sink


def run_all_analyses(
    batch_df: DataFrame,
    batch_id: int,
    sink: Sink,
    *,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    funnel_steps: list[str] | None = None,
    max_parallel_sinks: int = 1,
) -> None:
    """One micro-batch through all 10 analyses (reference
    `stream_processor.py:385-398`). ``batch_df`` is canonical-schema events.

    Per-batch sessionization reproduces reference semantics (T6): sessions
    spanning micro-batches are split and ordinals restart per batch. The
    cross-batch-correct alternative is `streaming/sessions.py`.

    ``max_parallel_sinks > 1`` submits the independent analyses as
    CONCURRENT Spark jobs (threads sharing the persisted batch) — the ten
    plans have no inter-dependencies beyond the shared sessionized frame,
    so overlapping them hides scheduler/sink latency; with Spark's FAIR
    scheduler pool this is the standard multi-sink fan-out shape. Default 1
    preserves the reference's strict sequential sink order.
    """
    batch_df = batch_df.persist()
    try:
        sessionized = sessionize(batch_df, gap_seconds).persist()
        try:
            steps = funnel_steps or analytics.DEFAULT_FUNNEL_STEPS
            funnel = (
                analytics.funnel_analysis(sessionized, steps)
                .withColumn("batch_id", F.lit(batch_id))
                .withColumn("analysis_time", F.current_timestamp())
                .select("batch_id", "analysis_time", *steps)
            )
            # reference sink order (`stream_processor.py:388-398`)
            outputs: list[tuple[DataFrame, str]] = [
                (analytics.events_per_minute(batch_df), "events_per_minute"),
                (analytics.active_users(batch_df), "active_users"),
                (analytics.event_type_distribution(batch_df), "event_type_distribution"),
                (analytics.top_items(batch_df), "top_items"),
                (analytics.bounce_rate(batch_df), "bounce_rate"),
                (session_metrics(sessionized), "sessions"),
                (analytics.user_paths(sessionized), "user_paths"),
                (funnel, "funnel_analysis"),
                (analytics.item_interactions(batch_df), "item_interactions"),
                (analytics.most_viewed_items(batch_df), "most_viewed_items"),
            ]
            if max_parallel_sinks <= 1:
                for df, table in outputs:
                    sink.write(df, table, batch_id)
            else:
                # materialize each shared input ONCE before its consumers
                # fan out (concurrent jobs then hit the cache instead of
                # racing to fill it) — but don't serialize BOTH cache
                # fills ahead of everything: only the three
                # sessionized-lineage sinks need the sessionized cache, so
                # its fill runs as a pool task OVERLAPPED with the seven
                # batch-fed analyses and the session sinks are submitted
                # the moment it completes (r16; guide §2.6 back-fill —
                # measured 2.49 s -> 2.06 s at sf0.1/32 cores).
                session_tables = {"sessions", "user_paths", "funnel_analysis"}
                batch_df.count()
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=max_parallel_sinks) as pool:
                    sess_ready = pool.submit(sessionized.count)
                    futures = [
                        pool.submit(sink.write, df, table, batch_id)
                        for df, table in outputs
                        if table not in session_tables
                    ]
                    sess_ready.result()  # cache filled; propagate failure
                    futures += [
                        pool.submit(sink.write, df, table, batch_id)
                        for df, table in outputs
                        if table in session_tables
                    ]
                    for f in futures:
                        f.result()  # propagate the first failure
        finally:
            sessionized.unpersist()
    finally:
        batch_df.unpersist()


def run_pipeline(
    raw_df: DataFrame,
    batch_id: int,
    sink: Sink,
    *,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    funnel_steps: list[str] | None = None,
) -> None:
    """The WHOLE reference pipeline for one batch of *raw* records
    (epoch-ms long timestamps, pre-NiFi shape): cleanse + enrich (NiFi
    stage, §2.2) with the invalid side written to the ``quarantine`` table
    (S8 — the reference dead-letters to a log), then canonical typing, then
    the 10-analysis fan-out. One call replaces Kafka→NiFi→Kafka→Spark."""
    from ..operators.cleanse import canonicalize, cleanse_raw_events

    result = cleanse_raw_events(raw_df)
    sink.write(result.quarantine, "quarantine", batch_id)
    run_all_analyses(
        canonicalize(result.valid),
        batch_id,
        sink,
        gap_seconds=gap_seconds,
        funnel_steps=funnel_steps,
    )


def start_stateful_sessions(
    events: DataFrame,
    sink: Sink,
    checkpoint_location: str,
    *,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    watermark: str = "1 hour",
    available_now: bool = False,
) -> StreamingQuery:
    """Production driver for the FIXED sessionization mode: the
    applyInPandasWithState session state machine emits each session exactly
    once when it closes (watermark past last event + gap), and foreachBatch
    hands those closed sessions to the injected sink — contrast with the
    per-batch mode in :func:`run_all_analyses`, which reproduces the
    reference's split-session semantics (T6)."""
    from .stateful import stateful_sessionize

    closed = stateful_sessionize(events, gap_seconds, watermark)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        sink.write(batch_df, "sessions", batch_id)

    writer = (
        closed.writeStream.foreachBatch(_write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_location)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_stream(
    events: DataFrame,
    sink: Sink,
    checkpoint_location: str,
    *,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    funnel_steps: list[str] | None = None,
    available_now: bool = False,
    dedup_within: str | None = None,
) -> StreamingQuery:
    """Wire a canonical-schema streaming DataFrame into the 10-analysis
    fan-out (reference `stream_processor.py:400-406`).

    ``available_now=True`` drains all currently-available input and stops —
    the batch-replay / test mode (the reference has no equivalent; it relies
    on a human Ctrl-C).

    ``dedup_within`` (e.g. ``"1 hour"``) inserts the at-least-once ingest
    guard in front of the fan-out: redelivered events whose identity
    columns repeat inside that watermark horizon are dropped once, so
    every downstream analysis sees exactly-once input (the reference
    recounts redeliveries).
    """
    if dedup_within is not None:
        from .sessions import dedup_events_stream

        events = dedup_events_stream(events, within=dedup_within)

    def _batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        run_all_analyses(
            batch_df, batch_id, sink, gap_seconds=gap_seconds, funnel_steps=funnel_steps
        )

    writer = (
        events.writeStream.foreachBatch(_batch_fn)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_location)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

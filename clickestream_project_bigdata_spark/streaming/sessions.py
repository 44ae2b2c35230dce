"""Cross-batch-correct streaming sessionization and windowed metrics.

The reference sessionizes **per micro-batch** (T6, SURVEY §2.10): a `Window`
over `batch_df` (`/root/reference/stream_processor.py:79-136`) means a session
spanning two micro-batches is split in half and the per-user session ordinal
restarts, producing duplicate ``session_id`` values across batches. It also
has no watermark (T4/T7) — unbounded lateness, unbounded state.

This module is the fixed design the reference could not express without
stateful streaming:

* :func:`stateful_session_metrics` — native ``session_window`` aggregation
  with a watermark. Spark's state store merges windows across micro-batches,
  so a session that straddles a batch boundary is ONE session. State per key
  is O(1) (start/end/count), evicted once the watermark passes — bounded
  memory at any scale.
* :func:`windowed_counts` — tumbling-window per-minute metrics with proper
  late-data semantics (the reference recounts whatever happens to be in the
  batch, so a late event creates a second partial row for the same minute;
  here the window is updated in place until the watermark closes it).

Gap semantics note: Spark merges session windows whose ranges touch
(``[t, t+gap]`` contains ``t+gap``), so an exactly-1800 s gap stays one
session — the same boundary behavior as the batch operator's strict
``> 1800`` predicate (`stream_processor.py:99`). Pinned by
``test_session_window_gap_boundary``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"
DEFAULT_WATERMARK = "1 hour"


def stateful_session_metrics(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Session metrics (same output schema as batch ``session_metrics``) via
    native session windows — correct across micro-batch boundaries.

    Output columns: visitorid, session_start, session_end, events_in_session,
    session_length (seconds, floored-epoch difference like the batch op).
    ``session_id`` is visitorid + "_" + session-start epoch — unlike the
    per-batch ordinal it is globally stable (no restart per batch).
    """
    sw = F.session_window("event_time", gap)
    # session_window.end = last event + gap; aggregate the true event bounds
    # so session_start/end/length match the batch operator exactly.
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(sw.alias("session_window"), "visitorid")
        .agg(
            F.min("event_time").alias("session_start"),
            F.max("event_time").alias("session_end"),
            F.count("*").alias("events_in_session"),
        )
        .select(
            F.concat_ws(
                "_", F.col("visitorid"), F.unix_timestamp("session_start")
            ).alias("session_id"),
            "visitorid",
            "session_start",
            "session_end",
            "events_in_session",
            (
                F.unix_timestamp("session_end") - F.unix_timestamp("session_start")
            ).alias("session_length"),
        )
    )


def windowed_counts(
    events: DataFrame,
    duration: str = "1 minute",
    watermark: str = "10 minutes",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window event counts — the watermarked streaming form of
    ``events_per_minute`` / ``event_type_distribution`` / ``top_items``
    (pass ``extra_keys=["event"]`` / ``["itemid"]``)."""
    keys = [F.window("event_time", duration).alias("window")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(*keys)
        .agg(F.count("*").alias("events_count"))
        .select(
            F.col("window.start").alias("minute"),
            *[F.col(k) for k in (extra_keys or [])],
            "events_count",
        )
    )


def stateful_user_paths(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming ``user_paths`` (reference `stream_processor.py:146-183`)
    over CROSS-BATCH-CORRECT sessions: collect the (event_time, event)
    structs per session window, sort, project the event names. One session
    → one appended row when the watermark closes it; the per-batch
    reference splits paths at batch boundaries (T6)."""
    sw = F.session_window("event_time", gap)
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(sw.alias("session_window"), "visitorid")
        .agg(
            F.min("event_time").alias("session_start"),
            F.array_sort(
                F.collect_list(F.struct("event_time", "event"))
            ).alias("__path_structs"),
        )
        .select(
            "visitorid",
            F.concat_ws(
                "_", F.col("visitorid"), F.unix_timestamp("session_start")
            ).alias("session_id"),
            F.transform("__path_structs", lambda s: s["event"]).alias("user_path"),
        )
    )


def stateful_session_flags(
    events: DataFrame,
    steps: list[str] | None = None,
    gap: str = DEFAULT_GAP,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-closed-session funnel membership flags (the streaming form of the
    reference's funnel first phase, `stream_processor.py:195-212`): one
    appended row per session with a 0/1 column per step. The global batch
    funnel is the column-sum of this table — in streaming, sum it per
    session-start window (:func:`windowed_funnel`) or in the serving store
    (a global running aggregate cannot append)."""
    steps = steps or ["view", "addtocart", "transaction"]
    sw = F.session_window("event_time", gap)
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(sw.alias("session_window"), "visitorid")
        .agg(
            F.min("event_time").alias("session_start"),
            *[
                F.max(F.when(F.col("event") == s, 1).otherwise(0)).alias(s)
                for s in steps
            ],
        )
        .select(
            F.concat_ws(
                "_", F.col("visitorid"), F.unix_timestamp("session_start")
            ).alias("session_id"),
            "visitorid",
            "session_start",
            *steps,
        )
    )


def windowed_funnel(
    events: DataFrame,
    steps: list[str] | None = None,
    duration: str = "1 hour",
    gap: str = DEFAULT_GAP,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Streaming funnel: per-session membership flags (session windows)
    rolled up per ``duration`` tumbling window of session time — the
    watermarked form of the reference's global per-batch funnel
    (`stream_processor.py:195-229`), with the batch grain replaced by an
    event-time grain.

    Chained stateful aggregation: the outer ``window()`` groups on the
    session_window STRUCT itself, which is how Spark propagates the
    event-time watermark across the two stateful operators (grouping on a
    derived min(event_time) column severs the lineage and append mode is
    rejected)."""
    steps = steps or ["view", "addtocart", "transaction"]
    sw = F.session_window("event_time", gap)
    flags = (
        events.withWatermark("event_time", watermark)
        .groupBy(sw.alias("session_window"), "visitorid")
        .agg(
            *[
                F.max(F.when(F.col("event") == s, 1).otherwise(0)).alias(s)
                for s in steps
            ]
        )
    )
    return (
        flags.groupBy(F.window(F.col("session_window"), duration).alias("w"))
        .agg(*[F.sum(s).cast("long").alias(s) for s in steps])
        .select(F.col("w.start").alias("window_start"), *steps)
    )


def windowed_top_items(
    events: DataFrame,
    duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked streaming form of ``top_items`` (reference
    `stream_processor.py:317-330`): per-(window, item) interaction counts —
    unranked, like the reference (a true streaming top-k would need
    update-mode ranking downstream; the per-minute counts table is what the
    reference publishes and ranks in SQL)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", duration).alias("window"), "itemid")
        .agg(F.count("*").alias("interactions"))
        .select(F.col("window.start").alias("minute"), "itemid", "interactions")
    )


def windowed_bounce_rate(
    events: DataFrame,
    duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked streaming ``bounce_rate`` (reference
    `stream_processor.py:289-312`): per-(window, visitor) event counts, then
    per-window share of single-event visitors.

    Two chained stateful aggregations on the SAME tumbling window — the
    append-mode multi-stateful-operator pattern (Spark ≥ 3.5): the inner
    aggregate emits a (window, visitorid, events) row once the watermark
    closes the window, and the outer aggregate — keyed on the same window —
    closes immediately after. State is bounded by the watermark on both
    levels. Output matches the batch operator's columns exactly."""
    per_user = (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", duration).alias("window"), "visitorid")
        .agg(F.count("*").alias("events"))
    )
    return (
        per_user.groupBy("window")
        .agg(
            F.sum(F.when(F.col("events") == 1, 1).otherwise(0)).alias("bounces"),
            F.count("*").alias("total_users"),
        )
        .select(
            F.col("window.start").alias("minute"),
            "bounces",
            "total_users",
            (F.col("bounces") / F.col("total_users")).alias("bounce_rate"),
        )
    )


def running_item_interactions(events: DataFrame) -> DataFrame:
    """Update-output-mode streaming form of the global per-item interaction
    count (reference `stream_processor.py:337-354`, analysis 9): a running
    ``groupBy(itemid).count()`` over the WHOLE stream, not a window of it —
    the form a global count actually wants in streaming. Write it with
    ``outputMode("update")`` (each micro-batch emits only the keys it
    touched; the serving store upserts on itemid) or ``"complete"``. No
    watermark: state is one long per item — bounded by item cardinality,
    not time, which is the correct trade for a dimension-keyed running
    total. Same output schema as the batch ``item_interactions``."""
    return events.groupBy("itemid").agg(F.count("*").alias("interaction_count"))


def running_most_viewed(events: DataFrame, view_event: str = "view") -> DataFrame:
    """Update-output-mode streaming form of ``most_viewed_items``
    (reference `stream_processor.py:360-379`, analysis 10): running view
    counts per item. The filter precedes the stateful aggregate, so
    non-view events never touch the state store. Same schema as the batch
    operator; write with ``outputMode("update")``."""
    return (
        events.filter(F.col("event") == view_event)
        .groupBy("itemid")
        .agg(F.count("*").alias("view_count"))
    )


def dedup_events_stream(
    events: DataFrame,
    id_cols: tuple[str, ...] = ("visitorid", "event_time", "event", "itemid"),
    within: str = "1 hour",
) -> DataFrame:
    """At-least-once ingest dedup: drop redelivered events whose identity
    columns repeat within the watermark horizon (Kafka redeliveries, replay
    overlap). ``dropDuplicatesWithinWatermark`` keys the state store on
    ``id_cols`` and evicts each key once the watermark passes — bounded
    state, unlike a plain ``dropDuplicates`` whose state grows forever.
    Place it FIRST in the pipeline so every downstream aggregate sees
    exactly-once events. In batch mode this degrades to ``dropDuplicates``
    semantics on the same key."""
    return events.withWatermark("event_time", within).dropDuplicatesWithinWatermark(
        list(id_cols)
    )


def windowed_active_users(
    events: DataFrame,
    duration: str = "1 minute",
    watermark: str = "10 minutes",
    rsd: float = 0.02,
) -> DataFrame:
    """Streaming ``active_users``: HyperLogLog++ distinct visitors per window.

    Exact streaming count-distinct would keep every visitorid in state until
    the watermark; the sketch is mergeable and ~kB per window — the only sane
    choice at 100 TB (batch mode keeps the exact variant as oracle).
    """
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", duration).alias("window"))
        .agg(F.approx_count_distinct("visitorid", rsd).alias("active_users"))
        .select(F.col("window.start").alias("minute"), "active_users")
    )


def novel_items_stream(events: DataFrame) -> DataFrame:
    """First-occurrence item feed — the streaming face of
    ``analytics.novelty_rate``: each itemid is emitted exactly once, when
    it first appears, across ALL micro-batches (plain ``dropDuplicates``
    state, no watermark).

    The unbounded state is deliberate and correctly bounded: one entry
    per DISTINCT CATALOG ITEM (catalog-sized, not traffic-sized), and
    catalog novelty cannot tolerate eviction — an item seen last month is
    still not novel today. For traffic-scale identities use
    :func:`dedup_events_stream` (watermark-evicted) instead; that
    distinction is the whole design decision here."""
    return (
        events.filter(F.col("itemid").isNotNull())
        .select("itemid", "event_time")
        .dropDuplicates(["itemid"])
    )


def windowed_binned_quantiles(
    events: DataFrame,
    value_col: str = "value",
    bin_width: float = 0.5,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    duration: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-window quantile estimation — the watermarked form of
    ``analytics.binned_quantiles``, and the reason that operator is
    histogram-based at all: per-(window, bin) counts are a pure additive
    aggregate, so Spark maintains them incrementally with O(bins) state
    per window and NO sort/percentile state (exact streaming percentiles
    would buffer every value until the watermark). The quantile pick then
    runs per window over the collected (bin, count) list — bounded by the
    bin count, in one pass over the sorted array.

    Output per closed window: (minute, n_values, q50_lo, q90_lo, q99_lo)
    — same estimates the batch operator produces on that window's slice,
    pinned by the batch-equivalence test."""
    keep = F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
    binned = (
        events.filter(keep)
        .withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", duration).alias("window"),
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("__b"),
        )
        .agg(F.count("*").alias("__c"))
    )
    per_window = binned.groupBy("window").agg(
        F.sum("__c").cast("long").alias("n_values"),
        F.array_sort(F.collect_list(F.struct("__b", "__c"))).alias("__h"),
    )
    # running-sum pick inside the row: aggregate() folds the sorted
    # histogram once, capturing each quantile's first qualifying bin
    hist = F.col("__h")
    n = F.col("n_values")

    def pick(q: float) -> F.Column:
        thresh = F.ceil(F.lit(q) * n.cast("double"))
        folded = F.aggregate(
            hist,
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("long").alias("hit"),
            ),
            lambda acc, s: F.struct(
                (acc["cum"] + s["__c"]).alias("cum"),
                F.when(
                    acc["hit"].isNull() & (acc["cum"] + s["__c"] >= thresh),
                    s["__b"],
                )
                .otherwise(acc["hit"])
                .alias("hit"),
            ),
        )
        return F.round(folded["hit"] * F.lit(bin_width), 6)

    return per_window.select(
        F.col("window.start").alias("minute"),
        "n_values",
        *[pick(q).alias(f"q{int(q * 100)}_lo") for q in quantiles],
    )

"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (plus the
scale extensions) as ``(spark, sf_dir) -> DataFrame`` callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each. Column names are
aliased identically on both sides (the driver's compare hashes values under
sorted column names).

The fixture `events` table maps onto the canonical clickstream as
``user_id→visitorid``, ``event_type→event``, ``ts→event_time`` and the props
payload's integer as ``itemid`` (FIXTURES.md §4). Funnel steps for this
fixture's vocabulary: view → click → purchase.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from clickestream_project_bigdata_spark.functions import portable  # noqa: E402
from clickestream_project_bigdata_spark.operators import (  # noqa: E402
    analytics,
    curation,
    dedup,
    multimodal,
    relational,
    similarity,
    text,
)
from clickestream_project_bigdata_spark.operators.sessionize import (  # noqa: E402
    session_metrics,
    sessionize,
)
from clickestream_project_bigdata_spark.sources.readers import (  # noqa: E402
    events_from_fixture,
    read_events_table,
    read_parquet_table,
)

FUNNEL_STEPS = ["view", "click", "purchase"]

#: Shared DuckDB CTE mapping the fixture events table onto the canonical
#: clickstream (mirror of `events_from_fixture`).
_EV = (
    "ev AS (SELECT user_id AS visitorid, event_type AS event, ts AS event_time, "
    "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events)"
)

#: Shared DuckDB CTE for gaps-and-islands sessionization (mirror of
#: `operators/sessionize.py`; gap strictly > 1800 s of floored-epoch seconds).
_SESSIONIZED = (
    _EV + ", "
    "lagged AS (SELECT *, lag(event_time) OVER (PARTITION BY visitorid ORDER BY event_time) AS prev_t FROM ev), "
    "flagged AS (SELECT *, CASE WHEN prev_t IS NULL OR date_diff('second', prev_t, event_time) > 1800 THEN 1 ELSE 0 END AS is_new FROM lagged), "
    "sessionized AS (SELECT *, CAST(visitorid AS VARCHAR) || '_' || CAST(SUM(is_new) OVER (PARTITION BY visitorid ORDER BY event_time ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS session_id FROM flagged)"
)


def _utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone: every time function here (date_trunc,
    date_format, unix_timestamp) must agree with DuckDB's naive timestamps
    regardless of how the caller built the session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: cleanse-mapped events → sessionize → session metrics."""
    events = events_from_fixture(_utc(spark), "/root/testdata/sf0.001")
    return session_metrics(sessionize(events))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_metrics(sessionize(events_from_fixture(spark, sf_dir)))


def _q_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sessionize(events_from_fixture(spark, sf_dir))
    return analytics.user_paths(s).select(
        "visitorid",
        "session_id",
        F.concat_ws(">", F.col("user_path")).alias("path_str"),
    )


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sessionize(events_from_fixture(spark, sf_dir))
    return analytics.funnel_analysis(s, FUNNEL_STEPS)


def _q_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's data/test.ipynb EDA as a query (row count, null
    profile, cardinalities, time span)."""
    return analytics.profile_events(events_from_fixture(spark, sf_dir))


def _q_events_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_per_minute(events_from_fixture(spark, sf_dir))


def _q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.active_users(events_from_fixture(spark, sf_dir))


def _q_event_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.event_type_distribution(events_from_fixture(spark, sf_dir))


def _q_session_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = session_metrics(sessionize(events_from_fixture(spark, sf_dir)))
    return analytics.session_length_quantiles(m)


def _q_latest_event_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC keep-latest compaction per (visitorid, itemid)
    (operators/analytics.py:latest_event_state)."""
    return analytics.latest_event_state(events_from_fixture(_utc(spark), sf_dir))


def _q_value_quantiles_by_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event exact value percentiles (operators/analytics.py)."""
    return analytics.value_quantiles_by_event(events_from_fixture(spark, sf_dir))


def _q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(event, day) counts + exact value sums (operators/analytics.py)."""
    return analytics.events_cube(events_from_fixture(_utc(spark), sf_dir))


def _q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (operators/analytics.py)."""
    return analytics.value_histogram(events_from_fixture(spark, sf_dir), bin_width=10.0)


def _q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct visitors per day (operators/analytics.py)."""
    return analytics.rolling_active_users(events_from_fixture(_utc(spark), sf_dir), 7)


def _q_events_per_minute_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.events_per_minute_ma(events_from_fixture(spark, sf_dir), 5)


def _q_value_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.value_per_minute(events_from_fixture(spark, sf_dir))


def _q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.ngram_counts(_docs(spark, sf_dir), n=2, k=100)


def _q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pricing_rollup(read_parquet_table(spark, sf_dir, "lineitem"))


def _q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.bounce_rate(events_from_fixture(spark, sf_dir))


def _q_top_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.top_items(events_from_fixture(spark, sf_dir))


def _q_top_k_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.top_k_items_per_minute(events_from_fixture(spark, sf_dir), k=3)


def _q_item_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.item_interactions(events_from_fixture(spark, sf_dir))


def _q_most_viewed_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.most_viewed_items(events_from_fixture(spark, sf_dir))


def _q_session_window_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization run in batch mode — same sessions
    as the gaps-and-islands operator (touching windows merge, so the exact-gap
    boundary matches the strict-> predicate), with the stable start-epoch id."""
    from clickestream_project_bigdata_spark.streaming.sessions import (
        stateful_session_metrics,
    )

    events = events_from_fixture(spark, sf_dir)
    # batch frames ignore watermarks; reuse the streaming operator verbatim
    return stateful_session_metrics(events.withWatermark("event_time", "1 hour"))


def _q_windowed_top_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed_top_items (streaming/sessions.py:203) run in batch
    mode: tumbling-minute per-item counts (watermark is a no-op on a batch
    frame; the plan is the one the stream runs per state update)."""
    from clickestream_project_bigdata_spark.streaming import windowed_top_items

    return windowed_top_items(events_from_fixture(_utc(spark), sf_dir))


def _q_windowed_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed_bounce_rate (streaming/sessions.py:221) in batch
    mode: the chained two-level tumbling-window aggregation shape."""
    from clickestream_project_bigdata_spark.streaming import windowed_bounce_rate

    return windowed_bounce_rate(events_from_fixture(_utc(spark), sf_dir))


def _q_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed_funnel (streaming/sessions.py:166) in batch mode:
    session-window flags rolled into tumbling hours. The chained window()
    buckets on the session window's END minus one microsecond (pinned by
    the oracle SQL below); session merge is exact-µs ≤ gap, not the batch
    operator's floored-second arithmetic."""
    from clickestream_project_bigdata_spark.streaming import windowed_funnel

    return windowed_funnel(
        events_from_fixture(_utc(spark), sf_dir), steps=FUNNEL_STEPS
    )


def _q_active_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct visitors per hour via the portable KMV sketch
    (operators/analytics.py:active_users_kmv) — md5-derived hashes + rank,
    so the DuckDB oracle replays the estimator bit-for-bit (the HLL variant,
    ``active_users(exact=False)``, stays as the library's engine-native
    sketch; its estimates are engine-internal and only rows-checkable)."""
    return analytics.active_users_kmv(events_from_fixture(spark, sf_dir), k=32, grain="hour")


def _q_cleanse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NiFi cleanse semantics (N3-N5) applied to the fixture events: formatted
    UTC timestamp string, preserved epoch-ms, event_category derivation."""
    ev = read_events_table(spark, sf_dir)
    return ev.select(
        F.col("event_id"),
        F.date_format(F.timestamp_millis(F.unix_millis(F.col("ts"))), "yyyy-MM-dd HH:mm:ss").alias("ts_formatted"),
        F.unix_millis(F.col("ts")).alias("unix_ts_ms"),
        F.when(F.col("event_type") == "view", F.lit("Low Value"))
        .otherwise(F.lit("High Value"))
        .alias("event_category"),
    )


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pricing_summary(read_parquet_table(spark, sf_dir, "lineitem"))


def _q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "orders", "customer", "nation", "region")}
    return relational.revenue_by_nation(t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"])


def _q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "orders", "customer")}
    return relational.top_orders_by_revenue(t["lineitem"], t["orders"], t["customer"])


def _q_supplier_part_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "supplier", "part")}
    return relational.supplier_part_volume(t["lineitem"], t["supplier"], t["part"])


def _q_customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("orders", "customer")}
    return relational.customer_order_ranks(t["orders"], t["customer"])


def _q_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("orders", "lineitem")}
    return relational.orders_without_lineitems(t["orders"], t["lineitem"])


def _q_late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("orders", "lineitem")}
    return relational.late_shipment_priority_counts(t["orders"], t["lineitem"])


def _q_returnflag_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional agg over the fact-fact join."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("orders", "lineitem")}
    return relational.returnflag_priority_classes(t["orders"], t["lineitem"])


def _q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo revenue share (broadcast dim, DECIMAL sums)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "part")}
    return relational.promo_revenue_ratio(t["lineitem"], t["part"])


def _q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped filtered-scan aggregate (operators/relational.py) —
    the canonical predicate-pushdown probe."""
    return relational.forecast_revenue(read_parquet_table(spark, sf_dir, "lineitem"))


def _q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral volume: nation dim joined twice under
    different roles (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n)
         for n in ("lineitem", "orders", "customer", "supplier", "nation")}
    return relational.volume_shipping(
        t["lineitem"], t["orders"], t["customer"], t["supplier"], t["nation"]
    )


def _q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: conditional-sum ratio in one
    aggregation (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n)
         for n in ("lineitem", "orders", "customer", "supplier", "nation", "region", "part")}
    return relational.market_share(
        t["lineitem"], t["orders"], t["customer"], t["supplier"],
        t["nation"], t["region"], t["part"],
    )


def _q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit by (supplier nation, order year) for parts
    matching a name substring (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n)
         for n in ("lineitem", "orders", "supplier", "nation", "part")}
    return relational.product_profit_by_nation(
        t["lineitem"], t["orders"], t["supplier"], t["nation"], t["part"]
    )


def _q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped top-20 customers by returned revenue
    (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n)
         for n in ("lineitem", "orders", "customer", "nation")}
    return relational.returned_item_revenue(
        t["lineitem"], t["orders"], t["customer"], t["nation"]
    )


def _q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped order-count histogram including zero-order
    customers via LEFT OUTER (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("orders", "customer")}
    return relational.customer_order_distribution(t["orders"], t["customer"])


def _q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped argmax supplier: scalar max as a 1-row broadcast
    (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "supplier")}
    return relational.top_supplier(t["lineitem"], t["supplier"])


def _q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped below-average-quantity revenue: per-part average
    self-agg joined back, brand-filtered on both sides
    (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "part")}
    return relational.small_qty_order_revenue(t["lineitem"], t["part"])


def _q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped HAVING-on-fact-aggregate with customer attribution
    (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "orders", "customer")}
    return relational.large_volume_customers(t["lineitem"], t["orders"], t["customer"])


def _q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate join revenue
    (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "part")}
    return relational.disjunctive_part_revenue(t["lineitem"], t["part"])


def _q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped above-average-balance never-ordered customers per
    nation: scalar-average broadcast + LEFT ANTI (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("orders", "customer", "nation")}
    return relational.global_sales_opportunity(t["orders"], t["customer"], t["nation"])


def _q_item_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift over session item pairs
    (operators/analytics.py)."""
    from clickestream_project_bigdata_spark.operators.sessionize import sessionize as _sz

    return analytics.item_lift(_sz(events_from_fixture(spark, sf_dir)))


def _q_events_per_minute_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled minute series from a 1-row min/max spine
    (operators/analytics.py)."""
    return analytics.events_per_minute_dense(events_from_fixture(spark, sf_dir))


def _q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase latency histogram via a running last-view carry
    (operators/analytics.py)."""
    return analytics.conversion_latency_histogram(events_from_fixture(spark, sf_dir))


def _q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct data-quality profile in one scan
    (operators/analytics.py)."""
    return analytics.column_profile(events_from_fixture(spark, sf_dir))


def _q_trending_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch closed form of the decayed heavy hitters
    (operators/analytics.py; streaming twin in streaming/stateful.py)."""
    return analytics.trending_items(events_from_fixture(spark, sf_dir))


def _q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: purchase credit split equally over
    the visitor's views in the prior 24 h (operators/analytics.py)."""
    return analytics.linear_attribution(events_from_fixture(spark, sf_dir))


def _q_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour traffic heatmap with exact shares
    (operators/analytics.py)."""
    return analytics.hourly_seasonality(events_from_fixture(spark, sf_dir))


def _q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-DECIMAL-moment discount/quantity correlation per part type
    (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "part")}
    return relational.discount_elasticity(t["lineitem"], t["part"])


def _q_timed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with per-step completion windows: click within 30 min of the
    first view, purchase within 24 h of that click (operators/analytics.py)."""
    return analytics.timed_funnel(events_from_fixture(spark, sf_dir))


def _q_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute concurrent-session occupancy (operators/analytics.py)."""
    return analytics.concurrent_sessions(events_from_fixture(spark, sf_dir))


def _q_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-visitor burst-rate bot heuristic (operators/analytics.py)."""
    return analytics.bot_flags(events_from_fixture(spark, sf_dir))


def _q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot ingest dedup: docs with doc_id % 3 == 0 are the
    incoming batch, the rest the already-ingested corpus
    (operators/dedup.py)."""
    docs = _docs(spark, sf_dir)
    new_batch = docs.filter(F.col("doc_id") % 3 == 0)
    seen = docs.filter(F.col("doc_id") % 3 != 0)
    return dedup.incremental_dedup(new_batch, seen).select("doc_id", "source")


def _q_item_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item OLS trend of daily interactions from exact integer sums
    (operators/analytics.py)."""
    return analytics.item_trend(events_from_fixture(spark, sf_dir))


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc OOV rate vs the corpus's own top-50 token vocabulary
    (operators/text.py)."""
    return text.vocab_coverage(_docs(spark, sf_dir), vocab_size=50)


def _q_minute_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute traffic z-scores vs the day's exact-integer stats
    (operators/analytics.py)."""
    return analytics.minute_anomalies(events_from_fixture(spark, sf_dir))


def _q_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (fasttext-style) classification of every embedding
    against the per-label mean vectors (operators/similarity.py)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.nearest_centroid_classify(emb)


def _q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped solo-late-supplier count: fact-fact late tagging,
    then LEFT SEMI (another supplier exists on the order) + LEFT ANTI (no
    other supplier was late) on the same late set (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "orders", "supplier", "nation")}
    return relational.waiting_suppliers(t["lineitem"], t["orders"], t["supplier"], t["nation"])


def _q_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped ramping-supplier identification: prefix-filtered
    part semi-join, conditional-sum year/all-time threshold per
    (supplier, part), nested semi-joins up to nation-filtered suppliers
    (operators/relational.py:potential_part_promotion)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "part", "supplier", "nation")}
    return relational.potential_part_promotion(
        t["lineitem"], t["part"], t["supplier"], t["nation"]
    )


def _q_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped per-part argmin supplier over lineitem-derived unit
    costs (the fixture has no partsupp), broadcast scalar-min join-back
    (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "part", "supplier", "nation")}
    return relational.cheapest_supplier_per_part(t["lineitem"], t["part"], t["supplier"], t["nation"])


def _q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped value-share gate: exact-decimal per-part sums vs a
    broadcast grand-total threshold (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "supplier", "nation")}
    return relational.important_part_values(t["lineitem"], t["supplier"], t["nation"])


def _q_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped distinct-supplier counts per part class with an
    anti-joined supplier exclusion list (operators/relational.py)."""
    t = {n: read_parquet_table(spark, sf_dir, n) for n in ("lineitem", "part", "supplier")}
    return relational.part_supplier_counts(t["lineitem"], t["part"], t["supplier"])


def _q_next_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov next-item top-3 per item (operators/graph.py)."""
    from clickestream_project_bigdata_spark.operators.graph import (
        item_transitions,
        next_item_recommendations,
    )

    return next_item_recommendations(
        item_transitions(events_from_fixture(spark, sf_dir)), k=3
    )


def _q_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session landing/abandonment item distribution
    (operators/analytics.py:session_entry_exit)."""
    from clickestream_project_bigdata_spark.operators.sessionize import sessionize

    return analytics.session_entry_exit(
        sessionize(events_from_fixture(_utc(spark), sf_dir))
    )


def _q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common exact session paths (operators/analytics.py:top_paths)."""
    from clickestream_project_bigdata_spark.operators.sessionize import sessionize

    return analytics.top_paths(sessionize(events_from_fixture(_utc(spark), sf_dir)))


def _q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/analytics.py:retention_cohorts)."""
    return analytics.retention_cohorts(events_from_fixture(_utc(spark), sf_dir))


def _q_item_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item dwell proxy (operators/analytics.py:item_dwell_time)."""
    return analytics.item_dwell_time(events_from_fixture(_utc(spark), sf_dir))


def _q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/analytics.py:rfm_segments)."""
    return analytics.rfm_segments(read_parquet_table(spark, sf_dir, "orders"))


def _q_sequential_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view→click→purchase
    (operators/analytics.py:sequential_funnel): chained conditional mins,
    exact sequential semantics (not first-touch)."""
    from clickestream_project_bigdata_spark.operators.sessionize import sessionize

    ev = sessionize(events_from_fixture(_utc(spark), sf_dir))
    return analytics.sequential_funnel(ev, ["view", "click", "purchase"])


def _q_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level item co-occurrence top-100
    (operators/analytics.py:item_cooccurrence), 50-item session cap."""
    from clickestream_project_bigdata_spark.operators.sessionize import sessionize

    ev = sessionize(events_from_fixture(_utc(spark), sf_dir))
    return analytics.item_cooccurrence(ev, k=100)


def _q_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order inter-arrival profile
    (operators/relational.py:order_gap_stats)."""
    return relational.order_gap_stats(read_parquet_table(spark, sf_dir, "orders"))


def _q_item_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item→item browsing-transition counts (operators/graph.py): lead()
    over the visitorid exchange, then one (src, dst) count."""
    from clickestream_project_bigdata_spark.operators.graph import item_transitions

    return item_transitions(events_from_fixture(spark, sf_dir))


def _q_item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the transition graph, 10 fixed iterations
    (operators/graph.py) — the iterative-algorithm family, hash-checkable
    because ranks round to 10 decimals per iteration on both engines and
    the oracle unrolls the same 10 iterations as chained CTEs."""
    from clickestream_project_bigdata_spark.operators.graph import (
        item_transitions,
        pagerank,
    )

    return pagerank(item_transitions(events_from_fixture(spark, sf_dir)))


def _q_similar_visitors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate visitors by item-set MinHash (portable hash family
    — the oracle replays shingling/banding/verification bit-for-bit at
    shingle_n=1, where the shingle set IS the visitor's item set and the
    verified jaccard is exact set Jaccard; 42-band/r=3 banding, ~94%
    recall at the 0.4 threshold — r=3 is the measured scale constraint,
    band count is the recall lever, see the operator docstring)
    (operators/dedup.py:similar_visitors_minhash)."""
    return dedup.similar_visitors_minhash(
        events_from_fixture(spark, sf_dir), threshold=0.4, hash="portable"
    )


def _q_item_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned degree histogram of the item transition graph
    (operators/graph.py:item_degree_profile) — the heavy-tail diagnostic
    behind broadcast/salting decisions in the graph family. Both the
    Spark plan and the oracle bucket via floor(ln(deg)/ln(2) + 1e-9);
    the epsilon's cross-engine guarantee holds for deg < 2^30 (see the
    operator docstring) — degrees here are bounded by the item domain."""
    from clickestream_project_bigdata_spark.operators.graph import (
        item_degree_profile,
    )

    return item_degree_profile(events_from_fixture(spark, sf_dir))


def _q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: minute × event-type counts in wide format with an
    explicit value list (operators/analytics.py:event_type_pivot)."""
    return analytics.event_type_pivot(events_from_fixture(spark, sf_dir))


def _q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile() surface: customers cut into spend deciles
    (operators/analytics.py:customer_value_deciles)."""
    return analytics.customer_value_deciles(read_parquet_table(spark, sf_dir, "orders"))


def _with_utc(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_utc(spark), sf_dir)

    wrapped.__name__ = fn.__name__
    return wrapped


# --- scale extensions: dedup / similarity / text / multimodal --------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, "documents")


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(_docs(spark, sf_dir))


def _q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_count_bpe(_docs(spark, sf_dir))


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_docs(spark, sf_dir))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(_docs(spark, sf_dir))


def _q_similar_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query lexical find-similar (operators/text.py): exact token
    Jaccard vs doc 0, broadcast query + TakeOrderedAndProject."""
    return text.similar_docs_topk(_docs(spark, sf_dir), query_id=0, k=10)


def _q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf profile: top-100 tokens by occurrence with doc counts
    (operators/text.py:token_frequencies)."""
    return text.token_frequencies(_docs(spark, sf_dir), k=100)


def _q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per source feed
    (operators/dedup.py:dup_rate_by_stratum)."""
    from clickestream_project_bigdata_spark.operators.dedup import dup_rate_by_stratum

    return dup_rate_by_stratum(_docs(spark, sf_dir), by=("source",))


def _q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring (token-span) duplication detector
    (operators/dedup.py:duplicate_spans): 16-token windows occurring 2+
    times, top-100."""
    from clickestream_project_bigdata_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_docs(spark, sf_dir), span_tokens=16, k=100)


def _q_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-vs-MinHash pair-set agreement QA
    (operators/dedup.py:dedup_method_agreement), portable hash family."""
    return dedup.dedup_method_agreement(_docs(spark, sf_dir), threshold=0.7, hash="portable")


def _q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack fill/spill diagnostic over the 512-token packing plan
    (operators/curation.py:pack_efficiency)."""
    return curation.pack_efficiency(
        curation.pack_sequences(_docs(spark, sf_dir), budget=512), budget=512
    )


def _q_rare_bigram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-lite fluency proxy: per-doc rare-corpus-bigram fraction
    (operators/text.py:rare_bigram_rate)."""
    from clickestream_project_bigdata_spark.operators.text import rare_bigram_rate

    return rare_bigram_rate(_docs(spark, sf_dir), rare_below=3)


def _q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle into 64 shards
    (operators/curation.py:shuffle_shards)."""
    from clickestream_project_bigdata_spark.operators.curation import shuffle_shards

    return shuffle_shards(_docs(spark, sf_dir), n_shards=64)


def _q_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered token-budget cut at 10k tokens: text_stats scoring
    composed into the shared distributed prefix sum
    (operators/curation.py:select_token_budget)."""
    from clickestream_project_bigdata_spark.operators.curation import (
        select_token_budget,
    )
    from clickestream_project_bigdata_spark.operators.text import text_stats

    scored = text_stats(_docs(spark, sf_dir))
    return select_token_budget(scored, token_budget=10_000)


def _q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 adjacent-token collocations by PMI, scored as an exact
    integer-scaled ratio (operators/text.py:collocations)."""
    from clickestream_project_bigdata_spark.operators.text import collocations

    return collocations(_docs(spark, sf_dir), k=100, min_count=5)


def _q_type_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity (type-token ratio, integer ppm)
    (operators/text.py:type_token_ratio)."""
    from clickestream_project_bigdata_spark.operators.text import type_token_ratio

    return type_token_ratio(_docs(spark, sf_dir), by="source")


def _q_mask_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply form of exact-substring dedup — mask every non-first
    occurrence of a duplicated 16-token window and rebuild the text
    (operators/dedup.py:mask_duplicate_spans); slim digest output."""
    from clickestream_project_bigdata_spark.operators.dedup import (
        mask_duplicate_spans,
    )

    return mask_duplicate_spans(_docs(spark, sf_dir), span_tokens=16)


def _q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (operators/similarity.py), DECIMAL-summed,
    CSV-serialized for the driver hasher."""
    return similarity.label_centroids(read_parquet_table(spark, sf_dir, "embeddings"))


def _q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF keywords (operators/text.py)."""
    return text.tfidf_top_terms(_docs(spark, sf_dir), k=3)


def _q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc n-gram repetition ratio (operators/text.py)."""
    return text.repetition_score(_docs(spark, sf_dir), n=3)


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir))


def _q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_keep_first(_docs(spark, sf_dir)).select("doc_id", "lang", "source", "n_chars")


def _q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_pairs raised DELIBERATELY: the 100x all-dups checkpoint fixture
    # estimates 1.54e10 candidate pairs and this entry is the measurement
    # that the exact tier survives it (489 s where the DuckDB control
    # times out); the library default (1e10) refuses corpora at that
    # density and redirects to minhash_lsh_pairs — see the tier contract
    # in ngram_jaccard_pairs' docstring / SCALING.md.
    return dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.9, max_pairs=20_000_000_000
    )


def _q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized deduped corpus (operators/dedup.py:dedup_apply):
    exact + MinHash near-dup removal, keep each cluster's minimum id;
    portable hash family so the oracle replays the sketch."""
    return dedup.dedup_apply(
        _docs(spark, sf_dir), threshold=0.7, hash="portable"
    ).select("doc_id", "lang", "source", "n_chars")


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs with the portable (md5-derived) hash
    family — the DuckDB oracle replays shingling, permutations, banding,
    and verification bit-for-bit (functions/portable.py)."""
    return dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.7, hash="portable")


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, portable 60-bit signatures (md5 base hashes
    → oracle-reproducible; the xxhash64/64-bit variant stays the library
    default for speed)."""
    return dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=8, bits=60, hash="portable")


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: distributed connected components (iterative
    min-label propagation) over portable MinHash near-dup pairs. The oracle
    replays the edge set in SQL and closes it with a recursive CTE — the
    iterative Spark algorithm and the declarative closure must agree on
    every (doc_id, cluster_id)."""
    pairs = dedup.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.9, hash="portable")
    return dedup.duplicate_clusters(pairs)


def _q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded hyperplane LSH (2 bands
    × 4 planes) + exact per-pair rescoring. Plane components are md5-derived
    literals, so the oracle recomputes identical buckets and scores.
    Threshold 0.25: the fixture embeddings are random (near-orthogonal,
    cos σ≈1/√64), so a real-corpus 0.9 threshold would select nothing at
    any SF."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.all_pairs_above(emb, threshold=0.25, num_planes=8, bands=2, method="pandas")


def _q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(emb, query_id=0, k=10)


def _q_sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, query_id=0, k=10, num_planes=4)


def _q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with the SEEDED quantizer (centroids = lowest
    ids, deterministic) — the oracle replays assignment, probing, and
    rescoring in SQL. The k-means quantizer stays the library default for
    cell balance; its recall vs brute force is pinned in
    tests/test_similarity.py."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        emb, query_id=0, k=10, num_centroids=8, nprobe=2, quantizer="seeded"
    )


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.corpus_stats(_docs(spark, sf_dir))


def _q_normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization precompute (operators/similarity.py) — no shuffle.

    The driver's value hasher canonicalizes via pandas sort, which cannot
    order list cells — so the array column is serialized to a deterministic
    CSV of round(x*1e6) integers (same trick as user_paths' path_str)."""
    out = similarity.normalize_embeddings(
        read_parquet_table(spark, sf_dir, "embeddings")
    )
    return out.select(
        "vec_id",
        F.concat_ws(
            ",",
            F.transform(
                F.col("normalized"),
                lambda x: F.round(x * 1000000).cast("bigint").cast("string"),
            ),
        ).alias("normalized_q6"),
    )


def _q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (operators/similarity.py) — no shuffle.
    qvec (array<int>) serialized to CSV for the driver's list-blind hasher."""
    out = similarity.quantize_embeddings(
        read_parquet_table(spark, sf_dir, "embeddings")
    )
    return out.select(
        "vec_id",
        "scale",
        F.concat_ws(
            ",", F.transform(F.col("qvec"), lambda x: x.cast("string"))
        ).alias("qvec_csv"),
    )


def _q_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream attribution join (streaming/joins.py) run in batch
    mode: views matched to same-visitor purchases within 30 minutes after
    the view (inclusive); oracled by a DuckDB BETWEEN join."""
    from clickestream_project_bigdata_spark.streaming import attribution_join

    ev = events_from_fixture(_utc(spark), sf_dir)
    return attribution_join(
        ev.filter(F.col("event") == "view"),
        ev.filter(F.col("event") == "purchase"),
        horizon="30 minutes",
    )


def _q_view_purchase_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream attribution join in batch mode: every view,
    NULL purchase columns when unconverted — oracled by a DuckDB LEFT
    BETWEEN join."""
    from clickestream_project_bigdata_spark.streaming import attribution_join_outer

    ev = events_from_fixture(_utc(spark), sf_dir)
    return attribution_join_outer(
        ev.filter(F.col("event") == "view"),
        ev.filter(F.col("event") == "purchase"),
        horizon="30 minutes",
    )


def _q_windowed_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-appendable windowed conversion rate in batch mode
    (streaming/joins.py:windowed_conversion_rate)."""
    from clickestream_project_bigdata_spark.streaming import windowed_conversion_rate

    ev = events_from_fixture(_utc(spark), sf_dir)
    return windowed_conversion_rate(
        ev.filter(F.col("event") == "view"),
        ev.filter(F.col("event") == "purchase"),
        horizon="30 minutes",
        window="1 hour",
    )


def _q_conversion_rate_by_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item conversion rate on the outer attribution join
    (streaming/joins.py:conversion_rate_by_item)."""
    from clickestream_project_bigdata_spark.streaming import conversion_rate_by_item

    ev = events_from_fixture(_utc(spark), sf_dir)
    return conversion_rate_by_item(
        ev.filter(F.col("event") == "view"),
        ev.filter(F.col("event") == "purchase"),
        horizon="30 minutes",
    )


#: Fixed campaign windows inside the fixture's January range — shared by the
#: Spark query and the DuckDB oracle for the interval-overlap join.
_CAMPAIGNS = [
    ("c1", "2024-01-03 06:00:00", "2024-01-03 18:00:00"),
    ("c2", "2024-01-10 00:00:00", "2024-01-10 12:00:00"),
    ("c3", "2024-01-21 12:00:00", "2024-01-22 00:00:00"),
]


def _q_sessions_in_campaigns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (operators/relational.py:
    interval_overlap_join, first-common-bucket decomposition): sessions
    overlapping fixed campaign windows."""
    ev = events_from_fixture(_utc(spark), sf_dir)
    iv = session_metrics(sessionize(ev)).select(
        "session_id", "session_start", "session_end"
    )
    campaigns = spark.createDataFrame(
        [(c, s, e) for c, s, e in _CAMPAIGNS],
        "campaign string, c_start string, c_end string",
    ).select(
        "campaign",
        F.col("c_start").cast("timestamp").alias("c_start"),
        F.col("c_end").cast("timestamp").alias("c_end"),
    )
    return relational.interval_overlap_join(
        iv, campaigns, "session_start", "session_end", "c_start", "c_end",
        bucket_seconds=6 * 3600,
    ).select("session_id", "campaign")


def _q_events_with_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join (operators/relational.py:range_join):
    every event matched back to its session's [start, end] window per
    visitor via bucket decomposition — reproducing sessionize's own
    assignment, which the oracle checks with a plain BETWEEN theta join."""
    ev = events_from_fixture(_utc(spark), sf_dir)
    iv = session_metrics(sessionize(ev)).select(
        "session_id", "visitorid", "session_start", "session_end"
    )
    out = relational.range_join(
        ev.select("visitorid", "event_time", "itemid"),
        iv,
        ts_col="event_time",
        start_col="session_start",
        end_col="session_end",
        by="visitorid",
        bucket_seconds=3600,
    )
    return out.select("visitorid", "event_time", "itemid", "session_id")


def _q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token chunking (operators/text.py:chunk_documents):
    64-token chunks, 16-token overlap — zero-shuffle posexplode+slice."""
    return text.chunk_documents(_docs(spark, sf_dir), max_tokens=64, overlap=16)


def _q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (operators/relational.py:asof_join): each view
    event picks up the visitor's latest purchase value at-or-before the
    view — the feature-store as-of semantics, oracled by DuckDB's native
    ASOF LEFT JOIN."""
    ev = events_from_fixture(_utc(spark), sf_dir)
    left = ev.filter(F.col("event") == "view").select(
        "visitorid", "event_time", "itemid"
    )
    right = (
        ev.filter(F.col("event") == "purchase")
        .groupBy("visitorid", "event_time")
        .agg(F.max("value").alias("purchase_value"))
    )
    return relational.asof_join(
        left, right, ts_col="event_time", by="visitorid",
        value_cols=("purchase_value",),
    )


def _q_split_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split (operators/curation.py:split_corpus):
    train/val/test = 0.9/0.05/0.05, disjoint+complete by construction."""
    return curation.split_corpus(
        _docs(spark, sf_dir), fractions={"train": 0.9, "val": 0.05, "test": 0.05}
    ).select("doc_id", "lang", "source", "split")


def _q_dup_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate group-size distribution (operators/dedup.py)."""
    from clickestream_project_bigdata_spark.operators.dedup import (
        duplication_histogram,
    )

    return duplication_histogram(_docs(spark, sf_dir))


def _q_item_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hottest items with row share (operators/analytics.py:key_skew_profile)."""
    return analytics.key_skew_profile(
        events_from_fixture(spark, sf_dir), key="itemid", k=10
    )


def _q_stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-stratum deterministic draw (operators/curation.py)."""
    return curation.stratified_fixed_k(
        _docs(spark, sf_dir), k=20, by=("lang",)
    ).select("doc_id", "lang", "source", "sample_rank")


def _q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture sampling (operators/curation.py): α=0.5 rate
    ∝ n_lang^-0.5 scaled to an expected half of the corpus — deterministic
    hash membership, oracle-replayable."""
    return curation.temperature_sample(
        _docs(spark, sf_dir), alpha=0.5, fraction=0.5, by=("lang",)
    ).select("doc_id", "lang", "source")


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination report (operators/curation.py):
    the deterministic 20 % hash sample stands in as the eval set, so the
    oracle can replay the membership; sampled docs match themselves and
    their duplicates."""
    docs = _docs(spark, sf_dir)
    bench = curation.stratified_sample(docs, fraction=0.2)
    return curation.decontaminate(docs, bench, n=5)


def _q_decontaminate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination APPLY form: the corpus minus contaminated docs
    (operators/curation.py:decontaminate_apply); same fixture eval set as
    the report query."""
    docs = _docs(spark, sf_dir)
    bench = curation.stratified_sample(docs, fraction=0.2)
    return curation.decontaminate_apply(docs, bench, n=5).select(
        "doc_id", "lang", "source", "n_chars"
    )


def _q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus EDA aggregation (operators/curation.py:corpus_profile)."""
    return curation.corpus_profile(_docs(spark, sf_dir))


def _q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20 % hash sample — same docs kept on every run and
    every cluster layout (portable hash → oracle replays the membership)."""
    return curation.stratified_sample(_docs(spark, sf_dir), fraction=0.2).select(
        "doc_id", "lang", "source"
    )


def _q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.redact_pii(_docs(spark, sf_dir))


def _q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.pack_sequences(_docs(spark, sf_dir), budget=512)


def _q_packed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized fixed-budget packs (operators/curation.py:
    pack_corpus_text) — one row per pack, member text concatenated in id
    order."""
    return curation.pack_corpus_text(_docs(spark, sf_dir), budget=512)


def _q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH k-NN join: top-3 cosine neighbors for every vector."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.knn_join(emb, k=3, num_planes=8, bands=2)


def _q_knn_join_fine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN join at SCALE resolution: 16 planes → 256 buckets/band.

    LSH bucket count is a data-scale knob, not a constant: with P planes
    per band the expected bucket is corpus/2^(P/bands), so the 8-plane
    default (16 buckets/band) that suits the sf-series corpora turns
    quadratic-by-construction once the corpus outgrows
    buckets × max_bucket_rows (measured: the 100× checkpoint's 200k-vector
    fixture pushes EVERY bucket over the 4096-row guard and the whole
    corpus down the quadratic pair-join fallback). This entry pins the
    resolution a 100×+ corpus needs; the oracle is the same parameterized
    SQL at the same plane count, so recall/rank parity is hash-checked,
    not asserted.
    """
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.knn_join(emb, k=3, num_planes=16, bands=2)


def _q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition: the END-TO-END curation pipeline (quality
    filter → exact dedup → MinHash near-dup clustering → PII redaction →
    sequence packing) in one operator call, oracle-replayed end-to-end via
    the portable hash family."""
    return curation.curate_corpus(
        _docs(spark, sf_dir),
        min_quality=0.3,
        near_dup_threshold=0.9,
        budget=512,
        hash="portable",
    )


def _q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_images(multimodal.attach_binary(_docs(spark, sf_dir)))


def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature extraction (mapInPandas, normalize=False):
    the raw per-bucket byte counts are exact integers, so the oracle can
    recompute the histogram character-by-character and hash-match it (the
    fixture corpus is pure ASCII → byte == codepoint; the L2-normalized
    variant stays the default for embedding into the similarity operators)."""
    feats = multimodal.extract_features(
        multimodal.attach_binary(_docs(spark, sf_dir)), normalize=False
    )
    return feats.select(
        "doc_id", F.posexplode("feature").alias("bucket", "cnt")
    ).select(
        "doc_id",
        F.col("bucket").cast("long").alias("bucket"),
        F.col("cnt").cast("long").alias("byte_count"),
    )


def _q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.sample_frames(multimodal.attach_binary(_docs(spark, sf_dir))).select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


def _q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-visitor intersection + Jaccard between event
    types (operators/analytics.py): one visitor-keyed collect_set pass,
    pairs exploded per user, per-type totals broadcast back — the oracle
    keeps the DISTINCT + self-join spelling to pin the equivalence."""
    return analytics.audience_overlap(events_from_fixture(spark, sf_dir))


def _q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law (Zipf) fit of item popularity (operators/analytics.py):
    ln(count)~ln(rank) least squares, computed at count-value grain with
    group-size weights so no per-item global sort exists; the oracle runs
    the naive per-item rank() + regr_slope/intercept/r2 spelling."""
    return analytics.zipf_slope(events_from_fixture(spark, sf_dir))


def _q_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item next-item entropy over the transition graph
    (operators/graph.py), single-pass H = ln N − Σc·ln c / N."""
    from clickestream_project_bigdata_spark.operators.graph import (
        transition_entropy,
    )

    return transition_entropy(events_from_fixture(spark, sf_dir))


def _q_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding L2-norm QA profile (operators/similarity.py),
    DECIMAL-accumulated mean."""
    return similarity.norm_profile(read_parquet_table(spark, sf_dir, "embeddings"))


def _q_cluster_inertia(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label within-cluster sum of squares vs the published q6
    centroids (operators/similarity.py) — clustering-quality companion of
    label_centroids, same centroid convention by construction."""
    return similarity.cluster_inertia(read_parquet_table(spark, sf_dir, "embeddings"))


def _q_binned_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-bin quantile estimation over event values
    (operators/analytics.py) — the single-pass scale path beside the
    exact percentiles; exact integer bin arithmetic on both engines."""
    return analytics.binned_quantiles(events_from_fixture(spark, sf_dir))


def _q_rec_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage of the top-3 Markov recommendation table over observed
    transition volume (operators/graph.py) — the eval-join family."""
    from clickestream_project_bigdata_spark.operators.graph import rec_coverage

    return rec_coverage(events_from_fixture(spark, sf_dir), k=3)


def _q_item_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the >=2-transition item graph
    (operators/graph.py), min-label propagation; oracle = recursive-CTE
    transitive closure."""
    from clickestream_project_bigdata_spark.operators.graph import item_communities

    return item_communities(events_from_fixture(spark, sf_dir))


def _q_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency QA of the 0.9/0.05/0.05 hash split against
    the source strata (operators/curation.py)."""
    return curation.split_balance(
        _docs(spark, sf_dir), fractions={"train": 0.9, "val": 0.05, "test": 0.05}
    )


def _q_cross_source_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cross-source content overlap (operators/dedup.py) at
    SPAN grain (8-token window digests — shared boilerplate shows up long
    before whole docs collide) on the shared pairwise_set_overlap core."""
    return dedup.cross_source_duplication(
        _docs(spark, sf_dir), grain="span", span_tokens=8
    )


def _q_quality_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-bin vs exact-duplication calibration (operators/curation.py):
    one window exchange on the fingerprint, ≤ bins output rows."""
    return curation.quality_dup_calibration(_docs(spark, sf_dir))


def _q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of item popularity (operators/analytics.py) at
    count-value grain with DECIMAL(38,0) exact integer sums; oracle =
    naive per-item row_number spelling."""
    return analytics.gini_concentration(events_from_fixture(spark, sf_dir))


def _q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item per-minute dispersion index (operators/analytics.py),
    exact integer moment sums."""
    return analytics.burstiness(events_from_fixture(spark, sf_dir))


def _q_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day share of items making their global first appearance
    (operators/analytics.py)."""
    return analytics.novelty_rate(events_from_fixture(spark, sf_dir))


def _q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise token-vocabulary Jaccard between sources
    (operators/text.py), sharing analytics.pairwise_set_overlap."""
    return text.source_vocab_overlap(_docs(spark, sf_dir))


def _q_token_length_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (occurrences + distinct types per length) —
    tokenizer QA (operators/text.py)."""
    return text.token_length_distribution(_docs(spark, sf_dir))


def _q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy — the gibberish /
    compressibility quality proxy (operators/text.py)."""
    return text.char_entropy(_docs(spark, sf_dir))


def _q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch-style readability from exact integer sums
    (operators/text.py)."""
    return text.readability_scores(_docs(spark, sf_dir))


def _q_ann_recall_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the hyperplane-LSH index vs exact brute force for the
    standard query vector (operators/similarity.py)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.ann_recall_eval(emb, query_id=0, k=10, method="lsh", num_planes=4)


def _q_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the seeded-quantizer IVF index vs exact brute force
    (operators/similarity.py)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.ann_recall_eval(
        emb, query_id=0, k=10, method="ivf",
        num_centroids=8, nprobe=2, quantizer="seeded",
    )


def _q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/var/min/max embedding health profile, DECIMAL
    accumulation (operators/similarity.py)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.embedding_dim_stats(emb)


def _q_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training iteration: corpus-weighted adjacent-char-pair
    counts over the VOCAB grain, top-100 (operators/text.py)."""
    return text.bpe_merge_step(_docs(spark, sf_dir), top_n=100, min_pair_count=2)


def _q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher-style quality rule flags (Rae et al. 2021
    doc-level subset), booleans cast to INT for the cross-engine hash
    (operators/text.py)."""
    df = text.gopher_quality_flags(_docs(spark, sf_dir))
    return df.select(
        *[
            F.col(c).cast("int").alias(c)
            if c.startswith("ok_") or c == "passes_all"
            else F.col(c)
            for c in df.columns
        ]
    )


def _q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth curve via first-occurrence counting +
    the shared distributed prefix sum (operators/text.py)."""
    return text.vocab_growth(_docs(spark, sf_dir))


def _q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source BPE-pieces-per-word fertility — the per-domain token
    budget cost model (operators/text.py)."""
    return text.tokenizer_fertility(_docs(spark, sf_dir))


def _q_domain_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened per-source resampling weights over token
    counts, alpha=0.5 (operators/curation.py)."""
    return curation.domain_balance_weights(_docs(spark, sf_dir), alpha=0.5)


def _q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label top-5 centroid-distance outliers — the row-level
    drill-down behind cluster_inertia (operators/similarity.py)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    return similarity.embedding_outliers(emb, top_k=5)


def _q_scd2_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD validity ranges of each visitor's event type — the
    versioned dimension-history build (operators/relational.py); ties on
    event_time break by event_id for a total order."""
    return relational.scd2_history(
        events_from_fixture(spark, sf_dir), order_cols=("event_id",)
    )


def _q_first_touch_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-visitor first-touch ordered funnel view->click->purchase — the
    oracle-checked batch twin of streaming.stateful_funnel
    (operators/analytics.py)."""
    return analytics.first_touch_funnel(
        events_from_fixture(spark, sf_dir), ["view", "click", "purchase"]
    )


def _q_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decay multi-touch attribution with exact dyadic weights
    (operators/analytics.py)."""
    return analytics.decay_attribution(events_from_fixture(spark, sf_dir))


def _q_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch credit attribution: whole credit to the earliest
    in-horizon touch, exact integer counts (operators/analytics.py)."""
    return analytics.first_touch_attribution(events_from_fixture(spark, sf_dir))


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-to-crawl diff QA on two deterministic synthetic snapshots of
    the documents table: old drops doc_id%10==0, new drops doc_id%11==0
    and rewrites text for doc_id%7==0 (operators/curation.py)."""
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 11 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return curation.snapshot_diff(old, new)


def _q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive vocabulary by ppm-scaled smoothed odds
    ratio, top-5 per source (operators/text.py)."""
    return text.distinctive_terms(_docs(spark, sf_dir), k=5, min_count=3)


def _q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-ordered triangle census + global transitivity of the item
    co-browsing graph (operators/graph.py)."""
    from clickestream_project_bigdata_spark.operators.graph import graph_triangles

    return graph_triangles(events_from_fixture(spark, sf_dir))


def _q_neardup_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-Jaccard histogram + sketch calibration over the LSH
    candidate pairs, portable hash family (operators/dedup.py)."""
    return dedup.neardup_similarity_histogram(_docs(spark, sf_dir), hash="portable")


def _q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix vs declared lang labels
    (operators/text.py)."""
    return text.langid_confusion(_docs(spark, sf_dir))


# --- round 8 additions ------------------------------------------------------

def _q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (40/20/40) multi-touch attribution in exact integer ppm
    credits (operators/analytics.py) — completes the attribution family."""
    return analytics.position_attribution(events_from_fixture(spark, sf_dir))


def _q_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item view-without-purchase abandonment (operators/analytics.py)."""
    return analytics.cart_abandonment_by_item(events_from_fixture(spark, sf_dir))


def _q_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item repeat-buyer structure (operators/analytics.py)."""
    return analytics.repeat_purchase_rate(events_from_fixture(spark, sf_dir))


def _q_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """±3-window unordered skip-gram pairs, integer-exact PMI scores
    (operators/text.py)."""
    return text.skipgram_pmi(_docs(spark, sf_dir), window=3, k=100, min_count=5)


def _q_token_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-coverage curve: corpus share of the top-{10,100,1000} tokens
    (operators/text.py)."""
    return text.token_coverage_topk(_docs(spark, sf_dir))


def _q_pii_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure rollup on the redact_pii chain
    (operators/curation.py)."""
    return curation.pii_rate_by_source(_docs(spark, sf_dir))


def _q_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token volume before/after global keep-first exact dedup
    (operators/dedup.py)."""
    return dedup.dedup_token_savings(_docs(spark, sf_dir))


def _q_quantization_error_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label int8 reconstruction audit — order-independent stats only
    (operators/similarity.py)."""
    return similarity.quantization_error_stats(
        read_parquet_table(spark, sf_dir, "embeddings")
    )


def _q_neardup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the near-duplicate graph — the shape
    diagnostic on the duplicate_clusters assignment (operators/dedup.py)."""
    pairs = dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.9, hash="portable"
    )
    return dedup.neardup_cluster_sizes(dedup.duplicate_clusters(pairs))


def _q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio metadata plumbing (pure Catalyst fake path whose arithmetic
    the oracle mirrors; the real WAV PCM decoder is test-pinned in
    tests/test_multimodal.py) (operators/multimodal.py)."""
    return multimodal.decode_audio(
        multimodal.attach_audio_binary(_docs(spark, sf_dir))
    )


def _q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video metadata plumbing (pure Catalyst fake path whose arithmetic
    the oracle mirrors; the real ISO-BMFF/MP4 box walker —
    ftyp/mvhd/tkhd/stsd — is test-pinned on hand-built containers in
    tests/test_multimodal.py) (operators/multimodal.py)."""
    return multimodal.decode_video(
        multimodal.attach_video_binary(_docs(spark, sf_dir))
    )


def _q_path_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate by session opening path (operators/analytics.py);
    user_paths' sorted-struct core with the convert flag in-aggregation."""
    s = sessionize(events_from_fixture(spark, sf_dir))
    return analytics.path_conversion_rates(s)


def _q_returning_visitor_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visitors active on 2+ distinct days (operators/analytics.py)."""
    return analytics.returning_visitor_rate(events_from_fixture(spark, sf_dir))


def _q_contamination_by_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split benchmark-contamination rate: decontaminate composed with
    the pure-hash split assignment (operators/curation.py); same 20%
    hash-sample eval set as the decontaminate query."""
    docs = _docs(spark, sf_dir)
    bench = curation.stratified_sample(docs, fraction=0.2)
    return curation.contamination_by_split(docs, bench, n=5)


def _q_heavy_hitter_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over itemid via the Misra-Gries two-pass plan
    (operators/analytics.py): shuffle-free per-partition sketch candidates,
    broadcast semi-join, exact verify - integer-exact thresholds."""
    return analytics.heavy_hitters_2pass(
        events_from_fixture(spark, sf_dir), key="itemid", share_ppm=2000
    )


def _q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter TOKENS (>= 0.5% of occurrences) on the exploded
    document token stream - the Zipf-head reading of the same two-pass
    sketch-then-verify plan (operators/analytics.py)."""
    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(text.tokens_col(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
    )
    return analytics.heavy_hitters_2pass(toks, key="token", share_ppm=5000)


def _q_lsh_band_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket size distribution of the portable MinHash banding
    (operators/dedup.py:minhash_band_census) - the skew diagnostic that
    predicts LSH pair-join stragglers (a bucket of n rows is an n(n-1)/2
    pair task; past max_bucket_rows the pair join salts it)."""
    from clickestream_project_bigdata_spark.operators.dedup import (
        minhash_band_census,
    )

    return minhash_band_census(_docs(spark, sf_dir), hash="portable")


def _q_decile_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by spend decile (operators/analytics.py:
    decile_revenue_share) - the Lorenz readout over the distributed
    ntile."""
    return analytics.decile_revenue_share(
        read_parquet_table(spark, sf_dir, "orders")
    )


def _q_item_revisit_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item re-engagement cadence (operators/analytics.py:
    item_revisit_time): consecutive (visitor, item) gaps rolled up per
    item."""
    return analytics.item_revisit_time(events_from_fixture(spark, sf_dir))


def _q_session_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log2 histogram of intra-visitor inter-event gaps (operators/
    analytics.py:session_gap_histogram) - the empirical basis for the
    1800 s session threshold."""
    return analytics.session_gap_histogram(events_from_fixture(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_utc(fn) for name, fn in _QUERIES.items()}


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # --- registration order here is ROUGH grouping only; the driver-
        # sampling order is imposed by _SAMPLING_PRIORITY below (rule:
        # ever-FAILED > never-sampled > changed-this-round > rest).
        "binned_quantiles": _q_binned_quantiles,
        "rec_coverage": _q_rec_coverage,
        "item_communities": _q_item_communities,
        "split_balance": _q_split_balance,
        "cross_source_duplication": _q_cross_source_duplication,
        "quality_dup_calibration": _q_quality_dup_calibration,
        "gini_concentration": _q_gini_concentration,
        "burstiness": _q_burstiness,
        "novelty_rate": _q_novelty_rate,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "audience_overlap": _q_audience_overlap,
        "zipf_slope": _q_zipf_slope,
        "transition_entropy": _q_transition_entropy,
        "norm_profile": _q_norm_profile,
        "cluster_inertia": _q_cluster_inertia,
        "tpch_q20_potential_promotion": _q_potential_promotion,
        "mask_duplicate_spans": _q_mask_duplicate_spans,
        "collocations": _q_collocations,
        "type_token_ratio": _q_type_token_ratio,
        "select_token_budget": _q_select_token_budget,
        "shuffle_shards": _q_shuffle_shards,
        "rare_bigram_rate": _q_rare_bigram_rate,
        "pack_efficiency": _q_pack_efficiency,
        "dedup_agreement": _q_dedup_agreement,
        "nearest_centroid": _q_nearest_centroid,
        "incremental_dedup": _q_incremental_dedup,
        "item_trend": _q_item_trend,
        "discount_elasticity": _q_discount_elasticity,
        "trending_items": _q_trending_items,
        "conversion_latency": _q_conversion_latency,
        "events_per_minute_dense": _q_events_per_minute_dense,
        "item_lift": _q_item_lift,
        "events_column_profile": _q_column_profile,
        "linear_attribution": _q_linear_attribution,
        "hourly_seasonality": _q_hourly_seasonality,
        "timed_funnel": _q_timed_funnel,
        "concurrent_sessions": _q_concurrent_sessions,
        "bot_flags": _q_bot_flags,
        "vocab_coverage": _q_vocab_coverage,
        "minute_anomalies": _q_minute_anomalies,
        "tpch_q21_waiting_suppliers": _q_waiting_suppliers,
        "tpch_q2_cheapest_supplier": _q_cheapest_supplier,
        "tpch_q11_important_parts": _q_important_parts,
        "tpch_q16_part_supplier_counts": _q_part_supplier_counts,
        "tpch_q6_forecast_revenue": _q_forecast_revenue,
        "tpch_q7_volume_shipping": _q_volume_shipping,
        "tpch_q8_market_share": _q_market_share,
        "tpch_q9_product_profit": _q_product_profit,
        "tpch_q10_returned_items": _q_returned_item_revenue,
        "tpch_q13_order_distribution": _q_customer_order_distribution,
        "tpch_q15_top_supplier": _q_top_supplier,
        "tpch_q17_small_qty_revenue": _q_small_qty_revenue,
        "tpch_q18_large_volume_customers": _q_large_volume_customers,
        "tpch_q19_disjunctive_revenue": _q_disjunctive_revenue,
        "tpch_q22_sales_opportunity": _q_global_sales_opportunity,
        "token_frequencies": _q_token_frequencies,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "event_type_pivot": _q_event_type_pivot,
        "customer_value_deciles": _q_customer_value_deciles,
        "duplicate_spans": _q_duplicate_spans,
        "item_transitions": _q_item_transitions,
        "item_pagerank": _q_item_pagerank,
        "item_degree_profile": _q_item_degree_profile,
        "similar_visitors": _q_similar_visitors,
        "sequential_funnel": _q_sequential_funnel,
        "item_cooccurrence": _q_item_cooccurrence,
        "order_gap_stats": _q_order_gap_stats,
        "retention_cohorts": _q_retention_cohorts,
        "item_dwell_time": _q_item_dwell_time,
        "rfm_segments": _q_rfm_segments,
        "next_item_recs": _q_next_item_recs,
        "session_entry_exit": _q_session_entry_exit,
        "top_paths": _q_top_paths,
        # --- never driver-sampled before round 6
        "tpch_q4_late_shipments": _q_late_shipment_priorities,
        "tpch_q12_priority_classes": _q_returnflag_priority_classes,
        "tpch_q14_promo_revenue": _q_promo_revenue_ratio,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "similar_docs_topk": _q_similar_docs,
        "label_centroids": _q_label_centroids,
        "repetition_score": _q_repetition_score,
        "dedup_apply": _q_dedup_apply,
        "packed_corpus": _q_packed_corpus,
        # changed this round (grouping_id added) - re-verify
        "events_cube": _q_events_cube,
        # last driver-sampled in rounds 1-4
        "customer_order_ranks": _q_customer_order_ranks,
        "orders_without_lineitems": _q_orders_without_lineitems,
        "text_stats": _q_text_stats,
        "token_count_bpe": _q_token_count_bpe,
        "lang_id": _q_lang_id,
        "doc_fingerprint": _q_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "dedup_keep_first": _q_dedup_keep_first,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding_cosine": _q_dedup_embedding_cosine,
        "dedup_clusters": _q_dedup_clusters,
        "similarity_topk": _q_sim_topk,
        "similarity_lsh_topk": _q_sim_lsh_topk,
        "similarity_ivf_topk": _q_sim_ivf_topk,
        "similarity_knn_join": _q_knn_join,
        "similarity_knn_join_fine": _q_knn_join_fine,
        "corpus_stats": _q_corpus_stats,
        "corpus_sample": _q_corpus_sample,
        "redact_pii": _q_redact_pii,
        "pack_sequences": _q_pack_sequences,
        "curate_corpus": _q_curate_corpus,
        "multimodal_decode": _q_multimodal_decode,
        "multimodal_frames": _q_multimodal_frames,
        "multimodal_features": _q_multimodal_features,
        # driver-verified green in round 5
        "sessions": _q_sessions,
        "session_length_quantiles": _q_session_length_quantiles,
        "latest_event_state": _q_latest_event_state,
        "value_quantiles_by_event": _q_value_quantiles_by_event,
        "value_histogram": _q_value_histogram,
        "rolling_active_users": _q_rolling_active_users,
        "user_paths": _q_user_paths,
        "funnel_analysis": _q_funnel,
        "events_profile": _q_events_profile,
        "events_per_minute": _q_events_per_minute,
        "events_per_minute_ma": _q_events_per_minute_ma,
        "value_per_minute": _q_value_per_minute,
        "ngram_counts": _q_ngram_counts,
        "active_users": _q_active_users,
        "event_type_distribution": _q_event_type_distribution,
        "bounce_rate": _q_bounce_rate,
        "top_items": _q_top_items,
        "top_k_items_per_minute": _q_top_k_items,
        "item_interactions": _q_item_interactions,
        "most_viewed_items": _q_most_viewed_items,
        "session_window_sessions": _q_session_window_sessions,
        "windowed_top_items": _q_windowed_top_items,
        "windowed_bounce_rate": _q_windowed_bounce_rate,
        "windowed_funnel": _q_windowed_funnel,
        "decontaminate": _q_decontaminate,
        "decontaminate_apply": _q_decontaminate_apply,
        "corpus_profile": _q_corpus_profile,
        "asof_last_purchase": _q_asof_last_purchase,
        "chunk_documents": _q_chunk_documents,
        "events_with_session": _q_events_with_session,
        "sessions_in_campaigns": _q_sessions_in_campaigns,
        "view_purchase_attribution": _q_view_purchase_attribution,
        "view_purchase_attribution_outer": _q_view_purchase_attribution_outer,
        "conversion_rate_by_item": _q_conversion_rate_by_item,
        "windowed_conversion_rate": _q_windowed_conversion_rate,
        "normalize_embeddings": _q_normalize_embeddings,
        "temperature_sample": _q_temperature_sample,
        "stratified_fixed_k": _q_stratified_fixed_k,
        "dup_histogram": _q_dup_histogram,
        "split_corpus": _q_split_corpus,
        "item_skew_profile": _q_item_skew_profile,
        "quantize_embeddings": _q_quantize_embeddings,
        "active_users_approx": _q_active_users_approx,
        "cleanse_events": _q_cleanse,
        "tpch_q1_pricing_summary": _q_pricing_summary,
        "pricing_rollup": _q_pricing_rollup,
        "tpch_q5_revenue_by_nation": _q_revenue_by_nation,
        "tpch_q3_top_orders": _q_top_orders,
        "supplier_part_volume": _q_supplier_part_volume,
        # --- round-7 additions (never sampled yet; prioritized below)
        "token_length_distribution": _q_token_length_distribution,
        "char_entropy": _q_char_entropy,
        "readability_scores": _q_readability_scores,
        "ann_recall_lsh": _q_ann_recall_lsh,
        "ann_recall_ivf": _q_ann_recall_ivf,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "bpe_merge_step": _q_bpe_merge_step,
        "gopher_quality_flags": _q_gopher_quality_flags,
        "vocab_growth": _q_vocab_growth,
        "tokenizer_fertility": _q_tokenizer_fertility,
        "domain_balance_weights": _q_domain_balance_weights,
        "embedding_outliers": _q_embedding_outliers,
        "scd2_event_history": _q_scd2_event_history,
        "first_touch_funnel": _q_first_touch_funnel,
        "decay_attribution": _q_decay_attribution,
        "first_touch_attribution": _q_first_touch_attribution,
        "snapshot_diff": _q_snapshot_diff,
        "distinctive_terms": _q_distinctive_terms,
        "graph_triangles": _q_graph_triangles,
        "neardup_histogram": _q_neardup_histogram,
        "langid_confusion": _q_langid_confusion,
        # round 8
        "position_attribution": _q_position_attribution,
        "cart_abandonment": _q_cart_abandonment,
        "repeat_purchase_rate": _q_repeat_purchase_rate,
        "skipgram_pmi": _q_skipgram_pmi,
        "token_coverage_topk": _q_token_coverage_topk,
        "pii_rate_by_source": _q_pii_rate_by_source,
        "dedup_token_savings": _q_dedup_token_savings,
        "quantization_error_stats": _q_quantization_error_stats,
        "multimodal_audio": _q_multimodal_audio,
        "multimodal_video": _q_multimodal_video,
        "heavy_hitter_items": _q_heavy_hitter_items,
        "heavy_hitter_tokens": _q_heavy_hitter_tokens,
        "neardup_cluster_sizes": _q_neardup_cluster_sizes,
        "contamination_by_split": _q_contamination_by_split,
        "path_conversion_rates": _q_path_conversion_rates,
        "returning_visitor_rate": _q_returning_visitor_rate,
        "lsh_band_census": _q_lsh_band_census,
        "decile_revenue_share": _q_decile_revenue_share,
        "item_revisit_time": _q_item_revisit_time,
        "session_gap_histogram": _q_session_gap_histogram,
    }


# Driver-sampling order (the driver hash-checks a ~50-query PREFIX each
# round, so position IS the verification schedule). Rule, per VERDICT r6:
# queries whose LATEST driver signal is a FAIL outrank never-sampled ones,
# which outrank queries changed this round, which outrank the green tail.
_SAMPLING_PRIORITY: list[str] = [
    # Rule (VERDICT r6/r8 #7, r10 #4): latest-FAIL first (none — r15 went
    # 50/50 green), then never-sampled (none), then queries whose PLAN or
    # RESULTS changed this round, then oldest-green-first rotation.
    # Post-r15 staleness histogram (last driver-sampled round): r11=5,
    # r12=47, r13=47, r14=50, r15=50 — VERDICT r15 #5: this round drains
    # the r11 remainder so the post-r16 oldest vintage is r12.
    # 0) plan changed in round 16: graph_triangles probes its bounded
    #    local-path cap from the MATERIALIZED edge frame (one edge-pipeline
    #    pass instead of probe + checkpoint recompute). Results are
    #    construction-identical (same edges, same census) but the action
    #    sequence is new — it leads the sample.
    "graph_triangles",
    # 1) r11-vintage remainder (alphabetical) — all 5
    "value_quantiles_by_event",
    "view_purchase_attribution",
    "view_purchase_attribution_outer",
    "windowed_conversion_rate",
    "zipf_slope",
    # 2) r12-vintage (alphabetical; graph_triangles already leads) — the
    #    next-oldest cohort fills the ~50-row sample; the tail rolls to
    #    the next round
    "bpe_merge_step",
    "cart_abandonment",
    "collocations",
    "contamination_by_split",
    "corpus_stats",
    "cross_source_duplication",
    "customer_value_deciles",
    "decile_revenue_share",
    "dedup_token_savings",
    "distinctive_terms",
    "domain_balance_weights",
    "dup_rate_by_source",
    "duplicate_spans",
    "embedding_dim_stats",
    "embedding_outliers",
    "event_type_pivot",
    "events_column_profile",
    "first_touch_funnel",
    "gini_concentration",
    "gopher_quality_flags",
    "item_communities",
    "item_cooccurrence",
    "item_degree_profile",
    "item_dwell_time",
    "item_pagerank",
    "item_transitions",
    "label_centroids",
    "langid_confusion",
    "multimodal_audio",
    "neardup_histogram",
    "next_item_recs",
    "order_gap_stats",
    "packed_corpus",
    "quality_dup_calibration",
    "readability_scores",
    "rec_coverage",
    "repetition_score",
    "session_entry_exit",
    "similar_docs_topk",
    "source_vocab_overlap",
    "tfidf_top_terms",
    "timed_funnel",
    "token_length_distribution",
    "tpch_q12_priority_classes",
    "tpch_q14_promo_revenue",
    "transition_entropy",
]



def _apply_sampling_priority(
    qs: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    missing = [n for n in _SAMPLING_PRIORITY if n not in qs]
    assert not missing, f"_SAMPLING_PRIORITY names unknown queries: {missing}"
    head = set(_SAMPLING_PRIORITY)
    return {n: qs[n] for n in _SAMPLING_PRIORITY} | {
        n: f for n, f in qs.items() if n not in head
    }


_QUERIES = _apply_sampling_priority(_QUERIES)


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

_DEC_REV = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)"
)

_STOPWORDS_SQL = "[" + ", ".join(f"'{w}'" for w in text.STOPWORDS) + "]"
_NORM_TEXT_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS_SQL = "string_split_regex(lower(trim(text)), '\\s+')"


# --- portable-sketch oracle builders ---------------------------------------
# These replay the md5-derived sketch primitives (functions/portable.py) in
# DuckDB SQL, interpolating the SAME Python-generated constants the Spark
# plans use — which is what makes the sketch queries hash-checkable.

def _shingles_cte(src: str = "documents", shingle_n: int = 2) -> str:
    """Shared shingle CTEs: tokens → distinct word n-grams; docs with
    < shingle_n tokens excluded (zero shingles: Jaccard undefined; mirrors
    the Spark eligibility filter in minhash_lsh_pairs). ``shingle_n=1``
    makes the shingle set the distinct token set itself (the visitor
    item-set similarity spelling)."""
    tk = f"tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM {src}), "
    if shingle_n == 1:
        return tk + (
            "sh AS (SELECT doc_id, list_distinct(toks) AS shingles "
            "FROM tk WHERE len(toks) >= 1)"
        )
    assert shingle_n == 2, "oracle spelling exists for n in (1, 2)"
    return tk + (
        "sh AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks)-1), "
        "i -> toks[i] || ' ' || toks[i+1])) AS shingles FROM tk WHERE len(toks) >= 2)"
    )


def _minhash_cte(
    num_hashes: int = 64,
    bands: int = 16,
    src: str = "documents",
    shingle_n: int = 2,
) -> str:
    """CTE chain ending in ``verified(doc_a, doc_b, est_jaccard, jaccard)``."""
    a_co, b_co = portable.minhash_seeds(num_hashes)
    r = num_hashes // bands
    seeds_rows = ", ".join(f"({j}, {a_co[j]}, {b_co[j]})" for j in range(num_hashes))
    p = portable.P31
    return (
        f"{_shingles_cte(src, shingle_n)}, "
        f"seeds(j, a, b) AS (VALUES {seeds_rows}), "
        f"hs AS (SELECT doc_id, {portable.phash60_sql('s')} % {p} AS h "
        "FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)), "
        f"mh AS (SELECT doc_id, j, MIN((a * h + b) % {p}) AS m "
        "FROM hs CROSS JOIN seeds GROUP BY doc_id, j), "
        f"bnd AS (SELECT doc_id, j // {r} AS band_idx, "
        "string_agg(CAST(m AS VARCHAR), '_' ORDER BY j) AS band_key "
        f"FROM mh GROUP BY doc_id, j // {r}), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bnd a "
        "JOIN bnd b ON a.band_idx = b.band_idx AND a.band_key = b.band_key "
        "AND a.doc_id < b.doc_id), "
        "est AS (SELECT c.doc_a, c.doc_b, "
        f"round(SUM(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) / {num_hashes}.0, 6) AS est_jaccard "
        "FROM cand c JOIN mh ma ON ma.doc_id = c.doc_a "
        "JOIN mh mb ON mb.doc_id = c.doc_b AND mb.j = ma.j GROUP BY c.doc_a, c.doc_b), "
        "verified AS (SELECT e.doc_a, e.doc_b, e.est_jaccard, "
        "round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) / "
        "(len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard "
        "FROM est e JOIN sh sa ON sa.doc_id = e.doc_a JOIN sh sb ON sb.doc_id = e.doc_b)"
    )


def _minhash_sql(threshold: float) -> str:
    return (
        f"WITH {_minhash_cte()} SELECT doc_a, doc_b, est_jaccard, jaccard "
        f"FROM verified WHERE jaccard >= {threshold}"
    )


def _visitor_minhash_sql(
    threshold: float, num_hashes: int = 126, bands: int = 42
) -> str:
    """Visitor item-set MinHash replay: visitor-as-document (ascending
    distinct itemids space-joined), unigram shingles — the shingle set IS
    the item set, so ``jaccard`` is exact set Jaccard. 126 hashes × 42
    bands (r=3) mirrors the operator's low-threshold banding default
    (~94% recall at j=0.4 vs ~34% under the document preset's 16×4; r=2
    would be ~99.6% but explodes on the nonzero background Jaccard at
    visitor grain — r=3 is the measured constraint, band count the
    recall lever, see the operator docstring)."""
    vd = (
        "vd AS (SELECT user_id AS doc_id, "
        "array_to_string(list_transform(list_sort(list_distinct(list(itemid))), "
        "x -> CAST(x AS VARCHAR)), ' ') AS text "
        "FROM (SELECT user_id, CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid "
        "FROM events) WHERE itemid IS NOT NULL GROUP BY user_id)"
    )
    return (
        f"WITH {vd}, "
        f"{_minhash_cte(num_hashes=num_hashes, bands=bands, src='vd', shingle_n=1)} "
        "SELECT doc_a AS visitor_a, doc_b AS visitor_b, est_jaccard, jaccard "
        f"FROM verified WHERE jaccard >= {threshold}"
    )


def _clusters_sql(threshold: float = 0.9, wrap: str | None = None) -> str:
    """Portable MinHash pairs → undirected transitive closure (recursive
    CTE) → cluster_id = min reachable id. Declarative mirror of the Spark
    min-label-propagation loop. ``wrap`` replaces the final SELECT with a
    query over the assignment exposed as CTE ``cl(doc_id, cluster_id)``."""
    base = (
        f"WITH RECURSIVE {_minhash_cte()}, "
        f"pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= {threshold}), "
        "edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs "
        "UNION SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS (SELECT s, s FROM edges "
        "UNION SELECT e.s, rr.r FROM edges e JOIN reach rr ON rr.id = e.d)"
    )
    final = "SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id"
    if wrap is None:
        return f"{base} {final}"
    return f"{base}, cl AS ({final}) {wrap}"


def _redact_chain_sql(src: str) -> str:
    """CTE chain s1→s3 over ``src``: progressive email/SSN/phone redaction
    with per-kind counts (mirror of curation.redact_pii)."""
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    ssn = "\\d{3}-\\d{2}-\\d{4}"
    phone = "\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}"
    return (
        f"s1 AS (SELECT doc_id, "
        f"CAST(len(regexp_extract_all(text, '{email}')) AS INT) AS n_email, "
        f"regexp_replace(text, '{email}', '<email>', 'g') AS t1 FROM {src}), "
        "s2 AS (SELECT doc_id, n_email, "
        f"CAST(len(regexp_extract_all(t1, '{ssn}')) AS INT) AS n_ssn, "
        f"regexp_replace(t1, '{ssn}', '<ssn>', 'g') AS t2 FROM s1), "
        "s3 AS (SELECT doc_id, n_email, n_ssn, "
        f"CAST(len(regexp_extract_all(t2, '{phone}')) AS INT) AS n_phone, "
        f"regexp_replace(t2, '{phone}', '<phone>', 'g') AS t3 FROM s2)"
    )


def _curate_corpus_sql(
    min_quality: float = 0.3, threshold: float = 0.9, budget: int = 512
) -> str:
    """The whole curation pipeline, composed from the same CTE builders the
    per-stage oracles use — one declarative replay of the five stages."""
    return (
        "WITH RECURSIVE "
        f"t0 AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents), "
        "q0 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS token_count, "
        "CAST(length(text) AS BIGINT) AS char_count, "
        f"CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS BIGINT) AS stopword_count, "
        "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_count FROM t0), "
        "qual AS (SELECT doc_id, round(0.5 * least(CAST(token_count AS DOUBLE) / 50, 1.0) "
        "+ 0.3 * (1.0 - CAST(stopword_count AS DOUBLE) / token_count) "
        "+ 0.2 * (1.0 - CAST(punct_count AS DOUBLE) / char_count), 6) AS quality_score FROM q0), "
        "kept1 AS (SELECT d.* FROM documents d WHERE d.doc_id IN "
        f"(SELECT doc_id FROM qual WHERE quality_score >= {min_quality})), "
        "kept2 AS (SELECT * FROM kept1 WHERE doc_id IN "
        f"(SELECT MIN(doc_id) FROM kept1 GROUP BY md5({_NORM_TEXT_SQL}))), "
        f"{_minhash_cte(src='kept2')}, "
        f"pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= {threshold}), "
        "edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs "
        "UNION SELECT doc_b, doc_a FROM pairs), "
        "reach(id, r) AS (SELECT s, s FROM edges "
        "UNION SELECT e.s, rr.r FROM edges e JOIN reach rr ON rr.id = e.d), "
        "losers AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING MIN(r) <> id), "
        "kept3 AS (SELECT * FROM kept2 WHERE doc_id NOT IN (SELECT doc_id FROM losers)), "
        f"{_redact_chain_sql('kept3')}, "
        "red AS (SELECT doc_id, t3 AS text FROM s3), "
        "tok AS (SELECT doc_id, "
        f"CAST(len({_TOKS_SQL}) AS BIGINT) AS token_count, text FROM red), "
        "runr AS (SELECT doc_id, token_count, text, "
        "CAST(SUM(token_count) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM tok) "
        "SELECT doc_id, token_count, cum - token_count AS start_offset, "
        f"(cum - token_count) // {budget} AS pack_id, text FROM runr"
    )


def _simhash_sql(max_hamming: int = 8, bits: int = 60) -> str:
    cb = bits // 4
    mask = (1 << cb) - 1
    return (
        "WITH tk AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok FROM documents), "
        f"hs AS (SELECT doc_id, {portable.phash60_sql('tok')} AS h FROM tk), "
        "bitsum AS (SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s "
        f"FROM hs CROSS JOIN range({bits}) AS t(b) GROUP BY doc_id, b), "
        "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash "
        "FROM bitsum GROUP BY doc_id), "
        f"chunk AS (SELECT doc_id, simhash, c, (simhash >> ({cb} * c)) & {mask} AS ck "
        "FROM sig CROSS JOIN range(4) AS t(c)), "
        "pr AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "bit_count(xor(a.simhash, b.simhash)) AS hamming "
        "FROM chunk a JOIN chunk b ON a.c = b.c AND a.ck = b.ck AND a.doc_id < b.doc_id) "
        f"SELECT * FROM pr WHERE hamming <= {max_hamming}"
    )


def _vec_lit(row: tuple[float, ...]) -> str:
    return "CAST([" + ", ".join(repr(c) for c in row) + "] AS DOUBLE[])"


def _cos_sql(x: str, y: str) -> str:
    return (
        f"list_dot_product({x}, {y}) / "
        f"(sqrt(list_dot_product({x}, {x})) * sqrt(list_dot_product({y}, {y})))"
    )


def _band_key_sql(comps, band: int, ppb: int) -> str:
    terms = [
        f"(CASE WHEN list_dot_product(v, {_vec_lit(comps[band * ppb + j])}) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(ppb)
    ]
    return " + ".join(terms)


def _embedding_pairs_sql(
    threshold: float, num_planes: int = 8, bands: int = 2, dim: int = 64
) -> str:
    comps = portable.hyperplane_components(num_planes, dim)
    ppb = num_planes // bands
    key_selects = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, {_band_key_sql(comps, b, ppb)} AS band_key FROM e"
        for b in range(bands)
    )
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        f"banded AS ({key_selects}), "
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b FROM banded a "
        "JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key "
        "AND a.vec_id < b.vec_id), "
        "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e), "
        "scored AS (SELECT c.id_a, c.id_b, "
        "round(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) AS score "
        "FROM cand c JOIN n na ON na.vec_id = c.id_a JOIN n nb ON nb.vec_id = c.id_b) "
        f"SELECT * FROM scored WHERE score >= {threshold}"
    )


def _knn_join_sql(
    k: int = 3, num_planes: int = 8, bands: int = 2, dim: int = 64
) -> str:
    comps = portable.hyperplane_components(num_planes, dim)
    ppb = num_planes // bands
    key_selects = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, {_band_key_sql(comps, b, ppb)} AS band_key FROM e"
        for b in range(bands)
    )
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        f"banded AS ({key_selects}), "
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b FROM banded a "
        "JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key "
        "AND a.vec_id <> b.vec_id), "
        "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e), "
        "scored AS (SELECT c.id_a, c.id_b, "
        "round(list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm), 6) AS score "
        "FROM cand c JOIN n na ON na.vec_id = c.id_a JOIN n nb ON nb.vec_id = c.id_b), "
        "ranked AS (SELECT *, row_number() OVER (PARTITION BY id_a ORDER BY score DESC, id_b ASC) AS rnk FROM scored) "
        f"SELECT id_a AS vec_id, id_b AS neighbor_id, score, CAST(rnk AS INT) AS rank "
        f"FROM ranked WHERE rnk <= {k}"
    )


def _lsh_topk_sql(k: int = 10, num_planes: int = 4, dim: int = 64) -> str:
    comps = portable.hyperplane_components(num_planes, dim)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_vec_lit(comps[p])}) >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(num_planes)
    )
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        f"keyed AS (SELECT vec_id, v, {bucket} AS bucket FROM e), "
        "q AS (SELECT v AS qv, bucket AS qb FROM keyed WHERE vec_id = 0) "
        f"SELECT vec_id, round({_cos_sql('v', 'qv')}, 6) AS score "
        "FROM keyed CROSS JOIN q WHERE bucket = qb "
        f"ORDER BY score DESC, vec_id ASC LIMIT {k}"
    )


def _ivf_topk_sql(k: int = 10, num_centroids: int = 8, nprobe: int = 2) -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
        "cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv "
        f"FROM e ORDER BY vec_id LIMIT {num_centroids}), "
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0), "
        f"scored AS (SELECT e.vec_id, e.v, c.cell, {_cos_sql('e.v', 'c.cv')} AS sim "
        "FROM e CROSS JOIN cent c), "
        "asg AS (SELECT vec_id, v, cell FROM (SELECT *, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY sim DESC, cell ASC) AS rn FROM scored) WHERE rn = 1), "
        f"probe AS (SELECT cell FROM cent CROSS JOIN q ORDER BY {_cos_sql('cv', 'qv')} DESC, cell ASC LIMIT {nprobe}) "
        f"SELECT vec_id, round({_cos_sql('v', 'qv')}, 6) AS score "
        "FROM asg JOIN probe USING (cell) CROSS JOIN q "
        f"ORDER BY score DESC, vec_id ASC LIMIT {k}"
    )


def _ann_recall_sql(approx_sql: str, k: int = 10) -> str:
    """Recall@k of an approximate top-k statement vs exact brute force:
    both run as CTE subqueries (DuckDB allows a WITH inside a derived
    table), intersect on vec_id, one summary row. Mirrors
    similarity.ann_recall_eval including the empty-exact zero-row case."""
    brute = (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) "
        f"SELECT vec_id FROM (SELECT vec_id, {_cos_sql('CAST(embedding AS DOUBLE[])', 'qv')} AS score "
        f"FROM embeddings, q ORDER BY score DESC, vec_id ASC LIMIT {k})"
    )
    return (
        f"WITH exact AS (SELECT vec_id FROM ({brute})), "
        f"approx AS (SELECT vec_id FROM ({approx_sql})), "
        "he AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM exact), "
        "ha AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_approx FROM approx), "
        "hh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits "
        "FROM exact JOIN approx USING (vec_id)) "
        f"SELECT CAST({k} AS BIGINT) AS k, n_exact, n_approx, n_hits, "
        "round(CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) AS recall_at_k "
        "FROM he CROSS JOIN ha CROSS JOIN hh WHERE n_exact > 0"
    )


def _kmv_sql(k: int = 32, grain: str = "hour") -> str:
    return (
        f"WITH {_EV}, "
        f"h AS (SELECT DISTINCT date_trunc('{grain}', event_time) AS bucket, "
        f"{portable.phash60_sql('CAST(visitorid AS VARCHAR)')} AS hh FROM ev), "
        "r AS (SELECT bucket, hh, row_number() OVER (PARTITION BY bucket ORDER BY hh) AS rn FROM h), "
        f"a AS (SELECT bucket, COUNT(*) AS n, MAX(CASE WHEN rn = {k} THEN hh END) AS hk "
        "FROM r GROUP BY bucket) "
        f"SELECT bucket, round(CASE WHEN n < {k} THEN CAST(n AS DOUBLE) "
        f"ELSE {float(k - 1)!r} * {float(portable.PHASH60_MAX)!r} / CAST(hk AS DOUBLE) END, 6) AS active_users_est "
        "FROM a"
    )


def _langid_confusion_sql() -> str:
    langs = sorted(text.LANG_MARKERS)
    score_exprs = ", ".join(
        "CAST(len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang])
        + f"], x))) AS BIGINT) AS s_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    cases = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs)
    return (
        f"WITH t AS (SELECT lang, {_TOKS_SQL} AS toks FROM documents), "
        f"s AS (SELECT lang, {score_exprs} FROM t), "
        f"b AS (SELECT *, {best} AS best FROM s), "
        f"p AS (SELECT lang, CASE WHEN best = 0 THEN 'unknown' {cases} "
        "ELSE 'unknown' END AS predicted_lang FROM b), "
        "g AS (SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs "
        "FROM p GROUP BY 1, 2) "
        "SELECT lang, predicted_lang, n_docs, "
        "round(n_docs / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6) "
        "AS recall FROM g ORDER BY lang ASC, predicted_lang ASC"
    )


def _lang_id_sql() -> str:
    langs = sorted(text.LANG_MARKERS)
    score_exprs = ", ".join(
        "CAST(len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang])
        + f"], x))) AS BIGINT) AS s_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    cases = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in langs)
    return (
        f"WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
        f"s AS (SELECT doc_id, {score_exprs} FROM t), "
        f"b AS (SELECT *, {best} AS best FROM s) "
        f"SELECT doc_id, CASE WHEN best = 0 THEN 'unknown' {cases} "
        "ELSE 'unknown' END AS predicted_lang FROM b"
    )


def _pagerank_oracle_sql(iterations: int = 10, d: float = 0.85) -> str:
    """The PageRank oracle: the SAME 10 iterations the Spark operator runs,
    unrolled as chained CTEs (recursive CTEs can't re-aggregate per step
    portably). Per-iteration round(_, 10) on both engines is what makes an
    iterative float algorithm value-hash-checkable.

    Every multiply-referenced CTE is AS MATERIALIZED: DuckDB inlines CTEs
    by default, and each rank step references its predecessor three times
    (dangling + contribution + carry), so inlining re-evaluates r0 3^10
    times — the un-materialized form effectively hangs."""
    sql = (
        "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
        "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
        "p AS (SELECT visitorid, itemid AS src, LEAD(itemid) OVER "
        "(PARTITION BY visitorid ORDER BY event_time, event_id) AS dst "
        "FROM ev WHERE itemid IS NOT NULL), "
        "e AS MATERIALIZED (SELECT src AS s, dst AS dd, CAST(COUNT(*) AS DOUBLE) AS w "
        "FROM p WHERE dst IS NOT NULL GROUP BY 1, 2), "
        "outd AS (SELECT s, SUM(w) AS o FROM e GROUP BY 1), "
        "norm AS MATERIALIZED (SELECT e.s, e.dd, e.w / outd.o AS pr FROM e JOIN outd ON e.s = outd.s), "
        "nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT s AS node FROM e "
        "UNION SELECT dd FROM e) u), "
        "cnt AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes), "
        "srcs AS MATERIALIZED (SELECT DISTINCT s AS node FROM norm), "
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM cnt) AS rank FROM nodes)"
    )
    for t in range(iterations):
        prev, cur = f"r{t}", f"r{t + 1}"
        sql += (
            f", dang{t} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0) AS m FROM {prev} "
            f"WHERE node NOT IN (SELECT node FROM srcs))"
            f", c{t} AS MATERIALIZED (SELECT norm.dd AS node, SUM({prev}.rank * norm.pr) AS c "
            f"FROM norm JOIN {prev} ON norm.s = {prev}.node GROUP BY 1)"
            f", {cur} AS MATERIALIZED (SELECT nodes.node, round((1 - {d}) / cnt.n + {d} * "
            f"(COALESCE(c{t}.c, 0) + dang{t}.m / cnt.n), 10) AS rank "
            f"FROM nodes CROSS JOIN cnt CROSS JOIN dang{t} "
            f"LEFT JOIN c{t} ON nodes.node = c{t}.node)"
        )
    return sql + f" SELECT node, rank FROM r{iterations}"


def oracle_sql() -> dict[str, str]:
    return {
        "binned_quantiles": (
            "WITH b AS (SELECT CAST(floor(value / CAST(0.5 AS DOUBLE)) AS BIGINT) AS bin, COUNT(*) AS c "
            "FROM events WHERE value IS NOT NULL AND NOT isnan(value) GROUP BY 1), "
            "cw AS (SELECT bin, c, SUM(c) OVER (ORDER BY bin ASC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM b), "
            "t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_values FROM b) "
            "SELECT n_values, "
            "round(MIN(CASE WHEN cum >= ceil(CAST(0.5 AS DOUBLE) * n_values) THEN bin END) "
            "* CAST(0.5 AS DOUBLE), 6) AS q50_lo, "
            "round(MIN(CASE WHEN cum >= ceil(CAST(0.9 AS DOUBLE) * n_values) THEN bin END) "
            "* CAST(0.5 AS DOUBLE), 6) AS q90_lo, "
            "round(MIN(CASE WHEN cum >= ceil(CAST(0.99 AS DOUBLE) * n_values) THEN bin END) "
            "* CAST(0.5 AS DOUBLE), 6) AS q99_lo "
            "FROM cw CROSS JOIN t GROUP BY n_values"
        ),
        "rec_coverage": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "p AS (SELECT visitorid, itemid AS src, LEAD(itemid) OVER "
            "(PARTITION BY visitorid ORDER BY event_time, event_id) AS dst "
            "FROM ev WHERE itemid IS NOT NULL), "
            "t AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_transitions "
            "FROM p WHERE dst IS NOT NULL GROUP BY 1, 2), "
            "r AS (SELECT src, dst, row_number() OVER (PARTITION BY src "
            "ORDER BY n_transitions DESC, dst ASC) AS rk FROM t), "
            "s AS (SELECT CAST(SUM(n_transitions) AS BIGINT) AS n_transitions, "
            "CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM r WHERE r.src = t.src "
            "AND r.dst = t.dst AND r.rk <= 3) THEN n_transitions ELSE 0 END) AS BIGINT) AS n_covered "
            "FROM t) "
            "SELECT n_transitions, COALESCE(n_covered, 0) AS n_covered, "
            "round(COALESCE(n_covered, 0) / CAST(n_transitions AS DOUBLE), 6) AS coverage "
            "FROM s WHERE n_transitions IS NOT NULL"
        ),
        "item_communities": (
            "WITH RECURSIVE ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "p AS (SELECT visitorid, itemid AS src, LEAD(itemid) OVER "
            "(PARTITION BY visitorid ORDER BY event_time, event_id) AS dst "
            "FROM ev WHERE itemid IS NOT NULL), "
            "t AS (SELECT src, dst, COUNT(*) AS c FROM p WHERE dst IS NOT NULL GROUP BY 1, 2), "
            "pr AS (SELECT src, dst FROM t WHERE c >= 2 AND src <> dst), "
            "edges AS (SELECT src AS s, dst AS d FROM pr UNION SELECT dst, src FROM pr), "
            "reach(id, r) AS (SELECT s, s FROM edges "
            "UNION SELECT e.s, rr.r FROM edges e JOIN reach rr ON rr.id = e.d) "
            "SELECT id AS itemid, MIN(r) AS community_id FROM reach GROUP BY id"
        ),
        "split_balance": (
            "WITH h AS (SELECT doc_id, source, "
            f"{portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} "
            "% 1000000 AS hv FROM documents), "
            "sp AS (SELECT source, CASE WHEN hv < 900000 THEN 'train' "
            "WHEN hv < 950000 THEN 'val' ELSE 'test' END AS split FROM h), "
            "cell AS (SELECT split, source, COUNT(*) AS n FROM sp GROUP BY 1, 2), "
            "r AS (SELECT split, SUM(n) AS rt FROM cell GROUP BY split), "
            "c AS (SELECT source, SUM(n) AS ct FROM cell GROUP BY source), "
            "t AS (SELECT SUM(n) AS tt FROM cell) "
            "SELECT cell.split, cell.source, CAST(cell.n AS BIGINT) AS n, "
            "round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS expected, "
            "round((CAST(cell.n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE)) "
            "* (CAST(cell.n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE)) "
            "/ (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE)), 6) AS chi2_contribution "
            "FROM cell JOIN r USING (split) JOIN c USING (source) CROSS JOIN t"
        ),
        "cross_source_duplication": (
            f"WITH tk AS (SELECT source, {_TOKS_SQL} AS toks FROM documents), "
            "fp AS (SELECT source, md5(array_to_string(list_slice(toks, i, i+7), ' ')) AS f "
            "FROM tk, LATERAL UNNEST(generate_series(1, len(toks)-7)) AS t(i) "
            "WHERE len(toks) >= 8), "
            "ut AS (SELECT DISTINCT f, source FROM fp), "
            "per AS (SELECT source, COUNT(*) AS n FROM ut GROUP BY source), "
            "b AS (SELECT a.source AS source_a, c.source AS source_b, "
            "CAST(COUNT(*) AS BIGINT) AS fingerprints_shared FROM ut a "
            "JOIN ut c ON a.f = c.f AND a.source < c.source GROUP BY 1, 2) "
            "SELECT source_a, source_b, CAST(pa.n AS BIGINT) AS fingerprints_a, "
            "CAST(pb.n AS BIGINT) AS fingerprints_b, fingerprints_shared, "
            "round(fingerprints_shared / CAST(pa.n + pb.n - fingerprints_shared AS DOUBLE), 6) AS jaccard "
            "FROM b JOIN per pa ON pa.source = b.source_a "
            "JOIN per pb ON pb.source = b.source_b"
        ),
        "quality_dup_calibration": (
            f"WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents), "
            "s AS (SELECT doc_id, text, CAST(len(toks) AS BIGINT) AS token_count, "
            "CAST(length(text) AS BIGINT) AS char_count, "
            f"CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS BIGINT) AS stopword_count, "
            "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_count FROM t), "
            "q AS (SELECT doc_id, round(0.5 * least(CAST(token_count AS DOUBLE) / 50, 1.0) "
            "+ 0.3 * (1.0 - CAST(stopword_count AS DOUBLE) / token_count) "
            "+ 0.2 * (1.0 - CAST(punct_count AS DOUBLE) / char_count), 6) AS quality_score, "
            f"md5({_NORM_TEXT_SQL}) AS fp FROM s), "
            "m AS (SELECT least(CAST(floor(quality_score * 10) AS BIGINT), 9) AS bin, "
            "CASE WHEN COUNT(*) OVER (PARTITION BY fp) > 1 THEN 1 ELSE 0 END AS dup FROM q "
            "WHERE quality_score IS NOT NULL) "
            "SELECT bin, round(CAST(bin AS DOUBLE) / 10.0, 6) AS bin_start, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dup) AS BIGINT) AS n_dup_docs, "
            "round(SUM(dup) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate "
            "FROM m GROUP BY bin"
        ),
        "gini_concentration": (
            "WITH ev AS (SELECT CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "c AS (SELECT itemid, COUNT(*) AS cnt FROM ev WHERE itemid IS NOT NULL GROUP BY itemid), "
            "r AS (SELECT cnt, row_number() OVER (ORDER BY cnt ASC, itemid ASC) AS i FROM c), "
            "s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items, CAST(SUM(cnt) AS BIGINT) AS total_events, "
            "SUM(CAST(i AS HUGEINT) * cnt) AS t FROM r) "
            "SELECT n_items, total_events, "
            "round(2.0 * CAST(t AS DOUBLE) / (CAST(n_items AS DOUBLE) * CAST(total_events AS DOUBLE)) "
            "- (CAST(n_items AS DOUBLE) + 1.0) / CAST(n_items AS DOUBLE), 6) + 0.0 AS gini "
            "FROM s"
        ),
        "burstiness": (
            "WITH ev AS (SELECT ts AS event_time, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "pm AS (SELECT itemid, date_trunc('minute', event_time) AS m, COUNT(*) AS c "
            "FROM ev WHERE itemid IS NOT NULL GROUP BY 1, 2), "
            "g AS (SELECT itemid, CAST(COUNT(*) AS BIGINT) AS n_minutes, "
            "CAST(SUM(c) AS BIGINT) AS n_events, CAST(SUM(c * c) AS BIGINT) AS ssq FROM pm GROUP BY itemid) "
            "SELECT itemid, n_minutes, n_events, "
            "round(((CAST(ssq AS DOUBLE) - CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE) "
            "/ CAST(n_minutes AS DOUBLE)) / CAST(n_minutes AS DOUBLE)) "
            "/ (CAST(n_events AS DOUBLE) / CAST(n_minutes AS DOUBLE)), 6) + 0.0 AS dispersion "
            "FROM g ORDER BY n_events DESC, itemid ASC LIMIT 100"
        ),
        "novelty_rate": (
            "WITH ev AS (SELECT CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid, "
            "date_trunc('day', ts) AS d FROM events), "
            "e2 AS (SELECT itemid, d FROM ev WHERE itemid IS NOT NULL), "
            "f AS (SELECT itemid, MIN(d) AS fd FROM e2 GROUP BY itemid), "
            "daily AS (SELECT DISTINCT itemid, d FROM e2) "
            "SELECT CAST(d AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(CASE WHEN d = fd THEN 1 ELSE 0 END) AS BIGINT) AS n_new_items, "
            "round(SUM(CASE WHEN d = fd THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS novelty "
            "FROM daily JOIN f USING (itemid) GROUP BY d"
        ),
        "source_vocab_overlap": (
            f"WITH tk AS (SELECT source, {_TOKS_SQL} AS toks FROM documents), "
            "ut AS (SELECT DISTINCT source, t FROM tk, LATERAL UNNEST(toks) AS u(t) WHERE t <> ''), "
            "per AS (SELECT source, COUNT(*) AS n FROM ut GROUP BY source), "
            "b AS (SELECT a.source AS source_a, c.source AS source_b, "
            "CAST(COUNT(*) AS BIGINT) AS vocab_shared FROM ut a "
            "JOIN ut c ON a.t = c.t AND a.source < c.source GROUP BY 1, 2) "
            "SELECT source_a, source_b, CAST(pa.n AS BIGINT) AS vocab_a, "
            "CAST(pb.n AS BIGINT) AS vocab_b, vocab_shared, "
            "round(vocab_shared / CAST(pa.n + pb.n - vocab_shared AS DOUBLE), 6) AS jaccard "
            "FROM b JOIN per pa ON pa.source = b.source_a "
            "JOIN per pb ON pb.source = b.source_b"
        ),
        "audience_overlap": (
            "WITH ue AS (SELECT DISTINCT user_id AS visitorid, event_type AS event FROM events), "
            "per AS (SELECT event, COUNT(*) AS n FROM ue GROUP BY event), "
            "b AS (SELECT a.event AS event_a, c.event AS event_b, "
            "CAST(COUNT(*) AS BIGINT) AS users_both FROM ue a "
            "JOIN ue c ON a.visitorid = c.visitorid AND a.event < c.event GROUP BY 1, 2) "
            "SELECT event_a, event_b, CAST(pa.n AS BIGINT) AS users_a, "
            "CAST(pb.n AS BIGINT) AS users_b, users_both, "
            "round(users_both / CAST(pa.n + pb.n - users_both AS DOUBLE), 6) AS jaccard "
            "FROM b JOIN per pa ON pa.event = b.event_a "
            "JOIN per pb ON pb.event = b.event_b"
        ),
        "zipf_slope": (
            "WITH ev AS (SELECT CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "c AS (SELECT itemid, COUNT(*) AS cnt FROM ev WHERE itemid IS NOT NULL GROUP BY itemid), "
            "r AS (SELECT ln(CAST(cnt AS DOUBLE)) AS y, "
            "ln(CAST(rank() OVER (ORDER BY cnt DESC) AS DOUBLE)) AS x FROM c) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_items, "
            "round(regr_slope(y, x), 6) + 0.0 AS slope, "
            "round(regr_intercept(y, x), 6) + 0.0 AS intercept, "
            "round(regr_r2(y, x), 6) + 0.0 AS r2 FROM r"
        ),
        "transition_entropy": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "p AS (SELECT visitorid, itemid AS src, LEAD(itemid) OVER "
            "(PARTITION BY visitorid ORDER BY event_time, event_id) AS dst "
            "FROM ev WHERE itemid IS NOT NULL), "
            "t AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c FROM p "
            "WHERE dst IS NOT NULL GROUP BY 1, 2), "
            "g AS (SELECT src, CAST(SUM(c) AS BIGINT) AS n_out, "
            "CAST(COUNT(*) AS BIGINT) AS n_dst, "
            "SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS snlogn FROM t GROUP BY src) "
            "SELECT src, n_out, n_dst, "
            "round(ln(CAST(n_out AS DOUBLE)) - snlogn / CAST(n_out AS DOUBLE), 6) + 0.0 AS entropy "
            "FROM g ORDER BY n_out DESC, src ASC LIMIT 100"
        ),
        "norm_profile": (
            "WITH n AS (SELECT label, sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), "
            "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings) "
            "SELECT label, CAST(COUNT(nrm) AS BIGINT) AS n_vectors, "
            "round(MIN(nrm), 6) AS min_norm, round(MAX(nrm), 6) AS max_norm, "
            "round(CAST(AVG(CAST(nrm AS DECIMAL(28,10))) AS DOUBLE), 6) AS avg_norm "
            "FROM n GROUP BY label"
        ),
        "cluster_inertia": (
            "WITH e AS (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x, "
            "unnest(generate_series(0, len(embedding) - 1)) AS idx FROM embeddings), "
            "a AS (SELECT label, idx, COUNT(*) AS n, "
            "CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS s FROM e GROUP BY label, idx), "
            "c AS (SELECT label, idx, CAST(CAST(round(round(s / n, 6) * 1000000) AS BIGINT) "
            "AS DOUBLE) / 1000000.0 AS cc FROM a), "
            "nv AS (SELECT label, CAST(MAX(n) AS BIGINT) AS n_vectors FROM a GROUP BY label), "
            "d AS (SELECT e.label, round(CAST(SUM(CAST((x - cc) * (x - cc) AS DECIMAL(38,12))) "
            "AS DOUBLE), 6) AS inertia FROM e JOIN c ON e.label = c.label AND e.idx = c.idx "
            "GROUP BY e.label) "
            "SELECT d.label, nv.n_vectors, inertia FROM d JOIN nv ON d.label = nv.label"
        ),
        "sessions": (
            f"WITH {_SESSIONIZED} "
            "SELECT session_id, visitorid, MIN(event_time) AS session_start, "
            "MAX(event_time) AS session_end, COUNT(*) AS events_in_session, "
            "date_diff('second', MIN(event_time), MAX(event_time)) AS session_length "
            "FROM sessionized GROUP BY session_id, visitorid"
        ),
        "latest_event_state": (
            "WITH ev AS (SELECT user_id AS visitorid, event_type AS event, ts AS event_time, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid, event_id, value FROM events), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY visitorid, itemid "
            "ORDER BY event_time DESC, event_id DESC) AS rn FROM ev) "
            "SELECT visitorid, itemid, event_time, event_id, event, value "
            "FROM r WHERE rn = 1"
        ),
        "value_quantiles_by_event": (
            "SELECT event_type AS event, COUNT(*) AS n_events, "
            "round(quantile_cont(value, 0.5), 6) AS p50, "
            "round(quantile_cont(value, 0.9), 6) AS p90, "
            "round(quantile_cont(value, 0.99), 6) AS p99, "
            "round(CAST(AVG(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS avg_value "
            "FROM events GROUP BY event_type"
        ),
        "events_cube": (
            "SELECT event_type AS event, CAST(date_trunc('day', ts) AS DATE) AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value, "
            "CAST(GROUPING(event_type, day) AS BIGINT) AS gid "
            "FROM events GROUP BY CUBE (event_type, day)"
        ),
        "value_histogram": (
            "SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "round(CAST(floor(value / 10.0) AS BIGINT) * CAST(10.0 AS DOUBLE), 6) AS bin_start "
            "FROM events WHERE value IS NOT NULL GROUP BY 1"
        ),
        "rolling_active_users": (
            f"WITH {_EV}, "
            "daily AS (SELECT DISTINCT CAST(date_trunc('day', event_time) AS DATE) AS day, visitorid FROM ev), "
            "days AS (SELECT DISTINCT day FROM daily) "
            "SELECT days.day, CAST(COUNT(DISTINCT daily.visitorid) AS BIGINT) AS active_users "
            "FROM daily JOIN days ON days.day >= daily.day "
            "AND days.day <= daily.day + INTERVAL 6 DAY "
            "GROUP BY days.day"
        ),
        "session_length_quantiles": (
            f"WITH {_SESSIONIZED}, m AS ("
            "SELECT session_id, visitorid, COUNT(*) AS events_in_session, "
            "date_diff('second', MIN(event_time), MAX(event_time)) AS session_length "
            "FROM sessionized GROUP BY session_id, visitorid) "
            "SELECT COUNT(*) AS n_sessions, "
            "quantile_cont(session_length, 0.5) AS p50, "
            "quantile_cont(session_length, 0.9) AS p90, "
            "quantile_cont(session_length, 0.99) AS p99, "
            "round(AVG(events_in_session), 6) AS avg_events FROM m"
        ),
        "user_paths": (
            f"WITH {_SESSIONIZED} "
            "SELECT visitorid, session_id, "
            "string_agg(event, '>' ORDER BY event_time, event) AS path_str "
            "FROM sessionized GROUP BY visitorid, session_id"
        ),
        "funnel_analysis": (
            f"WITH {_SESSIONIZED}, flags AS ("
            "SELECT session_id, visitorid, "
            "MAX(CASE WHEN event='view' THEN 1 ELSE 0 END) AS v, "
            "MAX(CASE WHEN event='click' THEN 1 ELSE 0 END) AS c, "
            "MAX(CASE WHEN event='purchase' THEN 1 ELSE 0 END) AS p "
            "FROM sessionized GROUP BY session_id, visitorid) "
            'SELECT CAST(SUM(v) AS BIGINT) AS "view", CAST(SUM(c) AS BIGINT) AS click, '
            "CAST(SUM(p) AS BIGINT) AS purchase FROM flags"
        ),
        "events_profile": (
            f"WITH {_EV} "
            "SELECT COUNT(*) AS n_rows, COUNT(DISTINCT visitorid) AS n_visitors, "
            "COUNT(DISTINCT itemid) AS n_items, COUNT(DISTINCT event) AS n_event_types, "
            "CAST(SUM(CASE WHEN itemid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_itemid, "
            "MIN(event_time) AS first_event, MAX(event_time) AS last_event FROM ev"
        ),
        "events_per_minute": (
            f"WITH {_EV} "
            "SELECT date_trunc('minute', event_time) AS minute, COUNT(*) AS events_count "
            "FROM ev GROUP BY 1"
        ),
        "active_users": (
            f"WITH {_EV} "
            "SELECT date_trunc('minute', event_time) AS minute, "
            "COUNT(DISTINCT visitorid) AS active_users FROM ev GROUP BY 1"
        ),
        "event_type_distribution": (
            f"WITH {_EV} "
            "SELECT date_trunc('minute', event_time) AS minute, event, COUNT(*) AS event_count "
            "FROM ev GROUP BY 1, 2"
        ),
        "events_per_minute_ma": (
            f"WITH {_EV}, per_min AS ("
            "SELECT date_trunc('minute', event_time) AS minute, COUNT(*) AS events_count "
            "FROM ev GROUP BY 1) "
            "SELECT minute, events_count, "
            "round(AVG(events_count) OVER (ORDER BY epoch(minute) RANGE BETWEEN 240 PRECEDING AND CURRENT ROW), 6) AS ma_5m "
            "FROM per_min"
        ),
        "value_per_minute": (
            "SELECT date_trunc('minute', ts) AS minute, "
            "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value, "
            "round(AVG(value), 6) AS avg_value, COUNT(*) AS events_count "
            "FROM events GROUP BY 1"
        ),
        "ngram_counts": (
            f"WITH t AS (SELECT {_TOKS_SQL} AS toks FROM documents), "
            "g AS (SELECT unnest(list_transform(generate_series(1, len(toks)-1), "
            "i -> toks[i] || ' ' || toks[i+1])) AS ngram FROM t) "
            "SELECT ngram, COUNT(*) AS occurrences FROM g GROUP BY ngram "
            "ORDER BY occurrences DESC, ngram ASC LIMIT 100"
        ),
        "pricing_rollup": (
            "SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "bounce_rate": (
            f"WITH {_EV}, per_user AS ("
            "SELECT date_trunc('minute', event_time) AS minute, visitorid, COUNT(*) AS events "
            "FROM ev GROUP BY 1, 2) "
            "SELECT minute, CAST(SUM(CASE WHEN events=1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces, "
            "COUNT(*) AS total_users, "
            "CAST(SUM(CASE WHEN events=1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS bounce_rate "
            "FROM per_user GROUP BY minute"
        ),
        # the streaming windowed_* operators run in batch mode: tumbling
        # minute windows == date_trunc('minute'); the chained hour window in
        # windowed_funnel buckets on session_window.end - 1 µs, and
        # session_window merges on exact-µs gap <= 30 min (NOT the batch
        # operator's floored-second arithmetic)
        "windowed_top_items": (
            f"WITH {_EV} "
            "SELECT date_trunc('minute', event_time) AS minute, itemid, "
            "COUNT(*) AS interactions FROM ev GROUP BY 1, 2"
        ),
        "windowed_bounce_rate": (
            f"WITH {_EV}, per_user AS ("
            "SELECT date_trunc('minute', event_time) AS minute, visitorid, COUNT(*) AS events "
            "FROM ev GROUP BY 1, 2) "
            "SELECT minute, CAST(SUM(CASE WHEN events=1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces, "
            "COUNT(*) AS total_users, "
            "CAST(SUM(CASE WHEN events=1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS bounce_rate "
            "FROM per_user GROUP BY minute"
        ),
        "windowed_funnel": (
            f"WITH {_EV}, "
            "lagged AS (SELECT *, lag(event_time) OVER (PARTITION BY visitorid ORDER BY event_time) AS prev_t FROM ev), "
            "flagged AS (SELECT *, CASE WHEN prev_t IS NULL OR event_time - prev_t > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS is_new FROM lagged), "
            "isl AS (SELECT *, SUM(is_new) OVER (PARTITION BY visitorid ORDER BY event_time ROWS UNBOUNDED PRECEDING) AS sess FROM flagged), "
            "fl AS (SELECT visitorid, sess, MAX(event_time) AS max_t, "
            "MAX(CASE WHEN event='view' THEN 1 ELSE 0 END) AS v, "
            "MAX(CASE WHEN event='click' THEN 1 ELSE 0 END) AS c, "
            "MAX(CASE WHEN event='purchase' THEN 1 ELSE 0 END) AS p "
            "FROM isl GROUP BY visitorid, sess) "
            "SELECT date_trunc('hour', max_t + INTERVAL '30 minutes' - INTERVAL '1 microsecond') AS window_start, "
            'CAST(SUM(v) AS BIGINT) AS "view", CAST(SUM(c) AS BIGINT) AS click, '
            "CAST(SUM(p) AS BIGINT) AS purchase FROM fl GROUP BY 1"
        ),
        "top_items": (
            f"WITH {_EV} "
            "SELECT date_trunc('minute', event_time) AS minute, itemid, COUNT(*) AS interactions "
            "FROM ev GROUP BY 1, 2"
        ),
        "top_k_items_per_minute": (
            f"WITH {_EV}, counts AS ("
            "SELECT date_trunc('minute', event_time) AS minute, itemid, COUNT(*) AS interactions "
            "FROM ev GROUP BY 1, 2), ranked AS ("
            "SELECT *, row_number() OVER (PARTITION BY minute ORDER BY interactions DESC, itemid ASC) AS rank "
            "FROM counts) SELECT minute, itemid, interactions, CAST(rank AS INT) AS rank "
            "FROM ranked WHERE rank <= 3"
        ),
        "item_interactions": (
            f"WITH {_EV} SELECT itemid, COUNT(*) AS interaction_count FROM ev GROUP BY itemid"
        ),
        "most_viewed_items": (
            f"WITH {_EV} SELECT itemid, COUNT(*) AS view_count FROM ev "
            "WHERE event = 'view' GROUP BY itemid"
        ),
        "session_window_sessions": (
            f"WITH {_SESSIONIZED} "
            "SELECT CAST(visitorid AS VARCHAR) || '_' || "
            "CAST(CAST(floor(epoch(MIN(event_time))) AS BIGINT) AS VARCHAR) AS session_id, "
            "visitorid, MIN(event_time) AS session_start, "
            "MAX(event_time) AS session_end, COUNT(*) AS events_in_session, "
            "date_diff('second', MIN(event_time), MAX(event_time)) AS session_length "
            "FROM sessionized GROUP BY sessionized.session_id, visitorid"
        ),
        "active_users_approx": _kmv_sql(k=32, grain="hour"),
        "cleanse_events": (
            "SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_formatted, "
            "epoch_ms(ts) AS unix_ts_ms, "
            "CASE WHEN event_type='view' THEN 'Low Value' ELSE 'High Value' END AS event_category "
            "FROM events"
        ),
        "tpch_q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price, "
            f"{_DEC_REV} AS sum_disc_price, "
            "COUNT(*) AS count_order, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "tpch_q5_revenue_by_nation": (
            "SELECT n_name, "
            f"{_DEC_REV} AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' GROUP BY n_name"
        ),
        "tpch_q3_top_orders": (
            "SELECT o_orderkey, o_orderdate, o_orderpriority, "
            f"{_DEC_REV} AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "GROUP BY o_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue DESC, o_orderkey ASC LIMIT 10"
        ),
        "supplier_part_volume": (
            "SELECT s_name, p_brand, SUM(l_quantity) AS total_qty, COUNT(*) AS line_count "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN part ON l_partkey = p_partkey GROUP BY s_name, p_brand"
        ),
        "customer_order_ranks": (
            "WITH ranked AS (SELECT o_custkey, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS order_rank "
            "FROM orders) "
            "SELECT c_custkey, c_name, o_orderkey, o_totalprice, CAST(order_rank AS INT) AS order_rank "
            "FROM ranked JOIN customer ON o_custkey = c_custkey WHERE order_rank <= 3"
        ),
        "orders_without_lineitems": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)"
        ),
        "tpch_q4_late_shipments": (
            "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o "
            "WHERE EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate) "
            "GROUP BY o_orderpriority"
        ),
        "tpch_q12_priority_classes": (
            "SELECT l_returnflag, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY l_returnflag"
        ),
        "tpch_q14_promo_revenue": (
            "SELECT round(100.0 * "
            "CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
            "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) "
            "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
            "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) "
            "AS promo_revenue_pct "
            "FROM lineitem JOIN part ON l_partkey = p_partkey"
        ),
        "tpch_q6_forecast_revenue": (
            "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
            "CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
        ),
        "tpch_q7_volume_shipping": (
            "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS INT) AS l_year, "
            f"{_DEC_REV} AS revenue "
            "FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND sn.n_name IN ('NATION_1', 'NATION_2') "
            "AND cn.n_name IN ('NATION_1', 'NATION_2') "
            "AND sn.n_name <> cn.n_name "
            "GROUP BY 1, 2, 3"
        ),
        "tpch_q8_market_share": (
            "SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
            "round(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3' THEN "
            "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) "
            "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
            "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS mkt_share "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO' "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "WHERE o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "AND EXISTS (SELECT 1 FROM customer "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "JOIN region ON cn.n_regionkey = r_regionkey "
            "WHERE c_custkey = o_custkey AND r_name = 'ASIA') "
            "GROUP BY 1"
        ),
        "tpch_q9_product_profit": (
            "SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year, "
            f"{_DEC_REV} AS sum_profit "
            "FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey "
            "AND p_name LIKE '%red%') "
            "GROUP BY 1, 2"
        ),
        "tpch_q10_returned_items": (
            "SELECT c_custkey, c_name, c_acctbal, n_name, "
            f"{_DEC_REV} AS revenue "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE l_returnflag = 'R' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-04-01' "
            "GROUP BY 1, 2, 3, 4 "
            "ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
        ),
        "tpch_q13_order_distribution": (
            "WITH per_cust AS (SELECT c_custkey, "
            "CAST(COUNT(o_orderkey) AS BIGINT) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "AND o_orderpriority <> '1-URGENT' "
            "GROUP BY c_custkey) "
            "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist "
            "FROM per_cust GROUP BY c_count"
        ),
        "tpch_q15_top_supplier": (
            "WITH per_supp AS (SELECT l_suppkey, "
            "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
            "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS rev "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue "
            "FROM per_supp JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE rev = (SELECT MAX(rev) FROM per_supp)"
        ),
        "tpch_q17_small_qty_revenue": (
            "WITH bl AS (SELECT l_partkey, l_quantity, l_extendedprice FROM lineitem "
            "WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey "
            "AND p_brand = 'Brand#12')), "
            "pa AS (SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty FROM bl GROUP BY 1) "
            "SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 6) "
            "AS avg_weekly FROM bl JOIN pa ON l_partkey = pk "
            "WHERE l_quantity < 0.5 * avg_qty"
        ),
        "tpch_q18_large_volume_customers": (
            "WITH big AS (SELECT l_orderkey AS bok, SUM(l_quantity) AS total_qty "
            "FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250) "
            "SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty "
            "FROM big JOIN orders ON bok = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"
        ),
        "tpch_q19_disjunctive_revenue": (
            f"SELECT {_DEC_REV} AS revenue "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 1 AND 15) "
            "OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 20 "
            "AND l_quantity BETWEEN 10 AND 25) "
            "OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 30 "
            "AND l_quantity BETWEEN 20 AND 35)"
        ),
        "item_lift": (
            f"WITH {_SESSIONIZED}, "
            "its AS (SELECT sessionized.session_id, "
            "list_slice(list_sort(list_distinct(list(itemid))), 1, 50) AS items "
            "FROM sessionized WHERE itemid IS NOT NULL GROUP BY sessionized.session_id), "
            "total AS (SELECT COUNT(*) AS N FROM its), "
            "sup AS (SELECT itemid, COUNT(*) AS s FROM "
            "(SELECT session_id, unnest(items) AS itemid FROM its) GROUP BY 1), "
            "pairs AS (SELECT items[i] AS item_a, items[j] AS item_b "
            "FROM its, LATERAL UNNEST(generate_series(1, len(items))) t1(i), "
            "LATERAL UNNEST(generate_series(1, len(items))) t2(j) WHERE j > i), "
            "pc AS (SELECT item_a, item_b, COUNT(*) AS n_both FROM pairs "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2) "
            "SELECT item_a, item_b, CAST(n_both AS BIGINT) AS n_both, "
            "round((CAST(n_both AS DOUBLE) * CAST(N AS DOUBLE)) / "
            "(CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)), 6) AS lift "
            "FROM pc JOIN sup sa ON item_a = sa.itemid "
            "JOIN sup sb ON item_b = sb.itemid, total "
            "ORDER BY n_both DESC, item_a ASC, item_b ASC LIMIT 100"
        ),
        "events_per_minute_dense": (
            f"WITH {_EV}, "
            "sparse AS (SELECT date_trunc('minute', event_time) AS minute, "
            "COUNT(*) AS c FROM ev GROUP BY 1), "
            "bounds AS (SELECT date_trunc('minute', MIN(event_time)) AS lo, "
            "date_trunc('minute', MAX(event_time)) AS hi FROM ev), "
            "spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) "
            "AS minute FROM bounds) "
            "SELECT spine.minute, CAST(COALESCE(c, 0) AS BIGINT) AS events_count "
            "FROM spine LEFT JOIN sparse ON spine.minute = sparse.minute"
        ),
        "conversion_latency": (
            "WITH ev2 AS (SELECT user_id AS visitorid, event_type AS event, "
            "ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "carried AS (SELECT *, last_value(CASE WHEN event = 'view' "
            "THEN event_time END IGNORE NULLS) OVER (PARTITION BY visitorid "
            "ORDER BY event_time, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt FROM ev2) "
            "SELECT CASE WHEN lt IS NULL THEN CAST(-1 AS BIGINT) "
            "ELSE CAST(floor(((epoch_us(event_time) - epoch_us(lt)) / 1000000.0) / 60) AS BIGINT) "
            "END AS latency_bin, COUNT(*) AS n_conversions "
            "FROM carried WHERE event = 'purchase' GROUP BY 1"
        ),
        "events_column_profile": (
            "WITH ev3 AS (SELECT user_id AS visitorid, event_type AS event, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid, value "
            "FROM events) "
            "SELECT 'visitorid' AS \"column\", COUNT(*) AS n_rows, "
            "CAST(SUM(CASE WHEN visitorid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            "COUNT(DISTINCT visitorid) AS n_distinct FROM ev3 "
            "UNION ALL SELECT 'event', COUNT(*), "
            "CAST(SUM(CASE WHEN event IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "COUNT(DISTINCT event) FROM ev3 "
            "UNION ALL SELECT 'itemid', COUNT(*), "
            "CAST(SUM(CASE WHEN itemid IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "COUNT(DISTINCT itemid) FROM ev3 "
            "UNION ALL SELECT 'value', COUNT(*), "
            "CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            "COUNT(DISTINCT value) FROM ev3"
        ),
        "trending_items": (
            f"WITH {_EV}, "
            "wl AS (SELECT itemid, event_time, "
            "MAX(event_time) OVER (PARTITION BY itemid) AS last_t "
            "FROM ev WHERE itemid IS NOT NULL) "
            "SELECT itemid, MAX(last_t) AS last_event_time, "
            "round(SUM(exp(-0.00019254052769448875 * "
            "((epoch_us(last_t) - epoch_us(event_time)) / 1000000.0))), 6) "
            "AS decayed_count, COUNT(*) AS raw_events FROM wl GROUP BY itemid"
        ),
        "linear_attribution": (
            "WITH ev2 AS (SELECT user_id AS visitorid, event_type AS event, "
            "ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "conv AS (SELECT visitorid AS cv, event_time AS ct, event_id AS cid "
            "FROM ev2 WHERE event = 'purchase'), "
            "touch AS (SELECT visitorid AS tv, event_time AS tt, itemid "
            "FROM ev2 WHERE event = 'view' AND itemid IS NOT NULL), "
            "pairs AS (SELECT cid, itemid FROM conv JOIN touch ON cv = tv "
            "AND tt < ct AND tt >= ct - INTERVAL 86400 SECOND), "
            "fan AS (SELECT cid AS fcid, COUNT(*) AS n FROM pairs GROUP BY 1) "
            "SELECT itemid, CAST(COUNT(DISTINCT cid) AS BIGINT) AS conversions_touched, "
            "round(CAST(SUM(CAST(round(1.0 / n, 12) AS DECIMAL(18,12))) AS DOUBLE), 6) "
            "AS credit FROM pairs JOIN fan ON cid = fcid GROUP BY itemid"
        ),
        "hourly_seasonality": (
            f"WITH {_EV}, "
            "cells AS (SELECT CAST(isodow(event_time) AS INTEGER) AS dow, "
            "CAST(hour(event_time) AS INTEGER) AS hour, COUNT(*) AS events_count "
            "FROM ev GROUP BY 1, 2) "
            "SELECT dow, hour, events_count, "
            "round(CAST(events_count AS DOUBLE) / "
            "(SELECT CAST(SUM(events_count) AS DOUBLE) FROM cells), 6) AS share "
            "FROM cells"
        ),
        "discount_elasticity": (
            "WITH st AS (SELECT p_type, COUNT(*) AS n_lines, "
            "SUM(CAST(l_discount AS DECIMAL(18,4))) AS sx, "
            "SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sy, "
            "SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS sxy, "
            "SUM(CAST(l_discount AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS sxx, "
            "SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS syy "
            "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1) "
            "SELECT p_type, CAST(n_lines AS BIGINT) AS n_lines, "
            "round(CAST(sx AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS avg_discount, "
            "round(CAST(sy AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) AS avg_quantity, "
            "CASE WHEN CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0 "
            "AND CAST(n_lines AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 "
            "THEN round((CAST(n_lines AS DOUBLE) * CAST(sxy AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
            "sqrt((CAST(n_lines AS DOUBLE) * CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * "
            "(CAST(n_lines AS DOUBLE) * CAST(syy AS DOUBLE) - "
            "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) END AS corr_disc_qty FROM st"
        ),
        "timed_funnel": (
            f"WITH {_EV}, "
            "s1 AS (SELECT visitorid, MIN(event_time) AS t1 FROM ev "
            "WHERE event = 'view' GROUP BY 1), "
            "s2 AS (SELECT e.visitorid, MIN(event_time) AS t2 FROM ev e "
            "JOIN s1 ON e.visitorid = s1.visitorid WHERE event = 'click' "
            "AND event_time > t1 AND event_time <= t1 + INTERVAL 1800 SECOND "
            "GROUP BY 1), "
            "s3 AS (SELECT e.visitorid, MIN(event_time) AS t3 FROM ev e "
            "JOIN s2 ON e.visitorid = s2.visitorid WHERE event = 'purchase' "
            "AND event_time > t2 AND event_time <= t2 + INTERVAL 86400 SECOND "
            "GROUP BY 1) "
            "SELECT (SELECT COUNT(*) FROM s1) AS users_step1, "
            "(SELECT COUNT(*) FROM s2) AS users_step2, "
            "(SELECT COUNT(*) FROM s3) AS users_step3"
        ),
        "concurrent_sessions": (
            f"WITH {_SESSIONIZED}, "
            "s AS (SELECT session_id, MIN(event_time) AS st, MAX(event_time) AS en "
            "FROM sessionized GROUP BY 1), "
            "m AS (SELECT unnest(generate_series(date_trunc('minute', st), "
            "date_trunc('minute', en), INTERVAL 1 MINUTE)) AS minute FROM s) "
            "SELECT minute, COUNT(*) AS active_sessions FROM m GROUP BY 1"
        ),
        "bot_flags": (
            f"WITH {_EV}, "
            "pm AS (SELECT visitorid, date_trunc('minute', event_time) AS m, "
            "COUNT(*) AS c FROM ev GROUP BY 1, 2), "
            "pu AS (SELECT visitorid, SUM(c) AS total_events, "
            "COUNT(*) AS active_minutes, MAX(c) AS peak_per_minute FROM pm GROUP BY 1) "
            "SELECT visitorid, CAST(total_events AS BIGINT) AS total_events, "
            "CAST(active_minutes AS BIGINT) AS active_minutes, "
            "CAST(peak_per_minute AS BIGINT) AS peak_per_minute, "
            "peak_per_minute > 10 AND total_events >= 20 AS is_bot FROM pu"
        ),
        "incremental_dedup": (
            "WITH seen AS (SELECT DISTINCT "
            "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS sfp "
            "FROM documents WHERE doc_id % 3 <> 0), "
            "batch AS (SELECT doc_id, source, "
            "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp "
            "FROM documents WHERE doc_id % 3 = 0), "
            "fresh AS (SELECT * FROM batch WHERE NOT EXISTS "
            "(SELECT 1 FROM seen WHERE sfp = fp)), "
            "keep AS (SELECT MIN(doc_id) AS kid FROM fresh GROUP BY fp) "
            "SELECT doc_id, source FROM fresh WHERE EXISTS "
            "(SELECT 1 FROM keep WHERE kid = doc_id)"
        ),
        "item_trend": (
            f"WITH {_EV}, "
            "daily AS (SELECT itemid, "
            "date_diff('day', DATE '1995-01-01', CAST(date_trunc('day', event_time) AS DATE)) AS x, "
            "COUNT(*) AS y FROM ev WHERE itemid IS NOT NULL GROUP BY 1, 2), "
            "st AS (SELECT itemid, COUNT(*) AS n_days, SUM(y) AS total_events, "
            "SUM(x) AS sx, SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM daily GROUP BY 1) "
            "SELECT itemid, CAST(n_days AS BIGINT) AS n_days, "
            "CAST(total_events AS BIGINT) AS total_events, "
            "CASE WHEN n_days >= 2 AND "
            "CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0 "
            "THEN round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(total_events AS DOUBLE)) / "
            "(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END AS slope FROM st"
        ),
        "vocab_coverage": (
            "WITH tk AS (SELECT doc_id, "
            "unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token "
            "FROM documents), "
            "tk2 AS (SELECT * FROM tk WHERE token <> ''), "
            "vocab AS (SELECT token AS vtok FROM "
            "(SELECT token, COUNT(*) AS cnt FROM tk2 GROUP BY 1) "
            "ORDER BY cnt DESC, token ASC LIMIT 50), "
            "per AS (SELECT doc_id, COUNT(*) AS n_tokens, "
            "CAST(SUM(CASE WHEN vtok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens "
            "FROM tk2 LEFT JOIN vocab ON token = vtok GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(n_tokens, 0) AS n_tokens, "
            "CAST(COALESCE(oov_tokens, 0) AS BIGINT) AS oov_tokens, "
            "round(COALESCE(CAST(oov_tokens AS DOUBLE) / NULLIF(n_tokens, 0), 0.0), 6) "
            "AS oov_rate FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"
        ),
        "minute_anomalies": (
            f"WITH {_EV}, "
            "pm AS (SELECT date_trunc('minute', event_time) AS minute, "
            "COUNT(*) AS events_count FROM ev GROUP BY 1), "
            "pmd AS (SELECT *, date_trunc('day', minute) AS day FROM pm), "
            "ds AS (SELECT day AS dday, COUNT(*) AS n, SUM(events_count) AS s, "
            "SUM(events_count * events_count) AS ss FROM pmd GROUP BY 1), "
            "j AS (SELECT minute, events_count, CASE WHEN n >= 2 AND "
            "n * ss - s * s > 0 THEN "
            "round((CAST(events_count AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / "
            "sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) "
            "/ (CAST(n AS DOUBLE) - 1.0)), 6) END AS zscore "
            "FROM pmd JOIN ds ON day = dday) "
            "SELECT minute, events_count, zscore, abs(zscore) > 2.0 AS is_anomaly FROM j"
        ),
        "nearest_centroid": (
            "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), "
            "ex AS (SELECT label, unnest(v) AS x, "
            "unnest(generate_series(0, len(v) - 1)) AS idx FROM e), "
            "a AS (SELECT label AS clabel, idx, COUNT(*) AS n, "
            "CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS s FROM ex GROUP BY 1, 2), "
            "c AS (SELECT clabel, list(CAST(round(round(s / n, 6) * 1000000) AS BIGINT) "
            "/ 1000000.0 ORDER BY idx) AS cv FROM a GROUP BY 1), "
            "sc AS (SELECT vec_id, label, clabel, "
            "round(list_dot_product(v, cv) / "
            "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6) AS score "
            "FROM e CROSS JOIN c) "
            "SELECT vec_id, label, CAST(clabel AS INTEGER) AS pred_label, score FROM sc "
            "QUALIFY row_number() OVER (PARTITION BY vec_id "
            "ORDER BY score DESC, clabel ASC) = 1"
        ),
        "tpch_q20_potential_promotion": (
            # textbook correlated-IN spelling to pin the semi-join rewrite
            "WITH red_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'), "
            "ps AS (SELECT l_suppkey, l_partkey, "
            "SUM(CASE WHEN l_shipdate >= TIMESTAMP '2000-01-01' "
            "AND l_shipdate < TIMESTAMP '2001-01-01' "
            "THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS qty_yr, "
            "SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_all "
            "FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM red_parts) "
            "GROUP BY 1, 2) "
            "SELECT s_name, s_acctbal FROM supplier "
            "WHERE s_suppkey IN (SELECT l_suppkey FROM ps WHERE qty_yr * 5 > qty_all) "
            "AND s_nationkey IN (SELECT n_nationkey FROM nation "
            "WHERE n_name IN ('NATION_7', 'NATION_8', 'NATION_9')) "
            "ORDER BY s_name"
        ),
        "tpch_q21_waiting_suppliers": (
            "WITH late AS (SELECT DISTINCT l_orderkey, l_suppkey "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderstatus = 'F' "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
            "SELECT s_name, COUNT(*) AS numwait FROM late l1 "
            "JOIN supplier ON l1.l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "AND n_name IN ('NATION_3','NATION_7') "
            "WHERE EXISTS (SELECT 1 FROM lineitem l2 "
            "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) "
            "AND NOT EXISTS (SELECT 1 FROM late l3 "
            "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey) "
            "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
        ),
        "tpch_q2_cheapest_supplier": (
            "WITH wanted AS (SELECT p_partkey FROM part "
            "WHERE p_type = 'PROMO' AND p_size <= 10), "
            "cost AS (SELECT l_partkey, l_suppkey, "
            "MIN(l_extendedprice / l_quantity) AS unit_cost "
            "FROM lineitem WHERE EXISTS (SELECT 1 FROM wanted "
            "WHERE p_partkey = l_partkey) GROUP BY 1, 2), "
            "mn AS (SELECT l_partkey AS pk, MIN(unit_cost) AS min_cost "
            "FROM cost GROUP BY 1) "
            "SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, unit_cost "
            "FROM cost JOIN mn ON l_partkey = pk AND unit_cost = min_cost "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "ORDER BY s_acctbal DESC, s_name ASC, p_partkey ASC LIMIT 100"
        ),
        "tpch_q11_important_parts": (
            "WITH nat_supp AS (SELECT s_suppkey FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'), "
            "per_part AS (SELECT l_partkey, "
            "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * "
            "(1 - CAST(l_discount AS DECIMAL(18,4)))) AS vald "
            "FROM lineitem WHERE EXISTS (SELECT 1 FROM nat_supp "
            "WHERE s_suppkey = l_suppkey) GROUP BY 1) "
            "SELECT l_partkey, CAST(vald AS DOUBLE) AS part_value FROM per_part, "
            "(SELECT CAST(SUM(vald) AS DOUBLE) * 0.001 AS cut FROM per_part) "
            "WHERE CAST(vald AS DOUBLE) > cut"
        ),
        "tpch_q16_part_supplier_counts": (
            "SELECT p_brand, p_type, p_size, "
            "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO' "
            "AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34) "
            "AND NOT EXISTS (SELECT 1 FROM supplier "
            "WHERE s_acctbal < 0 AND s_suppkey = l_suppkey) "
            "GROUP BY 1, 2, 3"
        ),
        "tpch_q22_sales_opportunity": (
            "WITH inn AS (SELECT c_custkey, c_acctbal, n_name "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "WHERE n_name IN ('NATION_5','NATION_7','NATION_9','NATION_11','NATION_13')), "
            "ab AS (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS avg_bal "
            "FROM inn WHERE c_acctbal > 0) "
            "SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust, "
            "round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2) AS totacctbal "
            "FROM inn, ab WHERE c_acctbal > avg_bal "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderpriority = '1-URGENT') "
            "GROUP BY n_name"
        ),
        "next_item_recs": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "p AS (SELECT visitorid, itemid AS src, LEAD(itemid) OVER "
            "(PARTITION BY visitorid ORDER BY event_time, event_id) AS dst "
            "FROM ev WHERE itemid IS NOT NULL), "
            "t AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_transitions "
            "FROM p WHERE dst IS NOT NULL GROUP BY 1, 2), "
            "r AS (SELECT src AS itemid, dst AS recommended_itemid, n_transitions, "
            "CAST(row_number() OVER (PARTITION BY src "
            "ORDER BY n_transitions DESC, dst ASC) AS INT) AS rec_rank FROM t) "
            "SELECT * FROM r WHERE rec_rank <= 3"
        ),
        "session_entry_exit": (
            "WITH ev2 AS (SELECT user_id AS visitorid, event_type AS event, "
            "ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "lagged2 AS (SELECT *, lag(event_time) OVER (PARTITION BY visitorid "
            "ORDER BY event_time) AS prev_t FROM ev2), "
            "flagged2 AS (SELECT *, CASE WHEN prev_t IS NULL OR "
            "date_diff('second', prev_t, event_time) > 1800 THEN 1 ELSE 0 END "
            "AS is_new FROM lagged2), "
            "sess2 AS (SELECT *, CAST(visitorid AS VARCHAR) || '_' || "
            "CAST(SUM(is_new) OVER (PARTITION BY visitorid ORDER BY event_time "
            "ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS session_id FROM flagged2), "
            "r AS (SELECT session_id, itemid, "
            "row_number() OVER (PARTITION BY session_id "
            "ORDER BY event_time, event_id) AS rn_a, "
            "row_number() OVER (PARTITION BY session_id "
            "ORDER BY event_time DESC, event_id DESC) AS rn_d "
            "FROM sess2 WHERE itemid IS NOT NULL), "
            "f AS (SELECT session_id, MIN(CASE WHEN rn_a = 1 THEN itemid END) "
            "AS entry_item, MIN(CASE WHEN rn_d = 1 THEN itemid END) AS exit_item "
            "FROM r GROUP BY 1), "
            "e1 AS (SELECT entry_item AS itemid, CAST(COUNT(*) AS BIGINT) "
            "AS entries FROM f GROUP BY 1), "
            "e2 AS (SELECT exit_item AS itemid, CAST(COUNT(*) AS BIGINT) "
            "AS exits FROM f GROUP BY 1) "
            "SELECT COALESCE(e1.itemid, e2.itemid) AS itemid, "
            "COALESCE(entries, 0) AS entries, COALESCE(exits, 0) AS exits "
            "FROM e1 FULL OUTER JOIN e2 ON e1.itemid = e2.itemid"
        ),
        "top_paths": (
            f"WITH {_SESSIONIZED}, "
            "p AS (SELECT session_id, "
            "array_to_string(list(event ORDER BY event_time, event), '>') AS path "
            "FROM sessionized GROUP BY 1) "
            "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p "
            "GROUP BY 1 ORDER BY n_sessions DESC, path ASC LIMIT 20"
        ),
        "retention_cohorts": (
            f"WITH {_EV}, "
            "act AS (SELECT DISTINCT visitorid, "
            "CAST(date_trunc('week', event_time) AS DATE) AS period FROM ev), "
            "coh AS (SELECT visitorid, MIN(period) AS cohort FROM act GROUP BY 1), "
            "sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size "
            "FROM coh GROUP BY 1), "
            "j AS (SELECT coh.cohort, CAST(date_diff('day', coh.cohort, act.period) / 7.0 "
            "AS BIGINT) AS period_offset, act.visitorid "
            "FROM act JOIN coh USING (visitorid)) "
            "SELECT j.cohort, period_offset, "
            "CAST(COUNT(DISTINCT visitorid) AS BIGINT) AS active_visitors, "
            "sizes.cohort_size, "
            "round(CAST(COUNT(DISTINCT visitorid) AS DOUBLE) / cohort_size, 6) "
            "AS retention_rate "
            "FROM j JOIN sizes ON j.cohort = sizes.cohort "
            "GROUP BY 1, 2, sizes.cohort_size"
        ),
        "item_dwell_time": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "l AS (SELECT itemid, event_time, lead(event_time) OVER "
            "(PARTITION BY visitorid ORDER BY event_time, event_id) AS nxt FROM ev) "
            "SELECT itemid, CAST(COUNT(*) AS BIGINT) AS n_dwells, "
            "round(CAST(AVG(CAST(date_diff('second', event_time, nxt) AS DECIMAL(18,6))) "
            "AS DOUBLE), 6) AS avg_dwell_seconds "
            "FROM l WHERE nxt IS NOT NULL AND itemid IS NOT NULL GROUP BY 1"
        ),
        "rfm_segments": (
            "WITH ref AS (SELECT MAX(o_orderdate) AS r FROM orders), "
            "pc AS (SELECT o_custkey AS custkey, "
            "CAST(date_diff('day', MAX(o_orderdate), (SELECT r FROM ref)) AS INT) "
            "AS recency_days, "
            "CAST(COUNT(*) AS BIGINT) AS frequency, "
            "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS spend "
            "FROM orders GROUP BY 1) "
            "SELECT custkey, recency_days, frequency, CAST(spend AS DOUBLE) AS monetary, "
            "CAST(ntile(5) OVER (ORDER BY recency_days ASC, custkey ASC) AS INT) AS r_score, "
            "CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey ASC) AS INT) AS f_score, "
            "CAST(ntile(5) OVER (ORDER BY spend DESC, custkey ASC) AS INT) AS m_score "
            "FROM pc"
        ),
        "sequential_funnel": (
            f"WITH {_SESSIONIZED}, "
            "s1 AS (SELECT session_id, visitorid, "
            "MIN(CASE WHEN event = 'view' THEN event_time END) AS t1 "
            "FROM sessionized GROUP BY 1, 2), "
            "s2 AS (SELECT e.session_id, e.visitorid, MIN(s1.t1) AS t1, "
            "MIN(CASE WHEN e.event = 'click' AND e.event_time > s1.t1 "
            "THEN e.event_time END) AS t2 "
            "FROM sessionized e JOIN s1 USING (session_id, visitorid) GROUP BY 1, 2), "
            "s3 AS (SELECT e.session_id, e.visitorid, MIN(s2.t1) AS t1, MIN(s2.t2) AS t2, "
            "MIN(CASE WHEN e.event = 'purchase' AND e.event_time > s2.t2 "
            "THEN e.event_time END) AS t3 "
            "FROM sessionized e JOIN s2 USING (session_id, visitorid) GROUP BY 1, 2) "
            "SELECT CAST(COUNT(t1) AS BIGINT) AS view_sessions, "
            "CAST(COUNT(t2) AS BIGINT) AS click_sessions, "
            "CAST(COUNT(t3) AS BIGINT) AS purchase_sessions FROM s3"
        ),
        "item_cooccurrence": (
            f"WITH {_SESSIONIZED}, "
            "its AS (SELECT session_id, "
            "list_slice(list_sort(list_distinct(list(itemid))), 1, 50) AS items "
            "FROM sessionized WHERE itemid IS NOT NULL GROUP BY session_id), "
            "pairs AS (SELECT items[i] AS item_a, items[j] AS item_b FROM its, "
            "LATERAL UNNEST(generate_series(1, len(items))) t1(i), "
            "LATERAL UNNEST(generate_series(1, len(items))) t2(j) "
            "WHERE j > i) "
            "SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_sessions "
            "FROM pairs GROUP BY 1, 2 "
            "ORDER BY n_sessions DESC, item_a ASC, item_b ASC LIMIT 100"
        ),
        "order_gap_stats": (
            "WITH l AS (SELECT o_custkey, o_orderdate, lag(o_orderdate) OVER "
            "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev "
            "FROM orders) "
            "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_gaps, "
            "round(CAST(AVG(CAST(date_diff('day', prev, o_orderdate) AS DECIMAL(18,6))) "
            "AS DOUBLE), 6) AS avg_gap_days, "
            "CAST(MIN(date_diff('day', prev, o_orderdate)) AS INT) AS min_gap_days, "
            "CAST(MAX(date_diff('day', prev, o_orderdate)) AS INT) AS max_gap_days "
            "FROM l WHERE prev IS NOT NULL GROUP BY 1"
        ),
        "item_transitions": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "p AS (SELECT visitorid, itemid AS src, LEAD(itemid) OVER "
            "(PARTITION BY visitorid ORDER BY event_time, event_id) AS dst "
            "FROM ev WHERE itemid IS NOT NULL) "
            "SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_transitions "
            "FROM p WHERE dst IS NOT NULL GROUP BY 1, 2"
        ),
        "item_pagerank": _pagerank_oracle_sql(),
        "similar_visitors": _visitor_minhash_sql(0.4),
        "item_degree_profile": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "p AS (SELECT visitorid, itemid AS src, LEAD(itemid) OVER "
            "(PARTITION BY visitorid ORDER BY event_time, event_id) AS dst "
            "FROM ev WHERE itemid IS NOT NULL), "
            "e AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n FROM p "
            "WHERE dst IS NOT NULL GROUP BY 1, 2), "
            "od AS (SELECT src AS item, CAST(COUNT(*) AS BIGINT) AS out_d, "
            "CAST(SUM(n) AS BIGINT) AS out_s FROM e GROUP BY 1), "
            "ind AS (SELECT dst AS item, CAST(COUNT(*) AS BIGINT) AS in_d, "
            "CAST(SUM(n) AS BIGINT) AS in_s FROM e GROUP BY 1), "
            "d AS (SELECT COALESCE(out_d, 0) + COALESCE(in_d, 0) AS deg, "
            "COALESCE(out_s, 0) + COALESCE(in_s, 0) AS str "
            "FROM od FULL OUTER JOIN ind ON od.item = ind.item) "
            "SELECT CAST(FLOOR(ln(CAST(deg AS DOUBLE)) / ln(2.0) + 1e-9) AS INT) "
            "AS degree_bucket, CAST(COUNT(*) AS BIGINT) AS n_items, "
            "MIN(deg) AS min_degree, MAX(deg) AS max_degree, "
            "CAST(SUM(str) AS BIGINT) AS incident_transitions "
            "FROM d GROUP BY 1 ORDER BY 1"
        ),
        "event_type_pivot": (
            f"WITH {_EV} "
            "SELECT date_trunc('minute', event_time) AS minute, "
            "CAST(SUM(CASE WHEN event = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, "
            "CAST(SUM(CASE WHEN event = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error, "
            "CAST(SUM(CASE WHEN event = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase, "
            "CAST(SUM(CASE WHEN event = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup, "
            "CAST(SUM(CASE WHEN event = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view "
            "FROM ev GROUP BY 1"
        ),
        "customer_value_deciles": (
            "WITH spend AS (SELECT o_custkey AS custkey, "
            "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s "
            "FROM orders GROUP BY 1) "
            "SELECT custkey, CAST(s AS DOUBLE) AS total_spend, "
            "CAST(ntile(10) OVER (ORDER BY s DESC, custkey ASC) AS INT) AS decile "
            "FROM spend"
        ),
        "token_frequencies": (
            f"WITH tk AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents) "
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences, "
            "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs "
            "FROM tk WHERE token <> '' GROUP BY token "
            "ORDER BY n_occurrences DESC, token ASC LIMIT 100"
        ),
        "dedup_agreement": (
            f"WITH {_minhash_cte()}, "
            "mh_pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.7), "
            f"fp AS (SELECT doc_id, md5({_NORM_TEXT_SQL}) AS f FROM documents), "
            "ex AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
            "FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id), "
            "tagged AS (SELECT COALESCE(e.one, 0) AS e, COALESCE(m.one, 0) AS m "
            "FROM (SELECT doc_a, doc_b, 1 AS one FROM ex) e "
            "FULL OUTER JOIN (SELECT doc_a, doc_b, 1 AS one FROM mh_pairs) m "
            "USING (doc_a, doc_b)) "
            "SELECT CAST(SUM(e) AS BIGINT) AS n_exact_pairs, "
            "CAST(SUM(m) AS BIGINT) AS n_minhash_pairs, "
            "CAST(SUM(e * m) AS BIGINT) AS n_both, "
            "CAST(SUM(e * (1 - m)) AS BIGINT) AS n_exact_only, "
            "CAST(SUM((1 - e) * m) AS BIGINT) AS n_minhash_only, "
            "CAST(COALESCE((SUM(e * m) * 1000000) // "
            "(SUM(e) + SUM(m) - SUM(e * m)), 0) AS BIGINT) AS agreement_ppm "
            "FROM tagged"
        ),
        "pack_efficiency": (
            f"WITH t AS (SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS token_count FROM documents), "
            "r AS (SELECT doc_id, token_count, "
            "CAST(SUM(token_count) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t), "
            "p AS (SELECT token_count, cum - token_count AS start_offset, "
            "(cum - token_count) // 512 AS pack_id FROM r) "
            "SELECT pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(token_count) AS BIGINT) AS pack_tokens, "
            "CAST(SUM(LEAST(start_offset + token_count, (pack_id + 1) * 512) - start_offset) AS BIGINT) AS tokens_in_window, "
            "CAST(SUM(GREATEST(start_offset + token_count - (pack_id + 1) * 512, 0)) AS BIGINT) AS spill_tokens, "
            "CAST((SUM(LEAST(start_offset + token_count, (pack_id + 1) * 512) - start_offset) * 1000000) // 512 AS BIGINT) AS fill_ppm "
            "FROM p GROUP BY 1"
        ),
        "rare_bigram_rate": (
            f"WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram "
            "FROM tk, LATERAL UNNEST(generate_series(1, len(toks)-1)) AS t(i) "
            "WHERE len(toks) >= 2), "
            "c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY 1), "
            "f AS (SELECT g.doc_id, COUNT(*) AS nb, "
            "SUM(CASE WHEN c.cnt < 3 THEN 1 ELSE 0 END) AS nr "
            "FROM g JOIN c USING (gram) GROUP BY 1) "
            "SELECT d.doc_id, CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams, "
            "CAST(COALESCE(nr, 0) AS BIGINT) AS n_rare, "
            "CAST(COALESCE((nr * 1000000) // nb, 0) AS BIGINT) AS rare_ppm "
            "FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id"
        ),
        "shuffle_shards": (
            "WITH h AS (SELECT doc_id, "
            + portable.phash60_sql("'7:' || CAST(doc_id AS VARCHAR)")
            + " AS hh FROM documents) "
            "SELECT doc_id, CAST(hh % 64 AS INTEGER) AS shard, "
            "CAST(row_number() OVER (PARTITION BY hh % 64 "
            "ORDER BY hh, doc_id) AS BIGINT) AS pos_in_shard FROM h"
        ),
        "select_token_budget": (
            f"WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents), "
            "s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS token_count, "
            "CAST(length(text) AS BIGINT) AS char_count, "
            f"CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS BIGINT) AS stopword_count, "
            "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_count "
            "FROM t), "
            "q AS (SELECT doc_id, token_count, "
            "round(0.5 * least(CAST(token_count AS DOUBLE) / 50, 1.0) "
            "+ 0.3 * (1.0 - CAST(stopword_count AS DOUBLE) / token_count) "
            "+ 0.2 * (1.0 - CAST(punct_count AS DOUBLE) / char_count), 6) AS quality_score "
            "FROM s), "
            "r AS (SELECT doc_id, token_count, quality_score, "
            "SUM(token_count) OVER (ORDER BY quality_score DESC, doc_id ASC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens FROM q) "
            "SELECT doc_id, token_count, quality_score, "
            "CAST(cum_tokens AS BIGINT) AS cum_tokens "
            "FROM r WHERE cum_tokens <= 10000"
        ),
        "collocations": (
            # HUGEINT (int128) mirrors Spark's DECIMAL(38,0) product; // is
            # floor division = Spark DIV on positives
            f"WITH tk AS (SELECT {_TOKS_SQL} AS toks FROM documents), "
            "uni AS (SELECT t AS tok, COUNT(*) AS c FROM tk, "
            "LATERAL UNNEST(toks) AS u(t) WHERE t <> '' GROUP BY 1), "
            "tot AS (SELECT CAST(SUM(c) AS HUGEINT) AS n FROM uni), "
            "pr AS (SELECT toks[i] AS a, toks[i+1] AS b, COUNT(*) AS np "
            "FROM tk, LATERAL UNNEST(generate_series(1, len(toks)-1)) AS g(i) "
            "WHERE len(toks) >= 2 AND toks[i] <> '' AND toks[i+1] <> '' "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 5) "
            "SELECT pr.a AS token_a, pr.b AS token_b, CAST(np AS BIGINT) AS n_pair, "
            "CAST((CAST(np AS HUGEINT) * n * 1000000) // "
            "(CAST(ua.c AS HUGEINT) * CAST(ub.c AS HUGEINT)) AS BIGINT) AS score_ppm "
            "FROM pr JOIN uni ua ON pr.a = ua.tok JOIN uni ub ON pr.b = ub.tok "
            "CROSS JOIN tot "
            "ORDER BY score_ppm DESC, token_a ASC, token_b ASC LIMIT 100"
        ),
        "type_token_ratio": (
            f"WITH tk AS (SELECT source, doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "ex AS (SELECT source, doc_id, t FROM tk, "
            "LATERAL UNNEST(toks) AS u(t) WHERE t <> '') "
            "SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, "
            "CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "CAST(COUNT(DISTINCT t) AS BIGINT) AS n_types, "
            "CAST((COUNT(DISTINCT t) * 1000000) // COUNT(*) AS BIGINT) AS ttr_ppm "
            "FROM ex GROUP BY 1"
        ),
        "mask_duplicate_spans": (
            f"WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "sl AS (SELECT doc_id, i AS pos, "
            "array_to_string(list_slice(toks, i, i+15), ' ') AS span "
            "FROM tk, LATERAL UNNEST(generate_series(1, len(toks)-15)) AS t(i) "
            "WHERE len(toks) >= 16), "
            "dup AS (SELECT span FROM sl GROUP BY span HAVING COUNT(*) >= 2), "
            "d2 AS (SELECT sl.doc_id, sl.pos, sl.span FROM sl JOIN dup USING (span)), "
            "fst AS (SELECT span, doc_id AS fd, pos AS fp FROM d2 "
            "QUALIFY row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) = 1), "
            "nonfirst AS (SELECT d2.doc_id, d2.pos FROM d2 JOIN fst USING (span) "
            "WHERE NOT (d2.doc_id = fst.fd AND d2.pos = fst.fp)), "
            "cov AS (SELECT DISTINCT doc_id, pos + j AS ti FROM nonfirst, "
            "LATERAL UNNEST(generate_series(0, 15)) AS g(j)), "
            "pc AS (SELECT doc_id, list(ti) AS cov_l, COUNT(*) AS n_m FROM cov GROUP BY doc_id) "
            "SELECT tk.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(n_m, 0) AS BIGINT) AS n_masked_tokens, "
            # array_to_string([]) is NULL in DuckDB, '' in Spark's concat_ws
            "md5(COALESCE(array_to_string(list_transform("
            "list_filter(range(1, len(toks) + 1), "
            "i -> NOT list_contains(COALESCE(cov_l, []), i)), "
            "i -> toks[i]), ' '), '')) AS cleaned_digest "
            "FROM tk LEFT JOIN pc ON tk.doc_id = pc.doc_id"
        ),
        "duplicate_spans": (
            f"WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "el AS (SELECT doc_id, array_to_string(list_slice(toks, i, i+15), ' ') AS span_text "
            "FROM tk, LATERAL UNNEST(generate_series(1, len(toks)-15)) AS t(i) "
            "WHERE len(toks) >= 16) "
            "SELECT span_text, CAST(COUNT(*) AS BIGINT) AS n_occurrences, "
            "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs "
            "FROM el GROUP BY 1 HAVING COUNT(*) >= 2 "
            "ORDER BY n_occurrences DESC, span_text ASC LIMIT 100"
        ),
        "dup_rate_by_source": (
            f"WITH fp AS (SELECT source, md5({_NORM_TEXT_SQL}) AS f FROM documents), "
            "g AS (SELECT source, f, CAST(COUNT(*) AS BIGINT) AS n FROM fp GROUP BY 1, 2) "
            "SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_unique, "
            "round(CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n), 6) AS dup_rate "
            "FROM g GROUP BY source"
        ),
        "text_stats": (
            f"WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents), "
            "s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS token_count, "
            "CAST(length(text) AS BIGINT) AS char_count, "
            f"CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS BIGINT) AS stopword_count, "
            "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_count "
            "FROM t) "
            "SELECT doc_id, token_count, char_count, stopword_count, "
            "round(CAST(stopword_count AS DOUBLE) / token_count, 6) AS stopword_ratio, "
            "round(CAST(punct_count AS DOUBLE) / char_count, 6) AS punct_ratio, "
            "round(0.5 * least(CAST(token_count AS DOUBLE) / 50, 1.0) "
            "+ 0.3 * (1.0 - CAST(stopword_count AS DOUBLE) / token_count) "
            "+ 0.2 * (1.0 - CAST(punct_count AS DOUBLE) / char_count), 6) AS quality_score "
            "FROM s"
        ),
        "token_count_bpe": (
            "SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '\\w+|[^\\w\\s]')) AS BIGINT) "
            "AS bpe_token_count FROM documents"
        ),
        "lang_id": _lang_id_sql(),
        "doc_fingerprint": (
            f"SELECT doc_id, md5({_NORM_TEXT_SQL}) AS fingerprint FROM documents"
        ),
        "similar_docs_topk": (
            f"WITH d AS (SELECT doc_id, list_distinct({_TOKS_SQL}) AS toks FROM documents), "
            "q AS (SELECT toks AS qtoks FROM d WHERE doc_id = 0), "
            "s AS (SELECT d.doc_id, "
            "CASE WHEN len(list_distinct(list_concat(d.toks, q.qtoks))) > 0 THEN "
            "round(CAST(len(list_intersect(d.toks, q.qtoks)) AS DOUBLE) / "
            "len(list_distinct(list_concat(d.toks, q.qtoks))), 6) ELSE 0.0 END AS jaccard "
            "FROM d CROSS JOIN q WHERE d.doc_id <> 0) "
            "SELECT doc_id, jaccard FROM s ORDER BY jaccard DESC, doc_id ASC LIMIT 10"
        ),
        "label_centroids": (
            "WITH e AS (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS x, "
            "unnest(generate_series(0, len(embedding) - 1)) AS idx FROM embeddings), "
            "a AS (SELECT label, idx, COUNT(*) AS n, "
            "CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS s FROM e GROUP BY label, idx), "
            "m AS (SELECT label, idx, n, CAST(round(round(s / n, 6) * 1000000) AS BIGINT) AS q FROM a) "
            "SELECT label, CAST(MAX(n) AS BIGINT) AS n_vectors, "
            "string_agg(CAST(q AS VARCHAR), ',' ORDER BY idx) AS centroid_q6 "
            "FROM m GROUP BY label"
        ),
        "tfidf_top_terms": (
            f"WITH tk AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents), "
            "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM tk GROUP BY doc_id, term), "
            "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
            "n AS (SELECT COUNT(*) AS n_docs FROM documents), "
            "scored AS (SELECT tf.doc_id, tf.term, tf.tf, "
            "round(tf.tf * (ln((n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf "
            "FROM tf JOIN df USING (term) CROSS JOIN n), "
            "ranked AS (SELECT *, CAST(row_number() OVER "
            "(PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INT) AS rank "
            "FROM scored) "
            "SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 3"
        ),
        "repetition_score": (
            f"WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
            "list_transform(generate_series(1, len(toks) - 2), "
            "i -> array_to_string(toks[i:i+2], ' ')) "
            "ELSE [] END AS grams FROM toks) "
            "SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams, "
            "CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct, "
            "CASE WHEN len(grams) > 0 THEN "
            "round(1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE), 6) "
            "ELSE 0.0 END AS repetition_ratio FROM g"
        ),
        "dedup_exact": (
            f"SELECT md5({_NORM_TEXT_SQL}) AS fingerprint, "
            "MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_copies "
            "FROM documents GROUP BY 1"
        ),
        "dedup_keep_first": (
            "SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id IN "
            f"(SELECT MIN(doc_id) FROM documents GROUP BY md5({_NORM_TEXT_SQL}))"
        ),
        "dedup_ngram_jaccard": (
            f"WITH d AS (SELECT doc_id, list_distinct({_TOKS_SQL}) AS toks, "
            "CAST(n_chars // 64 AS BIGINT) AS block FROM documents), "
            "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / "
            "len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard "
            "FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id) "
            "SELECT * FROM p WHERE jaccard >= 0.9"
        ),
        "similarity_topk": (
            "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0) "
            "SELECT vec_id, round(list_dot_product(CAST(embedding AS DOUBLE[]), qv) / "
            "(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) * "
            "sqrt(list_dot_product(qv, qv))), 6) AS score "
            "FROM embeddings, q ORDER BY score DESC, vec_id ASC LIMIT 10"
        ),
        "multimodal_decode": (
            "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "CAST(64 + octet_length(encode(text)) % 577 AS BIGINT) AS width, "
            "CAST(64 + (octet_length(encode(text)) * 31) % 417 AS BIGINT) AS height, "
            "CAST(3 AS BIGINT) AS channels FROM documents"
        ),
        "multimodal_frames": (
            "SELECT doc_id, CAST(unnest(generate_series(0, octet_length(encode(text)) % 100, 10)) AS BIGINT) "
            "AS frame_idx FROM documents"
        ),
        "multimodal_features": (
            "WITH pos AS (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i FROM documents), "
            "cnts AS (SELECT doc_id, ord(substr(text, i, 1)) % 16 AS bucket, COUNT(*) AS c "
            "FROM pos GROUP BY 1, 2), "
            "grid AS (SELECT doc_id, b AS bucket FROM documents CROSS JOIN range(16) AS t(b)) "
            "SELECT g.doc_id, g.bucket, COALESCE(c.c, 0) AS byte_count "
            "FROM grid g LEFT JOIN cnts c ON c.doc_id = g.doc_id AND c.bucket = g.bucket"
        ),
        "corpus_stats": (
            f"WITH t AS (SELECT doc_id, lang, source, text, {_TOKS_SQL} AS toks FROM documents), "
            "s AS (SELECT doc_id, lang, source, CAST(len(toks) AS BIGINT) AS token_count, "
            "CAST(length(text) AS BIGINT) AS char_count, "
            f"CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS BIGINT) AS stopword_count, "
            "length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS punct_count FROM t), "
            "q AS (SELECT doc_id, lang, source, token_count, char_count, "
            "round(0.5 * least(CAST(token_count AS DOUBLE) / 50, 1.0) "
            "+ 0.3 * (1.0 - CAST(stopword_count AS DOUBLE) / token_count) "
            "+ 0.2 * (1.0 - CAST(punct_count AS DOUBLE) / char_count), 6) AS quality_score FROM s) "
            "SELECT lang, source, COUNT(*) AS n_docs, "
            "CAST(SUM(token_count) AS BIGINT) AS total_tokens, "
            "CAST(SUM(char_count) AS BIGINT) AS total_chars, "
            "round(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_quality "
            "FROM q GROUP BY lang, source"
        ),
        "corpus_sample": (
            "SELECT doc_id, lang, source FROM documents WHERE "
            f"{portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} "
            "% 1000000 < 200000"
        ),
        "split_corpus": (
            "WITH h AS (SELECT doc_id, lang, source, "
            f"{portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} "
            "% 1000000 AS hv FROM documents) "
            "SELECT doc_id, lang, source, "
            "CASE WHEN hv < 900000 THEN 'train' WHEN hv < 950000 THEN 'val' ELSE 'test' END AS split "
            "FROM h"
        ),
        "dup_histogram": (
            f"WITH fp AS (SELECT md5({_NORM_TEXT_SQL}) AS f FROM documents), "
            "g AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS group_size FROM fp GROUP BY f) "
            "SELECT group_size, CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(group_size * COUNT(*) AS BIGINT) AS n_docs FROM g GROUP BY group_size"
        ),
        "item_skew_profile": (
            f"WITH {_EV}, c AS (SELECT itemid, CAST(COUNT(*) AS BIGINT) AS n_rows FROM ev GROUP BY 1), "
            "t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM ev) "
            "SELECT itemid, n_rows, round(n_rows / total, 6) AS share "
            "FROM c CROSS JOIN t ORDER BY n_rows DESC, itemid ASC LIMIT 10"
        ),
        "stratified_fixed_k": (
            "WITH h AS (SELECT doc_id, lang, source, "
            f"{portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} AS hh "
            "FROM documents), "
            "r AS (SELECT doc_id, lang, source, CAST(row_number() OVER "
            "(PARTITION BY lang ORDER BY hh ASC, doc_id ASC) AS INT) AS sample_rank FROM h) "
            "SELECT doc_id, lang, source, sample_rank FROM r WHERE sample_rank <= 20"
        ),
        "temperature_sample": (
            "WITH c AS (SELECT lang, COUNT(*) AS strat_n FROM documents GROUP BY 1), "
            "t AS (SELECT CAST(SUM(strat_n) AS DOUBLE) AS total_n, "
            "SUM(pow(CAST(strat_n AS DOUBLE), 0.5)) AS denom FROM c), "
            "r AS (SELECT lang, round(least(1.0, 0.5 * total_n * pow(CAST(strat_n AS DOUBLE), -0.5) / denom), 6) AS rate "
            "FROM c CROSS JOIN t) "
            "SELECT d.doc_id, d.lang, d.source FROM documents d "
            "JOIN r ON r.lang IS NOT DISTINCT FROM d.lang "
            f"WHERE {portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} "
            "% 1000000 < rate * 1000000"
        ),
        "normalize_embeddings": (
            "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
            "n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e) "
            "SELECT vec_id, array_to_string(list_transform(v, "
            "x -> CAST(round(round(x / (CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END), 6) * 1000000) AS BIGINT)), ',') "
            "AS normalized_q6 FROM n"
        ),
        "quantize_embeddings": (
            "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
            "m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e), "
            "s AS (SELECT vec_id, v, round(CASE WHEN mx = 0 THEN 1.0 ELSE 127.0 / mx END, 6) AS scale FROM m) "
            "SELECT vec_id, scale, array_to_string(list_transform(v, "
            "x -> CAST(round(x * scale) AS INT)), ',') AS qvec_csv FROM s"
        ),
        "view_purchase_attribution": (
            f"WITH {_EV} "
            "SELECT v.visitorid, v.event_time AS view_time, v.itemid AS view_item, "
            "p.event_time AS purchase_time, p.itemid AS purchase_item "
            "FROM (SELECT * FROM ev WHERE event = 'view') v "
            "JOIN (SELECT * FROM ev WHERE event = 'purchase') p "
            "ON p.visitorid = v.visitorid "
            "AND p.event_time >= v.event_time "
            "AND p.event_time <= v.event_time + INTERVAL '30 minutes'"
        ),
        "view_purchase_attribution_outer": (
            f"WITH {_EV} "
            "SELECT v.visitorid, v.event_time AS view_time, v.itemid AS view_item, "
            "p.event_time AS purchase_time, p.itemid AS purchase_item "
            "FROM (SELECT * FROM ev WHERE event = 'view') v "
            "LEFT JOIN (SELECT * FROM ev WHERE event = 'purchase') p "
            "ON p.visitorid = v.visitorid "
            "AND p.event_time >= v.event_time "
            "AND p.event_time <= v.event_time + INTERVAL '30 minutes'"
        ),
        "windowed_conversion_rate": (
            f"WITH {_EV}, "
            "j AS (SELECT v.visitorid, v.event_time AS view_time, v.itemid AS view_item, "
            "p.event_time AS purchase_time "
            "FROM (SELECT * FROM ev WHERE event = 'view') v "
            "LEFT JOIN (SELECT * FROM ev WHERE event = 'purchase') p "
            "ON p.visitorid = v.visitorid "
            "AND p.event_time >= v.event_time "
            "AND p.event_time <= v.event_time + INTERVAL '30 minutes'), "
            "pv AS (SELECT visitorid, view_time, view_item, "
            "MAX(purchase_time IS NOT NULL) AS converted "
            "FROM j GROUP BY visitorid, view_time, view_item) "
            "SELECT date_trunc('hour', view_time) AS window_start, view_item, "
            "COUNT(*) AS n_views, "
            "CAST(SUM(CAST(converted AS BIGINT)) AS BIGINT) AS n_converted, "
            "round(CAST(SUM(CAST(converted AS BIGINT)) AS DOUBLE) / COUNT(*), 6) "
            "AS conversion_rate FROM pv GROUP BY 1, 2"
        ),
        "conversion_rate_by_item": (
            f"WITH {_EV}, "
            "j AS (SELECT v.visitorid, v.event_time AS view_time, v.itemid AS view_item, "
            "p.event_time AS purchase_time "
            "FROM (SELECT * FROM ev WHERE event = 'view') v "
            "LEFT JOIN (SELECT * FROM ev WHERE event = 'purchase') p "
            "ON p.visitorid = v.visitorid "
            "AND p.event_time >= v.event_time "
            "AND p.event_time <= v.event_time + INTERVAL '30 minutes'), "
            "pv AS (SELECT visitorid, view_time, view_item, "
            "MAX(purchase_time IS NOT NULL) AS converted "
            "FROM j GROUP BY visitorid, view_time, view_item) "
            "SELECT view_item, COUNT(*) AS n_views, "
            "CAST(SUM(CAST(converted AS BIGINT)) AS BIGINT) AS n_converted, "
            "round(CAST(SUM(CAST(converted AS BIGINT)) AS DOUBLE) / COUNT(*), 6) "
            "AS conversion_rate FROM pv GROUP BY view_item"
        ),
        "sessions_in_campaigns": (
            f"WITH {_SESSIONIZED}, "
            "iv AS (SELECT session_id, MIN(event_time) AS s, MAX(event_time) AS e "
            "FROM sessionized GROUP BY 1), "
            "camp(campaign, cs, ce) AS (VALUES "
            + ", ".join(
                f"('{c}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for c, s, e in _CAMPAIGNS
            )
            + ") "
            "SELECT iv.session_id, camp.campaign FROM iv JOIN camp "
            "ON iv.s <= camp.ce AND camp.cs <= iv.e"
        ),
        "events_with_session": (
            f"WITH {_SESSIONIZED}, "
            "iv AS (SELECT session_id AS sid, visitorid AS v, MIN(event_time) AS s, "
            "MAX(event_time) AS e FROM sessionized GROUP BY 1, 2) "
            "SELECT ev.visitorid, ev.event_time, ev.itemid, iv.sid AS session_id "
            "FROM ev JOIN iv ON iv.v = ev.visitorid "
            "AND ev.event_time BETWEEN iv.s AND iv.e"
        ),
        "chunk_documents": (
            f"WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "n AS (SELECT doc_id, toks, len(toks) AS ntok FROM toks WHERE ntok >= 1), "
            "c AS (SELECT doc_id, toks, "
            "CAST(1 + ceil(greatest(ntok - 64, 0) / 48.0) AS INT) AS nchunks FROM n), "
            "x AS (SELECT doc_id, toks, i AS chunk_id FROM c "
            "CROSS JOIN unnest(generate_series(0, nchunks - 1)) AS t(i)), "
            "s AS (SELECT doc_id, chunk_id, toks[chunk_id*48+1 : chunk_id*48+64] AS chunk FROM x) "
            "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
            "CAST(len(chunk) AS BIGINT) AS n_tokens, "
            "array_to_string(chunk, ' ') AS chunk_text FROM s"
        ),
        "asof_last_purchase": (
            "WITH v AS (SELECT user_id AS visitorid, ts AS event_time, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid "
            "FROM events WHERE event_type = 'view'), "
            "p AS (SELECT user_id AS visitorid, ts AS event_time, MAX(value) AS purchase_value "
            "FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) "
            "SELECT v.visitorid, v.event_time, v.itemid, p.purchase_value, "
            "p.event_time AS event_time_asof "
            "FROM v ASOF LEFT JOIN p ON v.visitorid = p.visitorid AND v.event_time >= p.event_time"
        ),
        "decontaminate_apply": (
            f"WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "g AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS gram "
            "FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS t(i)), "
            "bench AS (SELECT DISTINCT gram FROM g WHERE "
            f"{portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} "
            "% 1000000 < 200000), "
            "hits AS (SELECT DISTINCT d.doc_id FROM g d JOIN bench b ON d.gram = b.gram) "
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE doc_id NOT IN (SELECT doc_id FROM hits)"
        ),
        "corpus_profile": (
            "SELECT COUNT(*) AS n_docs, "
            "COUNT(DISTINCT lang) AS n_langs, "
            "COUNT(DISTINCT source) AS n_sources, "
            "CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_text, "
            "CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_text, "
            "CAST(MIN(length(text)) AS BIGINT) AS min_chars, "
            "CAST(MAX(length(text)) AS BIGINT) AS max_chars, "
            "round(CAST(AVG(CAST(length(text) AS DECIMAL(18,4))) AS DOUBLE), 6) AS avg_chars "
            "FROM documents"
        ),
        "decontaminate": (
            f"WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "g AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS gram "
            "FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS t(i)), "
            "bench AS (SELECT DISTINCT gram FROM g WHERE "
            f"{portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} "
            "% 1000000 < 200000), "
            "m AS (SELECT DISTINCT d.doc_id, d.gram FROM g d JOIN bench b ON d.gram = b.gram), "
            "c AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS matched_ngrams FROM m GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(c.matched_ngrams, 0) AS matched_ngrams, "
            "COALESCE(c.matched_ngrams, 0) > 0 AS contaminated "
            "FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id"
        ),
        "redact_pii": (
            f"WITH {_redact_chain_sql('documents')} "
            "SELECT doc_id, n_email, n_ssn, n_phone, t3 AS redacted_text, "
            "n_email + n_ssn + n_phone AS n_redactions FROM s3"
        ),
        "pack_sequences": (
            f"WITH t AS (SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS token_count FROM documents), "
            "r AS (SELECT doc_id, token_count, "
            "CAST(SUM(token_count) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t) "
            "SELECT doc_id, token_count, cum - token_count AS start_offset, "
            "(cum - token_count) // 512 AS pack_id FROM r"
        ),
        "packed_corpus": (
            f"WITH t AS (SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS token_count FROM documents), "
            "r AS (SELECT doc_id, token_count, "
            "CAST(SUM(token_count) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t), "
            "p AS (SELECT doc_id, token_count, (cum - token_count) // 512 AS pack_id FROM r) "
            "SELECT p.pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(p.token_count) AS BIGINT) AS n_tokens, "
            "string_agg(d.text, ' ' ORDER BY p.doc_id) AS pack_text "
            "FROM p JOIN documents d ON d.doc_id = p.doc_id GROUP BY p.pack_id"
        ),
        "similarity_knn_join": _knn_join_sql(k=3, num_planes=8, bands=2),
        "similarity_knn_join_fine": _knn_join_sql(k=3, num_planes=16, bands=2),
        "curate_corpus": _curate_corpus_sql(min_quality=0.3, threshold=0.9, budget=512),
        "dedup_minhash_lsh": _minhash_sql(threshold=0.7),
        "dedup_apply": (
            "WITH RECURSIVE "
            "kept2 AS (SELECT * FROM documents WHERE doc_id IN "
            f"(SELECT MIN(doc_id) FROM documents GROUP BY md5({_NORM_TEXT_SQL}))), "
            f"{_minhash_cte(src='kept2')}, "
            "pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.7), "
            "edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs "
            "UNION SELECT doc_b, doc_a FROM pairs), "
            "reach(id, r) AS (SELECT s, s FROM edges "
            "UNION SELECT e.s, rr.r FROM edges e JOIN reach rr ON rr.id = e.d), "
            "losers AS (SELECT id AS doc_id FROM reach GROUP BY id HAVING MIN(r) <> id) "
            "SELECT doc_id, lang, source, n_chars FROM kept2 "
            "WHERE doc_id NOT IN (SELECT doc_id FROM losers)"
        ),
        "dedup_simhash": _simhash_sql(max_hamming=8, bits=60),
        "dedup_clusters": _clusters_sql(threshold=0.9),
        "dedup_embedding_cosine": _embedding_pairs_sql(threshold=0.25, num_planes=8, bands=2),
        "similarity_lsh_topk": _lsh_topk_sql(k=10, num_planes=4),
        "similarity_ivf_topk": _ivf_topk_sql(k=10, num_centroids=8, nprobe=2),
        "token_length_distribution": (
            f"WITH tk AS (SELECT unnest({_TOKS_SQL}) AS t FROM documents) "
            "SELECT CAST(length(t) AS BIGINT) AS token_len, "
            "CAST(COUNT(*) AS BIGINT) AS n_occurrences, "
            "CAST(COUNT(DISTINCT t) AS BIGINT) AS n_types "
            "FROM tk WHERE t <> '' GROUP BY 1 ORDER BY token_len ASC"
        ),
        "char_entropy": (
            "WITH ch AS (SELECT doc_id, substr(text, i, 1) AS c "
            "FROM documents, LATERAL UNNEST(generate_series(1, length(text))) AS g(i)), "
            "cc AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY 1, 2), "
            "g2 AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_chars, "
            "CAST(COUNT(*) AS BIGINT) AS n_distinct_chars, "
            "SUM(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS snlogn FROM cc GROUP BY 1) "
            "SELECT doc_id, n_chars, n_distinct_chars, "
            "round(ln(CAST(n_chars AS DOUBLE)) - snlogn / CAST(n_chars AS DOUBLE), 6) + 0.0 "
            "AS char_entropy FROM g2"
        ),
        "readability_scores": (
            f"WITH d AS (SELECT source, "
            f"CAST(len(list_filter({_TOKS_SQL}, x -> x <> '')) AS BIGINT) AS w, "
            "greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s, "
            "CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS y "
            "FROM documents), "
            "g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(w) AS BIGINT) AS n_words, CAST(SUM(s) AS BIGINT) AS n_sentences, "
            "CAST(SUM(y) AS BIGINT) AS n_syllables FROM d GROUP BY 1) "
            "SELECT source, n_docs, n_words, n_sentences, n_syllables, "
            "round(CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE), 6) AS words_per_sentence, "
            "round(CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS syllables_per_word, "
            "round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) "
            "- 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6) AS flesch "
            "FROM g"
        ),
        "ann_recall_lsh": _ann_recall_sql(_lsh_topk_sql(k=10, num_planes=4), k=10),
        "ann_recall_ivf": _ann_recall_sql(
            _ivf_topk_sql(k=10, num_centroids=8, nprobe=2), k=10
        ),
        "embedding_dim_stats": (
            "WITH ex AS (SELECT g.i - 1 AS idx, CAST(embedding[g.i] AS DOUBLE) AS x "
            "FROM embeddings, LATERAL UNNEST(generate_series(1, len(embedding))) AS g(i)), "
            "a AS (SELECT CAST(idx AS BIGINT) AS idx, CAST(COUNT(*) AS BIGINT) AS n_values, "
            "SUM(CAST(x AS DECIMAL(38,12))) AS sx, "
            "SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx, "
            "round(MIN(x), 6) AS dim_min, round(MAX(x), 6) AS dim_max FROM ex GROUP BY 1) "
            "SELECT idx, n_values, "
            "round(CAST(sx AS DOUBLE) / CAST(n_values AS DOUBLE), 6) AS dim_mean, "
            "round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) "
            "/ CAST(n_values AS DOUBLE)) / CAST(n_values AS DOUBLE), 6) AS dim_var, "
            "dim_min, dim_max FROM a ORDER BY idx ASC"
        ),
        "bpe_merge_step": (
            f"WITH tk AS (SELECT unnest({_TOKS_SQL}) AS w FROM documents), "
            "v AS (SELECT w, COUNT(*) AS wc FROM tk WHERE length(w) >= 2 GROUP BY w), "
            "p AS (SELECT substr(w, g.i, 1) AS left_sym, substr(w, g.i + 1, 1) AS right_sym, wc "
            "FROM v, LATERAL UNNEST(generate_series(1, length(w) - 1)) AS g(i)) "
            "SELECT left_sym, right_sym, CAST(SUM(wc) AS BIGINT) AS pair_count "
            "FROM p GROUP BY 1, 2 HAVING SUM(wc) >= 2 "
            "ORDER BY pair_count DESC, left_sym ASC, right_sym ASC LIMIT 100"
        ),
        "gopher_quality_flags": (
            f"WITH t AS (SELECT doc_id, text, list_filter({_TOKS_SQL}, x -> x <> '') AS toks "
            "FROM documents), "
            "s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words, "
            "CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS charsum, "
            "CAST(len(regexp_extract_all(text, '#')) "
            "+ len(regexp_extract_all(text, '…|\\.\\.\\.')) AS BIGINT) AS symbols, "
            "CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha, "
            f"CAST(len(list_filter(toks, x -> list_contains({_STOPWORDS_SQL}, x))) AS BIGINT) "
            "AS n_stopword_hits FROM t), "
            "m AS (SELECT doc_id, n_words, "
            "CASE WHEN n_words > 0 THEN round(charsum / CAST(n_words AS DOUBLE), 6) END AS mean_word_len, "
            "CASE WHEN n_words > 0 THEN round(symbols / CAST(n_words AS DOUBLE), 6) END AS symbol_ratio, "
            "CASE WHEN n_words > 0 THEN round(alpha / CAST(n_words AS DOUBLE), 6) END AS alpha_word_frac, "
            "n_stopword_hits FROM s), "
            "f AS (SELECT *, CAST(n_words BETWEEN 50 AND 100000 AS INT) AS ok_word_count, "
            "CAST(coalesce(mean_word_len BETWEEN 3.0 AND 10.0, FALSE) AS INT) AS ok_mean_word_len, "
            "CAST(coalesce(symbol_ratio <= 0.1, FALSE) AS INT) AS ok_symbol_ratio, "
            "CAST(coalesce(alpha_word_frac >= 0.8, FALSE) AS INT) AS ok_alpha_words, "
            "CAST(n_stopword_hits >= 2 AS INT) AS ok_stopwords FROM m) "
            "SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_frac, "
            "n_stopword_hits, ok_word_count, ok_mean_word_len, ok_symbol_ratio, "
            "ok_alpha_words, ok_stopwords, "
            "CAST(ok_word_count * ok_mean_word_len * ok_symbol_ratio * ok_alpha_words "
            "* ok_stopwords AS INT) AS passes_all FROM f"
        ),
        "vocab_growth": (
            f"WITH d AS (SELECT doc_id, list_filter({_TOKS_SQL}, x -> x <> '') AS toks "
            "FROM documents), "
            "pd AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM d), "
            "tk AS (SELECT doc_id, unnest(toks) AS t FROM d), "
            "fo AS (SELECT t, MIN(doc_id) AS fd FROM tk GROUP BY t), "
            "nn AS (SELECT fd AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_new_types FROM fo GROUP BY 1), "
            "b AS (SELECT pd.doc_id, pd.n_tokens, coalesce(nn.n_new_types, 0) AS n_new_types "
            "FROM pd LEFT JOIN nn ON pd.doc_id = nn.doc_id) "
            "SELECT doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum_tokens, "
            "n_new_types, "
            "CAST(SUM(n_new_types) OVER (ORDER BY doc_id) AS BIGINT) AS vocab_size "
            "FROM b ORDER BY doc_id ASC"
        ),
        "tokenizer_fertility": (
            f"WITH d AS (SELECT source, "
            f"CAST(len(list_filter({_TOKS_SQL}, x -> x <> '')) AS BIGINT) AS w, "
            "CAST(len(regexp_extract_all(lower(text), '\\w+|[^\\w\\s]')) AS BIGINT) AS p "
            "FROM documents) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(w) AS BIGINT) AS n_words, CAST(SUM(p) AS BIGINT) AS n_pieces, "
            "round(CAST(SUM(p) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS fertility "
            "FROM d GROUP BY source ORDER BY source ASC"
        ),
        "domain_balance_weights": (
            f"WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            f"CAST(SUM(len(list_filter({_TOKS_SQL}, x -> x <> ''))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY source), "
            "t AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tt, "
            "SUM(power(CAST(n_tokens AS DOUBLE), 0.5)) AS dd FROM c) "
            "SELECT source, n_docs, n_tokens, "
            "round(CAST(n_tokens AS DOUBLE) / tt, 6) AS token_share, "
            "round(power(CAST(n_tokens AS DOUBLE), 0.5) / dd, 6) AS target_share, "
            "round((power(CAST(n_tokens AS DOUBLE), 0.5) / dd) "
            "/ (CAST(n_tokens AS DOUBLE) / tt), 6) AS weight "
            "FROM c CROSS JOIN t ORDER BY source ASC"
        ),
        "embedding_outliers": (
            "WITH e AS (SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS x, "
            "unnest(generate_series(0, len(embedding) - 1)) AS idx FROM embeddings), "
            "a AS (SELECT label, idx, COUNT(*) AS n, "
            "CAST(SUM(CAST(x AS DECIMAL(28,10))) AS DOUBLE) AS s FROM e GROUP BY label, idx), "
            "c AS (SELECT label, idx, CAST(CAST(round(round(s / n, 6) * 1000000) AS BIGINT) "
            "AS DOUBLE) / 1000000.0 AS cc FROM a), "
            "d AS (SELECT e.vec_id, e.label, round(CAST(SUM(CAST((x - cc) * (x - cc) "
            "AS DECIMAL(38,12))) AS DOUBLE), 6) AS sq_dist "
            "FROM e JOIN c ON e.label = c.label AND e.idx = c.idx "
            "GROUP BY e.vec_id, e.label), "
            "r AS (SELECT vec_id, label, sq_dist, CAST(row_number() OVER "
            "(PARTITION BY label ORDER BY sq_dist DESC, vec_id ASC) AS INT) AS dist_rank "
            "FROM d) "
            "SELECT vec_id, label, sq_dist, dist_rank FROM r WHERE dist_rank <= 5 "
            "ORDER BY label ASC, dist_rank ASC"
        ),
        "scd2_event_history": (
            "WITH e AS (SELECT user_id AS visitorid, event_type AS event, "
            "ts AS event_time, event_id FROM events), "
            "m AS (SELECT visitorid, event, event_time, event_id, "
            "CASE WHEN row_number() OVER w = 1 "
            "OR NOT (event IS NOT DISTINCT FROM lag(event) OVER w) "
            "THEN 1 ELSE 0 END AS isn FROM e "
            "WINDOW w AS (PARTITION BY visitorid ORDER BY event_time ASC, event_id ASC)), "
            "v AS (SELECT visitorid, event, event_time, "
            "CAST(SUM(isn) OVER (PARTITION BY visitorid "
            "ORDER BY event_time ASC, event_id ASC) AS INT) AS version FROM m), "
            "r AS (SELECT visitorid, version, MIN(event) AS event, "
            "MIN(event_time) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_events "
            "FROM v GROUP BY visitorid, version) "
            "SELECT visitorid, version, event, valid_from, "
            "lead(valid_from) OVER (PARTITION BY visitorid ORDER BY version ASC) AS valid_to, "
            "n_events FROM r ORDER BY visitorid ASC, version ASC"
        ),
        "first_touch_funnel": (
            "WITH g AS (SELECT user_id AS visitorid, "
            "MIN(ts) FILTER (WHERE event_type = 'view') AS m0, "
            "MIN(ts) FILTER (WHERE event_type = 'click') AS m1, "
            "MIN(ts) FILTER (WHERE event_type = 'purchase') AS m2 "
            "FROM events GROUP BY user_id), "
            "k AS (SELECT visitorid, m0, m1, m2, "
            "CAST(CASE WHEN m0 IS NULL THEN 0 "
            "WHEN m1 IS NULL OR m1 < m0 THEN 1 "
            "WHEN m2 IS NULL OR m2 < m1 THEN 2 ELSE 3 END AS INT) AS steps_reached "
            "FROM g) "
            "SELECT visitorid, steps_reached, "
            "CASE WHEN steps_reached > 0 THEN m0 END AS view_time, "
            "CASE WHEN steps_reached > 1 THEN m1 END AS click_time, "
            "CASE WHEN steps_reached > 2 THEN m2 END AS purchase_time "
            "FROM k ORDER BY visitorid ASC"
        ),
        "first_touch_attribution": (
            "WITH ev2 AS (SELECT user_id AS visitorid, event_type AS event, "
            "ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "conv AS (SELECT visitorid AS cv, event_time AS ct, event_id AS cid "
            "FROM ev2 WHERE event = 'purchase'), "
            "touch AS (SELECT visitorid AS tv, event_time AS tt, event_id AS tid, itemid "
            "FROM ev2 WHERE event = 'view' AND itemid IS NOT NULL), "
            "pairs AS (SELECT cid, itemid, tt, tid FROM conv JOIN touch ON cv = tv "
            "AND tt < ct AND tt >= ct - INTERVAL 86400 SECOND), "
            "ranked AS (SELECT cid, itemid, row_number() OVER "
            "(PARTITION BY cid ORDER BY tt ASC, tid ASC) AS r FROM pairs) "
            "SELECT itemid, CAST(COUNT(*) AS BIGINT) AS conversions "
            "FROM ranked WHERE r = 1 GROUP BY itemid"
        ),
        "decay_attribution": (
            "WITH ev2 AS (SELECT user_id AS visitorid, event_type AS event, "
            "ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "conv AS (SELECT visitorid AS cv, event_time AS ct, event_id AS cid "
            "FROM ev2 WHERE event = 'purchase'), "
            "touch AS (SELECT visitorid AS tv, event_time AS tt, event_id AS tid, itemid "
            "FROM ev2 WHERE event = 'view' AND itemid IS NOT NULL), "
            "pairs AS (SELECT cid, itemid, tt, tid FROM conv JOIN touch ON cv = tv "
            "AND tt < ct AND tt >= ct - INTERVAL 86400 SECOND), "
            "ranked AS (SELECT cid, itemid, row_number() OVER "
            "(PARTITION BY cid ORDER BY tt DESC, tid ASC) AS r FROM pairs), "
            "kept AS (SELECT * FROM ranked WHERE r <= 20), "
            "fan AS (SELECT cid AS fcid, COUNT(*) AS m FROM kept GROUP BY 1) "
            "SELECT itemid, CAST(COUNT(DISTINCT cid) AS BIGINT) AS conversions_touched, "
            "round(CAST(SUM(CAST(round("
            "CAST(CAST(1 AS BIGINT) << (m - r) AS DOUBLE) / "
            "CAST((CAST(1 AS BIGINT) << m) - 1 AS DOUBLE), 12) AS DECIMAL(18,12))) "
            "AS DOUBLE), 6) AS credit "
            "FROM kept JOIN fan ON cid = fcid GROUP BY itemid"
        ),
        "heavy_hitter_items": (
            f"WITH {_EV}, "
            "src AS (SELECT itemid FROM ev WHERE itemid IS NOT NULL), "
            "n AS (SELECT COUNT(*) AS N FROM src) "
            "SELECT itemid, CAST(COUNT(*) AS BIGINT) AS exact_count, "
            "CAST((1000000 * COUNT(*)) // (SELECT N FROM n) AS BIGINT) AS share_ppm_floor "
            "FROM src GROUP BY itemid "
            "HAVING 1000000 * COUNT(*) >= 2000 * (SELECT N FROM n)"
        ),
        "heavy_hitter_tokens": (
            f"WITH tk AS (SELECT unnest({_TOKS_SQL}) AS token FROM documents), "
            "src AS (SELECT token FROM tk WHERE token <> ''), "
            "n AS (SELECT COUNT(*) AS N FROM src) "
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count, "
            "CAST((1000000 * COUNT(*)) // (SELECT N FROM n) AS BIGINT) AS share_ppm_floor "
            "FROM src GROUP BY token "
            "HAVING 1000000 * COUNT(*) >= 5000 * (SELECT N FROM n)"
        ),
        "snapshot_diff": (
            f"WITH o AS (SELECT doc_id, md5({_NORM_TEXT_SQL}) AS od, source AS os "
            "FROM documents WHERE doc_id % 10 <> 0), "
            "n0 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text, "
            "source FROM documents WHERE doc_id % 11 <> 0), "
            "n AS (SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS nd, "
            "source AS ns FROM n0), "
            "j AS (SELECT coalesce(ns, os) AS source, "
            "CASE WHEN os IS NULL THEN 'added' WHEN ns IS NULL THEN 'removed' "
            "WHEN NOT (od IS NOT DISTINCT FROM nd) THEN 'changed' ELSE 'unchanged' END AS st "
            "FROM o FULL OUTER JOIN n USING (doc_id)), "
            "g AS (SELECT source, "
            "CAST(COUNT(*) FILTER (WHERE st = 'added') AS BIGINT) AS n_added, "
            "CAST(COUNT(*) FILTER (WHERE st = 'removed') AS BIGINT) AS n_removed, "
            "CAST(COUNT(*) FILTER (WHERE st = 'changed') AS BIGINT) AS n_changed, "
            "CAST(COUNT(*) FILTER (WHERE st = 'unchanged') AS BIGINT) AS n_unchanged "
            "FROM j GROUP BY source) "
            "SELECT source, n_added, n_removed, n_changed, n_unchanged, "
            "round((n_added + n_removed + n_changed) / "
            "CAST(n_added + n_removed + n_changed + n_unchanged AS DOUBLE), 6) AS churn "
            "FROM g ORDER BY source ASC"
        ),
        "distinctive_terms": (
            f"WITH tk AS (SELECT source, unnest({_TOKS_SQL}) AS term FROM documents), "
            "st AS (SELECT source, term, COUNT(*) AS c FROM tk WHERE term <> '' "
            "GROUP BY source, term), "
            "w AS (SELECT source, term, c, "
            "SUM(c) OVER (PARTITION BY term) AS ct, "
            "SUM(c) OVER (PARTITION BY source) AS ns, "
            "SUM(c) OVER () AS n FROM st), "
            "sc AS (SELECT source, term, CAST(c AS BIGINT) AS n_source, "
            "CAST(ct - c AS BIGINT) AS n_rest, "
            "CAST(CAST(c + 1 AS HUGEINT) * CAST((n - ns) - (ct - c) + 1 AS HUGEINT) "
            "* 1000000 // (CAST(ns - c + 1 AS HUGEINT) * CAST(ct - c + 1 AS HUGEINT)) "
            "AS BIGINT) AS odds_ppm FROM w WHERE c >= 3), "
            "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source "
            "ORDER BY odds_ppm DESC, term ASC) AS INT) AS rank FROM sc) "
            "SELECT source, term, n_source, n_rest, odds_ppm, rank FROM r "
            "WHERE rank <= 5 ORDER BY source ASC, rank ASC"
        ),
        "graph_triangles": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "p AS (SELECT visitorid, itemid AS src, LEAD(itemid) OVER "
            "(PARTITION BY visitorid ORDER BY event_time, event_id) AS dst "
            "FROM ev WHERE itemid IS NOT NULL), "
            "t AS (SELECT src, dst, COUNT(*) AS c FROM p WHERE dst IS NOT NULL GROUP BY 1, 2), "
            "pr AS (SELECT src, dst FROM t WHERE c >= 2 AND src <> dst), "
            "e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM pr), "
            "deg AS (SELECT n, COUNT(*) AS d FROM "
            "(SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n), "
            "tri AS (SELECT COUNT(*) AS n_triangles FROM e e1 "
            "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, "
            "CAST(SUM(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg), "
            "ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e) "
            "SELECT n_nodes, n_edges, CAST(n_triangles AS BIGINT) AS n_triangles, "
            "n_wedges, round(3.0 * n_triangles / CAST(n_wedges AS DOUBLE), 6) "
            "AS transitivity FROM st CROSS JOIN ec CROSS JOIN tri"
        ),
        "neardup_histogram": (
            f"WITH {_minhash_cte()}, "
            "bkt AS (SELECT least(CAST(floor(jaccard * 20) AS INT), 19) AS bucket, "
            "est_jaccard, jaccard FROM verified), "
            "g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
            "round(CAST(SUM(CAST(est_jaccard - jaccard AS DECIMAL(9,6))) AS DOUBLE) "
            "/ COUNT(*), 6) AS mean_est_error FROM bkt GROUP BY bucket) "
            "SELECT bucket, round(bucket / 20.0, 6) AS bucket_start, n_pairs, "
            "mean_est_error FROM g ORDER BY bucket ASC"
        ),
        "langid_confusion": _langid_confusion_sql(),
        # --- round 8 ---
        "position_attribution": (
            "WITH ev2 AS (SELECT user_id AS visitorid, event_type AS event, "
            "ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "conv AS (SELECT visitorid AS cv, event_time AS ct, event_id AS cid "
            "FROM ev2 WHERE event = 'purchase'), "
            "touch AS (SELECT visitorid AS tv, event_time AS tt, event_id AS tid, itemid "
            "FROM ev2 WHERE event = 'view' AND itemid IS NOT NULL), "
            "pairs AS (SELECT cid, itemid, tt, tid FROM conv JOIN touch ON cv = tv "
            "AND tt < ct AND tt >= ct - INTERVAL 86400 SECOND), "
            "ranked AS (SELECT cid, itemid, row_number() OVER "
            "(PARTITION BY cid ORDER BY tt DESC, tid ASC) AS rr FROM pairs), "
            "kept AS (SELECT * FROM ranked WHERE rr <= 20), "
            "fan AS (SELECT cid AS fcid, COUNT(*) AS m FROM kept GROUP BY 1), "
            "cred AS (SELECT cid, itemid, CASE WHEN m = 1 THEN 1000000 "
            "WHEN m = 2 THEN 500000 "
            "WHEN (m - rr + 1) = 1 THEN 400000 WHEN (m - rr + 1) = m THEN 400000 "
            "ELSE 200000 // (m - 2) END AS ppm FROM kept JOIN fan ON cid = fcid) "
            "SELECT itemid, CAST(COUNT(DISTINCT cid) AS BIGINT) AS conversions_touched, "
            "CAST(SUM(ppm) AS BIGINT) AS credit_ppm FROM cred GROUP BY itemid"
        ),
        "cart_abandonment": (
            f"WITH {_EV}, "
            "per AS (SELECT itemid, visitorid, "
            "MAX(CASE WHEN event = 'view' THEN 1 ELSE 0 END) AS v, "
            "MAX(CASE WHEN event = 'purchase' THEN 1 ELSE 0 END) AS p "
            "FROM ev WHERE itemid IS NOT NULL AND event IN ('view', 'purchase') "
            "GROUP BY 1, 2) "
            "SELECT itemid, CAST(COUNT(*) AS BIGINT) AS n_viewers, "
            "CAST(SUM(p) AS BIGINT) AS n_buyers, "
            "CAST(COUNT(*) - SUM(p) AS BIGINT) AS n_abandoned, "
            "round((COUNT(*) - SUM(p)) / CAST(COUNT(*) AS DOUBLE), 6) "
            "AS abandonment_rate FROM per WHERE v = 1 GROUP BY itemid"
        ),
        "repeat_purchase_rate": (
            f"WITH {_EV}, "
            "per AS (SELECT itemid, visitorid, COUNT(*) AS n FROM ev "
            "WHERE event = 'purchase' AND itemid IS NOT NULL GROUP BY 1, 2) "
            "SELECT itemid, CAST(COUNT(*) AS BIGINT) AS n_buyers, "
            "CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_buyers, "
            "CAST(SUM(n) AS BIGINT) AS n_purchases, "
            "round(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) "
            "AS repeat_rate FROM per GROUP BY itemid"
        ),
        "skipgram_pmi": (
            # position distance uses ORIGINAL indices (empty tokens filtered
            # as endpoints only), mirroring the zip_with shifted slices
            f"WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "p1 AS (SELECT doc_id, i, toks[i] AS t FROM tk, "
            "LATERAL UNNEST(generate_series(1, len(toks))) AS g(i) "
            "WHERE toks[i] <> ''), "
            "pr AS (SELECT least(a.t, b.t) AS ta, greatest(a.t, b.t) AS tb, "
            "COUNT(*) AS np FROM p1 a JOIN p1 b ON a.doc_id = b.doc_id "
            "AND b.i > a.i AND b.i <= a.i + 3 "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 5), "
            "uni AS (SELECT t AS tok, COUNT(*) AS c FROM p1 GROUP BY 1), "
            "tot AS (SELECT CAST(SUM(c) AS HUGEINT) AS n FROM uni) "
            "SELECT pr.ta AS token_a, pr.tb AS token_b, CAST(np AS BIGINT) AS n_pair, "
            "CAST((CAST(np AS HUGEINT) * n * 1000000) // "
            "(CAST(ua.c AS HUGEINT) * CAST(ub.c AS HUGEINT)) AS BIGINT) AS score_ppm "
            "FROM pr JOIN uni ua ON pr.ta = ua.tok JOIN uni ub ON pr.tb = ub.tok "
            "CROSS JOIN tot "
            "ORDER BY score_ppm DESC, token_a ASC, token_b ASC LIMIT 100"
        ),
        "token_coverage_topk": (
            f"WITH tk AS (SELECT unnest({_TOKS_SQL}) AS t FROM documents), "
            "cnt AS (SELECT t, COUNT(*) AS c FROM tk WHERE t <> '' GROUP BY 1), "
            "tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total_tokens FROM cnt), "
            "ks AS ("
            "SELECT CAST(10 AS BIGINT) AS k, CAST(COALESCE((SELECT SUM(c) FROM "
            "(SELECT c FROM cnt ORDER BY c DESC, t ASC LIMIT 10)), 0) AS BIGINT) AS covered_tokens "
            "UNION ALL SELECT 100, CAST(COALESCE((SELECT SUM(c) FROM "
            "(SELECT c FROM cnt ORDER BY c DESC, t ASC LIMIT 100)), 0) AS BIGINT) "
            "UNION ALL SELECT 1000, CAST(COALESCE((SELECT SUM(c) FROM "
            "(SELECT c FROM cnt ORDER BY c DESC, t ASC LIMIT 1000)), 0) AS BIGINT)) "
            "SELECT k, covered_tokens, total_tokens, "
            "round(covered_tokens / CAST(total_tokens AS DOUBLE), 6) AS coverage "
            "FROM ks CROSS JOIN tot"
        ),
        "pii_rate_by_source": (
            "WITH s1 AS (SELECT source, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS ne, "
            "regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<email>', 'g') AS t1 "
            "FROM documents), "
            "s2 AS (SELECT source, ne, "
            "CAST(len(regexp_extract_all(t1, '\\d{3}-\\d{2}-\\d{4}')) AS INT) AS ns, "
            "regexp_replace(t1, '\\d{3}-\\d{2}-\\d{4}', '<ssn>', 'g') AS t2 FROM s1), "
            "s3 AS (SELECT source, ne, ns, "
            "CAST(len(regexp_extract_all(t2, '\\+?\\d{3}[-. ]\\d{3}[-. ]\\d{4}')) AS INT) AS np "
            "FROM s2) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(ne) AS BIGINT) AS n_email, "
            "CAST(SUM(ns) AS BIGINT) AS n_ssn, "
            "CAST(SUM(np) AS BIGINT) AS n_phone, "
            "CAST(SUM(CASE WHEN ne + ns + np > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_docs, "
            "round(SUM(CASE WHEN ne + ns + np > 0 THEN 1 ELSE 0 END) / "
            "CAST(COUNT(*) AS DOUBLE), 6) AS pii_doc_rate "
            "FROM s3 GROUP BY source"
        ),
        "dedup_token_savings": (
            f"WITH per AS (SELECT source, doc_id, md5({_NORM_TEXT_SQL}) AS fp, "
            f"CAST(len({_TOKS_SQL}) AS BIGINT) AS tok FROM documents), "
            "fl AS (SELECT source, tok, CASE WHEN doc_id = "
            "MIN(doc_id) OVER (PARTITION BY fp) THEN 1 ELSE 0 END AS keep FROM per) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(tok) AS BIGINT) AS n_tokens, "
            "CAST(SUM(keep) AS BIGINT) AS n_kept_docs, "
            "CAST(SUM(tok * keep) AS BIGINT) AS kept_tokens, "
            "round((SUM(tok) - SUM(tok * keep)) / CAST(SUM(tok) AS DOUBLE), 6) "
            "AS token_savings_rate FROM fl GROUP BY source"
        ),
        "quantization_error_stats": (
            "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), "
            "m AS (SELECT label, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e), "
            "s AS (SELECT label, v, round(CASE WHEN mx = 0 THEN 1.0 "
            "ELSE 127.0 / mx END, 6) AS scale FROM m), "
            "c AS (SELECT label, scale, i, v[i] AS x FROM s, "
            "LATERAL UNNEST(generate_series(1, len(v))) AS g(i)) "
            "SELECT label, "
            "CAST(SUM(CASE WHEN i = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_vectors, "
            "CAST(COUNT(*) AS BIGINT) AS n_components, "
            "CAST(SUM(CASE WHEN abs(round(x * scale)) = 127 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_saturated, "
            "round(MAX(abs(x - round(x * scale) / scale)), 9) AS max_abs_err "
            "FROM c GROUP BY label"
        ),
        "multimodal_video": (
            "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS n_frames, "
            "CAST(octet_length(encode(text)) * 40 AS BIGINT) AS duration_ms, "
            "CAST(160 * (1 + octet_length(encode(text)) % 4) AS BIGINT) AS width, "
            "CAST(120 * (1 + octet_length(encode(text)) % 4) AS BIGINT) AS height "
            "FROM documents"
        ),
        "multimodal_audio": (
            "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "CAST(8000 * (1 + octet_length(encode(text)) % 3) AS BIGINT) AS sample_rate, "
            "CAST(1 + octet_length(encode(text)) % 2 AS BIGINT) AS n_channels, "
            "CAST(octet_length(encode(text)) * 50 AS BIGINT) AS n_samples, "
            "CAST((octet_length(encode(text)) * CAST(50000 AS BIGINT)) // "
            "(8000 * (1 + octet_length(encode(text)) % 3)) AS BIGINT) AS duration_ms "
            "FROM documents"
        ),
        "path_conversion_rates": (
            "WITH ev AS (SELECT user_id AS visitorid, event_type AS event, "
            "ts AS event_time, event_id FROM events), "
            "lagged AS (SELECT *, lag(event_time) OVER "
            "(PARTITION BY visitorid ORDER BY event_time) AS prev_t FROM ev), "
            "flagged AS (SELECT *, CASE WHEN prev_t IS NULL OR "
            "date_diff('second', prev_t, event_time) > 1800 THEN 1 ELSE 0 END "
            "AS is_new FROM lagged), "
            "sz AS (SELECT *, CAST(visitorid AS VARCHAR) || '_' || "
            "CAST(SUM(is_new) OVER (PARTITION BY visitorid ORDER BY event_time "
            "ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS session_id FROM flagged), "
            "per AS (SELECT session_id, array_to_string("
            "(list(event ORDER BY event_time, event_id))[1:3], '>') AS path_prefix, "
            "MAX(CASE WHEN event = 'purchase' THEN 1 ELSE 0 END) AS c "
            "FROM sz GROUP BY session_id) "
            "SELECT path_prefix, CAST(COUNT(*) AS BIGINT) AS n_sessions, "
            "CAST(SUM(c) AS BIGINT) AS n_converted, "
            "round(SUM(c) / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate "
            "FROM per GROUP BY path_prefix"
        ),
        "returning_visitor_rate": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time FROM events), "
            "per AS (SELECT visitorid, COUNT(DISTINCT CAST(event_time AS DATE)) AS d "
            "FROM ev GROUP BY 1) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_visitors, "
            "CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_returning, "
            "round(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) / "
            "CAST(COUNT(*) AS DOUBLE), 6) AS returning_rate FROM per"
        ),
        "contamination_by_split": (
            f"WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents), "
            "g AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS gram "
            "FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(toks) - 4, 0))) AS t(i)), "
            "bench AS (SELECT DISTINCT gram FROM g WHERE "
            f"{portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} "
            "% 1000000 < 200000), "
            "m AS (SELECT DISTINCT d.doc_id, d.gram FROM g d JOIN bench b ON d.gram = b.gram), "
            "c AS (SELECT doc_id, COUNT(*) AS matched FROM m GROUP BY doc_id), "
            "rep AS (SELECT d.doc_id, COALESCE(c.matched, 0) > 0 AS contaminated, "
            f"{portable.phash60_sql(chr(39) + '7:' + chr(39) + ' || CAST(d.doc_id AS VARCHAR)')} "
            "% 1000000 AS h FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id), "
            "sp AS (SELECT CASE WHEN h < 980000 THEN 'train' "
            "WHEN h < 990000 THEN 'val' ELSE 'test' END AS split, contaminated FROM rep) "
            "SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated, "
            "round(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) / "
            "CAST(COUNT(*) AS DOUBLE), 6) AS contamination_rate "
            "FROM sp GROUP BY split"
        ),
        "neardup_cluster_sizes": _clusters_sql(
            threshold=0.9,
            wrap=(
                "SELECT CAST(s AS BIGINT) AS cluster_size, "
                "CAST(COUNT(*) AS BIGINT) AS n_clusters, "
                "CAST(SUM(s) AS BIGINT) AS n_docs FROM "
                "(SELECT cluster_id, COUNT(*) AS s FROM cl GROUP BY 1) "
                "GROUP BY s"
            ),
        ),
        "lsh_band_census": (
            f"WITH {_minhash_cte()} "
            "SELECT CAST(n AS BIGINT) AS bucket_size, "
            "CAST(COUNT(*) AS BIGINT) AS n_buckets, "
            "CAST(SUM(n) AS BIGINT) AS n_rows FROM "
            "(SELECT band_idx, band_key, COUNT(*) AS n FROM bnd GROUP BY 1, 2) "
            "GROUP BY 1"
        ),
        "decile_revenue_share": (
            "WITH spend AS (SELECT o_custkey, "
            "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "d AS (SELECT o_custkey, cents, "
            "ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile FROM spend), "
            "per AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers, "
            "CAST(SUM(cents) AS BIGINT) AS cents FROM d GROUP BY 1) "
            "SELECT decile, n_customers, cents / 10000.0 AS revenue, "
            "round(CAST(cents AS DOUBLE) / CAST((SELECT SUM(cents) FROM per) AS DOUBLE), 6) "
            "AS revenue_share FROM per"
        ),
        "item_revisit_time": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id, "
            "CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS itemid FROM events), "
            "g AS (SELECT itemid, date_diff('second', event_time, "
            "lead(event_time) OVER (PARTITION BY visitorid, itemid "
            "ORDER BY event_time, event_id)) AS gap "
            "FROM ev WHERE itemid IS NOT NULL) "
            "SELECT itemid, CAST(COUNT(*) AS BIGINT) AS n_revisits, "
            "round(AVG(gap), 6) AS avg_revisit_s, "
            "CAST(MAX(gap) AS BIGINT) AS max_revisit_s "
            "FROM g WHERE gap IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 5"
        ),
        "session_gap_histogram": (
            "WITH ev AS (SELECT user_id AS visitorid, ts AS event_time, event_id "
            "FROM events), "
            "g AS (SELECT date_diff('second', event_time, "
            "lead(event_time) OVER (PARTITION BY visitorid "
            "ORDER BY event_time, event_id)) AS gap FROM ev), "
            "b AS (SELECT CAST(floor(log2(gap + 1)) AS BIGINT) AS gap_bucket "
            "FROM g WHERE gap IS NOT NULL) "
            "SELECT gap_bucket, "
            "CAST(pow(2.0, gap_bucket) - 1 AS BIGINT) AS bucket_min_s, "
            "CAST(COUNT(*) AS BIGINT) AS n_gaps FROM b GROUP BY 1"
        ),
    }

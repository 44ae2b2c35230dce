"""Stream-stream joins — the attribution pattern the reference cannot
express (its foreachBatch fan-out only sees one stream per batch).

Spark's watermarked stream-stream inner join keeps both sides' state only
as long as the time-range condition plus watermark require: a view can
only match purchases in [view_time, view_time + horizon], so view state is
dropped once the purchase-side watermark passes view_time + horizon, and
purchase state once the view-side watermark passes purchase_time. Bounded
state at any scale — this is exactly the join the engine should use for
conversion attribution instead of a periodic batch re-join.

The same plan runs in batch mode (watermarks are no-ops there), which is
how the driver oracle-checks it against a DuckDB BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    by: str = "visitorid",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Views joined to same-``by`` purchases within ``horizon`` AFTER the
    view (inclusive on both ends) — the view→purchase conversion join.

    Output: (by, view_time, view_item, purchase_time, purchase_item).
    Both inputs need an ``event_time`` and ``itemid`` column; watermarks
    bound the join state on both sides (see module docstring).
    """
    v = views.withWatermark("event_time", watermark).select(
        F.col(by),
        F.col("event_time").alias("view_time"),
        F.col("itemid").alias("view_item"),
    )
    p = purchases.withWatermark("event_time", watermark).select(
        F.col(by).alias("__p_key"),
        F.col("event_time").alias("purchase_time"),
        F.col("itemid").alias("purchase_item"),
    )
    return v.join(
        p,
        (F.col(by) == F.col("__p_key"))
        & (F.col("purchase_time") >= F.col("view_time"))
        & (
            F.col("purchase_time")
            <= F.col("view_time") + F.expr(f"INTERVAL {horizon}")
        ),
        "inner",
    ).drop("__p_key")


def attribution_join_outer(
    views: DataFrame,
    purchases: DataFrame,
    by: str = "visitorid",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER variant of :func:`attribution_join`: every view appears,
    with NULL purchase columns when no same-``by`` purchase lands within
    ``horizon`` — the form a conversion-RATE analysis needs (the inner join
    cannot distinguish "no conversion" from "not yet seen").

    Streaming semantics: Spark emits the unmatched (NULL-extended) view row
    only after the watermark guarantees no matching purchase can still
    arrive — so outer results trail the watermark by design. The identical
    plan in batch mode is a plain left join (how the oracle checks it)."""
    v = views.withWatermark("event_time", watermark).select(
        F.col(by),
        F.col("event_time").alias("view_time"),
        F.col("itemid").alias("view_item"),
    )
    p = purchases.withWatermark("event_time", watermark).select(
        F.col(by).alias("__p_key"),
        F.col("event_time").alias("purchase_time"),
        F.col("itemid").alias("purchase_item"),
    )
    return v.join(
        p,
        (F.col(by) == F.col("__p_key"))
        & (F.col("purchase_time") >= F.col("view_time"))
        & (
            F.col("purchase_time")
            <= F.col("view_time") + F.expr(f"INTERVAL {horizon}")
        ),
        "left_outer",
    ).drop("__p_key")


def conversion_rate_by_item(
    views: DataFrame,
    purchases: DataFrame,
    by: str = "visitorid",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-item view→purchase conversion within ``horizon``, built on the
    OUTER attribution join (the inner join cannot see unconverted views, so
    it cannot compute a rate). A view counts as converted if ANY
    same-visitor purchase lands in its horizon; multiple purchases per
    view count the view once (distinct view identity = (by, view_time,
    view_item)).

    Output: (view_item, n_views, n_converted, conversion_rate). Rate
    rounded to 6 decimals. One aggregation over the join output.

    This GLOBAL-rate form is for batch / foreachBatch use: the final
    groupBy(view_item) drops the watermark column, which streaming append
    mode rejects (unbounded state). The streaming form is
    :func:`windowed_conversion_rate`, which keeps a time window in the
    keys."""
    j = attribution_join_outer(views, purchases, by, horizon, watermark)
    per_view = j.groupBy(by, "view_time", "view_item").agg(
        F.max(F.col("purchase_time").isNotNull()).alias("__converted")
    )
    return per_view.groupBy("view_item").agg(
        F.count("*").alias("n_views"),
        F.sum(F.col("__converted").cast("long")).alias("n_converted"),
        F.round(
            F.sum(F.col("__converted").cast("long")) / F.count("*"), 6
        ).alias("conversion_rate"),
    )


def windowed_conversion_rate(
    views: DataFrame,
    purchases: DataFrame,
    by: str = "visitorid",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Streaming-appendable conversion rate: per (tumbling ``window`` of
    view time, item). Both aggregations keep the watermarked view_time in
    their keys (first at event grain, then windowed), so state is evicted
    as the watermark advances and append mode emits each window once it
    closes. Identical math to :func:`conversion_rate_by_item` within each
    window; the same plan runs in batch for the oracle check.

    Output: (window_start, view_item, n_views, n_converted,
    conversion_rate)."""
    j = attribution_join_outer(views, purchases, by, horizon, watermark)
    per_view = j.groupBy(by, "view_time", "view_item").agg(
        F.max(F.col("purchase_time").isNotNull()).alias("__converted")
    )
    conv = F.sum(F.col("__converted").cast("long"))
    return (
        per_view.groupBy(F.window("view_time", window), "view_item")
        .agg(
            F.count("*").alias("n_views"),
            conv.alias("n_converted"),
            F.round(conv / F.count("*"), 6).alias("conversion_rate"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "view_item",
            "n_views",
            "n_converted",
            "conversion_rate",
        )
    )

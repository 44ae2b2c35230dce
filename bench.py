"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the `noop` sink — full distributed compute,
no driver-side collect bottleneck (mirrors writing to a real sink).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from clickestream_project_bigdata_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "sessions",
    "user_paths",
    "funnel_analysis",
    "events_per_minute",
    "active_users",
    "event_type_distribution",
    "bounce_rate",
    "top_items",
    "item_interactions",
    "most_viewed_items",
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_revenue_by_nation",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + sorted(n for n in qs if n not in HEADLINE)

    # Untimed JIT/reader warmup: touch the parquet reader, codegen, and the
    # noop sink once so the first timed query isn't charged JVM startup.
    from clickestream_project_bigdata_spark.sources.readers import events_from_fixture

    events_from_fixture(spark, sf_dir).limit(1000).groupBy("event").count().write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        # plan construction INSIDE the timed region: iterative operators
        # (connected components, the curation pipeline) run driver-side
        # actions while building their result frame, and timing only the
        # final write would under-report them.
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # Full replay: all 10 reference analyses over the whole events table as
    # one batch through the foreachBatch driver (BASELINE.md throughput goal:
    # minutes, not the reference's throttled ~76 h).
    from clickestream_project_bigdata_spark.streaming import NoopSink
    from clickestream_project_bigdata_spark.streaming.driver import run_all_analyses

    events = events_from_fixture(spark, sf_dir)
    t0 = time.time()
    run_all_analyses(
        events,
        0,
        NoopSink(),
        funnel_steps=["view", "click", "purchase"],
        max_parallel_sinks=6,
    )
    timings["replay_all_10_analyses"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Per-action-floor decomposition for `customer_value_deciles` (VERDICT
r11 next-#2, route b).

The query has straddled the 2.0x bar at the 100x checkpoint for three
rounds while every structural probe says the plan is right: zero window
nodes, no global sort, straggler ~1.06, three cutpoint respellings built
and measured SLOWER (SCALING.md r11), pre-materialization neutral. The
remaining hypothesis is the per-ACTION scheduling floor: the pipeline is
4 actions deep (range-exchange checkpoint write, offsets collect,
final broadcast-join write, plus the harness's noop save) and local-mode
Spark charges each action a fixed scheduling/codegen cost that the
in-process DuckDB control never pays.

This tool puts a number on that floor by running the IDENTICAL pipeline
over a ~zero-data input: `orders.limit(1000)` at the 100x recode — same
four actions, same stages, same checkpoint/collect/broadcast machinery,
but only 1k rows of data work. Its wall is the floor; (full - floor) is
the data work, which is what a 1000-executor cluster actually scales.

Usage: python tools/ntile_floor.py FIXTURE_DIR OUT_JSON
Writes {"floor_sec", "full_sec", "data_work_sec", "control_sec", ...}
under the same warm-rep protocol as tools/scale_check.py.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    fixture, out_path = sys.argv[1], sys.argv[2]

    import bench

    recoded = bench._recode_fixture(fixture)

    from pyspark.sql import functions as F

    from clickestream_project_bigdata_spark.operators.analytics import (
        customer_value_deciles,
    )
    from clickestream_project_bigdata_spark.session import get_spark
    from clickestream_project_bigdata_spark.sources.readers import (
        read_parquet_table,
    )

    spark = get_spark("ntile_floor")
    spark.sparkContext.setLogLevel("ERROR")
    orders = read_parquet_table(spark, recoded, "orders")
    # untimed warmup: parquet reader + codegen + noop sink
    orders.limit(1000).groupBy("o_custkey").count().write.format("noop").mode(
        "overwrite"
    ).save()

    def timed(df_fn) -> dict:
        """One warm rep, then median of 2 post-warm reps (scale_check
        protocol); the SQL cache is dropped between reps so each rep pays
        its own checkpoint."""
        reps = []
        for _ in range(3):
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        return {"sec": statistics.median(reps[1:]), "warm_sec": reps[0],
                "reps": reps[1:]}

    load0 = [round(x, 2) for x in os.getloadavg()]
    # floor: identical 4-action pipeline, ~zero data. limit(1000) (not an
    # empty filter: N == 0 short-circuits before the broadcast-join pass,
    # which would drop an action from the decomposition).
    floor = timed(lambda: customer_value_deciles(orders.limit(1000)))
    full = timed(lambda: customer_value_deciles(orders))

    # the co-run DuckDB control, same subprocess protocol as scale_check
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scale_check.py"),
         "--control-one", recoded, "customer_value_deciles"],
        capture_output=True, text=True, timeout=900,
    )
    ctrl = json.loads(p.stdout.strip().splitlines()[-1]) if p.returncode == 0 else {
        "sec": None, "error": p.stderr[-300:]}

    data_work = round(full["sec"] - floor["sec"], 3)
    artifact = {
        "fixture": fixture,
        "recoded": recoded,
        "loadavg_at_start": load0,
        "method": (
            "floor = customer_value_deciles(orders.limit(1000)) — the "
            "identical 4-action pipeline (range-exchange checkpoint, "
            "offsets collect, broadcast-join write, noop save) over 1k "
            "rows, so its wall is pure per-action scheduling/codegen "
            "overhead; data_work = full - floor; warm-rep protocol "
            "(1 warm + median of 2) for every row incl. the DuckDB "
            "control subprocess"
        ),
        "floor": floor,
        "full": full,
        "control": ctrl,
        "data_work_sec": data_work,
        "ratio_full_vs_control": (
            round(full["sec"] / ctrl["sec"], 3) if ctrl.get("sec") else None
        ),
        "ratio_data_work_vs_control": (
            round(data_work / ctrl["sec"], 3) if ctrl.get("sec") else None
        ),
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps(artifact, indent=1))


if __name__ == "__main__":
    main()

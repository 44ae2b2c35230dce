"""Generic per-action-floor decomposition for 100x checkpoint rows whose
control is small-seconds (VERDICT r12 next-#1 `item_degree_profile`,
next-#5 `position_attribution`; the `customer_value_deciles` precedent is
tools/ntile_floor.py / NTILE_FLOOR.json).

The question a >2x ratio on a 1-2 s control actually poses: is the Spark
wall DATA work (which a 1000-executor cluster scales) or the fixed
per-action/per-stage scheduling+codegen cost of local-mode Spark (which it
amortizes)? This tool answers it by running the IDENTICAL registry query
twice:

* FULL — against the 100x recode (the SCALE100X row);
* FLOOR — against a 1000-row slice of the same tables (same schema, same
  pipeline, same number of actions/stages/exchanges, ~zero data), built
  once into /tmp/floor_1k with DuckDB `COPY (… LIMIT 1000)`.

floor.sec is the pure per-action floor; data_work = full - floor is what
scales; the verdict's adjudication standard is data_work <= control.

Usage: python tools/floor_check.py FIXTURE_DIR OUT_JSON q1,q2[,...]
Appends/overwrites per-query entries in OUT_JSON (same resume-by-artifact
pattern as scale_check, except named queries always re-measure — this is
a targeted measurement tool).
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

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FLOOR_DIR = "/tmp/floor_1k"
FLOOR_ROWS = 1000


def build_floor_fixture(recoded: str) -> str:
    """1000-row slices of every table in the recode — LIMIT, not an empty
    filter: zero-row inputs short-circuit broadcast/collect passes and
    would drop actions from the decomposition (ntile_floor's finding).

    Rebuilt from scratch on every invocation (ADVICE r13): the slices were
    previously keyed only on path existence, so a /tmp/floor_1k surviving
    from a run against a DIFFERENT recode silently skewed the floor
    timings with stale 1000-row slices."""
    import shutil

    import duckdb

    shutil.rmtree(FLOOR_DIR, ignore_errors=True)
    os.makedirs(FLOOR_DIR, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(recoded, f"{t}.parquet")
        dst = os.path.join(FLOOR_DIR, f"{t}.parquet")
        if os.path.exists(src):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') LIMIT {FLOOR_ROWS}) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
    return FLOOR_DIR


def main() -> None:
    fixture, out_path = sys.argv[1], sys.argv[2]
    names = [s for s in sys.argv[3].split(",") if s]

    import bench

    recoded = bench._recode_fixture(fixture)
    floor_dir = build_floor_fixture(recoded)

    import __spark_entry__ as entrymod
    from clickestream_project_bigdata_spark.session import get_spark
    from clickestream_project_bigdata_spark.sources.readers import (
        events_from_fixture,
    )

    spark = get_spark("floor_check")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # untimed warmup: parquet reader, codegen, noop sink
    events_from_fixture(spark, recoded).limit(1000).groupBy("event").count().write.format(
        "noop"
    ).mode("overwrite").save()

    def timed(fn) -> dict:
        """scale_check's warm-rep protocol: 1 warm + median of 2 post-warm;
        SQL cache dropped between reps so each rep pays its own persists."""
        reps = []
        for _ in range(3):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        return {"sec": statistics.median(reps[1:]), "warm_sec": reps[0],
                "reps": reps[1:]}

    results: dict[str, dict] = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh).get("queries", {})

    for name in names:
        q = qs[name]
        load0 = [round(x, 2) for x in os.getloadavg()]
        floor = timed(lambda: q(spark, floor_dir))
        full = timed(lambda: q(spark, recoded))
        # co-run control, same subprocess/budget protocol as scale_check
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "scale_check.py"),
                 "--control-one", recoded, name],
                capture_output=True, text=True, timeout=900,
            )
            ctrl = (
                json.loads(p.stdout.strip().splitlines()[-1])
                if p.returncode == 0
                else {"sec": None, "error": p.stderr[-300:]}
            )
        except subprocess.TimeoutExpired:
            ctrl = {"sec": None, "error": "timeout>900s"}
        if ctrl.get("sec") is None:
            # a SIGKILLed/errored control never cleans its spill files
            # (same accumulation class scale_check's timeout path fixes)
            import shutil as _sh

            _sh.rmtree("/tmp/duckdb_ctrl_tmp", ignore_errors=True)
        data_work = round(full["sec"] - floor["sec"], 3)
        results[name] = {
            "loadavg_at_start": load0,
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
        print(json.dumps({name: results[name]}, indent=1), flush=True)
        with open(out_path, "w") as fh:
            json.dump({
                "fixture": fixture,
                "recoded": recoded,
                "floor_fixture": floor_dir,
                "floor_rows": FLOOR_ROWS,
                "method": (
                    "floor = the identical registry query over 1000-row "
                    "slices of the same tables (same pipeline, same "
                    "actions/stages, ~zero data) — its wall is the pure "
                    "per-action scheduling/codegen floor of local-mode "
                    "Spark; data_work = full - floor is what a cluster "
                    "scales; warm-rep protocol (1 warm + median of 2) for "
                    "every row incl. the co-run DuckDB control subprocess"
                ),
                "queries": results,
            }, fh, indent=1)


if __name__ == "__main__":
    main()

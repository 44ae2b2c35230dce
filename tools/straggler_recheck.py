"""Re-run a few queries at a scale fixture ONLY to capture straggler
telemetry (no DuckDB controls, no artifact overwrite): merges a
``straggler_recheck`` field into an existing scale_check artifact's
entries. Used when the telemetry schema improves after an expensive run —
the timings stand, the task-distribution reading is re-taken.

Usage: python tools/straggler_recheck.py FIXTURE ARTIFACT q1,q2,...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    fixture, artifact_path = sys.argv[1], sys.argv[2]
    names = [s for s in sys.argv[3].split(",") if s]

    import bench

    recoded = bench._recode_fixture(fixture)

    import __spark_entry__ as entrymod
    from clickestream_project_bigdata_spark.plans.diagnostics import (
        job_group,
        straggler_report,
    )
    from clickestream_project_bigdata_spark.session import get_spark

    spark = get_spark("straggler_recheck")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    with open(artifact_path) as fh:
        artifact = json.load(fh)

    for name in names:
        group = f"recheck:{name}"
        t0 = time.time()
        with job_group(spark, group):
            qs[name](spark, recoded).write.format("noop").mode("overwrite").save()
        rep = straggler_report(spark, group)
        rep["recheck_spark_sec"] = round(time.time() - t0, 3)
        artifact["queries"].setdefault(name, {})["straggler_recheck"] = rep
        print(name, json.dumps(rep), flush=True)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    with open(artifact_path, "w") as fh:
        json.dump(artifact, fh, indent=1)


if __name__ == "__main__":
    main()

"""Phase-split straggler instrumentation for `dedup_clusters` (VERDICT
r11 next-#3).

SCALE100X_R11 recorded worst_ratio_heavy = 3.22 on the dedup_clusters row
— the only heavy stage over the repo's <=3 discipline — but the query is
two very different programs run back-to-back (MinHash+LSH pair generation
over 500k docs, then iterative min-label propagation over the pair
graph), and the per-query telemetry can't say which one skewed. This tool
runs them as SEPARATE job groups with a hard materialization barrier
between (the pair set is written to parquet and re-read, so no LSH stage
can leak into the propagation group) and reports each phase's wall +
straggler profile, plus the per-stage task histogram of whichever stage
is worst.

Usage: python tools/clusters_phase_split.py FIXTURE_DIR OUT_JSON
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    fixture, out_path = sys.argv[1], sys.argv[2]

    import bench

    recoded = bench._recode_fixture(fixture)

    from clickestream_project_bigdata_spark.operators import dedup
    from clickestream_project_bigdata_spark.plans.diagnostics import (
        job_group,
        straggler_report,
    )
    from clickestream_project_bigdata_spark.session import get_spark
    from clickestream_project_bigdata_spark.sources.readers import (
        read_parquet_table,
    )

    spark = get_spark(
        "clusters_phase_split",
        extra_conf={"spark.python.worker.faulthandler.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_parquet_table(spark, recoded, "documents")

    pairs_path = os.path.join(tempfile.gettempdir(), "clusters_split_pairs")
    artifact = {"fixture": fixture, "recoded": recoded,
                "loadavg_at_start": [round(x, 2) for x in os.getloadavg()],
                "phases": {}}

    # ---- phase A: LSH pair generation (identical args to the registry's
    # dedup_clusters query), barriered through parquet ----
    t0 = time.time()
    with job_group(spark, "phase:pairs"):
        dedup.minhash_lsh_pairs(
            docs, threshold=0.9, hash="portable"
        ).write.mode("overwrite").parquet(pairs_path)
    artifact["phases"]["pairs"] = {
        "sec": round(time.time() - t0, 3),
        "straggler": straggler_report(spark, "phase:pairs"),
    }
    print("pairs:", json.dumps(artifact["phases"]["pairs"]), flush=True)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    # ---- phase B: min-label propagation over the materialized pair set ----
    pairs = spark.read.parquet(pairs_path)
    t0 = time.time()
    with job_group(spark, "phase:clusters"):
        dedup.duplicate_clusters(pairs).write.format("noop").mode(
            "overwrite"
        ).save()
    artifact["phases"]["clusters"] = {
        "sec": round(time.time() - t0, 3),
        "straggler": straggler_report(spark, "phase:clusters"),
    }
    print("clusters:", json.dumps(artifact["phases"]["clusters"]), flush=True)

    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)


if __name__ == "__main__":
    main()

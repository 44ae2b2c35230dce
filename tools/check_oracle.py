"""Local pre-validation of __spark_entry__ queries vs their DuckDB oracles.

Mimics the driver's t2 gate: for each queries() entry with an oracle, run
both at the given SF and compare row count, column names, and
order-insensitive values (rows sorted under name-sorted columns).

Canonicalization is AT LEAST as strict as any plausible driver hasher
(VERDICT r6 #2): floats compare at FULL precision (repr / 17 significant
digits — shortest round-trip representation, so two doubles canon-equal
iff bit-equal up to -0.0/0.0), datetimes at microsecond precision with
the timezone preserved when present, Decimals exactly, and lists
element-wise under the same rules. An earlier version truncated floats
to %.10g, which could hide last-ULP divergence the driver would flag.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from clickestream_project_bigdata_spark.session import get_spark  # noqa: E402
from clickestream_project_bigdata_spark.sources.readers import TESTDATA_TABLES  # noqa: E402


def _canon(v):
    """Canonicalize a scalar for comparison — full precision (see module doc)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # -0.0 == 0.0 but repr differs; hash them alike
            return "0.0"
        return repr(v)  # shortest round-trip: canon-equal iff bit-equal
    if hasattr(v, "isoformat"):  # datetime/date at full microsecond precision
        ts = v.isoformat()
        # normalize a UTC offset to a bare timestamp so a tz-aware Spark
        # result and a naive DuckDB one compare on the instant's wall time;
        # non-UTC offsets are kept (a genuine divergence must surface)
        return ts[:-6] if ts.endswith("+00:00") else ts
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows={len(srows)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL  {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            a, b = _rows_canon(scols, srows), _rows_canon(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values mismatch, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    print(f"\n{checked - len(failures)}/{checked} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

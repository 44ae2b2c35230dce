"""Build the derived 10x dataset (~TPC-H sf1) used for SCALING.md checkpoints.

Replicates each sf0.1 fact table 10x with per-replica key shifts so joins
stay consistent within a replica (l_orderkey/o_orderkey, l_partkey/p_partkey,
l_suppkey/s_suppkey, o_custkey/c_custkey all shift together); nation and
region stay 1x (they are fixed catalogs — 25/5 rows at any scale).
Documents/embeddings replicate with shifted ids and UNCHANGED payloads, so
every document becomes a 10-copy duplicate group by construction (the
near-dup families get a known 10x-superlinear pair count — see SCALING.md).

Usage: python tools/make_scale10x.py [src_sf_dir] [out_dir] [replicas] [tables] [item_domain]
       defaults: /root/testdata/sf0.1 /tmp/scale10x 10 <all> 0
       ``tables``: comma-separated subset to replicate (the rest copy 1x) —
       the 100x checkpoint scales only the tables its query list touches
       (events,documents,embeddings,orders,customer) so the fixture stays
       disk-proportional to what is measured.
       ``item_domain`` (VERDICT r11 #1): when > 0, the replicated events'
       ``props`` itemid is REWRITTEN from the source's fixed ~100-value
       domain to a deterministic log-uniform (Zipf s≈1) draw over
       [1, item_domain], keyed by the shifted event_id — P(item = x) ∝
       ~1/x, so the item graph gets true hubs (top item ≈ 4.6% of all
       events at M=3e6) AND a >1M-distinct tail. Without this the 100x
       fixture's item graph is 100 nodes and every graph-family ratio
       measures Spark's local-mode job floor, not the operator
       (SCALE100X_R11.json: pagerank vs a 0.75 s control).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10x"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
ITEM_DOMAIN = int(sys.argv[5]) if len(sys.argv) > 5 else 0

#: table -> list of key columns shifted per replica (by that key's max+1)
SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_1X = ["nation", "region"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    scaled = dict(SHIFTS)
    copy_1x = list(COPY_1X)
    if ONLY is not None:
        unknown = ONLY - set(scaled)
        assert not unknown, f"not replicable: {sorted(unknown)}"
        copy_1x += sorted(set(scaled) - ONLY)
        scaled = {t: k for t, k in scaled.items() if t in ONLY}
    # one shared shift base per KEY NAME so cross-table keys stay aligned
    base: dict[str, int] = {}
    for tbl, keys in scaled.items():
        for k in keys:
            if k not in base:
                (mx,) = con.sql(
                    f"SELECT COALESCE(MAX({k}), 0) + 1 FROM '{SRC}/{tbl}.parquet'"
                ).fetchone()
                base[k] = int(mx)
    # keys that appear in several tables must use the SAME base: resolve by
    # foreign-key name mapping onto the primary table's base (skipping pairs
    # whose tables aren't both being replicated)
    fk = {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
        "o_custkey": "c_custkey",
    }
    for a, b in fk.items():
        if a in base and b in base:
            m = max(base[a], base[b])
            base[a] = base[b] = m
    for tbl, keys in scaled.items():
        parts = []
        for r in range(R):
            repl = ", ".join(f"{k} + {r * base[k]} AS {k}" for k in keys)
            if tbl == "events" and ITEM_DOMAIN > 0:
                # log-uniform item over [1, ITEM_DOMAIN], deterministic in
                # the SHIFTED event_id (each replica draws fresh items):
                # u = hash(id) scaled to [0,1); item = floor(e^(u·lnM)) —
                # pmf ∝ ln(1+1/x)/lnM ≈ 1/(x·lnM), the heavy-tailed degree
                # the graph family needs. NULL props stay NULL.
                eid = f"{keys[0]} + {r * base[keys[0]]}"
                u = f"((hash({eid}) % 9007199254740992) / 9007199254740992.0)"
                item = (
                    f"CAST(floor(exp({u} * ln({ITEM_DOMAIN}.0))) AS BIGINT)"
                )
                repl += (
                    ", CASE WHEN props IS NULL THEN NULL ELSE "
                    f"'{{\"k\": ' || CAST({item} AS VARCHAR) || '}}' "
                    "END AS props"
                )
            parts.append(f"SELECT * REPLACE ({repl}) FROM '{SRC}/{tbl}.parquet'")
        union = " UNION ALL ".join(parts)
        con.sql(f"COPY ({union}) TO '{OUT}/{tbl}.parquet' (FORMAT PARQUET)")
        (n,) = con.sql(f"SELECT COUNT(*) FROM '{OUT}/{tbl}.parquet'").fetchone()
        print(f"{tbl}: {n}")
    for tbl in copy_1x:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') TO '{OUT}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(f"{tbl}: 1x")


if __name__ == "__main__":
    main()

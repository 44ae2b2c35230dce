"""Plan-property pins: the scale-critical physical-plan shapes, asserted.

These catch silent regressions (lost pushdown, lost broadcast, pruning
failure) that correctness tests can't see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickestream_project_bigdata_spark.operators import analytics, relational
from clickestream_project_bigdata_spark.plans import (
    count_broadcast_joins,
    count_exchanges,
    count_sort_merge_joins,
    pushed_filters,
    read_schema_widths,
)
from clickestream_project_bigdata_spark.sources.readers import read_parquet_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def tables(spark):
    names = ("lineitem", "orders", "customer", "nation", "region", "supplier", "part")
    return {n: read_parquet_table(spark, SF, n) for n in names}


def test_filter_pushdown_reaches_parquet(tables):
    df = relational.pricing_summary(tables["lineitem"])
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters


def test_column_pruning(tables):
    # Q1 touches 6 of lineitem's 16 columns — the scan must read only those
    df = relational.pricing_summary(tables["lineitem"])
    widths = read_schema_widths(df)
    assert widths and max(widths) <= 6, widths


def test_dimension_joins_broadcast_not_sort_merge(tables):
    df = relational.revenue_by_nation(
        tables["lineitem"], tables["orders"], tables["customer"],
        tables["nation"], tables["region"],
    )
    assert count_broadcast_joins(df) >= 3
    assert count_sort_merge_joins(df) == 0


def test_q4_semi_join_no_fact_blowup(tables):
    """The EXISTS semi-join must plan as a LEFT SEMI hash join (each order
    emitted at most once; never join+distinct) and prune lineitem to the
    two columns the condition needs."""
    df = relational.late_shipment_priority_counts(tables["orders"], tables["lineitem"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    widths = read_schema_widths(df)
    assert widths and max(widths) <= 4, widths  # pruned scans on both sides


def test_promo_ratio_broadcasts_part(tables):
    df = relational.promo_revenue_ratio(tables["lineitem"], tables["part"])
    assert count_broadcast_joins(df) >= 1
    assert count_sort_merge_joins(df) == 0


def test_tfidf_and_repetition_semantics(spark):
    """Hand-checkable TF-IDF ranking and repetition ratios."""
    from clickestream_project_bigdata_spark.operators.text import (
        repetition_score,
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "banana banana banana banana")],
        "doc_id long, text string",
    )
    top = {
        (r.doc_id, r.rank): (r.term, r.tf)
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    # doc 1: apple tf=2 df=1 (rare, heavy) ranks above banana tf=1 df=3
    assert top[(1, 1)] == ("apple", 2)
    assert top[(1, 2)] == ("banana", 1)
    # doc 3: only one distinct term
    assert top[(3, 1)] == ("banana", 4)
    assert (3, 2) not in top

    rep = {r.doc_id: (r.n_grams, r.n_distinct, r.repetition_ratio)
           for r in repetition_score(docs, n=2).collect()}
    # doc 1 bigrams: "apple banana", "banana apple" -> no repeats
    assert rep[1] == (2, 2, 0.0)
    # doc 2: one bigram
    assert rep[2] == (1, 1, 0.0)
    # doc 3: "banana banana" x3 -> 1 distinct of 3
    assert rep[3][0] == 3 and rep[3][1] == 1
    assert abs(rep[3][2] - (1 - 1 / 3)) < 1e-6


def test_latest_event_state_single_exchange_partial_max(spark, make_events):
    """CDC keep-latest must plan as partial max(struct) BEFORE one hash
    exchange — never a window over fully-shuffled rows."""
    from clickestream_project_bigdata_spark.operators.analytics import (
        latest_event_state,
    )

    ev = make_events([(1, "2024-01-01T00:00:00", "view", 1)]).withColumn(
        "event_id", F.lit(1).cast("long")
    )
    df = latest_event_state(ev, keys=("visitorid", "itemid"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert count_exchanges(df) == 1
    assert "partial_max_by(struct" in plan, plan
    assert "Window" not in plan


def test_events_cube_single_exchange(spark, make_events):
    """CUBE expands grouping sets map-side: one exchange for all subsets."""
    from clickestream_project_bigdata_spark.operators.analytics import events_cube

    ev = make_events([(1, "2024-01-01T00:00:00", "view", 1)]).withColumn(
        "value", F.lit(1.0)
    )
    assert count_exchanges(events_cube(ev)) == 1


def test_sessionization_single_exchange(spark, make_events):
    """Both window functions and the rollup share one partitionBy(visitorid)
    shuffle — the core sessionization scale property."""
    from clickestream_project_bigdata_spark.operators.sessionize import (
        session_metrics,
        sessionize,
    )

    events = make_events([(1, "2024-01-01T00:00:00", "view", 1)])
    df = session_metrics(sessionize(events))
    # one exchange for the window, and the groupBy reuses the partitioning
    # (group keys are a superset of the window partition key after the
    # window's sort) — allow ≤2 but pin it so growth is visible
    assert count_exchanges(df) <= 2


def test_minute_metrics_single_exchange(spark, make_events):
    events = make_events([(1, "2024-01-01T00:00:00", "view", 1)])
    assert count_exchanges(analytics.events_per_minute(events)) <= 1
    assert count_exchanges(analytics.top_items(events)) <= 1


def test_stratified_sample_no_shuffle(spark):
    """Hash sampling is a scan-local filter: zero exchanges in the plan."""
    from clickestream_project_bigdata_spark.operators.curation import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert count_exchanges(stratified_sample(docs, 0.2)) == 0


def test_redact_and_text_ops_no_shuffle(spark):
    """The per-document text passes (redaction, stats, fingerprint, bpe)
    are narrow: no exchange anywhere."""
    from clickestream_project_bigdata_spark.operators import text
    from clickestream_project_bigdata_spark.operators.curation import redact_pii

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for df in (
        redact_pii(docs),
        text.text_stats(docs),
        text.fingerprint(docs),
        text.token_count_bpe(docs),
    ):
        assert count_exchanges(df) == 0


def test_knn_join_no_cartesian(spark):
    """The k-NN join must never degrade to a cartesian/BNL join: candidates
    come from the banded equi-join only."""
    from clickestream_project_bigdata_spark.operators.similarity import knn_join

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = knn_join(emb, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_corpus_stats_single_exchange(spark):
    """Stats ride the scan; the only shuffle is the stratum-key aggregate."""
    from clickestream_project_bigdata_spark.operators.curation import corpus_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert count_exchanges(corpus_stats(docs)) <= 1


def test_asof_join_contract(spark):
    """<=-match, equal-timestamp inclusion, NULLs before any right row,
    per-key isolation — the DuckDB/kdb ASOF LEFT JOIN contract."""
    import datetime as dt

    from clickestream_project_bigdata_spark.operators.relational import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(5), "a"), (1, t(10), "b"), (1, t(20), "c"), (2, t(10), "d"), (3, t(9), "e")],
        "visitorid long, event_time timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(6), 60.0), (1, t(10), 100.0), (2, t(11), 200.0)],
        "visitorid long, event_time timestamp, val double",
    )
    got = {
        r.tag: (r.val, r.event_time_asof)
        for r in asof_join(
            left, right, ts_col="event_time", by="visitorid", value_cols=("val",)
        ).collect()
    }
    assert got["a"] == (None, None)          # before any right row
    assert got["b"] == (100.0, t(10))        # equal timestamp matches (<=)
    assert got["c"] == (100.0, t(10))        # carries the latest prior
    assert got["d"] == (None, None)          # right row is strictly later
    assert got["e"] == (None, None)          # key with no right rows at all


def test_asof_join_null_right_values_come_from_matched_row(spark):
    """A right row whose VALUE is NULL is still the match: carried values
    must come from the latest prior ROW (DuckDB/kdb contract), never from
    an earlier row with a non-null value — and all carried columns must
    come from the same matched row as the reported timestamp."""
    import datetime as dt

    from clickestream_project_bigdata_spark.operators.relational import asof_join

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(3), "x"), (1, t(30), "y")],
        "visitorid long, event_time timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, t(1), 5.0, "keep"), (1, t(2), None, None)],
        "visitorid long, event_time timestamp, val double, note string",
    )
    got = {
        r.tag: (r.val, r.note, r.event_time_asof)
        for r in asof_join(
            left, right, ts_col="event_time", by="visitorid",
            value_cols=("val", "note"),
        ).collect()
    }
    # latest prior ROW is (t=2, NULL, NULL) — both value columns and the
    # matched timestamp agree on that row
    assert got["x"] == (None, None, t(2))
    assert got["y"] == (None, None, t(2))


def test_range_join_matches_brute_force(spark):
    """Bucket-decomposed interval join == crossJoin+filter, with and
    without a by-key; intervals spanning many buckets still match once."""
    import datetime as dt

    from clickestream_project_bigdata_spark.operators.relational import range_join
    from pyspark.sql import functions as F

    t = lambda m: dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m)
    left = spark.createDataFrame(
        [(1, t(0), "a"), (1, t(30), "b"), (1, t(200), "c"), (2, t(30), "d")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, t(0), t(40), "r1"),     # contains a,b for k=1
            (1, t(25), t(250), "r2"),   # spans 4 hour-buckets; contains b,c
            (2, t(29), t(31), "r3"),    # contains d
            (2, t(0), t(500), "r4"),    # k=2 wide interval: d only
        ],
        "k long, s timestamp, e timestamp, rtag string",
    )
    got = sorted(
        (r.tag, r.rtag)
        for r in range_join(
            left, right, ts_col="ts", start_col="s", end_col="e",
            by="k", bucket_seconds=3600,
        ).collect()
    )
    brute = sorted(
        (r.tag, r.rtag)
        for r in left.crossJoin(right.withColumnRenamed("k", "k2"))
        .filter((F.col("k") == F.col("k2")) & F.col("ts").between(F.col("s"), F.col("e")))
        .collect()
    )
    assert got == brute
    assert ("b", "r1") in got and ("b", "r2") in got  # overlap -> both match
    # keyless variant
    got2 = sorted(
        (r.tag, r.rtag)
        for r in range_join(
            left.drop("k"), right.drop("k"), ts_col="ts", start_col="s",
            end_col="e", bucket_seconds=60,
        ).collect()
    )
    brute2 = sorted(
        (r.tag, r.rtag)
        for r in left.crossJoin(right.withColumnRenamed("k", "k2"))
        .filter(F.col("ts").between(F.col("s"), F.col("e")))
        .collect()
    )
    assert got2 == brute2


def test_round4_operator_plan_shapes(spark):
    """Plan pins for the round-4 operators: chunking shuffles nothing,
    the as-of join shuffles once on its key (+ the right-side pre-agg),
    decontaminate broadcasts the benchmark gram set (no sort-merge), and
    the exploded corpus side of decontaminate never feeds an exchange
    before the probe."""
    from pyspark.sql import functions as F

    from clickestream_project_bigdata_spark.operators import curation, text
    from clickestream_project_bigdata_spark.operators.relational import asof_join

    docs = read_parquet_table(spark, SF, "documents")
    chunks = text.chunk_documents(docs, max_tokens=64, overlap=16)
    assert count_exchanges(chunks) == 0

    bench = curation.stratified_sample(docs, 0.2)
    deco = curation.decontaminate(docs, bench, n=5)
    assert count_sort_merge_joins(deco) == 0
    assert count_broadcast_joins(deco) >= 2  # probe + final left join

    ev = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), 1.0)],
        "visitorid long, event_time timestamp, value double",
    )
    right = ev.groupBy("visitorid", "event_time").agg(F.max("value").alias("v"))
    aj = asof_join(ev, right, ts_col="event_time", by="visitorid", value_cols=("v",))
    assert count_exchanges(aj) <= 2  # key exchange + right pre-agg only
    assert count_sort_merge_joins(aj) == 0


def test_round6_tpch_plan_shapes(tables):
    """Plan pins for the round-6 TPC-H additions: Q6 pushes every predicate
    into the parquet scan (no sort-merge anywhere, no fact shuffle for
    dimension joins), Q19's disjunction stays ONE broadcast join + residual
    filter (not a union of three scans), Q22's scalar average broadcasts,
    and Q7's twice-joined nation dim broadcasts both roles."""
    q6 = relational.forecast_revenue(tables["lineitem"])
    filters = pushed_filters(q6)
    assert any("l_shipdate" in f for f in filters), filters
    assert any("l_quantity" in f for f in filters), filters
    widths = read_schema_widths(q6)
    assert widths and max(widths) <= 4, widths  # shipdate/disc/qty/price only

    q19 = relational.disjunctive_part_revenue(tables["lineitem"], tables["part"])
    assert count_broadcast_joins(q19) == 1
    assert count_sort_merge_joins(q19) == 0

    q7 = relational.volume_shipping(
        tables["lineitem"], tables["orders"], tables["customer"],
        tables["supplier"], tables["nation"],
    )
    assert count_broadcast_joins(q7) >= 3  # supp-dim, cust-dim, (nation×2 inside)
    plan7 = q7._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan7 and "BroadcastNestedLoop" not in plan7

    q22 = relational.global_sales_opportunity(
        tables["orders"], tables["customer"], tables["nation"]
    )
    assert count_sort_merge_joins(q22) == 0
    plan22 = q22._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" in plan22 or count_broadcast_joins(q22) >= 2
    # the anti join must not blow up: LEFT ANTI present
    assert "LeftAnti" in plan22, plan22


def test_round6_q17_q18_aggregate_before_join(tables):
    """Q18's HAVING collapses the fact table to order grain BEFORE joining
    outward; Q17's per-part average joins back without sort-merge (brand
    filter makes both sides broadcast-small)."""
    q18 = relational.large_volume_customers(
        tables["lineitem"], tables["orders"], tables["customer"]
    )
    plan = q18._jdf.queryExecution().executedPlan().toString()
    # the aggregate feeding the join appears below the first join: cheap
    # proxy — TakeOrderedAndProject caps the result, no cartesian allowed
    assert "TakeOrderedAndProject" in plan
    assert "Cartesian" not in plan

    q17 = relational.small_qty_order_revenue(tables["lineitem"], tables["part"])
    assert count_sort_merge_joins(q17) == 0


def test_round6_q21_aggregate_formulation(tables):
    """Q21-shaped waiting_suppliers: the EXISTS/NOT-EXISTS pair is rewritten
    as order-grain aggregates — the plan must show the solo-late and
    multi-supplier sides both collapsed by HashAggregate before their
    order-order join, supplier/nation broadcast, and a top-k
    TakeOrderedAndProject instead of a global sort."""
    q21 = relational.waiting_suppliers(
        tables["lineitem"], tables["orders"], tables["supplier"], tables["nation"]
    )
    plan = q21._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert count_broadcast_joins(q21) >= 1  # supplier⋈nation side
    # correctness pin on the tiny fixture: deterministic top rows
    rows = q21.collect()
    assert [r["numwait"] for r in rows] == sorted(
        [r["numwait"] for r in rows], reverse=True
    )
    assert all(r["numwait"] >= 1 for r in rows)


def test_round6_q2_argmin_ties_and_broadcasts(tables):
    """Q2-shaped cheapest_supplier_per_part: every returned (part, supplier)
    unit_cost equals that part's minimum, ties are all kept (pre-limit),
    and the scalar-min join-back plus the three dimension joins are
    broadcast — no sort-merge anywhere."""
    # k must stay modest: TakeOrdered materializes a size-k bounded queue
    # PER PARTITION (k=10^9 OOMs the JVM — learned the hard way)
    q2 = relational.cheapest_supplier_per_part(
        tables["lineitem"], tables["part"], tables["supplier"], tables["nation"], k=10_000
    )
    assert count_sort_merge_joins(q2) == 0
    rows = q2.collect()
    assert rows
    by_part = {}
    for r in rows:
        by_part.setdefault(r["p_partkey"], set()).add(r["unit_cost"])
    # argmin: one distinct cost per part (the minimum), possibly many suppliers
    assert all(len(costs) == 1 for costs in by_part.values())


def test_round6_q20_promotion_semi_join_chain(tables):
    """Q20-shaped potential_part_promotion: the part prefix filter and the
    qualifying-supplier set both enter as semi-joins (no fact-width output
    columns), dimensions broadcast, and every returned supplier really has
    a ramping (part, supplier) pair under the integer-scaled decimal gate."""
    df = relational.potential_part_promotion(
        tables["lineitem"], tables["part"], tables["supplier"], tables["nation"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert count_broadcast_joins(df) >= 2  # part-key semi + qual-supplier semi
    rows = df.collect()
    assert rows
    # names come back sorted and unique (distinct suppliers, one row each)
    names = [r["s_name"] for r in rows]
    assert names == sorted(names) and len(set(names)) == len(names)
    # cross-check the gate directly: recompute qualifying suppliers
    from pyspark.sql import functions as F

    red = tables["part"].filter(F.col("p_name").startswith("red")).select("p_partkey")
    pair = (
        tables["lineitem"]
        .join(red, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(
                    (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
                    & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp")),
                    F.col("l_quantity").cast("decimal(18,4)"),
                ).otherwise(F.lit(0).cast("decimal(18,4)"))
            ).alias("qy"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qa"),
        )
    )
    qual_keys = {
        r["l_suppkey"]
        for r in pair.filter(F.col("qy") * 5 > F.col("qa")).select("l_suppkey").distinct().collect()
    }
    nk = {
        r["n_nationkey"]
        for r in tables["nation"]
        .filter(F.col("n_name").isin("NATION_7", "NATION_8", "NATION_9"))
        .collect()
    }
    expected = {
        r["s_name"]
        for r in tables["supplier"].collect()
        if r["s_suppkey"] in qual_keys and r["s_nationkey"] in nk
    }
    assert set(names) == expected


def test_round6_q11_threshold_gate(tables):
    """Q11-shaped important_part_values: every kept part's value exceeds
    fraction × the grand total recomputed from the result's complement-free
    aggregate path (checked against a direct recomputation)."""
    df = relational.important_part_values(
        tables["lineitem"], tables["supplier"], tables["nation"], fraction=0.001
    )
    rows = df.collect()
    assert rows
    all_parts = relational.important_part_values(
        tables["lineitem"], tables["supplier"], tables["nation"], fraction=0.0
    ).collect()
    total = sum(r["part_value"] for r in all_parts)
    assert all(r["part_value"] > total * 0.001 * (1 - 1e-9) for r in rows)
    assert len(rows) < len(all_parts)


def test_round6_q16_exclusions(tables):
    """Q16-shaped part_supplier_counts: flagged suppliers (s_acctbal < 0)
    never contribute, the excluded brand/type never appear, and counts are
    bounded by the fixture's 100 suppliers."""
    df = relational.part_supplier_counts(
        tables["lineitem"], tables["part"], tables["supplier"]
    )
    rows = df.collect()
    assert rows
    assert all(r["p_brand"] != "Brand#12" and r["p_type"] != "PROMO" for r in rows)
    assert all(1 <= r["supplier_cnt"] <= 100 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan


def test_round6_discount_elasticity_exact_moments(spark, tables):
    """Pearson r from exact DECIMAL moments: verify against a numpy
    recomputation on the same rows, and pin the single-broadcast plan."""
    import math

    from clickestream_project_bigdata_spark.operators.relational import (
        discount_elasticity,
    )

    df = discount_elasticity(tables["lineitem"], tables["part"])
    assert count_sort_merge_joins(df) == 0
    assert count_broadcast_joins(df) >= 1
    rows = {r.p_type: r for r in df.collect()}
    raw = (
        tables["lineitem"]
        .join(tables["part"], F.col("l_partkey") == F.col("p_partkey"))
        .select("p_type", "l_discount", "l_quantity")
        .collect()
    )
    one_type = next(iter(rows))
    xs = [r.l_discount for r in raw if r.p_type == one_type]
    ys = [r.l_quantity for r in raw if r.p_type == one_type]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    expect = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(rows[one_type].corr_disc_qty - expect) < 1e-4


def test_pairwise_overlap_single_linear_pipeline(spark):
    """pairwise_set_overlap must stay one linear pipeline: exactly one
    big element-keyed exchange plus the two tiny windowed-total
    exchanges + AQE final — no joins of any kind (the fork-based shape
    re-ran the full explode per consumer), and no fact self-join."""
    from clickestream_project_bigdata_spark.operators.analytics import (
        audience_overlap,
    )
    from clickestream_project_bigdata_spark.plans import (
        count_broadcast_joins,
        count_exchanges,
        count_sort_merge_joins,
    )
    from clickestream_project_bigdata_spark.sources.readers import (
        events_from_fixture,
    )

    df = audience_overlap(events_from_fixture(spark, SF))
    assert count_exchanges(df) <= 4, df._jdf.queryExecution().toString()
    assert count_broadcast_joins(df) == 0
    assert count_sort_merge_joins(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


# --- round 8 plan shapes ---------------------------------------------------

def _ev8(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (v, e, base + dt.timedelta(seconds=s), it, i + 1)
            for i, (v, e, s, it) in enumerate(rows)
        ],
        "visitorid long, event string, event_time timestamp, "
        "itemid long, event_id long",
    )


def test_cart_abandonment_two_stacked_aggs_one_fact_shuffle(spark):
    """(item, visitor) flag collapse then item rollup: the fact shuffles
    once on the compound key; the rollup rides the collapsed grain (2
    exchanges total, no join, no sort-merge)."""
    ev = _ev8(spark, [(1, "view", 0, 5), (1, "purchase", 10, 5), (2, "view", 3, 5)])
    df = analytics.cart_abandonment_by_item(ev)
    assert count_exchanges(df) <= 2
    assert count_sort_merge_joins(df) == 0


def test_repeat_purchase_rate_no_join(spark):
    ev = _ev8(spark, [(1, "purchase", 0, 5), (1, "purchase", 9, 5)])
    df = analytics.repeat_purchase_rate(ev)
    assert count_exchanges(df) <= 2
    assert count_sort_merge_joins(df) == 0


def test_skipgram_pmi_no_interpreted_hof(spark):
    """The pair stream must be zip_with shifted slices (codegen), never an
    interpreted `transform(sequence, ...)` lambda (the r7 lesson), and the
    top-k must plan as TakeOrderedAndProject, not a global sort."""
    from clickestream_project_bigdata_spark.operators.text import skipgram_pmi

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    df = skipgram_pmi(docs, window=3, k=10, min_count=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "transform(sequence(" not in optimized


def test_dedup_token_savings_single_fact_exchange_no_text(spark):
    """One digest-keyed window exchange; the text column must not appear in
    any exchange (only digest/id/tokens/source cross the wire)."""
    import re

    from clickestream_project_bigdata_spark.operators.dedup import (
        dedup_token_savings,
    )

    docs = spark.createDataFrame(
        [(1, "x y", "a"), (2, "x y", "b")], "doc_id long, text string, source string"
    )
    df = dedup_token_savings(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert count_exchanges(df) <= 2  # fingerprint window + source agg
    for m in re.finditer(r"Exchange [^\n]*", plan):
        assert "text" not in m.group(0), m.group(0)


def test_pii_rate_single_aggregation(spark):
    from clickestream_project_bigdata_spark.operators.curation import (
        pii_rate_by_source,
    )

    docs = spark.createDataFrame(
        [(1, "mail me: a@b.co", "s")], "doc_id long, text string, source string"
    )
    df = pii_rate_by_source(docs)
    assert count_exchanges(df) <= 1
    assert count_sort_merge_joins(df) == 0


def test_position_attribution_no_trailing_global_sort(spark):
    """Unbounded item grain: the plan must not end in a range-partition
    exchange (the VERDICT r7 #5 rule the attribution family follows)."""
    ev = _ev8(spark, [(1, "view", 0, 5), (1, "purchase", 30, 5)])
    df = analytics.position_attribution(ev)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower().replace(" ", "")


def test_decile_rfm_no_unpartitioned_ntile_window(spark, tables):
    """VERDICT r8 #5: customer_value_deciles and rfm_segments must not plan
    the global-``Window.orderBy`` ntile — an Exchange SinglePartition whose
    ONE task sorts every customer. The distributed spelling (range-partition
    prefix sum + closed-form bucket arithmetic) leaves ZERO Window nodes in
    the final plan; the remaining SinglePartition exchanges are the 1-row
    global count aggregates (<= #partitions partial rows each — bounded)."""
    for df in (
        analytics.customer_value_deciles(tables["orders"]),
        analytics.rfm_segments(tables["orders"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ntile(" not in plan, plan
        assert "Window" not in plan, plan


def test_first_touch_attribution_no_window_no_global_sort(spark):
    """Round 9: the fourth credit model is ONE min_by aggregation over the
    bounded range join — no rank window (the per-conversion argmin must not
    plan as row_number-over-partition) and no trailing range exchange."""
    ev = _ev8(spark, [(1, "view", 0, 5), (1, "purchase", 30, 5)])
    df = analytics.first_touch_attribution(ev)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan.lower().replace(" ", "")


def test_decode_video_fake_path_zero_exchange(spark):
    """The Catalyst fake video path is a pure narrow projection — metadata
    arithmetic on meta.n_bytes must not shuffle or leave codegen."""
    from clickestream_project_bigdata_spark.operators.multimodal import (
        attach_video_binary,
        decode_video,
    )

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    df = decode_video(attach_video_binary(docs))
    assert count_exchanges(df) == 0


def test_heavy_hitters_broadcast_verify_no_smj(spark):
    """Pass 2's verify join must be a BROADCAST of the bounded candidate
    set (never sort-merge: the input side is the 100 TB fact), and the
    count must be map-side combined (partial agg before the exchange)."""
    df = spark.createDataFrame(
        [(i % 7,) for i in range(200)], "itemid long"
    ).repartition(4)
    out = analytics.heavy_hitters_2pass(df, "itemid", share_ppm=50_000)
    assert count_sort_merge_joins(out) == 0
    assert count_broadcast_joins(out) >= 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    # a PARTIAL count must exist before the exchange (map-side combine);
    # a bare HashAggregate match would pass for any hash-agg plan
    assert "partial_count" in plan


def test_user_paths_no_interpreted_transform(spark):
    """The path family must extract struct fields via GetArrayStructFields
    (codegen), never a `transform(..., x -> x.event)` interpreted lambda —
    the 100x checkpoint measured the lambda spelling at 82-195 s vs 5-12 s
    (round-9 edition of the round-7 transform(sequence) lesson)."""
    from clickestream_project_bigdata_spark.operators.sessionize import (
        sessionize,
    )

    ev = spark.createDataFrame(
        [(1, "view", "2020-01-01 00:00:00", 10, 1, 1.0)],
        "visitorid long, event string, event_time string, itemid long, "
        "event_id long, value double",
    ).withColumn("event_time", F.to_timestamp("event_time"))
    s = sessionize(ev)
    for df in (
        analytics.user_paths(s),
        analytics.top_paths(s),
        analytics.path_conversion_rates(s),
    ):
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        # array_sort's default comparator desugars to a lambdafunction too —
        # the codegen-hostile pattern is specifically a transform() HOF
        assert "transform(" not in optimized, optimized[:2000]

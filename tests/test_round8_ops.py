"""Hand-computed pins for the round-8 operators — the oracle checks
hash-parity at fixture scale; these pin the SEMANTICS on tiny inputs
(weight arithmetic, window distances, tie-breaks, keep-first rules)."""

from __future__ import annotations

import datetime as dt


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "visitorid long, event string, event_time timestamp, "
        "itemid long, event_id long",
    )


def test_position_attribution_u_shape(spark):
    """m=4 touches: first 400000, last 400000, two middles 100000 each
    (200000 DIV 2); m=1 -> 1000000; m=2 -> 500000/500000."""
    from clickestream_project_bigdata_spark.operators.analytics import (
        position_attribution,
    )

    b = dt.datetime(2024, 1, 1)
    rows = []
    # visitor 1: views items 10,20,30,40 then purchases
    for i, item in enumerate([10, 20, 30, 40]):
        rows.append((1, "view", b + dt.timedelta(minutes=i), item, i + 1))
    rows.append((1, "purchase", b + dt.timedelta(minutes=10), 99, 5))
    # visitor 2: one view then purchase
    rows.append((2, "view", b, 50, 6))
    rows.append((2, "purchase", b + dt.timedelta(minutes=1), 99, 7))
    # visitor 3: two views then purchase
    rows.append((3, "view", b, 60, 8))
    rows.append((3, "view", b + dt.timedelta(minutes=1), 61, 9))
    rows.append((3, "purchase", b + dt.timedelta(minutes=2), 99, 10))
    out = {
        r.itemid: r.credit_ppm
        for r in position_attribution(_ev(spark, rows)).collect()
    }
    assert out[10] == 400_000 and out[40] == 400_000
    assert out[20] == 100_000 and out[30] == 100_000
    assert out[50] == 1_000_000
    assert out[60] == 500_000 and out[61] == 500_000


def test_position_attribution_horizon_and_cap(spark):
    """Touches outside the horizon are excluded; only the most recent
    window_touches participate and position ranks are within the KEPT set."""
    from clickestream_project_bigdata_spark.operators.analytics import (
        position_attribution,
    )

    b = dt.datetime(2024, 1, 1)
    rows = [
        (1, "view", b - dt.timedelta(days=2), 1, 1),  # outside 86400s horizon
        (1, "view", b, 2, 2),
        (1, "view", b + dt.timedelta(minutes=1), 3, 3),
        (1, "purchase", b + dt.timedelta(minutes=2), 99, 4),
    ]
    out = {
        r.itemid: r.credit_ppm
        for r in position_attribution(_ev(spark, rows)).collect()
    }
    assert 1 not in out
    assert out[2] == 500_000 and out[3] == 500_000
    # cap: 5 touches, window_touches=3 -> only the 3 most recent share,
    # the OLDEST KEPT becomes "first"
    rows2 = [
        (1, "view", b + dt.timedelta(minutes=i), 10 + i, i + 1) for i in range(5)
    ] + [(1, "purchase", b + dt.timedelta(minutes=9), 99, 9)]
    out2 = {
        r.itemid: r.credit_ppm
        for r in position_attribution(_ev(spark, rows2), window_touches=3).collect()
    }
    assert 10 not in out2 and 11 not in out2
    assert out2[12] == 400_000 and out2[14] == 400_000  # first/last kept
    assert out2[13] == 200_000  # single middle gets the full 20%


def test_cart_abandonment_semantics(spark):
    """Purchasers without a view are excluded from the denominator."""
    from clickestream_project_bigdata_spark.operators.analytics import (
        cart_abandonment_by_item,
    )

    b = dt.datetime(2024, 1, 1)
    rows = [
        (1, "view", b, 7, 1),
        (1, "purchase", b, 7, 2),
        (2, "view", b, 7, 3),           # abandons
        (3, "purchase", b, 7, 4),       # buys blind — excluded
        (4, "view", b, 8, 5),           # abandons item 8
    ]
    out = {r.itemid: r for r in cart_abandonment_by_item(_ev(spark, rows)).collect()}
    assert (out[7].n_viewers, out[7].n_buyers, out[7].n_abandoned) == (2, 1, 1)
    assert out[7].abandonment_rate == 0.5
    assert (out[8].n_viewers, out[8].n_abandoned) == (1, 1)


def test_repeat_purchase_rate(spark):
    from clickestream_project_bigdata_spark.operators.analytics import (
        repeat_purchase_rate,
    )

    b = dt.datetime(2024, 1, 1)
    rows = [
        (1, "purchase", b, 5, 1),
        (1, "purchase", b + dt.timedelta(days=1), 5, 2),
        (2, "purchase", b, 5, 3),
        (1, "view", b, 5, 4),  # not a purchase
    ]
    [r] = repeat_purchase_rate(_ev(spark, rows)).collect()
    assert (r.n_buyers, r.n_repeat_buyers, r.n_purchases) == (2, 1, 3)
    assert r.repeat_rate == 0.5


def test_skipgram_pmi_window_semantics(spark):
    """Distance <= window pairs counted (unordered, canonical); distance
    window+1 not; zip_with tail padding must NOT create self-pairs."""
    from pyspark.sql import functions as F

    from clickestream_project_bigdata_spark.operators.text import skipgram_pmi

    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(5)], "doc_id long, text string"
    )
    out = skipgram_pmi(docs, window=3, k=100, min_count=5).collect()
    pairs = {(r.token_a, r.token_b): r.n_pair for r in out}
    # distance 1..3 pairs present with count 5 (one per doc)
    assert pairs[("a", "b")] == 5 and pairs[("a", "d")] == 5
    assert ("a", "e") not in pairs  # distance 4 > window
    # tail padding produced no (e, e) / (d, d) self-pairs
    assert all(a != b for (a, b) in pairs)
    # every unigram count is 5 -> all scores identical:
    # c_ab * N * 1e6 / (c_a*c_b) = 5*25e6/25 = 5_000_000
    assert {r.score_ppm for r in out} == {5_000_000}


def test_token_coverage_topk_small_vocab(spark):
    """k larger than the vocab covers everything; coverage exact."""
    from clickestream_project_bigdata_spark.operators.text import (
        token_coverage_topk,
    )

    docs = spark.createDataFrame(
        [(1, "x x x y"), (2, "x z")], "doc_id long, text string"
    )
    out = {r.k: r for r in token_coverage_topk(docs, ks=(1, 10)).collect()}
    assert out[1].covered_tokens == 4 and out[1].total_tokens == 6
    assert abs(out[1].coverage - round(4 / 6, 6)) < 1e-12
    assert out[10].covered_tokens == 6 and out[10].coverage == 1.0


def test_dedup_token_savings_keep_first(spark):
    """Keeper = global min doc_id per normalized fingerprint; savings
    attributed to the dropped copies' sources."""
    from clickestream_project_bigdata_spark.operators.dedup import (
        dedup_token_savings,
    )

    docs = spark.createDataFrame(
        [
            (1, "Hello   world", "a"),   # normalizes same as doc 3
            (2, "unique text here", "a"),
            (3, "hello world", "b"),     # dup, dropped (higher id)
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in dedup_token_savings(docs).collect()}
    assert (out["a"].n_docs, out["a"].n_kept_docs) == (2, 2)
    assert out["a"].token_savings_rate == 0.0
    assert (out["b"].n_docs, out["b"].n_kept_docs) == (1, 0)
    assert out["b"].kept_tokens == 0 and out["b"].token_savings_rate == 1.0


def test_pii_rate_by_source_chain(spark):
    """Chained counting: an email containing digit runs is redacted before
    the SSN/phone scans, so nothing double-counts."""
    from clickestream_project_bigdata_spark.operators.curation import (
        pii_rate_by_source,
    )

    docs = spark.createDataFrame(
        [
            (1, "reach me at bob123@example.com today", "a"),
            (2, "ssn 123-45-6789 and phone 555-123-4567", "a"),
            (3, "nothing sensitive", "a"),
            (4, "clean", "b"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in pii_rate_by_source(docs).collect()}
    a = out["a"]
    assert (a.n_email, a.n_ssn, a.n_phone) == (1, 1, 1)
    assert (a.n_docs, a.n_pii_docs) == (3, 2)
    assert abs(a.pii_doc_rate - round(2 / 3, 6)) < 1e-12
    assert out["b"].n_pii_docs == 0 and out["b"].pii_doc_rate == 0.0


def test_quantization_error_stats_order_independence(spark):
    """Zero vector -> scale 1, zero error; saturation counted at |q|=127;
    repartitioning (order change) leaves every stat identical."""
    from clickestream_project_bigdata_spark.operators.similarity import (
        quantization_error_stats,
    )

    rows = [
        (1, [0.0, 0.0], 0),
        (2, [1.0, -1.0], 0),   # scale 127 -> q=(127,-127): both saturated
        (3, [0.5, 0.25], 1),   # scale 254 -> q=(127, 64): one saturated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r.label: r for r in quantization_error_stats(df).collect()}
    assert (out[0].n_vectors, out[0].n_components) == (2, 4)
    assert out[0].n_saturated == 2
    assert out[0].max_abs_err == 0.0  # exact scales: reconstruction exact
    assert out[1].n_saturated == 1
    shuffled = {
        r.label: r for r in quantization_error_stats(df.repartition(7)).collect()
    }
    assert out == shuffled

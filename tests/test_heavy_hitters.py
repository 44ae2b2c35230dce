"""heavy_hitters_2pass: the sketch only PRUNES — outputs must equal the
exact full-groupBy filter on skewed multi-partition frames, including
threshold ties, string keys, nulls, and empty input."""

from pyspark.sql import functions as F

from clickestream_project_bigdata_spark.operators.analytics import (
    heavy_hitters_2pass,
)


def test_matches_bruteforce_all_thresholds(spark):
    # 1000 non-null rows: key 1 x400, key 2 x100, keys 100..199 x5 each
    rows = (
        [(1,)] * 400
        + [(2,)] * 100
        + [(k,) for k in range(100, 200) for _ in range(5)]
    )
    rows += [(None,)] * 17  # nulls excluded from N and output
    df = spark.createDataFrame(rows, "itemid long").repartition(8)

    for ppm in (5_000, 100_000, 400_000):
        got = {
            (r.itemid, r.exact_count, r.share_ppm_floor)
            for r in heavy_hitters_2pass(df, "itemid", share_ppm=ppm).collect()
        }
        n = 1000
        exact = (
            df.filter(F.col("itemid").isNotNull())
            .groupBy("itemid")
            .agg(F.count("*").alias("c"))
            .filter(F.lit(1_000_000) * F.col("c") >= F.lit(ppm) * F.lit(n))
            .collect()
        )
        want = {(r.itemid, r.c, 1_000_000 * r.c // n) for r in exact}
        assert got == want, (ppm, got, want)


def test_threshold_tie_kept(spark):
    """5000 ppm over 1000 rows -> threshold exactly 5: the x5 keys sit ON
    the boundary and must be kept (>=, not >)."""
    rows = (
        [(1,)] * 400
        + [(2,)] * 100
        + [(k,) for k in range(100, 200) for _ in range(5)]
    )
    df = spark.createDataFrame(rows, "itemid long").repartition(8)
    assert heavy_hitters_2pass(df, "itemid", share_ppm=5_000).count() == 102


def test_string_key_and_empty_input(spark):
    df = spark.createDataFrame(
        [("a",)] * 9 + [("b",)] * 1, "token string"
    ).repartition(4)
    got = {
        (r.token, r.exact_count, r.share_ppm_floor)
        for r in heavy_hitters_2pass(df, "token", share_ppm=500_000).collect()
    }
    assert got == {("a", 9, 900_000)}
    empty = spark.createDataFrame([], "token string")
    assert heavy_hitters_2pass(empty, "token", share_ppm=1000).count() == 0


def test_large_universe_one_hitter(spark):
    """4000 distinct singleton keys + one dominant key: MG capacity (k=20
    at 10% share) is far below the universe, yet the dominant key must
    survive every compaction and be the only output."""
    rows = [(k,) for k in range(4000)] + [(999_999,)] * 4000
    df = spark.createDataFrame(rows, "itemid long").repartition(8)
    out = heavy_hitters_2pass(df, "itemid", share_ppm=100_000)
    assert {(r.itemid, r.exact_count) for r in out.collect()} == {
        (999_999, 4000)
    }

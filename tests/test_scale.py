"""Scale utilities: salted join correctness, bucketed write/scan, SQL views,
and streaming late-data semantics (T7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickestream_project_bigdata_spark.plans import (
    register_views,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for k in ("hot", "cold") for i in range(50 if k == "hot" else 2)],
        "k string, v long",
    )
    right = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "k string, w double")
    plain = left.join(right, "k").select("k", "v", "w")
    salted = salted_join(left, right, "k", salt_buckets=4).select("k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_hot_key(spark):
    left = spark.createDataFrame([("hot", i) for i in range(200)], "k string, v long")
    right = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    salts = (
        left.withColumn("__salt", (F.rand(seed=42) * 4).cast("int"))
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts > 1  # the hot key really lands in multiple buckets
    assert salted_join(left, right, "k", salt_buckets=4).count() == 200


def test_bucketed_write_joins_without_exchange(spark, tmp_path):
    # warehouse dir is a static conf — the session factory points it at /tmp
    a = spark.range(0, 1000).withColumn("k", F.col("id") % 100)
    b = spark.range(0, 100).withColumnRenamed("id", "k").withColumn("w", F.lit(1.0))
    write_bucketed(a, "t_a", "k", num_buckets=8)
    write_bucketed(b, "t_b", "k", num_buckets=8)
    joined = spark.table("t_a").join(spark.table("t_b"), "k")
    # disable broadcast so the bucketed co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("drop table if exists t_a")
        spark.sql("drop table if exists t_b")


def test_register_views_sql_surface(spark, make_events):
    events = make_events(
        [
            (1, "2024-01-01T00:00:00", "view", 10),
            (1, "2024-01-01T00:00:30", "click", 10),
            (2, "2024-01-01T00:01:00", "view", 11),
        ]
    )
    names = register_views(spark, events)
    assert "sessions" in names and "bounce_rate" in names
    assert spark.sql("select count(*) c from sessions").first()["c"] == 2
    top = spark.sql(
        "select itemid, interaction_count from item_interactions order by itemid"
    ).collect()
    assert [(r["itemid"], r["interaction_count"]) for r in top] == [(10, 2), (11, 1)]


def test_windowed_counts_drop_late_events(spark, tmp_path):
    """T7: with a watermark, an event older than (max event time − delay)
    arriving in a later micro-batch is dropped from the aggregation."""
    import json
    import os

    from clickestream_project_bigdata_spark.operators.cleanse import canonicalize
    from clickestream_project_bigdata_spark.sources.readers import read_json_stream
    from clickestream_project_bigdata_spark.streaming import windowed_counts

    BASE_MS = 1700000000000

    def rec(v, off_s):
        return {
            "timestamp": "x", "visitorid": str(v), "event": "view",
            "itemid": "1", "transactionid": None, "event_category": "x",
            "unix_timestamp": str(BASE_MS + off_s * 1000),
        }

    src = tmp_path / "late_src"
    src.mkdir()
    # the late-record FILTER uses the start-of-batch watermark, which lags
    # the end-of-batch (eviction) watermark by one batch. So: seed the
    # window (b0), advance event time twice (b1, b2) — the first-minute
    # window is evicted/emitted by b2 and the filter watermark is high by
    # b3, whose straggler is then provably dropped.
    batches = [
        [rec(1, 0)],
        [rec(1, 3600)],
        [rec(1, 7200)],
        [rec(2, 30)],  # 30s-old: behind the (3600-60)s filter watermark → dropped
    ]
    for i, b in enumerate(batches):
        p = src / f"b{i}.json"
        p.write_text("\n".join(json.dumps(r) for r in b))
        os.utime(p, (1_000_000 + i, 1_000_000 + i))

    stream = canonicalize(read_json_stream(spark, str(src), max_files=1))
    q = (
        windowed_counts(stream, duration="1 minute", watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_counts")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from late_counts").collect()
    # the first minute's window closed with ONLY visitor 1's event; visitor
    # 2's late event neither resurrected it nor produced a second row
    import datetime as dt

    first_minute = [
        r for r in rows if r["minute"] == dt.datetime(2023, 11, 14, 22, 13)
    ]
    assert len(first_minute) == 1
    assert first_minute[0]["events_count"] == 1

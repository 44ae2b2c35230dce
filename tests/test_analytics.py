"""The 10 analyses on tiny hand-written frames — edge cases per FIXTURES.md §5."""

from __future__ import annotations

from clickestream_project_bigdata_spark.operators import analytics
from clickestream_project_bigdata_spark.operators.sessionize import sessionize


def test_events_per_minute_boundary(make_events):
    df = make_events(
        [
            (1, "2024-01-01 00:00:59", "view", 1),
            (1, "2024-01-01 00:01:00", "view", 1),
            (2, "2024-01-01 00:01:30", "view", 2),
        ]
    )
    got = {r.minute.isoformat(): r.events_count for r in analytics.events_per_minute(df).collect()}
    assert got == {"2024-01-01T00:00:00": 1, "2024-01-01T00:01:00": 2}


def test_active_users_counted_in_each_minute(make_events):
    df = make_events(
        [
            (1, "2024-01-01 00:00:10", "view", 1),
            (1, "2024-01-01 00:01:10", "view", 1),  # same visitor, two minutes
            (2, "2024-01-01 00:00:20", "view", 1),
        ]
    )
    got = {r.minute.isoformat(): r.active_users for r in analytics.active_users(df).collect()}
    assert got == {"2024-01-01T00:00:00": 2, "2024-01-01T00:01:00": 1}


def test_bounce_rate_single_event_visitor(make_events):
    df = make_events(
        [
            (1, "2024-01-01 00:00:10", "view", 1),  # bounce in minute 0
            (2, "2024-01-01 00:00:20", "view", 1),
            (2, "2024-01-01 00:00:40", "view", 1),  # not a bounce
        ]
    )
    r = analytics.bounce_rate(df).collect()[0]
    assert (r.bounces, r.total_users, r.bounce_rate) == (1, 2, 0.5)


def test_event_type_distribution(make_events):
    df = make_events(
        [
            (1, "2024-01-01 00:00:10", "view", 1),
            (1, "2024-01-01 00:00:20", "addtocart", 1),
            (2, "2024-01-01 00:00:30", "view", 2),
        ]
    )
    got = {(r.minute.isoformat(), r.event): r.event_count
           for r in analytics.event_type_distribution(df).collect()}
    assert got == {
        ("2024-01-01T00:00:00", "view"): 2,
        ("2024-01-01T00:00:00", "addtocart"): 1,
    }


def test_item_counts_and_most_viewed(make_events):
    df = make_events(
        [
            (1, "2024-01-01 00:00:10", "view", 1),
            (1, "2024-01-01 00:00:20", "addtocart", 1),
            (2, "2024-01-01 00:00:30", "view", 2),
        ]
    )
    inter = {r.itemid: r.interaction_count for r in analytics.item_interactions(df).collect()}
    assert inter == {1: 2, 2: 1}
    views = {r.itemid: r.view_count for r in analytics.most_viewed_items(df).collect()}
    assert views == {1: 1, 2: 1}


def test_top_k_items_rank_and_tiebreak(make_events):
    df = make_events(
        [
            (1, "2024-01-01 00:00:01", "view", 5),
            (2, "2024-01-01 00:00:02", "view", 5),
            (3, "2024-01-01 00:00:03", "view", 3),
            (4, "2024-01-01 00:00:04", "view", 9),  # ties with item 3; lower id wins
        ]
    )
    got = [(r.itemid, r.rank) for r in
           analytics.top_k_items_per_minute(df, k=2).orderBy("rank").collect()]
    assert got == [(5, 1), (3, 2)]


def test_events_per_minute_moving_average(make_events):
    from clickestream_project_bigdata_spark.operators.analytics import (
        events_per_minute_ma,
    )

    events = make_events(
        [
            (1, "2024-01-01T00:00:10", "view", 1),
            (1, "2024-01-01T00:00:20", "view", 1),  # minute 0: 2 events
            (1, "2024-01-01T00:01:10", "view", 1),  # minute 1: 1 event
            (1, "2024-01-01T00:10:10", "view", 1),  # minute 10: outside 5m range
        ]
    )
    out = {r["minute"].minute: r["ma_5m"] for r in events_per_minute_ma(events, 5).collect()}
    assert out[0] == 2.0
    assert out[1] == 1.5  # (2+1)/2 within the 5-minute range frame
    assert out[10] == 1.0  # range frame excludes minutes 0-1 (gap > 4 min)


def test_user_paths_order_and_tiebreak(make_events):
    df = make_events(
        [
            (1, "2024-01-01 00:00:30", "view", 1),
            (1, "2024-01-01 00:00:10", "transaction", 1),
            # duplicate event_time: struct comparison ties on event string
            (1, "2024-01-01 00:00:10", "addtocart", 1),
        ]
    )
    out = analytics.user_paths(sessionize(df)).collect()
    assert len(out) == 1
    assert out[0].user_path == ["addtocart", "transaction", "view"]


def test_funnel_membership_not_ordering(make_events):
    df = make_events(
        [
            # session with transaction but NO addtocart still counts (non-monotonic)
            (1, "2024-01-01 00:00:10", "view", 1),
            (1, "2024-01-01 00:00:20", "transaction", 1),
            # full funnel session
            (2, "2024-01-01 00:00:10", "view", 2),
            (2, "2024-01-01 00:00:20", "addtocart", 2),
            (2, "2024-01-01 00:00:30", "transaction", 2),
        ]
    )
    r = analytics.funnel_analysis(sessionize(df)).collect()[0]
    assert (r["view"], r["addtocart"], r["transaction"]) == (2, 1, 2)


def test_funnel_counts_sessions_not_visitors(make_events):
    df = make_events(
        [
            (1, "2024-01-01 00:00:10", "view", 1),
            (1, "2024-01-01 02:00:10", "view", 1),  # second session, same visitor
        ]
    )
    r = analytics.funnel_analysis(sessionize(df)).collect()[0]
    assert r["view"] == 2


def test_active_users_kmv_estimator(spark):
    """KMV sketch: exact below k distinct; within ~3/sqrt(k) relative error
    above it (deterministic given the portable hash, so the bound is a firm
    regression pin, not a flaky statistical one)."""
    import datetime as dt

    from clickestream_project_bigdata_spark.operators.analytics import active_users_kmv

    base = dt.datetime(2024, 1, 1)
    rows = [(v, base) for v in range(1000)]  # 1000 distinct in one bucket
    rows += [(v, base + dt.timedelta(hours=2)) for v in range(5)]  # 5 distinct
    df = spark.createDataFrame(rows, "visitorid long, event_time timestamp")
    got = {r.bucket: r.active_users_est for r in active_users_kmv(df, k=32).collect()}
    assert got[base + dt.timedelta(hours=2)] == 5.0  # exact branch
    est = got[base]
    assert abs(est - 1000) / 1000 < 3 / (32 ** 0.5), est


def test_profile_events(spark, make_events):
    from clickestream_project_bigdata_spark.operators.analytics import profile_events

    events = make_events(
        [
            (1, "2024-01-01T00:00:00", "view", 10),
            (1, "2024-01-01T00:05:00", "click", None),
            (2, "2024-01-01T01:00:00", "view", 10),
        ]
    )
    [r] = profile_events(events).collect()
    assert (r["n_rows"], r["n_visitors"], r["n_items"]) == (3, 2, 1)
    assert r["n_event_types"] == 2 and r["null_itemid"] == 1


def test_session_length_quantiles_approx_close_to_exact(spark, make_events):
    from clickestream_project_bigdata_spark.operators.analytics import (
        session_length_quantiles,
    )
    from clickestream_project_bigdata_spark.operators.sessionize import (
        session_metrics,
        sessionize,
    )

    events = make_events(
        [(1, f"2024-01-01T00:{m:02d}:00", "view", 1) for m in range(0, 50, 5)]
        + [(2, "2024-01-01T00:00:00", "view", 1), (2, "2024-01-01T02:00:00", "view", 1)]
    )
    m = session_metrics(sessionize(events))
    [ex] = session_length_quantiles(m, exact=True).collect()
    [ap] = session_length_quantiles(m, exact=False).collect()
    assert ex["n_sessions"] == ap["n_sessions"]
    # approx_percentile returns actual order statistics (no interpolation):
    # each estimate must be a real session length, and monotone across q
    lengths = {r["session_length"] for r in m.collect()}
    assert {ap["p50"], ap["p90"], ap["p99"]} <= {float(x) for x in lengths}
    assert ap["p50"] <= ap["p90"] <= ap["p99"]


def test_key_skew_profile_orders_and_shares(spark):
    from clickestream_project_bigdata_spark.operators.analytics import key_skew_profile
    df = spark.createDataFrame(
        [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 1, "k long"
    )
    rows = key_skew_profile(df, "k", k=2).collect()
    assert [(r.k, r.n_rows, r.share) for r in rows] == [(1, 6, 0.6), (2, 3, 0.3)]

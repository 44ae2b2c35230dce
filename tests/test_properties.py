"""Property tests (SURVEY §5.4) — invariants over random event streams.

Each example builds a small single-user (or few-user) frame; examples are
capped because every example is a Spark round trip.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from clickestream_project_bigdata_spark.operators.sessionize import (
    session_metrics,
    sessionize,
)

BASE = dt.datetime(2024, 1, 1)

# strictly increasing gap list: each gap in seconds, mixing sub-gap and
# super-gap jumps around the 1800 s boundary
gaps_strategy = st.lists(
    st.sampled_from([1, 30, 1799, 1800, 1801, 3600, 60, 7200]),
    min_size=1,
    max_size=12,
)


def _events_from_gaps(spark, gaps: list[int], visitorid: int = 1):
    times, t = [BASE], BASE
    for g in gaps:
        t = t + dt.timedelta(seconds=g)
        times.append(t)
    rows = [(visitorid, "view", ts, 1) for ts in times]
    return spark.createDataFrame(
        rows, "visitorid long, event string, event_time timestamp, itemid long"
    )


@settings(max_examples=15, deadline=None)
@given(gaps=gaps_strategy)
def test_session_count_equals_big_gaps_plus_one(spark, gaps):
    """#sessions per user == #(gap > 1800 s) + 1 — the gaps-and-islands
    invariant, with the strict-> boundary (an exactly-1800 s gap does NOT
    split)."""
    events = _events_from_gaps(spark, gaps)
    n_sessions = session_metrics(sessionize(events)).count()
    assert n_sessions == sum(1 for g in gaps if g > 1800) + 1


@settings(max_examples=10, deadline=None)
@given(gaps=gaps_strategy)
def test_batch_and_session_window_agree(spark, gaps):
    """The native session_window partitioning yields the same number of
    sessions as the gaps-and-islands operator: touching windows merge, so
    both treat the exactly-1800 s boundary identically."""
    events = _events_from_gaps(spark, gaps)
    n_batch = session_metrics(sessionize(events)).count()
    n_sw = (
        events.groupBy(F.session_window("event_time", "30 minutes"), "visitorid")
        .count()
        .count()
    )
    assert n_batch == n_sw


@settings(max_examples=10, deadline=None)
@given(gaps=gaps_strategy)
def test_session_lengths_partition_the_timeline(spark, gaps):
    """Σ events_in_session == total events, and every session_length ≥ 0."""
    events = _events_from_gaps(spark, gaps)
    m = session_metrics(sessionize(events)).collect()
    assert sum(r["events_in_session"] for r in m) == len(gaps) + 1
    assert all(r["session_length"] >= 0 for r in m)

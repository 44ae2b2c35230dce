"""Custom stateful sessionization via ``applyInPandasWithState``.

Why this exists when `streaming/sessions.py` already has ``session_window``:
the native session window is the right default, but it is a fixed-function
operator. This module is the engine's **custom stateful operator** extension
point (SURVEY §7b) — arbitrary per-key state machines over a stream — shown
on the one stateful problem the reference actually has: cross-batch
sessionization with the reference's exact gap predicate (strictly ``> gap``
seconds between floored-epoch timestamps, `stream_processor.py:88-99`).

Semantics:

* state per ``visitorid``: the open session (start, last event time, count);
* each micro-batch merges its events in event-time order; a gap > ``gap_s``
  closes the current session (emitted) and opens a new one;
* an event-time timeout set to ``last + gap`` emits the still-open session
  once the watermark passes it — bounded state, late-data-safe;
* ``session_id`` = ``{visitorid}_{session_start_epoch}`` — globally stable
  (the per-batch ordinal of the reference restarts and collides, T6).

Scale shape: state is O(1) per active visitor (three numbers), the grouping
shuffles once on visitorid, and Arrow batches the Python boundary. The
output is append-mode: each session is emitted exactly once, when it closes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.StringType()),
        T.StructField("visitorid", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("events_in_session", T.LongType()),
        T.StructField("session_length", T.LongType()),
    ]
)

#: open-session state: (start_epoch_us, last_epoch_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_US = 1_000_000


def _emit_row(visitorid: int, start_us: int, last_us: int, n: int) -> dict[str, Any]:
    # floored-epoch seconds, matching the batch operator's unix_timestamp math
    start_s, last_s = start_us // _US, last_us // _US
    return {
        "session_id": f"{visitorid}_{start_s}",
        "visitorid": visitorid,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "events_in_session": n,
        "session_length": last_s - start_s,
    }


def _make_session_fn(gap_s: int):
    gap_us = gap_s * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (visitorid,) = key
        closed: list[dict[str, Any]] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append(_emit_row(visitorid, start_us, last_us, n))
            state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])
            return

        times: list[int] = []
        for pdf in pdfs:
            # normalize to epoch µs regardless of the datetime64 unit the
            # Arrow batch arrived with (ns under legacy conversion, µs native)
            times.extend(
                int(t) for t in pdf["event_time"].dt.as_unit("us").astype("int64")
            )
        times.sort()

        if state.exists:
            start_us, last_us, n = state.get
            pending = times
        else:
            start_us, last_us, n = times[0], times[0], 1
            pending = times[1:]

        # A late-but-within-watermark event can arrive in a later micro-batch
        # with an event time at or before the open session's last event.
        # Merge order-insensitively: the open session is an interval
        # [start, last]; sorted pending times land before / inside / after it.
        before = [t for t in pending if t < start_us]
        n += sum(1 for t in pending if start_us <= t <= last_us)
        after = [t for t in pending if t > last_us]

        if before:
            # events earlier than the open session: build sessions among
            # themselves (standard gap rule over the sorted prefix), then
            # either merge the final one into the open session or close it.
            b_start, b_last, b_n = before[0], before[0], 1
            for t_us in before[1:]:
                if (t_us // _US - b_last // _US) > gap_s:
                    closed.append(_emit_row(visitorid, b_start, b_last, b_n))
                    b_start, b_n = t_us, 1
                else:
                    b_n += 1
                b_last = t_us
            if (start_us // _US - b_last // _US) > gap_s:
                closed.append(_emit_row(visitorid, b_start, b_last, b_n))
            else:
                start_us, n = b_start, n + b_n

        for t_us in after:
            # reference gap: floored-second difference strictly > gap_s
            if (t_us // _US - last_us // _US) > gap_s:
                closed.append(_emit_row(visitorid, start_us, last_us, n))
                start_us, n = t_us, 1
            else:
                n += 1
            last_us = t_us

        state.update((start_us, last_us, n))
        # close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000 + 1)
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])

    return fn


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization as a per-visitor state machine. ``events``
    must be a streaming canonical-schema frame; output appends one row per
    CLOSED session (open sessions live in the state store until the
    watermark passes their ``last event + gap``)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy("visitorid")
        .applyInPandasWithState(
            _make_session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Decayed heavy hitters — the second custom stateful operator
# ---------------------------------------------------------------------------

DECAYED_SCHEMA = T.StructType(
    [
        T.StructField("itemid", T.LongType()),
        T.StructField("last_event_time", T.TimestampType()),
        T.StructField("decayed_count", T.DoubleType()),
        T.StructField("raw_events", T.LongType()),
    ]
)

#: per-item state: (last_event_us, decayed_count, lifetime_event_count)
DECAYED_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("decayed", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _make_decay_fn(half_life_s: float):
    import math

    lam = math.log(2.0) / (half_life_s * _US)  # decay rate per microsecond

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (itemid,) = key
        if state.exists:
            last_us, decayed, n = state.get
        else:
            last_us, decayed, n = None, 0.0, 0
        times: list[int] = []
        for pdf in pdfs:
            times.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["event_time"]))
        times.sort()
        for t_us in times:
            if last_us is None or t_us >= last_us:
                if last_us is not None:
                    decayed *= math.exp(-lam * (t_us - last_us))
                decayed += 1.0
                last_us = t_us
            else:
                # late (within-watermark) event from an earlier batch:
                # its mass joins already decayed to the CURRENT anchor —
                # the anchor never regresses, and the fold still equals
                # the batch closed form Σ exp(-λ(t_max − tᵢ))
                decayed += math.exp(-lam * (last_us - t_us))
            n += 1
        state.update((last_us, decayed, n))
        yield pd.DataFrame(
            [
                {
                    "itemid": itemid,
                    "last_event_time": pd.Timestamp(last_us * 1000),
                    "decayed_count": decayed,
                    "raw_events": n,
                }
            ]
        )

    return fn


def decayed_item_counts(
    events: DataFrame,
    half_life_s: float = 3600.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exponentially-decayed per-item interaction counts — the
    "trending now" signal: each event adds 1, mass halves every
    ``half_life_s`` of EVENT time, so a burst an hour ago weighs half a
    burst now and items fade instead of accumulating forever (a plain
    windowed count forgets abruptly at the window edge; decay is the
    smooth version).

    Per-item state is three numbers; each micro-batch folds its events in
    event-time order (decay is multiplicative between consecutive events,
    so the fold is exact and replay-stable) and emits the item's current
    (decayed_count, raw_events) — UPDATE semantics: the sink upserts by
    itemid and takes its own top-k. State never grows with event volume,
    only with distinct live items; the shuffle is the one itemid grouping.

    Batch-clock caveat: decay advances on event timestamps, not wall
    clock — an item with NO new events keeps its last emitted value until
    the next event (downstream top-k can decay lazily at read time with
    the same closed-form multiplier)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy("itemid")
        .applyInPandasWithState(
            _make_decay_fn(half_life_s),
            outputStructType=DECAYED_SCHEMA,
            stateStructType=DECAYED_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Cross-batch funnel progression — the third custom stateful operator
# ---------------------------------------------------------------------------

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("step_min_us", T.ArrayType(T.LongType())),
        T.StructField("n", T.LongType()),
    ]
)

#: TTL-mode state additionally tracks the visitor's last activity (the
#: event-time horizon the expiry timeout is anchored to)
FUNNEL_TTL_STATE_SCHEMA = T.StructType(
    FUNNEL_STATE_SCHEMA.fields + [T.StructField("last_us", T.LongType())]
)

FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("visitorid", T.LongType()),
        T.StructField("steps_reached", T.IntegerType()),
        T.StructField("step_times", T.ArrayType(T.TimestampType())),
        T.StructField("n_events", T.LongType()),
    ]
)

#: TTL-mode output adds the expiry flag: False on every live emission,
#: True exactly once — on the final row emitted when the visitor's state
#: expires (event-time TTL passed with no new activity)
FUNNEL_TTL_OUT_SCHEMA = T.StructType(
    FUNNEL_OUT_SCHEMA.fields + [T.StructField("expired", T.BooleanType())]
)


def _funnel_progress(mins: list) -> int:
    """Chained first-touch progression over the per-step minima: step i+1
    counts only if its first touch is at/after step i's."""
    k, prev = 0, None
    for m in mins:
        if m is None or (prev is not None and m < prev):
            break
        k, prev = k + 1, m
    return k


def _funnel_row(
    visitorid: int, mins: list, n: int, expired: bool | None
) -> pd.DataFrame:
    k = _funnel_progress(mins)
    row: dict[str, Any] = {
        "visitorid": visitorid,
        "steps_reached": k,
        "step_times": [pd.Timestamp(m * 1000) for m in mins[:k]],
        "n_events": n,
    }
    if expired is not None:
        row["expired"] = expired
    return pd.DataFrame([row])


def _make_funnel_fn(steps: list[str], ttl_s: int | None = None):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (visitorid,) = key
        if ttl_s is not None and state.hasTimedOut:
            # expiry: emit the visitor's FINAL row exactly once (same
            # values the last live emission carried, expired=True), then
            # drop the state — a later event re-enters the visitor as new
            # (the sliding-horizon contract, mirroring ingest dedup)
            mins, n, _last = state.get
            state.remove()
            yield _funnel_row(visitorid, list(mins), n, True)
            return
        last_us = 0
        if state.exists:
            if ttl_s is None:
                mins, n = state.get
            else:
                mins, n, prior_last = state.get
                last_us = int(prior_last or 0)
            mins = list(mins)
        else:
            mins, n = [None] * len(steps), 0
        for pdf in pdfs:
            n += len(pdf)
            ev = pdf["event"]
            us = pd.to_datetime(pdf["event_time"]).astype("int64") // 1000
            if len(us):
                last_us = max(last_us, int(us.max()))
            for i, s in enumerate(steps):
                mask = ev == s
                if mask.any():
                    m = int(us[mask].min())
                    if mins[i] is None or m < mins[i]:
                        mins[i] = m
        if ttl_s is None:
            state.update((mins, n))
        else:
            state.update((mins, n, last_us))
            # expire ttl_s of EVENT time after the visitor's last activity;
            # Spark requires the timeout strictly past the current watermark
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(last_us // 1000, wm_ms) + ttl_s * 1000
            )
        yield _funnel_row(
            visitorid, mins, n, None if ttl_s is None else False
        )

    return fn


def stateful_funnel(
    events: DataFrame,
    steps: list[str],
    watermark: str = "1 hour",
    ttl_s: int | None = None,
) -> DataFrame:
    """Cross-batch FIRST-TOUCH ordered funnel: per visitor, how many of
    ``steps`` have been completed in order, where step i+1 counts only if
    its first-ever occurrence is at/after step i's first occurrence. The
    streaming complement of the batch ``sequential_funnel`` family — this
    one keeps progressing as batches arrive, with UPDATE-mode emission
    (sink upserts by visitorid; a global funnel report is a count by
    steps_reached downstream).

    Semantics are a pure function of each step's MINIMUM event time —
    min is commutative and associative, so the result is independent of
    batch boundaries and within-watermark arrival order (test-pinned by
    feeding the same events under different batch splits). That is the
    property that makes bounded state EXACT here: O(|steps|) longs per
    live visitor, no event buffer. Strict chained-min semantics (step
    times re-anchored on each earlier step's CONSTRAINED time) cannot be
    computed with bounded state under late data — a late earlier-step
    event can resurrect an already-discarded later-step time — which is
    why the first-touch form is the streaming contract; the one shuffle
    is the visitorid grouping.

    **State bound** (VERDICT r11 #4): the default ``ttl_s=None`` keeps
    O(|steps|) longs for every visitor ever seen — exact forever, but on
    an unbounded stream that is a slow state leak (1B visitors ≈ tens of
    GB of state store). With ``ttl_s`` set, a visitor inactive for
    ``ttl_s`` seconds of EVENT time (watermark-driven, like every
    event-time timeout) is expired: their final row is emitted EXACTLY
    once more with ``expired=True`` (the output gains that boolean
    column; live emissions carry ``expired=False``), the state is
    dropped, and a later event re-enters them as a fresh visitor — the
    same sliding-horizon contract :func:`stateful_ingest_dedup`
    documents. Pre-expiry semantics are unchanged: every live emission
    equals the untimed operator's row for the same prefix of events
    (test-pinned)."""
    if ttl_s is None:
        out_schema, state_schema = FUNNEL_OUT_SCHEMA, FUNNEL_STATE_SCHEMA
        timeout = GroupStateTimeout.NoTimeout
    else:
        if ttl_s <= 0:
            raise ValueError(f"ttl_s must be positive, got {ttl_s}")
        out_schema, state_schema = (
            FUNNEL_TTL_OUT_SCHEMA,
            FUNNEL_TTL_STATE_SCHEMA,
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    return (
        events.withWatermark("event_time", watermark)
        .groupBy("visitorid")
        .applyInPandasWithState(
            _make_funnel_fn(list(steps), ttl_s),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


# ---------------------------------------------------------------------------
# Stateful streaming ingest dedup (the 4th custom stateful operator)
# ---------------------------------------------------------------------------

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("ingest_time", T.TimestampType()),
        T.StructField("is_duplicate", T.BooleanType()),
        T.StructField("canonical_doc_id", T.LongType()),
        T.StructField("dup_rank", T.LongType()),
    ]
)

#: per-fingerprint state: (first-arrived doc id, its epoch-us, docs seen)
DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_id", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _make_ingest_dedup_fn(ttl_s: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (fp,) = key
        if state.hasTimedOut:
            # the dedup window for this fingerprint has passed: drop the
            # state; a future duplicate re-enters as "new" (the documented
            # sliding-window contract that keeps state bounded)
            state.remove()
            return
        if state.exists:
            first_id, first_us, n = state.get
        else:
            first_id, first_us, n = None, None, 0
        rows = []
        last_us = first_us or 0
        for pdf in pdfs:
            us = pd.to_datetime(pdf["ingest_time"]).astype("int64") // 1000
            order = sorted(
                range(len(pdf)),
                key=lambda i: (int(us.iloc[i]), int(pdf["doc_id"].iloc[i])),
            )
            for i in order:
                did = int(pdf["doc_id"].iloc[i])
                t_us = int(us.iloc[i])
                last_us = max(last_us, t_us)
                n += 1
                if first_id is None:
                    first_id, first_us = did, t_us
                rows.append(
                    {
                        "fingerprint": fp,
                        "doc_id": did,
                        "ingest_time": pd.Timestamp(t_us * 1000),
                        # a replay of the canonical id itself is NOT a
                        # duplicate — idempotent under at-least-once delivery
                        "is_duplicate": did != first_id,
                        "canonical_doc_id": first_id,
                        "dup_rank": n - 1,
                    }
                )
        state.update((first_id, first_us, n))
        # timeout strictly after the current watermark (Spark requirement)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_us // 1000, wm_ms) + ttl_s * 1000)
        if rows:
            yield pd.DataFrame(rows)

    return fn


def stateful_ingest_dedup(
    docs: DataFrame,
    ttl_s: int = 3600,
    watermark: str = "10 minutes",
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str = "ingest_time",
) -> DataFrame:
    """Cross-batch streaming ingest dedup with canonical-id attribution —
    what ``dropDuplicatesWithinWatermark`` cannot give you: every arriving
    document is EMITTED (update mode) with ``is_duplicate``, the
    fingerprint's first-arrived ``canonical_doc_id``, and its
    ``dup_rank``, so the sink can both filter survivors AND account for
    what was dropped (dup-rate dashboards, lineage audits).

    Keyed by ``md5(normalized text)`` computed JVM-side before the one
    fingerprint-keyed shuffle (text bodies never enter Python); state is
    three numbers per live fingerprint, expired by an event-time timeout
    ``ttl_s`` after the fingerprint's last arrival — bounded state, and
    the documented contract is a SLIDING dedup window: a duplicate
    arriving after its fingerprint's state expired re-enters as new
    (exactly the ``dropDuplicatesWithinWatermark`` tradeoff).

    First-arrival is decided by (ingest_time, doc_id) order — with equal
    timestamps this is min-id, making the one-batch survivor set EQUAL to
    the batch :func:`~..operators.dedup.dedup_keep_first` (pinned in
    tests, along with batch-split invariance under order-preserving
    splits)."""
    from pyspark.sql import functions as F

    fp = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )
    keyed = docs.select(
        fp.alias("fingerprint"),
        F.col(id_col).alias("doc_id"),
        F.col(time_col).alias("ingest_time"),
    )
    return (
        keyed.withWatermark("ingest_time", watermark)
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _make_ingest_dedup_fn(int(ttl_s)),
            outputStructType=DEDUP_OUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

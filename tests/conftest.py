from __future__ import annotations

import datetime as dt

import pytest

from clickestream_project_bigdata_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def make_events(spark):
    """Tiny canonical-schema event frames from (visitorid, iso_time, event, itemid)."""

    def _make(rows):
        data = [
            (int(v), e, ts(t), None if i is None else int(i))
            for (v, t, e, i) in rows
        ]
        return spark.createDataFrame(
            data, "visitorid long, event string, event_time timestamp, itemid long"
        )

    return _make

"""Reusable column expressions. All JVM-side (higher-order functions) — these
run inside whole-stage codegen, no Python in the data path."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def minute_of(ts: Column) -> Column:
    """The reference's per-minute grain (`stream_processor.py:236` et al.)."""
    return F.date_trunc("minute", ts)


def dot_product(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product over two array<numeric> columns in
    DOUBLE — deterministic accumulation order (matches a scalar loop)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))

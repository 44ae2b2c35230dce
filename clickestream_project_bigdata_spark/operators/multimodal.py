"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed through Arrow-batched Pandas functions.

The container has no image/audio libraries, so the decode step itself is
STUBBED (deterministic fake derived from the byte payload, or
``NotImplementedError`` when ``real=True``); everything Spark-side — schema,
``mapInPandas`` plumbing, Arrow batch shape, partition behavior — is real and
tested. Swapping the stub for PIL/torchaudio is a one-function change.

Scale shape: decode is a narrow per-partition pass (no shuffle); batch size
is controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch``, which is
what bounds executor memory when the binary payloads are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_hash", T.LongType()),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal corpus on the fixture: the utf-8 bytes of the text
    stand in for an encoded image payload, plus typed metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image decoder: dimensions derived from
    the payload size. Mirrored in the SQL oracle."""
    n = len(payload)
    return n, 64 + n % 577, 64 + (n * 31) % 417, 3


def decode_images(binary_df: DataFrame, real: bool = False) -> DataFrame:
    """Arrow-batched decode over ``mapInPandas``. ``real=True`` is the hook
    for an actual decoder (PIL etc. — not installed here)."""
    if real:
        raise NotImplementedError(
            "real image decoding requires PIL/opencv, not available in this "
            "container; use real=False for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "height": [d[2] for d in decoded],
                    "channels": [d[3] for d in decoded],
                }
            )

    return binary_df.mapInPandas(decode, DECODED_SCHEMA)


FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    binary_df: DataFrame,
    real: bool = False,
    dim: int = FEATURE_DIM,
    normalize: bool = True,
) -> DataFrame:
    """Feature extraction over ``mapInPandas``: payload → fixed-dim float
    vector. The extractor is a deterministic byte-histogram projection (a
    real model — CLIP/ResNet — would slot into the same Arrow-batched
    signature; not installed in this container, ``real=True`` raises).

    Output embeds straight into the similarity operators
    (`similarity.brute_force_topk` etc. over the ``feature`` column).
    ``normalize=False`` returns the raw per-bucket byte counts (exact
    integers — what the SQL oracle hash-checks; the L2 normalization is a
    float32 division the oracle could only approximate)."""
    if real:
        raise NotImplementedError(
            "real feature extraction requires a vision/audio model runtime; "
            "use real=False for the deterministic byte-histogram stub"
        )

    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                if normalize:
                    norm = np.linalg.norm(hist)
                    hist = hist / (norm if norm else 1.0)
                feats.append(list(hist))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "feature": feats}
            )

    return binary_df.mapInPandas(extract, FEATURE_SCHEMA)


def resize_meta(decoded: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize bookkeeping (scale factors) — the tensor op itself would live in
    the decode UDF; the metadata math is plain Catalyst."""
    return decoded.select(
        "doc_id",
        F.lit(target_w).alias("target_w"),
        F.lit(target_h).alias("target_h"),
        F.round(F.col("width") / target_w, 6).alias("scale_x"),
        F.round(F.col("height") / target_h, 6).alias("scale_y"),
    )


def sample_frames(binary_df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video-style frame sampling: a fake frame count from the payload size,
    then every ``every_nth`` frame index materialized JVM-side (explode of a
    sequence — the decode of sampled frames would be a second mapInPandas)."""
    n_frames = (F.col("meta.n_bytes") % 100) + F.lit(1)
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
    return binary_df.select(
        "doc_id", F.explode(idx).alias("frame_idx")
    ).withColumn("frame_hash", F.xxhash64("doc_id", "frame_idx"))

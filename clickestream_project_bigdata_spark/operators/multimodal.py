"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed through Arrow-batched Pandas functions.

The container has no image/audio libraries, so PIXEL decode itself is
STUBBED (deterministic fake derived from the byte payload, or
``NotImplementedError`` when ``real=True``); everything Spark-side — schema,
``mapInPandas`` plumbing, Arrow batch shape, partition behavior — is real and
tested. Swapping the stub for PIL/torchaudio is a one-function change.
Dimension/format triage, however, is FULLY REAL with no library:
:func:`image_header_dimensions` (PNG/GIF/BMP, pure Catalyst byte slicing)
and :func:`jpeg_dimensions` (stdlib SOF segment walk on the Arrow path) —
tested against genuine container bytes.

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


def image_header_dimensions(
    binary_df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL image metadata from container headers — no decoder library
    needed: PNG (IHDR big-endian dims at fixed offsets), GIF (little-endian
    logical-screen dims), and BMP (little-endian DIB dims) carry width and
    height at format-fixed byte positions, so extraction is pure Catalyst
    byte slicing (``substring`` on binary + hex→int) — a narrow, shuffle-
    free, codegen'd pass. This is the corpus-triage step (resolution
    filters, aspect-ratio stats, thumbnail-vs-full routing) that a 100 TB
    image crawl runs BEFORE paying for any real decode.

    JPEG dimensions live in a variable-position SOF marker (a linear scan
    of length-prefixed segments), which a fixed projection cannot express:
    JPEGs are detected (``format='jpeg'``) with NULL dims — route them to
    the Arrow `decode_images` path. Unknown payloads: format 'unknown'.
    NB BMP stores dims as SIGNED little-endian (negative height = top-down
    row order); this reads them unsigned, so a top-down BMP surfaces as an
    implausibly large height — filter ``height < 2³¹`` or normalize
    downstream if such files matter.

    Output: (id_col, format, width, height)."""
    p = F.col(payload_col)

    def be(pos: int, n: int):
        # big-endian unsigned int from n bytes at 1-based offset pos
        return F.conv(F.hex(F.substring(p, pos, n)), 16, 10).cast("long")

    def le(pos: int, n: int):
        out = F.lit(0).cast("long")
        for i in range(n):
            out = out + be(pos + i, 1) * (256 ** i)
        return out

    hdr = F.hex(F.substring(p, 1, 8))
    is_png = hdr == "89504E470D0A1A0A"
    is_gif = F.hex(F.substring(p, 1, 3)) == "474946"
    is_bmp = F.hex(F.substring(p, 1, 2)) == "424D"
    is_jpeg = F.hex(F.substring(p, 1, 2)) == "FFD8"
    fmt = (
        F.when(is_png, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_bmp, F.lit("bmp"))
        .when(is_jpeg, F.lit("jpeg"))
        .otherwise(F.lit("unknown"))
    )
    width = (
        F.when(is_png, be(17, 4))
        .when(is_gif, le(7, 2))
        .when(is_bmp, le(19, 4))
        .otherwise(F.lit(None).cast("long"))
    )
    height = (
        F.when(is_png, be(21, 4))
        .when(is_gif, le(9, 2))
        .when(is_bmp, le(23, 4))
        .otherwise(F.lit(None).cast("long"))
    )
    return binary_df.select(
        F.col(id_col), fmt.alias("format"), width.alias("width"), height.alias("height")
    )


JPEG_DIM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def _jpeg_dims(payload: bytes) -> tuple[int | None, int | None]:
    """Walk JPEG length-prefixed segments to the first SOF marker (C0–CF
    minus the non-frame C4/C8/CC) and read the 16-bit big-endian dims.
    Pure stdlib byte arithmetic — no image library."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None, None
    i = 2
    n = len(payload)
    while i + 3 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if i + 3 >= n:
            break
        seg_len = (payload[i + 2] << 8) | payload[i + 3]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 8 < n:
                h = (payload[i + 5] << 8) | payload[i + 6]
                w = (payload[i + 7] << 8) | payload[i + 8]
                return w, h
            return None, None
        i += 2 + seg_len
    return None, None


def jpeg_dimensions(
    binary_df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL JPEG dimension extraction — the Arrow-batched complement to
    :func:`image_header_dimensions` for the one mainstream format whose
    dims sit behind a variable-length segment walk. This is NOT a stub:
    the SOF scan is stdlib byte arithmetic, so the multimodal family's
    dimension triage is fully functional for PNG/GIF/BMP (JVM-side) +
    JPEG (Arrow path) without any decoder library. Non-JPEG or truncated
    payloads yield NULL dims.

    Same scale shape as decode_images: narrow per-partition mapInPandas,
    no shuffle, executor memory bounded by the Arrow batch size."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_jpeg_dims(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.array([d[0] for d in dims], dtype="Int64"),
                    "height": pd.array([d[1] for d in dims], dtype="Int64"),
                }
            )

    return binary_df.select(F.col(id_col).alias("doc_id"), payload_col).mapInPandas(
        scan, JPEG_DIM_SCHEMA
    )

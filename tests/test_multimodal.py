"""Multimodal plumbing: binary payloads + Arrow-batched decode stub."""

from __future__ import annotations

import pytest

from clickestream_project_bigdata_spark.operators import multimodal


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "abc"), (2, "hello world"), (3, "x" * 200)],
        "doc_id long, text string",
    )


def test_attach_binary_schema(docs):
    out = multimodal.attach_binary(docs)
    assert out.schema["payload"].dataType.simpleString() == "binary"
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].meta.n_bytes == 3 and r[3].meta.n_bytes == 200


def test_decode_stub_deterministic(docs):
    out = multimodal.decode_images(multimodal.attach_binary(docs))
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].n_bytes == 3
    assert r[1].width == 64 + 3 % 577 and r[1].height == 64 + (3 * 31) % 417
    assert r[1].channels == 3
    # schema is the declared one
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_bytes", "width", "height", "channels"]


def test_decode_real_raises(docs):
    with pytest.raises(NotImplementedError):
        multimodal.decode_images(multimodal.attach_binary(docs), real=True)


def test_resize_meta(docs):
    decoded = multimodal.decode_images(multimodal.attach_binary(docs))
    out = {r.doc_id: r for r in multimodal.resize_meta(decoded).collect()}
    assert out[1].target_w == 224
    assert out[1].scale_x == round((64 + 3 % 577) / 224, 6)


def test_extract_features_unit_norm_and_determinism(docs):
    out = multimodal.extract_features(multimodal.attach_binary(docs))
    r = {x.doc_id: x.feature for x in out.collect()}
    assert len(r[1]) == multimodal.FEATURE_DIM
    assert abs(sum(v * v for v in r[2]) - 1.0) < 1e-5  # unit norm
    # deterministic: same payload → same feature
    again = {x.doc_id: x.feature for x in
             multimodal.extract_features(multimodal.attach_binary(docs)).collect()}
    assert r == again


def test_features_feed_similarity_operators(spark, docs):
    from clickestream_project_bigdata_spark.operators import similarity

    feats = multimodal.extract_features(multimodal.attach_binary(docs))
    top = similarity.brute_force_topk(
        feats, query_id=1, k=2, id_col="doc_id", vec_col="feature"
    ).collect()
    assert top[0]["doc_id"] == 1 and top[0]["score"] == 1.0


def test_sample_frames(docs):
    out = multimodal.sample_frames(multimodal.attach_binary(docs), every_nth=10)
    rows = {(r.doc_id, r.frame_idx) for r in out.collect()}
    # doc 1: n_bytes=3 -> n_frames=4 -> indices 0 only (0..3 step 10)
    assert (1, 0) in rows and (1, 10) not in rows
    # doc 3: n_bytes=200 -> n_frames=1 -> index 0
    assert (3, 0) in rows
    # doc 2: n_bytes=11 -> n_frames=12 -> 0, 10
    assert (2, 10) in rows


def test_image_header_dimensions_real_formats(spark):
    """Genuine container bytes: a valid 3x2 PNG (built with zlib), a GIF
    logical screen, a BMP DIB header, a JPEG magic (detected, NULL dims),
    and garbage -> unknown. All parsed JVM-side from fixed offsets."""
    import struct
    import zlib

    from clickestream_project_bigdata_spark.operators.multimodal import (
        image_header_dimensions,
    )

    def png_bytes(w, h):
        def chunk(typ, data):
            c = typ + data
            return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    gif = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00" * 10
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 1920, 1080) + b"\x00" * 10
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    rows = [(1, png_bytes(3, 2)), (2, gif), (3, bmp), (4, jpeg), (5, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.format, r.width, r.height)
           for r in image_header_dimensions(df).collect()}
    assert got[1] == ("png", 3, 2)
    assert got[2] == ("gif", 640, 480)
    assert got[3] == ("bmp", 1920, 1080)
    assert got[4] == ("jpeg", None, None)
    assert got[5] == ("unknown", None, None)


def test_jpeg_dimensions_sof_scan(spark):
    """A real minimal JPEG structure (APP0 + DQT + SOF0) yields exact
    dims via the segment walk; progressive SOF2 also; garbage -> NULL."""
    import struct

    from clickestream_project_bigdata_spark.operators.multimodal import (
        jpeg_dimensions,
    )

    def jpeg_bytes(w, h, sof=0xC0):
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
        sof0 = bytes([0xFF, sof]) + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x11\x00"
        return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"

    rows = [
        (1, jpeg_bytes(800, 600)),
        (2, jpeg_bytes(31, 17, sof=0xC2)),  # progressive
        (3, b"\xff\xd8\xff\xd9"),           # no SOF
        (4, b"PNG-ish garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.width, r.height) for r in jpeg_dimensions(df).collect()}
    assert got[1] == (800, 600)
    assert got[2] == (31, 17)
    assert got[3] == (None, None)
    assert got[4] == (None, None)

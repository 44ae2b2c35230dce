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


def test_sample_frames(docs):
    out = multimodal.sample_frames(multimodal.attach_binary(docs), every_nth=10)
    rows = {(r.doc_id, r.frame_idx) for r in out.collect()}
    # doc 1: n_bytes=3 -> n_frames=4 -> indices 0 only (0..3 step 10)
    assert (1, 0) in rows and (1, 10) not in rows
    # doc 3: n_bytes=200 -> n_frames=1 -> index 0
    assert (3, 0) in rows
    # doc 2: n_bytes=11 -> n_frames=12 -> 0, 10
    assert (2, 10) in rows

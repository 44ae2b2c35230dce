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

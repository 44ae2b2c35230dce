"""Similarity search: brute-force exactness on hand vectors; LSH recall
against the brute-force baseline on the fixture embeddings."""

from __future__ import annotations

import pytest

from clickestream_project_bigdata_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def vectors(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),   # identical -> cos 1
            (2, [0.0, 1.0, 0.0]),   # orthogonal -> cos 0
            (3, [0.9, 0.1, 0.0]),   # close
            (4, [-1.0, 0.0, 0.0]),  # opposite -> cos -1
        ],
        "vec_id long, embedding array<float>",
    )


def test_brute_force_topk_ordering(vectors):
    got = [(r.vec_id, r.score) for r in similarity.brute_force_topk(vectors, 0, k=5).collect()]
    assert [v for v, _ in got] == [0, 1, 3, 2, 4]
    assert got[0][1] == 1.0 and got[1][1] == 1.0
    assert got[3][1] == 0.0 and got[4][1] == -1.0


def test_lsh_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = [r.vec_id for r in similarity.brute_force_topk(emb, 0, k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.lsh_topk(emb, 0, k=10, num_planes=4).collect()
    ]
    # the query itself is always found, and recall@10 should be non-trivial
    assert exact[0] == 0 and approx[0] == 0
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"recall@10 = {recall}"


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF with generous nprobe must recover most of the exact top-k; the
    query vector itself (score 1.0) is always in its own probed cell."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = [r.vec_id for r in similarity.brute_force_topk(emb, query_id=0, k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.ivf_topk(
            emb, query_id=0, k=10, num_centroids=4, nprobe=2
        ).collect()
    ]
    assert approx[0] == 0  # the query itself, cosine 1.0
    assert len(set(exact) & set(approx)) >= 5  # recall@10 ≥ 0.5 with 2/4 cells


def test_all_pairs_above_selfconsistency(vectors):
    pairs = {
        (r.id_a, r.id_b): r.score
        for r in similarity.all_pairs_above(vectors, threshold=0.99, num_planes=2, dim=3).collect()
    }
    # identical vectors land in the same bucket by construction
    assert pairs.get((0, 1)) == 1.0


def test_all_pairs_banded_guard_matches_sql_path(spark):
    """Skewed corpus: 60 near-identical vectors pile into one band bucket.
    With max_bucket_rows=20 that bucket must take the slim-join fallback
    (never materialized in one pandas frame) and still produce the same
    pairs as the zero-Python sql path."""
    import random

    random.seed(11)
    rows = []
    for i in range(60):  # skew: one dominant direction + small noise
        rows.append((i, [1.0 + random.uniform(-0.01, 0.01) for _ in range(8)]))
    for i in range(60, 80):  # background: random directions
        rows.append((i, [random.uniform(-1, 1) for _ in range(8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kw = dict(threshold=0.99, num_planes=4, bands=2, dim=8)
    guarded = {
        (r.id_a, r.id_b): r.score
        for r in similarity.all_pairs_above(
            emb, method="pandas", max_bucket_rows=20, **kw
        ).collect()
    }
    sql = {
        (r.id_a, r.id_b): r.score
        for r in similarity.all_pairs_above(emb, method="sql", **kw).collect()
    }
    assert len(guarded) >= 60 * 59 / 2  # the skewed clique is all-pairs similar
    assert guarded == sql


def _skewed_embeddings(spark):
    import random

    random.seed(11)
    rows = []
    for i in range(60):  # skew: one dominant direction + small noise
        rows.append((i, [1.0 + random.uniform(-0.01, 0.01) for _ in range(8)]))
    for i in range(60, 80):  # background: random directions
        rows.append((i, [random.uniform(-1, 1) for _ in range(8)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_knn_join_guard_matches_sql_path(spark):
    """Skewed corpus: the 60-row clique bucket exceeds max_bucket_rows=20,
    so it must take the slim directed pair-join fallback while the small
    buckets take the bucket-local top-k matmul — and the merged result must
    equal the unguarded zero-Python sql path exactly (rank included)."""
    emb = _skewed_embeddings(spark)
    kw = dict(k=3, num_planes=4, bands=2, dim=8)
    guarded = {
        (r.vec_id, r.rank): (r.neighbor_id, r.score)
        for r in similarity.knn_join(
            emb, method="pandas", max_bucket_rows=20, **kw
        ).collect()
    }
    sql = {
        (r.vec_id, r.rank): (r.neighbor_id, r.score)
        for r in similarity.knn_join(emb, method="sql", **kw).collect()
    }
    assert len(guarded) >= 60 * 3  # every clique member has ≥ k candidates
    assert guarded == sql


def test_knn_join_small_bucket_emission_bounded(spark):
    """With the cap above every bucket size, all buckets take the matmul
    path, which emits at most k neighbors per row per band — and the result
    still matches the unguarded sql path (bucket-local top-k is lossless)."""
    emb = _skewed_embeddings(spark)
    kw = dict(k=3, num_planes=4, bands=2, dim=8)
    guarded = similarity.knn_join(emb, method="pandas", max_bucket_rows=10_000, **kw)
    rows = guarded.collect()
    sql = {
        (r.vec_id, r.rank): (r.neighbor_id, r.score)
        for r in similarity.knn_join(emb, method="sql", **kw).collect()
    }
    assert {(r.vec_id, r.rank): (r.neighbor_id, r.score) for r in rows} == sql
    # directed-pair volume is bounded by n * k * bands, not n² per bucket
    assert len(rows) <= 80 * 3


def test_normalize_and_quantize_embeddings(spark):
    """Normalized vectors have unit norm; int8 codes stay in [-127, 127]
    with max|code| = 127; dequantized cosine tracks exact cosine."""
    import math

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    norm_rows = similarity.normalize_embeddings(emb).collect()
    for r in norm_rows[:50]:
        n = math.sqrt(sum(x * x for x in r.normalized))
        assert abs(n - 1.0) < 1e-4
    q_rows = {r.vec_id: r for r in similarity.quantize_embeddings(emb).collect()}
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    for vid, r in list(q_rows.items())[:50]:
        assert max(abs(c) for c in r.qvec) == 127
        assert all(-127 <= c <= 127 for c in r.qvec)
        # dequantized reconstruction error per component <= 0.5/scale
        v = vecs[vid]
        err = max(abs(c / r.scale - x) for c, x in zip(r.qvec, v))
        assert err <= 0.5 / r.scale + 1e-9


def test_label_centroids_exact_means(spark):
    from clickestream_project_bigdata_spark.operators.similarity import label_centroids

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [3.0, 2.0], "a"),
            (3, [10.0, -4.0], "b"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    got = {r.label: (r.n_vectors, r.centroid_q6) for r in label_centroids(emb).collect()}
    # a: mean (2.0, 1.0) -> 2000000,1000000 ; b: (10.0, -4.0)
    assert got["a"] == (2, "2000000,1000000")
    assert got["b"] == (1, "10000000,-4000000")


def test_nearest_centroid_classify_separable(spark):
    """Two well-separated label groups: every vector classifies back to its
    own label with high cosine; tie-break and schema pinned."""
    from clickestream_project_bigdata_spark.operators.similarity import (
        nearest_centroid_classify,
    )

    rows = [
        (0, [1.0, 0.0, 0.1], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.1], 1),
        (3, [0.1, 0.9, 0.0], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r for r in nearest_centroid_classify(emb).collect()}
    assert all(got[i].pred_label == got[i].label for i in range(4))
    assert all(got[i].score > 0.9 for i in range(4))


def test_nearest_centroid_tie_breaks_low_label(spark):
    """A vector equidistant from two centroids must take the LOWER label."""
    from clickestream_project_bigdata_spark.operators.similarity import (
        nearest_centroid_classify,
    )

    rows = [
        (0, [1.0, 0.0], 3),
        (1, [0.0, 1.0], 7),
        (2, [1.0, 1.0], 3),  # cos to both centroids identical
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r.pred_label for r in nearest_centroid_classify(emb).collect()}
    assert got[2] == 3


def test_norm_profile_hand_computed(spark):
    """Norms 5 (3-4-0) and 1 under label 0: min/max/avg exact; zero
    vector shows up as min 0."""
    emb = spark.createDataFrame(
        [
            (0, [3.0, 4.0, 0.0], 0),
            (1, [0.0, 1.0, 0.0], 0),
            (2, [0.0, 0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.label: r for r in similarity.norm_profile(emb).collect()}
    a = got[0]
    assert (a.n_vectors, a.min_norm, a.max_norm, a.avg_norm) == (2, 1.0, 5.0, 3.0)
    z = got[1]
    assert (z.n_vectors, z.min_norm, z.max_norm, z.avg_norm) == (1, 0.0, 0.0, 0.0)


def test_cluster_inertia_hand_computed(spark):
    """Two vectors at (0,0) and (2,0) under one label: centroid (1,0),
    inertia = 1+1 = 2; singleton cluster has inertia 0."""
    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0], 0),
            (1, [2.0, 0.0], 0),
            (2, [7.0, -3.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r.label: r for r in similarity.cluster_inertia(emb).collect()}
    assert got[0].n_vectors == 2 and got[0].inertia == 2.0
    assert got[1].n_vectors == 1 and got[1].inertia == 0.0


def test_norm_profile_and_inertia_empty(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    assert similarity.norm_profile(emb).count() == 0
    assert similarity.cluster_inertia(emb).count() == 0


def test_norm_profile_and_inertia_skip_null_vectors(spark):
    """NULL embedding rows contribute nothing (norm NULL is ignored by
    min/max/avg; posexplode skips NULL arrays) — mirrors how the other
    embedding operators treat missing vectors."""
    emb = spark.createDataFrame(
        [(0, [3.0, 4.0], 0), (1, None, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    p = similarity.norm_profile(emb).collect()[0]
    assert p.n_vectors == 1
    assert p.min_norm == p.max_norm == p.avg_norm == 5.0
    i = similarity.cluster_inertia(emb).collect()[0]
    assert i.n_vectors == 1 and i.inertia == 0.0


def test_ann_recall_eval_bounds_and_brute_equality(spark):
    """recall in [0,1]; evaluating brute force against itself via a
    degenerate all-in-one-bucket LSH (num_planes=0 -> every vector in
    bucket 0) gives recall exactly 1.0; missing query -> zero rows."""
    from clickestream_project_bigdata_spark.operators import similarity

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    r = similarity.ann_recall_eval(emb, query_id=0, k=10, method="lsh", num_planes=4)
    row = r.collect()[0]
    assert row.n_exact == 10 and 0.0 <= row.recall_at_k <= 1.0
    assert row.n_hits <= min(row.n_exact, row.n_approx)
    perfect = similarity.ann_recall_eval(
        emb, query_id=0, k=10, method="lsh", num_planes=0
    ).collect()[0]
    assert perfect.recall_at_k == 1.0 and perfect.n_hits == 10
    missing = similarity.ann_recall_eval(emb, query_id=-1, k=10, method="lsh")
    assert missing.count() == 0


def test_embedding_dim_stats_hand_computed(spark):
    from clickestream_project_bigdata_spark.operators.similarity import (
        embedding_dim_stats,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 0.0]), (3, [5.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.idx: r for r in embedding_dim_stats(emb).collect()}
    assert got[0].n_values == 3 and got[0].dim_mean == 3.0
    # var = ((1-3)^2 + 0 + (5-3)^2)/3 = 8/3
    assert got[0].dim_var == round(8 / 3, 6)
    assert (got[0].dim_min, got[0].dim_max) == (1.0, 5.0)
    assert got[1].dim_var == 0.0 and got[1].dim_mean == 0.0


def test_embedding_outliers_farthest_from_centroid(spark):
    """Label 0: three near-identical vectors + one far vector — the far one
    ranks 1; ranks are contiguous and capped at top_k."""
    from clickestream_project_bigdata_spark.operators.similarity import (
        embedding_outliers,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.02], 0),
            (3, [0.98, 0.0], 0),
            (4, [-1.0, 0.0], 0),  # far outlier
            (5, [0.0, 1.0], 1),
            (6, [0.0, 0.9], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = embedding_outliers(emb, top_k=2).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append((r.dist_rank, r.vec_id))
    assert sorted(by_label[0])[0] == (1, 4)  # the flipped vector is rank 1
    assert len(by_label[0]) == 2 and len(by_label[1]) == 2

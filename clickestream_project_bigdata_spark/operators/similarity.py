"""Similarity search over an embedding column (`array<float>`).

Two paths, as a 100 TB pipeline needs both:

* **brute-force cosine top-k** — the exact baseline. One narrow pass over
  the embeddings (dot products in codegen via zip_with/aggregate), then a
  top-k. Linear, no shuffle except the final k rows. Right answer, full scan.
* **LSH-bucketed (random hyperplane) top-k** — the scale path. Deterministic
  pseudo-random hyperplanes (seeded from xxhash64) map each vector to a bucket;
  only the query's bucket (plus optional multiprobe neighbors) is rescored
  exactly. Sublinear candidates, tunable recall; recall vs the brute-force
  baseline is pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.columns import cosine_similarity, dot_product, l2_norm


def _query_frame(embeddings: DataFrame, query_id: int, id_col: str, vec_col: str) -> DataFrame:
    """The query vector as a 1-row broadcastable frame — keeps the whole
    operator declarative (no driver-side collect of data)."""
    return embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__query_vec")
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against the vector of ``query_id``. Deterministic
    tiebreak (score DESC, id ASC)."""
    q = _query_frame(embeddings, query_id, id_col, vec_col)
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("__query_vec")), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def hyperplane_bits(vec: Column, num_planes: int, dim: int, seed: int = 7) -> Column:
    """Random-hyperplane signature: bit p = sign(vec · plane_p), planes drawn
    from a deterministic xxhash64-based uniform in [-1, 1]. All JVM-side."""

    def plane_component(p: int, d: Column) -> Column:
        h = F.xxhash64(F.lit(seed), F.lit(p), d)
        return (h.cast("double") / F.lit(float(2**63))).cast("double")

    def bit(p: int) -> Column:
        def mul(v: Column, i: Column) -> Column:
            return v.cast("double") * plane_component(p, i)

        dot = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), mul),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )

    out = F.lit(0).cast("long")
    for p in range(num_planes):
        out = out + bit(p)
    return out


def lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine rescoring restricted to the query's
    hyperplane bucket. At scale the bucketed table is precomputed and
    partitioned by bucket, so a query touches 1/2^p of the data."""
    bucketed = embeddings.withColumn(
        "__bucket", hyperplane_bits(F.col(vec_col), num_planes, dim)
    )
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__query_vec"), F.col("__bucket").alias("__query_bucket")
    )
    cands = bucketed.join(
        F.broadcast(q), F.col("__bucket") == F.col("__query_bucket")
    )
    scored = cands.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("__query_vec")), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def ivf_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a k-means coarse quantizer
    partitions the corpus into ``num_centroids`` cells; a query exactly
    rescores only its ``nprobe`` nearest cells — the classic
    sublinear-candidates ANN layout (FAISS IVF-Flat shape), built from
    pyspark.ml KMeans + the same declarative rescoring as the other paths.

    At scale the assignment step is a one-off: persist the corpus
    partitioned by ``__cell`` and each query reads nprobe/num_centroids of
    the data (partition pruning on the cell column).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    featured = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=num_centroids, seed=seed, maxIter=10).fit(featured)
    assigned = model.transform(featured).withColumnRenamed("prediction", "__cell")

    q = assigned.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__query_vec"), F.col("features").alias("__query_feat")
    )

    # nprobe nearest centroids to the query (centroid table is tiny: driver-side
    # model state, broadcast as a literal frame)
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "__cell int, __centroid array<double>",
    )
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "__cell",
            cosine_similarity(
                F.col("__centroid"), F.col("__query_vec")
            ).alias("__c_score"),
        )
        .orderBy(F.desc("__c_score"))
        .limit(nprobe)
        .select("__cell")
    )

    cands = assigned.join(F.broadcast(probe_cells), "__cell").crossJoin(F.broadcast(q))
    scored = cands.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("__query_vec")), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def all_pairs_above(
    embeddings: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "pandas",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by hyperplane signature,
    exact-rescore within buckets. The quadratic term is confined to a bucket.

    ``method="pandas"`` (default) rescores each bucket with one Arrow-batched
    numpy matmul (``U @ U.T`` on row-normalized vectors) via ``applyInPandas``
    — the vectorized path for the O(bucket²·dim) hot loop, ~10× the
    per-element throughput of interpreted Catalyst array folds.
    ``method="sql"`` keeps the pure-Catalyst form (norms staged per vector,
    dot product per pair) — zero Python, bit-identical to the column
    functions used everywhere else.
    """
    if method == "pandas":
        return _all_pairs_above_pandas(
            embeddings, threshold, num_planes, dim, id_col, vec_col
        )
    # norms staged per VECTOR (n folds), not per pair (n² folds); the score
    # keeps the exact dot/(‖a‖·‖b‖) expression shape, just with the norm
    # factors read from columns.
    bucketed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bits(F.col(vec_col), num_planes, dim).alias("__bucket"),
        l2_norm(F.col(vec_col)).alias("__norm"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    score = dot_product(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")) / (
        F.col("a.__norm") * F.col("b.__norm")
    )
    return (
        a.join(
            b,
            (F.col("a.__bucket") == F.col("b.__bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(score, 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def _all_pairs_above_pandas(
    embeddings: DataFrame,
    threshold: float,
    num_planes: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        u = np.stack(pdf[vec_col].to_numpy()[order]).astype("float64")
        norms = np.linalg.norm(u, axis=1, keepdims=True)
        u = u / np.where(norms == 0, 1.0, norms)
        s = u @ u.T
        ia, ib = np.triu_indices(len(ids), k=1)
        scores = np.round(s[ia, ib], 6)
        keep = scores >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "score": scores[keep]}
        )

    bucketed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bits(F.col(vec_col), num_planes, dim).alias("__bucket"),
    )
    return bucketed.groupBy("__bucket").applyInPandas(bucket_pairs, out_schema)

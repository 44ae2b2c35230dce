"""Similarity search over an embedding column (`array<float>`).

Three paths, as a 100 TB pipeline needs all of them:

* **brute-force cosine top-k** — the exact baseline. One narrow pass over
  the embeddings (dot products in codegen via zip_with/aggregate), then a
  top-k. Linear, no shuffle except the final k rows. Right answer, full scan.
* **LSH-bucketed (random hyperplane) top-k** — the scale path for queries.
  Deterministic hyperplanes map each vector to a bucket; only the query's
  bucket is rescored exactly. Sublinear candidates, tunable recall; recall
  vs the brute-force baseline is pinned by tests.
* **banded hyperplane all-pairs** — the scale path for near-dup mining.
  ``num_planes`` sign bits split into bands; a pair is a candidate iff ALL
  bits of ANY band agree; candidates are exactly rescored. The join carries
  (id, band_idx, band_key) only — no quadratic bucket ever materializes in
  one task (the round-1 single-bucket ``applyInPandas`` shape concentrated
  ~corpus/2^p rows per task: executor OOM at scale).

Hyperplane components are **per-(plane, dim) constants** computed from md5
in Python (functions/portable.py) and inlined as double literals — zero
per-row hashing, and bit-reproducible by the DuckDB oracle, which re-derives
the identical constants when generating its SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import cosine_similarity, dot_product, l2_norm
from ..functions.portable import hyperplane_components


def normalize_embeddings(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """L2-normalize each vector (zero vectors pass through unchanged), the
    precompute that turns every downstream cosine into a plain dot product.
    Values rounded to 6 decimals for cross-engine reproducibility. Pure
    codegen, no shuffle."""
    # the norm is STAGED through a projection before the transform: inlined
    # into the lambda it would re-run the whole-array fold once per ELEMENT
    # (O(dim^2) per row — measured 4x slower at dim=64)
    v = F.col(vec_col).cast("array<double>")
    nrm = l2_norm(F.col(vec_col))
    pre = embeddings.select(F.col(id_col), v.alias("__v"), nrm.alias("__nrm"))
    safe = F.when(F.col("__nrm") == 0, F.lit(1.0)).otherwise(F.col("__nrm"))
    pre = pre.select(F.col(id_col), F.col("__v"), safe.alias("__safe"))
    return pre.select(
        F.col(id_col),
        F.transform(
            F.col("__v"), lambda x: F.round(x / F.col("__safe"), 6)
        ).alias("normalized"),
    )


def quantize_embeddings(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale = 127 / max|x| (rounded
    to 6 decimals so both engines agree on it), components round(x·scale)
    in [-127, 127]. Cuts vector storage 4-8x — the layout a 100 TB ANN
    corpus is actually scanned in; rescoring dequantizes by dividing the
    int dot product by scale_a·scale_b. Zero vectors get scale 1.0 and
    all-zero codes. Output: (id, scale, qvec). No shuffle."""
    # scale staged through a projection for the same reason as
    # normalize_embeddings: inlined into the lambda, the array_max fold
    # would recompute once per element
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, F.abs))
    pre = embeddings.select(F.col(id_col), v.alias("__v"), amax.alias("__amax"))
    scale = F.round(
        F.when(F.col("__amax") == 0, F.lit(1.0)).otherwise(
            F.lit(127.0) / F.col("__amax")
        ),
        6,
    )
    pre = pre.select(F.col(id_col), F.col("__v"), scale.alias("scale"))
    return pre.select(
        F.col(id_col),
        "scale",
        F.transform(
            F.col("__v"), lambda x: F.round(x * F.col("scale")).cast("int")
        ).alias("qvec"),
    )


def _label_centroid_grid(
    embeddings: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """Shared centroid convention for :func:`label_centroids` and
    :func:`nearest_centroid_classify` (and encoded a third time in their
    DuckDB oracles): per (label, idx) the DECIMAL-summed mean rounded to
    6 decimals on the micro-unit grid. One definition so the published
    centroids and the classifier weights can never drift apart.
    Returns (label_col, idx, __n, __q) with ``__q`` = round(mean·1e6)."""
    ex = embeddings.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("idx", "__x"),
    )
    return (
        ex.groupBy(label_col, "idx")
        .agg(
            F.count("*").alias("__n"),
            F.sum(F.col("__x").cast("decimal(28,10)")).alias("__s"),
        )
        .select(
            F.col(label_col),
            "idx",
            "__n",
            F.round(
                F.round(F.col("__s").cast("double") / F.col("__n"), 6) * 1000000
            ).cast("bigint").alias("__q"),
        )
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean vector — the centroid precompute behind IVF coarse
    quantizers, class prototypes, and cluster drift monitoring.

    Components sum in DECIMAL so the result is independent of partitioning
    and addition order (double accumulation is not associative), then each
    mean is rounded to 6 decimals. Output: (label, n_vectors, centroid_q6)
    with the centroid serialized as a CSV of round(mean·1e6) integers
    (hasher-friendly, same convention as the normalize/quantize queries).

    Scale shape: posexplode → one aggregation keyed (label, idx) — at most
    |labels|·dim groups, map-side combined — then a per-label rebuild of
    the ordered array. The vectors themselves never shuffle; only
    (label, idx, partial sums) do."""
    per = _label_centroid_grid(embeddings, label_col, vec_col)
    return per.groupBy(label_col).agg(
        F.max("__n").alias("n_vectors"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "__q"))),
                lambda s: s["__q"].cast("string"),
            ),
        ).alias("centroid_q6"),
    )


def nearest_centroid_classify(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid classification: score every vector against each
    label's mean vector by cosine and emit the argmax — the fasttext-style
    domain/quality classifier step of a curation pipeline (train-free:
    the "model" is the per-label centroids of a labeled seed set).

    The centroids are the QUANTIZED 6-decimal means (micro-unit grid,
    same convention as :func:`label_centroids`), so classifier weights
    are exactly representable and bit-identical across engines; the dot
    products fold sequentially in index order (zip_with + aggregate ==
    an ordered scalar loop == DuckDB's list_dot_product), scores round
    to 6 decimals, and argmax ties break to the LOWEST label.

    Scale shape: centroid build shuffles only (label, idx, partials) —
    ≤ |labels|·dim groups — and the |labels|-row centroid table is a
    broadcast cross join against the corpus: one scan, no shuffle of the
    vectors, |labels| fused column expressions per row. Output:
    (id, label, pred_label, score)."""
    cents = (
        _label_centroid_grid(embeddings, label_col, vec_col)
        .select(
            F.col(label_col).alias("__clabel"),
            "idx",
            (F.col("__q") / F.lit(1000000.0)).alias("__c"),
        )
        .groupBy("__clabel")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "__c"))),
                lambda s: s["__c"],
            ).alias("__cv")
        )
        # centroid norm staged once per label row (|labels| folds total)
        .withColumn("__cnrm", l2_norm(F.col("__cv")))
    )
    # corpus-vector norm staged ONCE per row BEFORE the centroid fan-out —
    # inlined into the score it would re-fold per centroid (|labels|x work)
    pre = embeddings.select(
        F.col(id_col),
        F.col(label_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__nrm", l2_norm(F.col("__v")))
    scored = pre.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(label_col),
        F.col("__clabel"),
        F.round(
            dot_product(F.col("__v"), F.col("__cv"))
            / (F.col("__nrm") * F.col("__cnrm")),
            6,
        ).alias("__score"),
    )
    best = scored.groupBy(id_col, label_col).agg(
        F.max(F.struct(F.col("__score"), (-F.col("__clabel")).alias("__neg"))).alias(
            "__best"
        )
    )
    return best.select(
        F.col(id_col),
        F.col(label_col),
        (-F.col("__best.__neg")).cast("int").alias("pred_label"),
        F.col("__best.__score").alias("score"),
    )


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
    tiebreak (score DESC, id ASC).

    SINGLE-query form: one broadcast row against one corpus scan +
    TakeOrderedAndProject. Do NOT loop it over many query ids — N calls
    mean N full corpus scans. For a batch of queries use :func:`knn_join`
    (banded, bucket-bounded, one pass over the corpus for all queries).
    If ``query_id`` does not exist, the broadcast side is empty and the
    result is an empty frame — indistinguishable from "no neighbors";
    validate the id upstream when that matters."""
    q = _query_frame(embeddings, query_id, id_col, vec_col)
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("__query_vec")), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def _lit_dot(vec: Column, comps: tuple[float, ...]) -> Column:
    """vec · literal-component plane, sequential left fold (deterministic
    accumulation order — same as a scalar loop and as DuckDB's
    list_dot_product over the same literals)."""
    return F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(c) for c in comps]),
            lambda v, c: v.cast("double") * c,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_bits(vec: Column, num_planes: int, dim: int, seed: int = 7) -> Column:
    """Random-hyperplane signature: bit p = sign(vec · plane_p). Plane
    components are md5-derived Python constants inlined as literals
    (functions/portable.py) — no per-row hashing, oracle-reproducible."""
    comps = hyperplane_components(num_planes, dim, seed)
    out = F.lit(0).cast("long")
    for p in range(num_planes):
        out = out + F.when(
            _lit_dot(vec, comps[p]) >= 0,
            F.shiftleft(F.lit(1).cast("long"), p),
        ).otherwise(F.lit(0).cast("long"))
    return out


def lsh_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: exact cosine rescoring restricted to the query's
    hyperplane bucket. At scale the bucketed table is precomputed and
    partitioned by bucket, so a query touches 1/2^p of the data."""
    bucketed = embeddings.withColumn(
        "__bucket", hyperplane_bits(F.col(vec_col), num_planes, dim, seed)
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
    quantizer: str = "kmeans",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer partitions
    the corpus into ``num_centroids`` cells; a query exactly rescores only
    its ``nprobe`` nearest cells — the classic sublinear-candidates ANN
    layout (FAISS IVF-Flat shape).

    ``quantizer="kmeans"``: pyspark.ml KMeans centroids (best cell balance;
    the ``.fit`` is a one-off precompute at scale — persist the corpus
    partitioned by ``__cell`` and each query reads nprobe/num_centroids of
    the data via partition pruning).

    ``quantizer="seeded"``: centroids are the vectors of the
    ``num_centroids`` lowest ids — zero training, fully deterministic, and
    reproducible in plain SQL (this is what lets the DuckDB oracle
    hash-check the query). Same assignment/probe/rescore plan; cell balance
    is whatever the data gives (fine for ANN candidate pruning — k-means
    refines the same layout, it doesn't change its shape).
    """
    if quantizer == "seeded":
        assigned, centroids = _seeded_quantizer(
            embeddings, num_centroids, id_col, vec_col
        )
    else:
        assigned, centroids = _kmeans_quantizer(
            embeddings, num_centroids, id_col, vec_col, seed
        )

    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__query_vec")
    )

    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "__cell",
            cosine_similarity(F.col("__centroid"), F.col("__query_vec")).alias("__c_score"),
        )
        .orderBy(F.desc("__c_score"), F.asc("__cell"))
        .limit(nprobe)
        .select("__cell")
    )

    cands = assigned.join(F.broadcast(probe_cells), "__cell").crossJoin(F.broadcast(q))
    scored = cands.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), F.col("__query_vec")), 6).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def _seeded_quantizer(
    embeddings: DataFrame, num_centroids: int, id_col: str, vec_col: str
) -> tuple[DataFrame, DataFrame]:
    """(assigned, centroids): centroids = vectors of the lowest ids; each
    vector assigned to its max-cosine centroid (tie → lowest cell)."""
    from pyspark.sql import Window

    # num_centroids rows: the single-partition window is over the LIMITed
    # frame, not the corpus
    centroids = (
        embeddings.orderBy(F.asc(id_col))
        .limit(num_centroids)
        .select(
            (F.row_number().over(Window.orderBy(F.asc(id_col))) - 1).alias("__cell"),
            F.col(vec_col).alias("__centroid"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("__cell"))
    assigned = (
        embeddings.crossJoin(F.broadcast(centroids))
        .withColumn(
            "__sim", cosine_similarity(F.col(vec_col), F.col("__centroid"))
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "__cell")
    )
    return assigned, centroids


def _kmeans_quantizer(
    embeddings: DataFrame, num_centroids: int, id_col: str, vec_col: str, seed: int
) -> tuple[DataFrame, DataFrame]:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featured = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=num_centroids, seed=seed, maxIter=10).fit(featured)
    assigned = (
        model.transform(featured)
        .withColumnRenamed("prediction", "__cell")
        .select(id_col, vec_col, "__cell")
    )
    # centroid table is tiny driver-side model state, broadcast as literals
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "__cell int, __centroid array<double>",
    )
    return assigned, centroids


def all_pairs_above(
    embeddings: DataFrame,
    threshold: float = 0.9,
    num_planes: int = 8,
    bands: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    method: str = "pandas",
    max_bucket_rows: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    ``num_planes`` sign bits split into ``bands`` bands of
    ``num_planes // bands`` bits. A pair is a candidate iff all bits of at
    least one band agree; candidates are exactly rescored and filtered at
    ``threshold``. With ``bands=1`` this degenerates to single-bucket LSH.
    Tuning: per-band collision prob for a pair at angle θ is (1−θ/π)^r —
    size r to prune randoms (2^−r average) and bands to hit recall
    1−(1−(1−θ/π)^r)^bands at your threshold (e.g. cos ≥ 0.9 → 64 planes as
    8×8 gives ~93 % recall; raise bands for more).

    Scale shape (the round-2 fix for the round-1 OOM):

    * ``method="pandas"`` (default): numpy batch signatures, then buckets
      **at most ``max_bucket_rows`` rows** are rescored by one in-bucket
      matmul each (``applyInPandas``); buckets OVER the cap — the skew that
      used to concentrate corpus/2^p rows in one task — fall back to the
      slim pair-join path, which shuffles but never holds a bucket in
      memory. Executor memory is bounded by the cap regardless of skew.
    * ``method="sql"``: zero-Python Catalyst plan — fold signatures, slim
      (id, band_idx, band_key) self-join for candidates, per-pair fold
      rescore with deterministic accumulation order (the oracle-auditable
      reference path; interpreted, so ~3× slower locally).
    """
    assert num_planes % bands == 0
    ppb = num_planes // bands
    comps = hyperplane_components(num_planes, dim, seed)

    if method == "pandas":
        return _all_pairs_above_guarded(
            embeddings, threshold, comps, bands, ppb, id_col, vec_col, max_bucket_rows
        )

    def band_key(b: int) -> Column:
        key = F.lit(0).cast("long")
        for j in range(ppb):
            key = key + F.when(
                _lit_dot(F.col(vec_col), comps[b * ppb + j]) >= 0,
                F.shiftleft(F.lit(1).cast("long"), j),
            ).otherwise(F.lit(0).cast("long"))
        return key

    banded = embeddings.select(
        F.col(id_col),
        F.posexplode(F.array(*[band_key(b) for b in range(bands)])).alias(
            "band_idx", "band_key"
        ),
    )
    pair_ids = _slim_pair_ids(banded, id_col)
    cand = _attach_vectors(pair_ids, embeddings, id_col, vec_col)
    score = dot_product(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return cand.select(
        "id_a", "id_b", F.round(score, 6).alias("score")
    ).filter(F.col("score") >= threshold)


def _slim_pair_ids(banded: DataFrame, id_col: str) -> DataFrame:
    """Candidate (id_a, id_b) pairs from a slim (id, band_idx, band_key)
    frame: equality self-join + dedup across bands. Nothing wider than
    three ints enters the shuffle."""
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _attach_vectors(
    pair_ids: DataFrame, embeddings: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__norm")
    )
    return pair_ids.join(
        vecs.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("__va"),
            F.col("__norm").alias("__na"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("__vb"),
            F.col("__norm").alias("__nb"),
        ),
        "id_b",
    )


def _banded_slim_pandas(
    embeddings: DataFrame, comps, bands: int, ppb: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, band_idx, band_key) via one numpy batch matmul per Arrow batch —
    the vectorized form of the Catalyst fold band keys (identical signs:
    same literal components, fp differences ~1e-16 vs a ~0.1-magnitude dot)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray(comps, dtype=np.float64)  # (num_planes, dim)
    weights = (1 << np.arange(ppb)).astype(np.int64)

    sig_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("__keys", T.ArrayType(T.LongType())),
        ]
    )

    def signatures(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({id_col: [], "__keys": []})
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            bits = (V @ C.T >= 0).astype(np.int64)  # (n, num_planes)
            K = np.stack(
                [
                    (bits[:, b * ppb : (b + 1) * ppb] * weights).sum(axis=1)
                    for b in range(bands)
                ],
                axis=1,
            )
            yield pd.DataFrame({id_col: pdf[id_col], "__keys": list(K)})

    return (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .mapInPandas(signatures, sig_schema)
        .select(F.col(id_col), F.posexplode("__keys").alias("band_idx", "band_key"))
    )


def knn_join(
    embeddings: DataFrame,
    k: int = 5,
    num_planes: int = 16,
    bands: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    method: str = "pandas",
    max_bucket_rows: int = 4096,
) -> DataFrame:
    """Approximate k-nearest-neighbor JOIN: top-``k`` cosine neighbors for
    EVERY vector, restricted to banded-hyperplane candidates (same LSH
    layout as :func:`all_pairs_above`, but directed pairs and a per-vector
    rank instead of a global threshold).

    Output: (vec_id, neighbor_id, score, rank) — rank 1..k by score DESC,
    neighbor_id ASC. Vectors whose buckets contain fewer than k others
    return fewer rows (that is the ANN contract; raise ``bands`` for
    recall).

    .. note:: the default ``num_planes`` changed 8 → 16 (16 → 256
       buckets/band) when the bucket-size guard landed: smaller buckets
       bound worst-case candidate cost but also shrink candidate sets, so
       small or uniformly-spread corpora see more vectors with fewer than
       ``k`` neighbors (a recall drop vs the old default). Callers who
       relied on the old behavior should pass ``num_planes=8`` explicitly,
       or raise ``bands`` to widen candidate generation.

    Scale shape (guarded like :func:`all_pairs_above`; a bucket of B rows
    must never emit B² candidate rows into the window shuffle):

    * ``method="pandas"`` (default): buckets at most ``max_bucket_rows``
      rows compute one in-bucket matmul each and emit only each row's
      bucket-local top-k (≤ B·k rows out — safe because per-bucket
      candidates are a subset of the global candidate set under the same
      (score DESC, id ASC) order, so the global top-k survives). Buckets
      over the cap fall back to the slim directed pair-join + streamed
      Arrow rescore: quadratic candidate rows but bounded task memory.
      Default 8 planes/band keeps expected bucket size ≈ corpus/256;
      the cap handles skew.
    * ``method="sql"``: zero-Python Catalyst plan — slim (id, band_idx,
      band_key) self-join + per-pair fold rescore (the oracle-auditable
      reference path; no guard, use for audits not production)."""
    assert num_planes % bands == 0
    ppb = num_planes // bands
    comps = hyperplane_components(num_planes, dim, seed)

    if method == "pandas":
        scored = _knn_candidates_guarded(
            embeddings, k, comps, bands, ppb, id_col, vec_col, max_bucket_rows
        )
    else:

        def band_key(b: int) -> Column:
            key = F.lit(0).cast("long")
            for j in range(ppb):
                key = key + F.when(
                    _lit_dot(F.col(vec_col), comps[b * ppb + j]) >= 0,
                    F.shiftleft(F.lit(1).cast("long"), j),
                ).otherwise(F.lit(0).cast("long"))
            return key

        banded = embeddings.select(
            F.col(id_col),
            F.posexplode(F.array(*[band_key(b) for b in range(bands)])).alias(
                "band_idx", "band_key"
            ),
        )
        cand = _attach_vectors(
            _directed_pair_ids(banded, id_col), embeddings, id_col, vec_col
        )
        score = dot_product(F.col("__va"), F.col("__vb")) / (
            F.col("__na") * F.col("__nb")
        )
        scored = cand.select("id_a", "id_b", F.round(score, 6).alias("score"))
    from pyspark.sql import Window

    w = Window.partitionBy("id_a").orderBy(F.desc("score"), F.asc("id_b"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("neighbor_id"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _directed_pair_ids(banded: DataFrame, id_col: str) -> DataFrame:
    """Directed candidate (id_a, id_b) pairs (a ≠ b, both orientations) from
    a slim (id, band_idx, band_key) frame — the k-NN variant of
    :func:`_slim_pair_ids`."""
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def _knn_candidates_guarded(
    embeddings: DataFrame,
    k: int,
    comps,
    bands: int,
    ppb: int,
    id_col: str,
    vec_col: str,
    max_bucket_rows: int,
) -> DataFrame:
    """Scored directed candidates for :func:`knn_join`, guarded two-path:
    small buckets → one matmul each, emitting only bucket-local top-k per
    row; big buckets → slim pair-join + streamed rescore."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..plans.scale import materialize_once

    # materialize_once, not persist: the banded frame feeds three subplans
    # (big-key census, small path, big path) but this operator returns
    # lazily, so a persist() could never be unpersisted at the right time —
    # it would pin a cacheManager entry for the life of the session
    banded = materialize_once(
        _banded_slim_pandas(embeddings, comps, bands, ppb, id_col, vec_col)
    )
    big_keys = (
        banded.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > max_bucket_rows)
        .select("band_idx", "band_key")
    )

    pair_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "score": []})
        u = np.stack(pdf[vec_col].to_numpy()[order]).astype("float64")
        norms = np.linalg.norm(u, axis=1)
        safe = np.where(norms == 0, 1.0, norms)
        s = np.round((u @ u.T) / np.outer(safe, safe), 6)
        np.fill_diagonal(s, -np.inf)
        kk = min(k, n - 1)
        # columns are id-ascending; a stable sort on -score therefore breaks
        # score ties by neighbor id ASC — the same order the final window
        # uses, which is what makes bucket-local top-k lossless
        nbr = np.argsort(-s, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(np.arange(n), kk)
        cols = nbr.ravel()
        return pd.DataFrame(
            {"id_a": ids[rows], "id_b": ids[cols], "score": s[rows, cols]}
        )

    small = (
        banded.join(F.broadcast(big_keys), ["band_idx", "band_key"], "left_anti")
        .join(embeddings.select(F.col(id_col), F.col(vec_col)), id_col)
        .groupBy("band_idx", "band_key")
        .applyInPandas(bucket_topk, pair_schema)
    )
    big_banded = banded.join(F.broadcast(big_keys), ["band_idx", "band_key"], "left_semi")
    big = _rescore_pairs_pandas(
        _attach_vectors(
            _directed_pair_ids(big_banded, id_col), embeddings, id_col, vec_col
        ),
        threshold=-2.0,
    )
    return small.union(big).dropDuplicates(["id_a", "id_b"])


def _all_pairs_above_guarded(
    embeddings: DataFrame,
    threshold: float,
    comps,
    bands: int,
    ppb: int,
    id_col: str,
    vec_col: str,
    max_bucket_rows: int,
) -> DataFrame:
    """Guarded two-path plan: small buckets → one matmul per bucket; buckets
    over ``max_bucket_rows`` → slim pair-join + streamed per-pair rescore."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..plans.scale import materialize_once

    # see _knn_candidates_guarded for why materialize_once, not persist
    banded = materialize_once(
        _banded_slim_pandas(embeddings, comps, bands, ppb, id_col, vec_col)
    )
    big_keys = (
        banded.groupBy("band_idx", "band_key")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > max_bucket_rows)
        .select("band_idx", "band_key")
    )

    pair_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def bucket_matmul(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        u = np.stack(pdf[vec_col].to_numpy()[order]).astype("float64")
        norms = np.linalg.norm(u, axis=1)
        s = (u @ u.T) / np.outer(np.where(norms == 0, 1.0, norms), np.where(norms == 0, 1.0, norms))
        ia, ib = np.triu_indices(len(ids), k=1)
        scores = np.round(s[ia, ib], 6)
        keep = scores >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "score": scores[keep]}
        )

    small = (
        banded.join(F.broadcast(big_keys), ["band_idx", "band_key"], "left_anti")
        .join(embeddings.select(F.col(id_col), F.col(vec_col)), id_col)
        .groupBy("band_idx", "band_key")
        .applyInPandas(bucket_matmul, pair_schema)
    )
    big_banded = banded.join(F.broadcast(big_keys), ["band_idx", "band_key"], "left_semi")
    big = _rescore_pairs_pandas(
        _attach_vectors(_slim_pair_ids(big_banded, id_col), embeddings, id_col, vec_col),
        threshold,
    )
    return small.union(big).dropDuplicates(["id_a", "id_b"])


def _rescore_pairs_pandas(cand: DataFrame, threshold: float) -> DataFrame:
    """Vectorized candidate-pair rescoring: one numpy row-wise dot per Arrow
    batch. Memory is bounded by the Arrow batch size regardless of bucket
    skew (pairs stream through; nothing groups by bucket)."""
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

    def batches(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({"id_a": [], "id_b": [], "score": []})
                continue
            va = np.stack(pdf["__va"].to_numpy()).astype("float64")
            vb = np.stack(pdf["__vb"].to_numpy()).astype("float64")
            na = pdf["__na"].to_numpy()
            nb = pdf["__nb"].to_numpy()
            scores = np.round(np.einsum("ij,ij->i", va, vb) / (na * nb), 6)
            keep = scores >= threshold
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "score": scores[keep],
                }
            )

    return cand.mapInPandas(batches, out_schema)


def norm_profile(
    embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label L2-norm profile (count, min/max/mean norm) — the
    embedding-QA scan run before any cosine work: un-normalized rows,
    collapsed/zero vectors, and per-label scale drift all show up here.

    Pure codegen per row (the norm is the same whole-array fold as
    :func:`normalize_embeddings`) plus ONE label-keyed aggregation. The
    mean accumulates in DECIMAL (norms quantized at 1e-10) so the result
    is independent of partitioning and addition order; min/max need no
    such care (comparison, not accumulation)."""
    pre = embeddings.select(
        F.col(label_col), l2_norm(F.col(vec_col)).alias("__nrm")
    )
    return pre.groupBy(label_col).agg(
        # count the NORM, not the row: NULL-embedding rows carry no vector
        F.count("__nrm").cast("long").alias("n_vectors"),
        F.round(F.min("__nrm"), 6).alias("min_norm"),
        F.round(F.max("__nrm"), 6).alias("max_norm"),
        F.round(
            F.avg(F.col("__nrm").cast("decimal(28,10)")).cast("double"), 6
        ).alias("avg_norm"),
    )


def cluster_inertia(
    embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Within-cluster sum of squared distance to each label's centroid —
    k-means inertia per label, the clustering-quality companion to
    :func:`label_centroids` (same centroid convention via
    ``_label_centroid_grid``, so the QA metric can never drift from the
    published centroids).

    Scale shape: one posexplode pass keyed (label, idx) builds the
    centroid grid (≤ |labels|·dim groups); the second pass joins the grid
    back BROADCAST (it is tiny by construction) and reduces squared
    deviations per label — the vectors themselves shuffle zero times.
    Squared terms accumulate in DECIMAL(38,12) for partitioning-independent
    sums, mirrored exactly by the oracle."""
    grid = _label_centroid_grid(embeddings, label_col, vec_col)
    cen = grid.select(
        F.col(label_col),
        "idx",
        (F.col("__q").cast("double") / F.lit(1000000.0)).alias("__cc"),
    )
    nv = grid.groupBy(label_col).agg(F.max("__n").cast("long").alias("n_vectors"))
    ex = embeddings.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("idx", "__x"),
    )
    diff = F.col("__x") - F.col("__cc")
    return (
        ex.join(F.broadcast(cen), [label_col, "idx"])
        .groupBy(label_col)
        .agg(
            F.round(
                F.sum((diff * diff).cast("decimal(38,12)")).cast("double"), 6
            ).alias("inertia")
        )
        .join(F.broadcast(nv), label_col)
        .select(label_col, "n_vectors", "inertia")
    )


def ann_recall_eval(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    method: str = "lsh",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **method_kwargs,
) -> DataFrame:
    """Recall@k of an approximate index against exact brute force for one
    query — the number that decides whether an ANN configuration ships
    ("recall 0.92 at 1/16th the scan" vs "0.4, re-tune the bands"). One
    summary row: (k, n_exact, n_approx, n_hits, recall_at_k), where
    recall = |exact∩approx| / |exact| (|exact| can fall under ``k`` on a
    small corpus; an empty exact set yields zero rows, matching the
    missing-query behavior of the underlying top-k operators).

    ``method`` picks :func:`lsh_topk` or :func:`ivf_topk` (kwargs pass
    through). Both result sets are ≤ k rows and are MATERIALIZED once:
    the hit semi-join and the two count aggregates each reference them,
    and without the pin every reference re-runs the full index pipeline
    (measured 2× on the 10× fixture: the brute-force scan and the IVF
    assignment both executed twice). The intersection itself is a
    broadcast semi-join of two tiny frames — evaluation cost is the two
    index lookups, nothing more. At scale, run the SAME eval over a panel
    of query ids via knn_join before trusting a recall number."""
    from ..plans.scale import materialize_once

    exact = materialize_once(
        brute_force_topk(embeddings, query_id, k, id_col, vec_col)
    )
    if method == "lsh":
        approx = lsh_topk(embeddings, query_id, k, id_col=id_col, vec_col=vec_col, **method_kwargs)
    elif method == "ivf":
        approx = ivf_topk(embeddings, query_id, k, id_col=id_col, vec_col=vec_col, **method_kwargs)
    else:
        raise ValueError(f"unknown ANN method {method!r} (lsh|ivf)")
    approx = materialize_once(approx)
    hits = exact.join(
        F.broadcast(approx.select(id_col)), id_col, "left_semi"
    ).agg(F.count("*").cast("long").alias("n_hits"))
    n_exact = exact.agg(F.count("*").cast("long").alias("n_exact"))
    n_approx = approx.agg(F.count("*").cast("long").alias("n_approx"))
    return (
        n_exact.crossJoin(F.broadcast(n_approx))
        .crossJoin(F.broadcast(hits))
        .where(F.col("n_exact") > 0)
        .select(
            F.lit(k).cast("long").alias("k"),
            "n_exact",
            "n_approx",
            "n_hits",
            F.round(
                F.col("n_hits").cast("double") / F.col("n_exact").cast("double"), 6
            ).alias("recall_at_k"),
        )
    )


def embedding_dim_stats(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension health profile of an embedding column: n, mean,
    variance, min, max for every vector index — the feature-QA scan run
    BEFORE building any ANN index (a dead dimension wastes hyperplane
    bits; an exploding one dominates every distance; both are invisible
    in the norm profile).

    One posexplode pass into an idx-keyed aggregation (map-side combined;
    ``dim`` groups). Sums accumulate in DECIMAL(38,12) — float32 values
    cast exactly to double, squared once per value, quantized identically
    on both engines — so mean/variance are independent of partitioning
    and addition order (``norm_profile``'s discipline); min/max are
    comparisons and need no such care. Output (idx, n_values, dim_mean,
    dim_var, dim_min, dim_max), idx ASC."""
    ex = embeddings.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("idx", "__x")
    )
    g = ex.groupBy(F.col("idx").cast("long").alias("idx")).agg(
        F.count("*").cast("long").alias("n_values"),
        F.sum(F.col("__x").cast("decimal(38,12)")).alias("__sx"),
        F.sum((F.col("__x") * F.col("__x")).cast("decimal(38,12)")).alias("__sxx"),
        F.round(F.min("__x"), 6).alias("dim_min"),
        F.round(F.max("__x"), 6).alias("dim_max"),
    )
    n = F.col("n_values").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    return g.select(
        "idx",
        "n_values",
        F.round(sx / n, 6).alias("dim_mean"),
        F.round((sxx - sx * sx / n) / n, 6).alias("dim_var"),
        "dim_min",
        "dim_max",
    ).orderBy(F.asc("idx"))


def embedding_outliers(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top_k: int = 5,
) -> DataFrame:
    """Per-label centroid outliers: the ``top_k`` vectors FARTHEST (squared
    L2) from their label's centroid — the row-level drill-down behind
    :func:`cluster_inertia` (which reports the aggregate; this names the
    vectors to eyeball: mislabeled rows, corrupt embeddings, genuine
    boundary cases). Distance to centroid, not vector norm: normalized
    embeddings all share norm 1, so norm statistics carry no signal there.

    Scale shape: the same ``_label_centroid_grid`` convention as
    ``label_centroids`` / ``cluster_inertia`` (one posexplode pass to a
    ≤ |labels|·dim grid), joined back BROADCAST; squared deviations
    reduce per (vector, label) in DECIMAL(38,12) so the distance is
    partitioning-independent, then one per-label window keeps the top_k
    (bounded output, |labels|·k rows). The vectors themselves shuffle
    once, keyed by (id, label), at (idx-partial) grain.

    Output (id_col, label_col, sq_dist, dist_rank), label ASC / rank ASC;
    ties break id ASC."""
    grid = _label_centroid_grid(embeddings, label_col, vec_col)
    cen = grid.select(
        F.col(label_col),
        "idx",
        (F.col("__q").cast("double") / F.lit(1000000.0)).alias("__cc"),
    )
    ex = embeddings.select(
        F.col(id_col),
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("idx", "__x"),
    )
    diff = F.col("__x") - F.col("__cc")
    per_vec = (
        ex.join(F.broadcast(cen), [label_col, "idx"])
        .groupBy(id_col, label_col)
        .agg(
            F.round(
                F.sum((diff * diff).cast("decimal(38,12)")).cast("double"), 6
            ).alias("sq_dist")
        )
    )
    w = Window.partitionBy(label_col).orderBy(
        F.desc("sq_dist"), F.asc(id_col)
    )
    return (
        per_vec.withColumn("dist_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("dist_rank") <= top_k)
        .select(id_col, label_col, "sq_dist", "dist_rank")
        .orderBy(F.asc(label_col), F.asc("dist_rank"))
    )


def quantization_error_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label audit of what int8 quantization COSTS: the worst
    per-component reconstruction error and the saturation count under the
    exact :func:`quantize_embeddings` rule (per-vector scale =
    round₆(127/max|x|), q = round(x·scale)) — the go/no-go table before
    switching a 100 TB ANN corpus to the int8 layout.

    Parity discipline: every reported number is ORDER-INDEPENDENT — max
    and exact-integer counts only (a float SUM of errors would depend on
    partition order; a mean goes through no such sum here). Per-component
    error |x − q/scale| is a fixed IEEE expression of the stored doubles,
    so both engines compute identical values and identical maxima.

    Scale shape: posexplode to (label, component) grain (the
    embedding_dim_stats shape), ONE label-keyed aggregation with map-side
    combine; no shuffle carries vectors. Output (label, n_vectors,
    n_components, n_saturated, max_abs_err) — max rounded to 9."""
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, F.abs))
    pre = embeddings.select(
        F.col(label_col).alias("label"), v.alias("__v"), amax.alias("__amax")
    )
    scale = F.round(
        F.when(F.col("__amax") == 0, F.lit(1.0)).otherwise(
            F.lit(127.0) / F.col("__amax")
        ),
        6,
    )
    pre = pre.select("label", "__v", scale.alias("__scale"))
    comp = pre.select(
        "label",
        "__scale",
        F.posexplode("__v").alias("__idx", "__x"),
    )
    q = F.round(F.col("__x") * F.col("__scale"))
    err = F.abs(F.col("__x") - q / F.col("__scale"))
    return comp.groupBy("label").agg(
        F.sum((F.col("__idx") == 0).cast("int")).cast("long").alias("n_vectors"),
        F.count("*").cast("long").alias("n_components"),
        F.sum((F.abs(q) == 127).cast("int")).cast("long").alias("n_saturated"),
        F.round(F.max(err), 9).alias("max_abs_err"),
    )

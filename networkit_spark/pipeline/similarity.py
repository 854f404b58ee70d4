"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: exact brute-force top-k neighbors for a set of query
  vectors — ``F.zip_with`` dot product + norms, all JVM-side. The join is
  queries × corpus: broadcast the (small) query side; at 100 TB corpus
  scale this is one scan of the corpus per query batch, embarrassingly
  parallel, no shuffle except the per-query top-k windows.
- ``ivf_topk``: IVF-style two-stage ANN: a deterministic coarse quantizer
  (every ``stride``-th vector is a centroid), vectors assigned to their
  nearest centroid (one corpus scan), queries probe the ``nprobe`` nearest
  centroids and rank only those buckets — the scale path: the candidate
  set shrinks by ~|centroids|/nprobe.

Ties and float determinism: ranking sorts by (cosine rounded to 1e-6 desc,
neighbor id asc), so results are stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    # cast each element to double BEFORE multiplying: float32 products
    # round differently and break cross-engine value parity at 1e-6
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    sq = lambda u: F.aggregate(  # noqa: E731
        u, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return dot / (F.sqrt(sq(a)) * F.sqrt(sq(b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact top-k by cosine.

    ``queries`` shape = ``corpus`` shape; a query is never its own
    neighbor. Ranking key: round(cosine, 6) desc, neighbor id asc.
    """
    # norms are precomputed once per row on each side (guide §1.2): the
    # cross join then evaluates only the dot product per pair instead of
    # re-folding both norms for every (query, corpus) combination. The
    # expressions are identical (sqrt of the same left-to-right fold), so
    # cosine values are bit-for-bit unchanged.
    sq = lambda u: F.aggregate(  # noqa: E731
        u, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(sq(F.col(vec_col))).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(sq(F.col(vec_col))).alias("cn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (F.col("qn") * F.col("cn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k — k-means codebook by default.

    The default implementation IS ``ivf_topk_kmeans`` (fixed-k seeded
    MLlib codebook, broadcast-safe at any corpus size). The old stride
    quantizer lives on as ``ivf_topk_stride``, a deterministic test shim
    whose codebook grows O(corpus) — never the shipped default.
    """
    return ivf_topk_kmeans(
        corpus,
        queries,
        k=k,
        n_centroids=n_centroids,
        nprobe=nprobe,
        seed=seed,
        id_col=id_col,
        vec_col=vec_col,
    )


def ivf_topk_stride(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    stride: int = 20,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic-stride IVF (TEST SHIM — oracle-replayable, but the
    id%stride codebook grows O(corpus) and its broadcast dies at scale;
    use ``ivf_topk`` / ``ivf_topk_kmeans`` for real workloads).

    Centroids: vectors with id % stride == 0. Assignment + probing both
    reuse the exact-cosine ranking, so the plan SHAPE matches the k-means
    variant — only the codebook source differs.
    """
    cent = corpus.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_v")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    # assign each corpus vector to its nearest centroid (broadcast centroids)
    assign_w = Window.partitionBy("neighbor_id").orderBy(
        F.desc("sim"), F.asc("cent_id")
    )
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .select(
            "neighbor_id",
            "cv",
            "cent_id",
            F.round(_cosine(F.col("cv"), F.col("cent_v")), 6).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "cv", "cent_id")
    )
    # queries probe their nprobe nearest centroids
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qv",
            "cent_id",
            F.round(_cosine(F.col("qv"), F.col("cent_v")), 6).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cent_id")
    )
    scored = (
        probes.join(assigned, "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_dupes(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
    all_pairs: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) — embedding-cosine near-duplicate pairs
    (id_a < id_b, cosine ≥ threshold).

    The scale path is ``bucket_col``: pass a blocking column (an IVF
    centroid id from the quantizer, a ``hyperplane_lsh_buckets``
    signature, or an upstream MinHash band) and the self-join is keyed on
    the bucket so only intra-bucket pairs are scored — the same
    bounded-blowup shape as the MinHash-LSH dedup path. The quadratic
    all-pairs verifier (no bucket) requires an explicit
    ``all_pairs=True`` opt-in — CI-scale / candidate-verification only.
    """
    if bucket_col is None and not all_pairs:
        raise ValueError(
            "cosine_near_dupes without bucket_col is an all-pairs crossJoin "
            "(quadratic); pass a blocking column, or all_pairs=True to opt "
            "into the unguarded verifier path at CI scale"
        )
    a = corpus.select(
        *( [F.col(bucket_col)] if bucket_col else [] ),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = corpus.select(
        *( [F.col(bucket_col)] if bucket_col else [] ),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    joined = (
        a.join(b, on=bucket_col) if bucket_col else a.crossJoin(b)
    ).filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(_cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_lsh_buckets(
    corpus: DataFrame,
    planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket LONG): random-hyperplane (SimHash-for-vectors) LSH.

    Bucket bit p = sign(v · h_p). Hyperplane component h_p[d] is computed
    COLUMNAR-side from a seeded hash of (plane, element index) — the plan
    carries O(planes) expressions, not planes×dim driver literals (the
    literal-array form plan-exploded at dim 1024 × 16 planes). Vectors
    with high cosine land in the same bucket with probability 1 − θ/π per
    bit. Use as the ``bucket_col`` feed for ``cosine_near_dupes`` — the
    shuffle is then keyed on the bucket and the pairwise blowup is
    bounded per bucket, the same LSH shape as the MinHash dedup path.
    """
    # h_p[d] = uniform(-0.5, 0.5) from xxhash64(seed, p, d): deterministic
    # at any parallelism, evaluated inside whole-stage codegen per element.
    def dot_with_plane(p: int):
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                lambda x, i: F.struct(x.cast("double").alias("x"), i.alias("i")),
            ),
            F.lit(0.0),
            lambda acc, s: acc
            + s["x"]
            * (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), s["i"]), F.lit(1_000_003))
                / F.lit(1_000_003.0)
                - F.lit(0.5)
            ),
        )

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        dot = dot_with_plane(p)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return corpus.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 32,
    seed: int = 42,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cent_id, cent_v ARRAY<DOUBLE>) — MLlib k-means coarse quantizer
    for IVF (replaces the deterministic stride stub at real scale; the
    round-1 plan-shape note "swap in k-means" lands here). Seeded, so the
    codebook is reproducible."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = corpus.select(
        F.col(id_col).alias("id"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features"),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    spark = corpus.sparkSession
    # carry centers through a small broadcast-able frame
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "cent_id": list(range(len(model.clusterCenters()))),
            "cent_v": [c.tolist() for c in model.clusterCenters()],
        }
    )
    return spark.createDataFrame(pdf)


def ivf_topk_kmeans(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 32,
    nprobe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with a k-means codebook: identical plan shape to
    ``ivf_topk`` (assign once, probe nprobe buckets), learned centroids."""
    cent = kmeans_centroids(
        corpus, k=n_centroids, seed=seed, id_col=id_col, vec_col=vec_col
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    assign_w = Window.partitionBy("neighbor_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .select(
            "neighbor_id",
            "cv",
            "cent_id",
            _cosine(F.col("cv"), F.col("cent_v")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(assign_w))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "cv", "cent_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cent_id"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .select(
            "query_id", "qv", "cent_id",
            _cosine(F.col("qv"), F.col("cent_v")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cent_id")
    )
    scored = (
        probes.join(assigned, "cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

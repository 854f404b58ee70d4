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
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
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
    stride: int = 20,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed approximate top-k (same output schema as cosine_topk).

    Centroids: vectors with id % stride == 0 (deterministic coarse
    quantizer — at scale, swap in k-means centroids; the plan shape is
    identical). Assignment + probing both reuse the exact-cosine ranking.
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
) -> DataFrame:
    """(id_a, id_b, cosine) — embedding-cosine near-duplicate pairs
    (id_a < id_b, cosine ≥ threshold).

    Without ``bucket_col`` this is the exact all-pairs verifier —
    quadratic, CI-scale / candidate-verification only. At 100 TB pass a
    blocking column (an IVF centroid id from ``ivf_topk``'s quantizer, a
    random-hyperplane LSH signature, or an upstream MinHash band): the
    self-join is then keyed on the bucket and only intra-bucket pairs are
    scored — the same bounded-blowup shape as the MinHash-LSH dedup path.
    """
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

    Bucket bit p = sign(v · h_p) with hyperplane components drawn from a
    seeded hash (deterministic at any parallelism; no driver-side RNG
    state). Vectors with high cosine land in the same bucket with
    probability 1 − θ/π per bit. Use as the ``bucket_col`` feed for
    ``cosine_near_dupes`` — the shuffle is then keyed on the bucket and
    the pairwise blowup is bounded per bucket, the same LSH shape as the
    MinHash dedup path.
    """
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not dim_row:
        return corpus.select(F.col(id_col).alias("id")).withColumn(
            "bucket", F.lit(0).cast("long")
        )
    dim = int(dim_row[0]["d"])

    import hashlib

    def plane_component(p: int, d: int) -> float:
        h = hashlib.md5(f"hp:{seed}:{p}:{d}".encode()).digest()
        u = int.from_bytes(h[:8], "little") / float(1 << 64)
        return u - 0.5

    bucket = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.array(*[F.lit(plane_component(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
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

"""Deduplication operators for training-data pipelines.

Four tiers, all pure pyspark.sql (no Python in the row path):

- ``exact_duplicates``: sha256-groupBy. One shuffle on the 64-hex digest;
  at 100 TB this is the canonical "group by content hash" pass (digest
  computed JVM-side during the scan, so only (id, digest) shuffles —
  never the content).
- ``ngram_jaccard_pairs``: exact n-gram Jaccard via inverted index
  self-join — explode shingles, join docs sharing a shingle, count
  common / union. Quadratic in bucket size: correct at CI scale and as
  the verifier for the approximate tiers; at 100 TB run it only on LSH
  candidate pairs.
- ``minhash_lsh_candidates``: MinHash signatures (k portable md5 hashes,
  min per hash) banded into b bands of r rows; docs sharing a band bucket
  are candidate near-dups. The shuffle is on (band, bucket-hash) — bounded
  by band count × docs, independent of pairwise blowup.
- ``simhash_signatures``: 64-bit SimHash — per-token md5 bits, weighted
  bit-majority. Near-dups = signatures at small Hamming distance.

Tokenization is shared and oracle-reproducible: lowercase, split on
non-alphanumerics, drop empties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.functions.porthash import md5_mod

TOKEN_SPLIT = "[^a-z0-9]+"


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a narrow input up to the cluster's parallelism before an
    explode-heavy stage. Small parquet inputs arrive as 1-2 partitions (one
    row group), which would serialize the shingle/hash work onto one task;
    at real scale inputs already have ≥ parallelism partitions and this is
    a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _tokens(col):
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def _shingles(col, n: int):
    """Word n-gram shingles joined by single spaces (distinct)."""
    toks = _tokens(col)
    if n <= 1:
        return F.array_distinct(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(digest, group_size, keep_id): one row per duplicate group (size>1
    groups are the dups; keep_id = min id, the canonical survivor)."""
    return (
        docs.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("digest"))
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min(id_col).alias("keep_id"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 1000,
    all_pairs: bool = False,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with n-gram Jaccard ≥ threshold.

    Inverted-index join: only docs sharing ≥1 shingle are compared.

    ``max_df`` is the scale guard: a shingle appearing in more than
    ``max_df`` documents ("stop shingle" — boilerplate, license headers)
    is dropped from BOTH the pair index and the per-doc sizes, i.e. the
    Jaccard is computed over the filtered shingle universe. Without it
    the self-join is quadratic per shared shingle — one shingle present
    in a million docs yields 5·10¹¹ candidate rows, so the df cap is ON
    by default (1000). The unguarded quadratic path (``max_df=None``)
    requires an explicit ``all_pairs=True`` opt-in and is meant only for
    verifier runs on pre-blocked candidate sets.
    """
    if max_df is None and not all_pairs:
        raise ValueError(
            "max_df=None makes the shingle self-join quadratic per shared "
            "shingle; pass all_pairs=True to opt into the unguarded path "
            "(verifier runs on pre-blocked candidates only)"
        )
    sh = _spread(docs).select(
        F.col(id_col).alias("id"), F.explode(_shingles(F.col(text_col), n)).alias("s")
    )
    if max_df is not None:
        keep = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("s")
        )
        sh = sh.join(keep, "s", "left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    common = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, h0..h{k-1}): MinHash signature per doc via k salted portable
    hashes. Docs with no shingles get NULL mins (filtered by callers).

    r8 plan (guide §1.2 "per-task work"): shingles repeat heavily across
    documents (~10:1 on the benchmark corpus), so the k salted md5 hashes
    are computed once per DISTINCT shingle — group the inverted index by
    shingle (one narrow shuffle), hash each group row, explode the doc
    ids back, then take the per-doc min. The (id, hash-value) multiset
    reaching the min aggregate is identical to hashing every (doc,
    shingle) row, so the signatures are bit-for-bit unchanged; the md5
    work drops by the duplication factor."""
    sh = _spread(docs).select(
        F.col(id_col).alias("id"), F.explode(_shingles(F.col(text_col), shingle_n)).alias("s")
    )
    grouped = sh.groupBy("s").agg(F.collect_list("id").alias("ids"))
    hcols = [f"h{i}" for i in range(num_hashes)]
    hashed = grouped.select(
        "ids",
        *[
            md5_mod(F.col("s"), salt=f"mh{i}:").alias(c)
            for i, c in enumerate(hcols)
        ],
    )
    per_doc = hashed.select(F.explode("ids").alias("id"), *hcols)
    return per_doc.groupBy("id").agg(*[F.min(c).alias(c) for c in hcols])


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, bands_shared): candidate near-dup pairs that collide in
    ≥1 LSH band (num_hashes/bands rows per band)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, shingle_n, id_col, text_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("_", *[F.col(f"h{b * rows + r}") for r in range(rows)]).alias("key"),
        )
        for b in range(bands)
    ]
    buckets = sig.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    return (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("bands_shared"))
    )


def simhash_signatures(
    docs: DataFrame,
    bits: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, simhash): weighted bit-majority over token hashes.

    Plan: explode tokens → count per (doc, token) → explode bit index →
    groupBy doc,bit with ±count votes → assemble bits. Two shuffles, both
    on doc-sized keys; the 64× bit blowup stays columnar.
    """
    tok = (
        _spread(docs).select(F.col(id_col).alias("id"), F.explode(_tokens(F.col(text_col))).alias("t"))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("th", md5_mod(F.col("t"), salt="sh:", prime=(1 << 61) - 1))
    )
    bit = tok.select(
        "id",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
        "th",
    ).select(
        "id",
        "b",
        F.when(F.expr("shiftright(th, CAST(b AS INT)) % 2 = 1"), F.col("cnt"))
        .otherwise(-F.col("cnt"))
        .alias("vote"),
    )
    return (
        bit.groupBy("id", "b")
        .agg(F.sum("vote").alias("v"))
        .groupBy("id")
        .agg(
            F.sum(
                F.when(
                    F.col("v") > 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    keep: str = "longest",
    text_col: str = "text",
) -> DataFrame:
    """Resolve verified near-duplicate PAIRS into clusters and pick one
    canonical document per cluster — the step that turns pairwise dedup
    output (exact digests, LSH+Jaccard verification, embedding cosine)
    into an actual training-set filter.

    ``pairs``: two id columns of near-duplicate links; ``keep``:
    ``longest`` (longest text wins, ties to smallest id — the common
    near-dup policy) or ``smallest_id``. Returns
    (doc_id, cluster, is_canonical) for EVERY document — singletons are
    their own canonical cluster.

    Scale shape: clustering is the connected-components kernel over the
    near-dup link graph (O(log n) hash-to-min rounds — dedup clusters
    are shallow, typically 2-3 rounds); the canonical pick is one
    window over clusters. Only (id, cluster)-shaped rows shuffle; text
    lengths join in from the docs scan.
    """
    from networkit_spark.graph import Graph
    from networkit_spark.operators.components import connected_components

    a, b = pairs.columns[0], pairs.columns[1]
    edges = pairs.select(
        F.col(a).cast("long").alias("src"), F.col(b).cast("long").alias("dst")
    )
    nodes = docs.select(F.col(id_col).cast("long").alias("id"))
    g = Graph.from_edges(
        edges.withColumn("weight", F.lit(1.0)), directed=False, nodes=nodes
    )
    labels = connected_components(g).select(
        F.col("node").alias(id_col), F.col("label").alias("cluster")
    )
    if keep == "longest":
        ranked = labels.join(
            docs.select(
                F.col(id_col), F.length(F.col(text_col)).alias("_len")
            ),
            id_col,
        )
        w = Window.partitionBy("cluster").orderBy(
            F.desc("_len"), F.asc(id_col)
        )
    elif keep == "smallest_id":
        ranked = labels.withColumn("_len", F.lit(0))
        w = Window.partitionBy("cluster").orderBy(F.asc(id_col))
    else:
        raise ValueError(f"unknown keep policy {keep!r}")
    return (
        ranked.withColumn("_rn", F.row_number().over(w))
        .select(id_col, "cluster", (F.col("_rn") == 1).alias("is_canonical"))
    )

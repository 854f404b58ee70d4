"""Synthetic source-code table — the engine's true ingest input.

The production input (BASELINE.json input_hint) is an Iceberg table
``(repo STRING, path STRING, commit STRING, lang STRING, content STRING)``
at 10^12-file scale. For CI we render a deterministic synthetic table of
exactly that shape from an underlying dependency graph: each vertex
becomes a file whose ``content`` embeds one import/include line per
out-edge in lang-appropriate syntax (FIXTURES.md §1).

Everything is column expressions — the rendering is a join + group +
``concat_ws``, no Python in the row path — so the same code synthesizes
10^5 files locally and 10^12 on a cluster.

Invariant: ``sha256(content)`` per row is stable across ingest and across
parallelism levels (tested in tests/test_ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "c", "cpp", "java"]
_EXT = {"python": ".py", "c": ".h", "cpp": ".hpp", "java": ".java"}


def _lang_of(vid):
    return F.element_at(F.array(*[F.lit(l) for l in LANGS]), (vid % 4 + 1).cast("int"))


def _path_of(vid, lang):
    """Deterministic path for vertex id: dir sharding keeps paths realistic."""
    return F.concat(
        F.lit("src/m"),
        (vid % 97).cast("string"),
        F.lit("/f"),
        vid.cast("string"),
        F.element_at(
            F.array(*[F.lit(_EXT[l]) for l in LANGS]), (vid % 4 + 1).cast("int")
        ),
    )


def _import_line(lang, target_path):
    """Render one dependency as an import/include statement."""
    module = F.regexp_replace(
        F.regexp_replace(target_path, r"\.(py|h|hpp|java)$", ""), "/", "."
    )
    return (
        F.when(lang == "python", F.concat(F.lit("import "), module))
        .when(lang == "java", F.concat(F.lit("import "), module, F.lit(";")))
        .otherwise(F.concat(F.lit('#include "'), target_path, F.lit('"')))
    )


def synthesize_source_table(
    spark: SparkSession,
    edges: DataFrame,
    n: int,
    repos: int = 10,
    seed: int = 42,
    filler_lines: int = 3,
) -> DataFrame:
    """Render dependency graph ``edges(src, dst)`` over vertices 0..n-1 as a
    source-file table (repo, path, commit, lang, content).

    All vertices of one graph land in one repo (repo = hash-bucket of id,
    but dependencies must stay intra-repo, so repo is derived from a stable
    partition of the vertex space: vid % repos maps edges across repos —
    instead we bucket by vid // ceil(n/repos) so edge locality is possible;
    for simplicity and to keep EVERY edge resolvable we put everything in
    repo buckets by (vid * repos // n) and emit the import with the
    target's path regardless — extraction resolves within repo, so we
    force src and dst into the same repo by bucketing on the SOURCE vertex
    and rendering the target path verbatim).

    To guarantee resolvability, the target path encodes the vertex id
    globally and the extractor joins on path alone within repo='r0' when
    repos=1. Tests use repos=1; multi-repo rendering partitions the graph.
    """
    vids = spark.range(n).select(F.col("id").alias("vid"))
    lang = _lang_of(F.col("vid"))
    repo = F.concat(F.lit("org0/repo"), (F.col("vid") * repos / F.lit(n)).cast("long").cast("string")) if repos > 1 else F.lit("org0/repo0")

    files = vids.select(
        "vid",
        repo.alias("repo"),
        _path_of(F.col("vid"), lang).alias("path"),
        lang.alias("lang"),
    )

    # one import line per out-edge, rendered in the SOURCE file's language
    tgt = files.select(
        F.col("vid").alias("dst"), F.col("path").alias("dst_path")
    )
    dep_lines = (
        edges.select("src", "dst")
        .join(tgt, "dst")
        .join(files.select(F.col("vid").alias("src"), F.col("lang").alias("src_lang")), "src")
        .select(
            "src",
            _import_line(F.col("src_lang"), F.col("dst_path")).alias("line"),
            "dst",
        )
        .groupBy("src")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("dst", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("imports")
        )
    )

    filler = F.concat_ws(
        "\n",
        *[
            F.concat(
                F.lit(f"# filler {i} "),
                F.sha2(
                    F.concat(F.col("vid").cast("string"), F.lit(f":{seed}:{i}")), 256
                ),
            )
            for i in range(filler_lines)
        ],
    )

    out = (
        files.join(dep_lines.withColumnRenamed("src", "vid"), "vid", "left")
        .select(
            "repo",
            "path",
            F.sha2(F.concat(F.col("repo"), F.lit("@"), F.col("path")), 256)
            .substr(1, 40)
            .alias("commit"),
            "lang",
            F.concat_ws(
                "\n",
                F.concat(F.lit("// file "), F.col("path")),
                F.coalesce(F.col("imports"), F.lit("")),
                filler,
            ).alias("content"),
        )
    )
    return out

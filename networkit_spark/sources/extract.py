"""Dependency-edge extraction from source-file content.

The scale path of the ingest (SURVEY.md §2.1 "our true source"): a
vectorized pandas UDF (Arrow-batched — never per-row Python, per
input_hint) runs a per-``lang`` regex over ``content`` and emits the
referenced module/include strings; a join against the file table resolves
them to target paths WITHIN the same repo; dense vertex ids come from a
rank over the distinct (repo, path) set (the distributed analogue of the
reference reader's first-seen remap, ``io/SNAPGraphReader.cpp:27-40``).

Plan shape at 100 TB:
  files ──mapInPandas regex──▶ (repo, path, ref)          [narrow, no shuffle]
        ──join files on (repo, ref_path)──▶ raw edges      [shuffle on repo+path]
        ──join id map ×2──▶ edges(src, dst)                [|V|-sized map]
Filters/projections stay columnar: only (repo, path, lang, content) are
read from Parquet/Iceberg; sha256 is computed JVM-side with ``F.sha2``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import Graph
from networkit_spark.ids import assign_dense_ids

_PATTERNS = {
    "python": re.compile(r"^\s*import\s+([\w\.]+)", re.M),
    "java": re.compile(r"^\s*import\s+([\w\.]+)\s*;", re.M),
    "c": re.compile(r'^\s*#include\s*"([^"]+)"', re.M),
    "cpp": re.compile(r'^\s*#include\s*"([^"]+)"', re.M),
}
_EXT = {"python": ".py", "java": ".java"}


def _refs_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: (repo, path, lang, content) → (repo, path, ref_path).

    Module refs (python/java dots) are converted back to file paths; C/C++
    includes are already paths. Pure pandas/py-regex over Arrow batches.
    """
    for pdf in batches:
        out_repo, out_path, out_ref = [], [], []
        for repo, path, lang, content in zip(
            pdf["repo"], pdf["path"], pdf["lang"], pdf["content"]
        ):
            pat = _PATTERNS.get(lang)
            if pat is None or content is None:
                continue
            for m in pat.findall(content):
                # resolution is EXTENSION-AGNOSTIC: a python `import a.b.c`
                # or a C `#include "a/b/c.h"` both resolve to the repo file
                # whose extension-stripped path is a/b/c — cross-language
                # dependencies (python importing a C module, JNI, cffi)
                # would otherwise silently drop edges
                if lang in ("python", "java"):
                    ref = m.replace(".", "/")
                else:
                    ref = re.sub(r"\.[^./]+$", "", m)
                out_repo.append(repo)
                out_path.append(path)
                out_ref.append(ref)
        yield pd.DataFrame({"repo": out_repo, "path": out_path, "ref_path": out_ref})


def extract_edges(files: DataFrame) -> DataFrame:
    """(repo, src_path, dst_path) dependency edges, resolved intra-repo
    against extension-stripped target paths."""
    refs = files.select("repo", "path", "lang", "content").mapInPandas(
        _refs_batch, schema="repo string, path string, ref_path string"
    )
    targets = (
        files.select(
            "repo",
            F.regexp_replace("path", r"\.[^./]+$", "").alias("ref_path"),
            F.col("path").alias("dst_path"),
        )
        .distinct()
    )
    resolved = refs.join(targets, ["repo", "ref_path"], "inner")
    return resolved.select(
        "repo", F.col("path").alias("src_path"), "dst_path"
    ).distinct()


def dependency_graph(files: DataFrame, directed: bool = True) -> tuple[Graph, DataFrame]:
    """Full ingest: file table → (Graph, vertex map (repo, path, id)).

    Every file is a vertex (files with no deps stay isolated — PLP keeps
    them singletons, ``community/PLP.cpp:48-59``).
    """
    mapping = assign_dense_ids(files.select("repo", "path"), ["repo", "path"])
    deps = extract_edges(files)
    e = (
        deps.join(
            mapping.withColumnRenamed("path", "src_path").withColumnRenamed("id", "src"),
            ["repo", "src_path"],
        )
        .join(
            mapping.withColumnRenamed("path", "dst_path").withColumnRenamed("id", "dst"),
            ["repo", "dst_path"],
        )
        .select("src", "dst")
    )
    nodes = mapping.select("id")
    g = Graph.from_edges(e, directed=directed, nodes=nodes, dedupe=True)
    return g, mapping


def with_sha256(files: DataFrame) -> DataFrame:
    """Attach the per-row ingest invariant: sha256 of content (JVM-side)."""
    return files.withColumn("content_sha256", F.sha2(F.col("content"), 256))

"""Text-analysis operators for training-data pipelines.

All pure pyspark.sql column expressions (JVM-side, codegen-friendly):
token counting, language id (stopword-hit heuristic), quality scoring
(length / punctuation / stopword ratios), and document fingerprinting
(min-hash-of-k-grams, a winnowing-style rolling fingerprint).

These run in the same scan as the Parquet read — no extra shuffle except
the explode+groupBy inside the fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.porthash import md5_mod
from networkit_spark.pipeline.dedup import TOKEN_SPLIT, _shingles, _spread, _tokens

# tiny embedded stopword lists — a deterministic n-gram-free heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "no", "es", "en", "un", "por"],
}


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_words, n_chars): whitespace tokens plus a BPE-ish
    word/number/punct split."""
    ws = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != "")
    bpe = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+"), lambda t: t != ""
    )
    return docs.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_tokens"),
        F.size(bpe).cast("long").alias("n_words"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, lang_pred, lang_score): argmax stopword-hit-rate across the
    embedded lists; ties break alphabetically; no hits → 'und'."""
    toks = _tokens(F.col(text_col))
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct(
            (hits / F.greatest(F.size(toks), F.lit(1))).alias("score"),
            F.lit(lang).alias("lang"),
        ))
    arr = F.array(*scores)
    best = F.array_max(
        F.transform(arr, lambda s: F.struct(s["score"].alias("score"), s["lang"].alias("lang")))
    )
    # array_max on struct orders by (score, lang) — ties pick LAST lang;
    # invert lang for min-tie-break determinism is unnecessary: ordering is
    # total and deterministic either way.
    return docs.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, mean_word_len, punct_ratio, stopword_ratio, alpha_ratio,
    quality): deterministic heuristic quality in [0,1]."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(t), F.lit(1))
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    alpha = F.length(F.regexp_replace(F.lower(t), r"[^a-z]", ""))
    all_sw = F.array(*[F.lit(w) for ws in STOPWORDS.values() for w in ws])
    sw_hits = F.size(F.filter(toks, lambda x: F.array_contains(all_sw, x)))
    mean_wl = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
        / n_toks
    )
    punct_ratio = punct / n_chars
    sw_ratio = sw_hits / n_toks
    alpha_ratio = alpha / n_chars
    quality = (
        F.least(sw_ratio * 4, F.lit(1.0)) * 0.4
        + F.least(alpha_ratio * 1.25, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
    )
    return docs.select(
        F.col(id_col),
        mean_wl.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        sw_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        quality.alias("quality"),
    )


def doc_fingerprint(
    docs: DataFrame,
    shingle_n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fingerprint): min portable-hash over word k-grams — a
    winnowing-style rolling fingerprint that is stable under whitespace
    and case changes."""
    sh = _spread(docs).select(
        F.col(id_col), F.explode_outer(_shingles(F.col(text_col), shingle_n)).alias("s")
    )
    return sh.groupBy(id_col).agg(
        F.min(md5_mod(F.col("s"), salt="fp:")).alias("fingerprint")
    )

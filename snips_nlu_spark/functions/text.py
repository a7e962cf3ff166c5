"""Text-analysis column functions over a document table.

All pure ``pyspark.sql.functions`` column expressions (JVM-side,
whole-stage codegen, no Python in the hot path) with exact DuckDB-SQL
oracle equivalents registered in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F  # noqa: N812

# Per-language marker words for the n-gram/stopword language-ID heuristic.
# Deliberately small + word-boundary-matched so the same regex semantics
# hold in Spark and DuckDB.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in|that|it|was|for)\b",
    "fr": r"\b(le|la|les|et|des|une|est|dans|que|pour)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b",
    "es": r"\b(el|los|las|es|en|que|una|por|con|para)\b",
}

_WORD_RE = r"[A-Za-z0-9]+"


def token_count(text: Column) -> Column:
    """Whitespace/word-regex token count (BPE-ish proxy: alnum runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(_WORD_RE), F.lit(0)))


def _marker_hits(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern),
                                       F.lit(0)))


def language_id(text: Column) -> Column:
    """argmax over marker-word hit counts; 'und' (undetermined) when no
    marker matches. Ties break by language code order (deterministic)."""
    pairs = [F.struct(_marker_hits(text, pat).alias("hits"),
                      F.lit(code).alias("lang"))
             for code, pat in sorted(LANG_MARKERS.items())]
    best = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + alpha ratio + stopword
    presence - punctuation excess. Formula chosen to be expressible
    identically in DuckDB SQL (see __spark_entry__.oracle_sql)."""
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    n_tokens = token_count(text)
    stop_hits = _marker_hits(text, LANG_MARKERS["en"])
    len_component = F.when((n_chars >= 50) & (n_chars <= 5000), F.lit(0.25)) \
        .otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0,
                         n_alpha.cast("double") / n_chars.cast("double")) \
        .otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0,
                         n_punct.cast("double") / n_chars.cast("double")) \
        .otherwise(F.lit(0.0))
    stop_component = F.when(
        n_tokens > 0,
        F.least(F.lit(0.25),
                stop_hits.cast("double") / n_tokens.cast("double"))) \
        .otherwise(F.lit(0.0))
    raw = (len_component + 0.5 * alpha_ratio + stop_component
           - 0.5 * punct_ratio)
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw)), 6)


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized
    lowercase text (md5 exists with identical semantics in DuckDB)."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def text_profile(documents: DataFrame) -> DataFrame:
    """The combined per-document analysis table."""
    return documents.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        language_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text")).alias("quality"),
        doc_fingerprint(F.col("text")).alias("fingerprint"),
    )

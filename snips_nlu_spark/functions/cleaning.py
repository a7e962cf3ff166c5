"""Corpus-cleaning operators for LLM training-data pipelines.

Three classic pretraining-cleanup stages, all pure JVM expressions
(whole-stage codegen; no Python in the hot path):

- line-level boilerplate removal (the CCNet/RefinedWeb recipe): lines
  occurring in more than ``min_df`` distinct documents are dropped and
  each document is reassembled in original line order. One explode +
  one count-distinct agg + one join — the line-frequency side is tiny
  relative to the corpus and broadcastable at real scale;
- PII masking: email/phone spans replaced with typed placeholder
  tokens via regexp_replace (conservative patterns valid in both Java
  regex and RE2, so the DuckDB oracle runs the same expressions);
- Gopher-style quality flags: per-document word statistics and the
  corresponding keep/drop booleans (word-count window, mean word
  length window, symbol ratio cap) per the repetition/quality filters
  popularized by the Gopher/MassiveText cleaning rules.

The repo's documents fixture is single-line and digit-free, so the
boilerplate and PII gate queries run on deterministic synthetic tables
(pure functions of the row id — reproducible in SQL, same pattern as
the multimodal plumbing gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
# international formats: "+44 20 7946 0958", "(415) 555-0123",
# "415.555.0123" — >=9 chars, digit-delimited, no letters inside
PHONE_RE = "\\(?\\+?[0-9][0-9()\\. -]{7,}[0-9]"
# country code + check digits + 2-7 groups of 4 (spaced or fused) + an
# optional short tail — DE89 3704 0044 0532 0130 00 / GB29NWBK6016...
IBAN_RE = ("\\b[A-Z]{2}[0-9]{2}(?: ?[A-Z0-9]{4}){2,7}"
           "(?: ?[A-Z0-9]{1,3})?\\b")
IPV4_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"


def remove_boilerplate_lines(documents: DataFrame,
                             min_df: int = 20) -> DataFrame:
    """(doc_id, text) with every line occurring in > ``min_df`` distinct
    docs removed; line order preserved; docs whose lines all vanish keep
    an empty string."""
    lines = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n"))
        .alias("pos", "line"))
    hot = (lines.groupBy("line")
           .agg(F.countDistinct("doc_id").alias("df"))
           .filter(F.col("df") > min_df)
           .select("line"))
    kept = lines.join(F.broadcast(hot), "line", "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.concat_ws(
                   "\n",
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("pos", "line"))),
                       lambda s: s["line"])).alias("text")))
    # docs that lost every line still get a row (empty text)
    return (documents.select("doc_id")
            .join(rebuilt, "doc_id", "left")
            .na.fill({"text": ""}))


def mask_pii_col(text) -> "F.Column":
    """The PII-masked version of a text Column — exposed so pipelines
    can mask IN PLACE (``withColumn``) instead of joining a masked
    frame back to its own parent, which re-shuffles the corpus by
    doc_id for no reason."""
    masked = text
    for pat, token in ((EMAIL_RE, "<EMAIL>"), (IBAN_RE, "<IBAN>"),
                       (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>")):
        masked = F.regexp_replace(masked, pat, token)
    return masked


def mask_pii(documents: DataFrame) -> DataFrame:
    """(doc_id, text) with emails → <EMAIL>, IBANs → <IBAN>, IPv4
    addresses → <IP> and phone-like digit runs → <PHONE>. Order
    matters: emails first (their digits must not phone-match), then
    IBANs (digit groups would otherwise be phone-eaten), then IPs
    (dotted quads would otherwise match the dotted-phone form), phones
    last. All four patterns are valid in BOTH Java regex and RE2, so
    the DuckDB oracle runs the identical expressions."""
    return documents.select(
        "doc_id", mask_pii_col(F.col("text")).alias("text"))


def gopher_cols(min_words: int = 50, max_words: int = 100_000,
                min_mean_word_len: float = 3.0,
                max_mean_word_len: float = 10.0,
                max_symbol_frac: float = 0.1) -> dict:
    """name → Column map of the Gopher statistics/flags over a ``text``
    column, exposed so callers can compose them with other flags in ONE
    projection (see ``quality_filter`` for why a flag-frame join is a
    driver-side trap)."""
    words = F.regexp_extract_all(F.col("text"), F.lit("\\S+"), F.lit(0))
    n_words = F.size(words)
    total_word_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0), lambda acc, x: acc + x)
    mean_word_len = F.when(
        n_words > 0,
        F.round(total_word_chars.cast("double") / n_words, 6)
    ).otherwise(F.lit(0.0))
    n_chars = F.length("text")
    n_symbols = F.length(
        F.regexp_replace(F.col("text"), "[A-Za-z0-9\\s]", ""))
    symbol_frac = F.when(
        n_chars > 0,
        F.round(n_symbols.cast("double") / n_chars, 6)
    ).otherwise(F.lit(0.0))
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_frac": symbol_frac,
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_mean_word_len": mean_word_len.between(
            min_mean_word_len, max_mean_word_len),
        "ok_symbol_frac": symbol_frac <= max_symbol_frac,
    }


def gopher_quality_flags(documents: DataFrame,
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_frac: float = 0.1) -> DataFrame:
    """Per-doc word statistics + keep/drop booleans (Gopher-style
    rules). All columns rounded/typed for exact SQL parity."""
    cols = gopher_cols(min_words, max_words, min_mean_word_len,
                       max_mean_word_len, max_symbol_frac)
    return documents.select(
        "doc_id", *(c.alias(name) for name, c in cols.items()))


def quality_filter(documents: DataFrame, **kwargs) -> DataFrame:
    """Rows of ``documents`` passing BOTH the Gopher quality flags and
    the within-doc repetition flags, evaluated in ONE projection over
    the input scan.

    Why not ``gopher_quality_flags(df).join(repetition_flags(df),
    "doc_id").filter(...)``? Both flag frames derive from the same
    scan and their flag columns alias very large expression trees (the
    repetition longest-run aggregate in particular). Filtering across
    such a self-join makes Catalyst's constraint propagation substitute
    and recombine those trees combinatorially — observed 200+ s of
    driver-side planning at 500 rows. Composing the flags as one
    filter over one projection keeps planning O(expression size) and
    the whole stage codegen'd.

    kwargs are split by name between ``gopher_cols`` and
    ``repetition_cols``.
    """
    from .text import repetition_cols

    gk = {k: v for k, v in kwargs.items()
          if k in ("min_words", "max_words", "min_mean_word_len",
                   "max_mean_word_len", "max_symbol_frac")}
    rk = {k: v for k, v in kwargs.items()
          if k in ("max_dup_line_frac", "max_top_bigram_frac")}
    unknown = set(kwargs) - set(gk) - set(rk)
    if unknown:
        raise TypeError(f"unknown quality_filter kwargs: {sorted(unknown)}")
    g = gopher_cols(**gk)
    r = repetition_cols(**rk)
    keep = (g["ok_word_count"] & g["ok_mean_word_len"]
            & g["ok_symbol_frac"] & r["ok_dup_lines"] & r["ok_top_bigram"])
    return documents.filter(keep)


def benchmark_contamination(documents: DataFrame, benchmark: DataFrame,
                            n: int = 5,
                            threshold: float = 0.5) -> DataFrame:
    """Eval-set decontamination (the GPT-3 appendix-C / Gopher recipe):
    flag every training document whose word n-gram shingles cover at
    least ``threshold`` of some benchmark item's shingles.

    ``benchmark`` is (bench_id, text) — the eval prompts/answers.
    Output: (doc_id, bench_id, overlap_ngrams, bench_ngrams,
    overlap_frac) for flagged pairs only.

    Scale shape: the benchmark side is a few MB against a 100-TB corpus,
    so its shingle set is broadcast; the corpus is shingled map-side
    (one pass, no shuffle of unmatched rows) and only the surviving
    (doc, bench, shingle) matches — a set proportional to actual
    contamination, not corpus size — reach the (doc_id, bench_id)
    count shuffle.
    """
    from .dedup import _shingles

    doc_sh = _shingles(documents, n=n)
    bench_sh = _shingles(
        benchmark.select(F.col("bench_id").alias("doc_id"), "text"), n=n
    ).select(F.col("doc_id").alias("bench_id"), "shingle")
    bench_sizes = bench_sh.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams"))
    hits = (doc_sh.join(F.broadcast(bench_sh), "shingle")
            .groupBy("doc_id", "bench_id")
            .agg(F.count(F.lit(1)).alias("overlap_ngrams")))
    frac = F.round(
        F.col("overlap_ngrams").cast("double") / F.col("bench_ngrams"), 6)
    return (hits.join(F.broadcast(bench_sizes), "bench_id")
            .withColumn("overlap_frac", frac)
            .filter(F.col("overlap_frac") >= threshold)
            .select("doc_id", "bench_id", "overlap_ngrams",
                    "bench_ngrams", "overlap_frac"))


def snippet_benchmark(documents: DataFrame, modulus: int = 29,
                      residue: int = 5, start_word: int = 6,
                      n_words: int = 10) -> DataFrame:
    """Deterministic benchmark table for the contamination gate: a
    ``n_words``-word window cut from every document with
    doc_id % modulus == residue — modeling eval items that literally
    appear inside training documents (the planted-contamination case
    the detector must catch). Pure function of the corpus, reproducible
    in SQL."""
    w = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"),
                             F.lit(0))
    return (documents
            .filter(F.col("doc_id") % modulus == residue)
            .select(F.col("doc_id").alias("bench_id"), w.alias("w"))
            .filter(F.size("w") >= start_word + n_words - 1)
            .select("bench_id",
                    F.array_join(F.slice("w", start_word, n_words), " ")
                    .alias("text")))


def synthesize_line_docs(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic multi-line doc table for the boilerplate gate —
    pure function of the row id, reproducible in SQL. Per doc: a shared
    header (df = n/5), a globally-unique content line, one of two hot
    footers (df ≈ n/2), and a rare tail (df = n/40, below the default
    min_df)."""
    i = F.col("id")
    text = F.concat_ws(
        "\n",
        F.concat(F.lit("shared header "), (i % 5).cast("string")),
        F.concat(F.lit("unique content "), i.cast("string"),
                 F.lit(" value "), ((i * i) % 97).cast("string")),
        F.when(i % 2 == 0, F.lit("copyright footer line"))
        .otherwise(F.lit("subscribe newsletter now")),
        F.concat(F.lit("rare tail "), (i % 40).cast("string")))
    return spark.range(n).select(i.alias("doc_id"), text.alias("text"))


def synthesize_pii_docs(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic doc table with emails, international + US phone
    formats, IBANs and IPv4 addresses derived from the row id — pure
    function of the id, reproducible in SQL."""
    i = F.col("id")
    text = F.concat(
        F.lit("contact user"), i.cast("string"),
        F.lit("@example.com or call +1 555 00"),
        F.lpad((i % 100).cast("string"), 2, "0"),
        F.lit(" 1234, alt (415) 555-0"),
        F.lpad((i % 1000).cast("string"), 3, "0"),
        F.lit(", wire DE"), ((i % 89) + 10).cast("string"),
        F.lit(" 3704 0044 0532 "),
        F.lpad(((i * 13) % 10000).cast("string"), 4, "0"),
        F.lit(" 00 from 10."), (i % 256).cast("string"),
        F.lit(".0."), ((i * 3) % 256).cast("string"),
        F.lit(" about order "), ((i * 7) % 1000).cast("string"))
    return spark.range(n).select(i.alias("doc_id"), text.alias("text"))

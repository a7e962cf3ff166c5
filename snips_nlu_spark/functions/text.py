"""Text-analysis column functions over a document table.

All pure ``pyspark.sql.functions`` column expressions (JVM-side,
whole-stage codegen, no Python in the hot path) with exact DuckDB-SQL
oracle equivalents registered in __spark_entry__.
"""

from __future__ import annotations

import pandas as pd
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


# GPT-2-style pretokenizer, restricted to constructs RE2 also supports
# (no lookahead) so Spark and the DuckDB oracle run the IDENTICAL
# pattern: contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, then residual whitespace.
BPE_SPLIT_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
                r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")


def bpe_token_count(text: Column) -> Column:
    """Pretokenizer-piece count — the standard proxy for LLM token
    budgeting (each piece maps to ≥1 BPE token, so this lower-bounds
    the real tokenizer; the exact vocab merge step needs the vocab
    file, which is a resource, not an algorithm)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_RE),
                                       F.lit(0)))


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_bpe_pieces, n_chars) — the token-budget
    rollup a training-data pipeline runs before sampling."""
    return documents.select(
        "doc_id",
        token_count(F.col("text")).alias("n_words"),
        bpe_token_count(F.col("text")).alias("n_bpe_pieces"),
        F.length("text").alias("n_chars"))


# --- real vocab-driven BPE ---------------------------------------------------

def _bpe_ranks() -> dict:
    """pair → merge rank from the committed trained table (generated by
    scripts/make_bpe_vocab.py; shipped as a .py data module so the
    spark-submit --py-files zip carries it)."""
    from .bpe_vocab import MERGES
    return {pair: rank for rank, pair in enumerate(MERGES)}


def bpe_encode(pretoken: str, ranks: dict) -> tuple:
    """Greedy lowest-rank-first BPE merge loop (the GPT-2 inference
    algorithm): start from characters, repeatedly merge the adjacent
    pair with the smallest rank until none is in the table. Exact —
    not the pretokenizer-piece proxy (``bpe_token_count``)."""
    sym = list(pretoken)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


def chunk_documents(documents: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 16) -> DataFrame:
    """RAG-style fixed-window chunking: each document becomes
    overlapping windows of ``chunk_tokens`` whitespace tokens with
    ``overlap`` tokens shared between consecutive chunks (stride =
    chunk_tokens − overlap). The retrieval-pipeline step between
    curation and embedding.

    Output: (doc_id, chunk_idx, n_chunk_tokens, chunk_text); empty
    documents produce no rows; a document shorter than one window
    produces exactly one chunk.

    Scale shape: pure JVM — one regexp token split, a transform over
    the (bounded) per-doc chunk index range building each window via
    slice + array_join, then one posexplode. No shuffle at all: the
    op is embarrassingly parallel over the scan.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    n = F.size("_w")
    n_chunks = F.floor((F.greatest(n - overlap, F.lit(1))
                        + (stride - 1)) / stride).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("_w"), i * stride + 1, chunk_tokens))
    return (documents
            .select("doc_id", words.alias("_w"))
            .filter(n > 0)
            .select("doc_id",
                    F.posexplode(chunks).alias("chunk_idx", "_c"))
            .select("doc_id", "chunk_idx",
                    F.size("_c").alias("n_chunk_tokens"),
                    F.array_join("_c", " ").alias("chunk_text")))


def bpe_train_merges(word_freqs: dict[str, int],
                     n_merges: int) -> list[tuple[str, str]]:
    """Deterministic BPE training over a word-frequency table
    (Sennrich et al. 2016): start every type as a character sequence,
    repeatedly merge the most frequent adjacent pair, ties to the
    lexicographically smallest pair, stop when no pair occurs twice.
    Shared spec between the Spark trainer (:func:`train_bpe`), the
    committed-vocab script (scripts/make_bpe_vocab.py) and the oracle
    replay."""
    from collections import Counter

    seqs: list[tuple[list[str], int]] = [
        (list(w), f) for w, f in sorted(word_freqs.items())]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in seqs:
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best_n = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_n)
        if best_n < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for sym, _freq in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def train_bpe(documents: DataFrame, n_merges: int = 64,
              min_count: int = 2,
              max_vocab: int = 200_000) -> DataFrame:
    """Tokenizer training ON the corpus, Spark-first: the corpus-wide
    stage is ONE pretoken-frequency pass (explode + map-side-combinable
    count — the only thing that scales with corpus size); the merge
    loop then runs on the driver over the bounded TYPE table, exactly
    how production vocabularies are trained. ``min_count`` prunes the
    Heaps-law hapax tail and ``max_vocab`` hard-caps the collected
    table (top-K by (freq desc, word asc) — a deterministic
    TakeOrdered, no full sort), so the driver never sees more than a
    vocabulary of types at any corpus scale.

    Output: (rank, left, right) — the merge table, rank = merge order.
    """
    spark = documents.sparkSession
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_RE),
                                F.lit(0))
    freqs = (documents
             .select(F.explode(toks).alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
             .filter(F.col("freq") >= min_count)
             .orderBy(F.desc("freq"), F.asc("word"))
             .limit(max_vocab).collect())
    merges = bpe_train_merges({r["word"]: r["freq"] for r in freqs},
                              n_merges)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string")


def bpe_token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_bpe_tokens): EXACT vocab-driven BPE token counts —
    the number a real token-budget pipeline charges. Arrow-batched
    pandas UDF; the per-pretoken encode is memoized across the batch
    (Zipf: a handful of distinct pretokens dominate any corpus), so the
    merge loop runs once per DISTINCT pretoken per executor, not once
    per occurrence."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    split = BPE_SPLIT_RE

    @pandas_udf("int")
    def count_udf(texts: pd.Series) -> pd.Series:
        ranks = _bpe_ranks()
        pat = _re.compile(split)
        memo: dict[str, int] = {}
        out = []
        for t in texts:
            total = 0
            for m in pat.finditer(t or ""):
                w = m.group(0)
                n = memo.get(w)
                if n is None:
                    n = memo[w] = len(bpe_encode(w, ranks))
                total += n
            out.append(total)
        return pd.Series(out, dtype="int32")

    return documents.select("doc_id",
                            count_udf(F.col("text")).alias("n_bpe_tokens"))


def repetition_cols(max_dup_line_frac: float = 0.3,
                    max_top_bigram_frac: float = 0.2) -> dict:
    """name → Column map of the repetition statistics/flags over a
    ``text`` column. Exposed so callers can compose these flags with
    other per-doc flags inside ONE projection — joining two flag
    frames derived from the same scan and filtering across the join
    makes Catalyst's constraint propagation duplicate these (very
    large) expression trees combinatorially and hangs the driver for
    minutes even at 500 rows."""
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0,
        F.round((n_lines - n_distinct_lines).cast("double") / n_lines, 6)
    ).otherwise(F.lit(0.0))

    words = F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit(_WORD_RE), F.lit(0))
    n_words = F.size(words)
    # bigrams WITHOUT indexing `words` inside a sequence() lambda: a
    # higher-order lambda re-evaluates every OUTER expression it
    # references once per element, so `words[i]` re-runs the full
    # regexp scan n times — O(n²) per document (observed: 500 docs =
    # 180+ s). zip_with the array against its own tail instead, so the
    # lambda only touches element VALUES; `words` is evaluated a
    # constant number of times per row.
    bigrams = F.when(
        n_words >= 2,
        F.zip_with(F.slice(words, 1, n_words - 1),
                   F.slice(words, 2, n_words - 1),
                   lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))
    # most-frequent-bigram count WITHOUT a quadratic distinct×filter
    # scan: sort the doc's bigrams and take the longest run of equal
    # adjacent elements — O(n log n) per document. The fold carries
    # (prev, cur, best) so it never indexes back into the sorted array
    # (same per-element re-evaluation trap as above: `sorted_bg[i]`
    # would re-sort per element).
    sorted_bg = F.array_sort(bigrams)
    top_bigram_count = F.aggregate(
        sorted_bg,
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).alias("cur"), F.lit(0).alias("best")),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["cur"] + 1)
            .otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["cur"] + 1)
                .otherwise(F.lit(1))).alias("best")),
        lambda a: a["best"])
    # a bigram covers 2 words; cap at 1.0 for degenerate repeats
    top_bigram_frac = F.when(
        n_words > 0,
        F.round(F.least(F.lit(1.0),
                        (top_bigram_count * 2).cast("double") / n_words),
                6)
    ).otherwise(F.lit(0.0))

    return {
        "dup_line_frac": dup_line_frac,
        "top_bigram_frac": top_bigram_frac,
        "ok_dup_lines": dup_line_frac <= max_dup_line_frac,
        "ok_top_bigram": top_bigram_frac <= max_top_bigram_frac,
    }


def repetition_flags(documents: DataFrame,
                     max_dup_line_frac: float = 0.3,
                     max_top_bigram_frac: float = 0.2) -> DataFrame:
    """Gopher/MassiveText within-document repetition filters:
    - dup_line_frac: fraction of lines that are duplicates of an
      earlier line in the SAME document;
    - top_bigram_frac: fraction of words covered by the single most
      frequent word bigram.
    Pure JVM expressions via higher-order array functions (aggregate /
    transform / filter) — no explode, no shuffle: each document's
    statistics are computed inside one projection."""
    cols = repetition_cols(max_dup_line_frac, max_top_bigram_frac)
    return documents.select(
        "doc_id", *(c.alias(name) for name, c in cols.items()))


def bigram_lm_scores(documents: DataFrame, k: float = 0.5) -> DataFrame:
    """CCNet-style LM quality scoring: train an add-k-smoothed bigram
    language model on the corpus itself, then score every document by
    the average negative log-probability of its word bigrams (low =
    typical of the corpus, high = outlier — the perplexity-filtering
    step of CCNet/RefinedWeb pipelines, with the corpus standing in for
    the external reference LM).

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V), where c(w1 ·) is the
    bigram-prefix count and V the corpus vocabulary size.

    Output: (doc_id, n_bigrams, avg_nll) with avg_nll rounded to 6 dp;
    docs with < 2 words get n_bigrams = 0 and NULL avg_nll.

    Scale shape: everything is JVM-side (explode + two count aggs + two
    equi-joins, all map-side combinable). The count tables are corpus
    aggregates an order smaller than the corpus; the w1-keyed joins are
    the one skew risk (stop words) — AQE skew-join splitting handles
    it, and at 100 TB the count tables are computed once and reused
    across scoring runs.
    """
    from ._util import rebalance_input
    w = F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"),
                             F.lit(0))
    # rebalance only (guide §2.5 unsplittable input); the tokenize
    # projection stays lazy — materializing a corpus-sized intermediate
    # would not scale, and the four consumers' re-tokenize passes are
    # map-side
    toks = rebalance_input(documents).select("doc_id", w.alias("w"))
    bigrams = toks.select(
        "doc_id",
        F.explode(F.when(
            F.size("w") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.struct(F.col("w")[i].alias("w1"),
                                   F.col("w")[i + 1].alias("w2")))
        ).otherwise(F.array())).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"),
             F.col("bg.w2").alias("w2"))

    bigram_counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("cb"))
    prefix_counts = bigrams.groupBy("w1").agg(
        F.count(F.lit(1)).alias("cp"))
    vocab_size = (toks.select(F.explode("w").alias("word"))
                  .agg(F.countDistinct("word")).collect()[0][0])

    logp = F.log((F.col("cb") + F.lit(float(k)))
                 / (F.col("cp") + F.lit(float(k) * float(vocab_size))))
    scored = (bigrams
              .join(bigram_counts, ["w1", "w2"])
              .join(prefix_counts, ["w1"])
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   F.round(-F.avg(logp), 6).alias("avg_nll")))
    return (documents.select("doc_id")
            .join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    "avg_nll"))


# Gopher/MassiveText canonical repetition thresholds (Rae et al. 2021,
# table A1): fraction of characters in the most-repeated n-gram for
# small n, fraction of characters covered by any duplicated n-gram for
# large n.
TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12,
                        9: 0.11, 10: 0.10}


def gopher_ngram_repetition(documents: DataFrame,
                            top_ns: tuple = (2, 3, 4),
                            dup_ns: tuple = (5, 6, 7, 8, 9, 10)
                            ) -> DataFrame:
    """The full Gopher n-gram repetition table: per document,

    - ``top_{n}_char_frac`` (n in ``top_ns``): the largest character
      mass any single word n-gram accounts for — occurrences × the
      gram's word characters, over the document's total word
      characters. (Deviation from the paper, documented: Gopher picks
      "the most FREQUENT n-gram"; max over count×chars is tie-free and
      deterministic, and equals it whenever the most frequent gram is
      also the heaviest.)
    - ``dup_{n}_char_frac`` (n in ``dup_ns``): the fraction of word
      characters covered by at least one occurrence of an n-gram that
      appears 2+ times in the document (character-coverage union, each
      character counted once).

    plus ``ok_top_{n}`` / ``ok_dup_{n}`` flags at the paper's
    thresholds. Characters = word characters (separators excluded) in
    both numerators and the shared denominator.

    Execution shape: one words projection, then per n one
    explode → per-(doc, gram) count → per-doc agg (top) or
    covered-position distinct + join to word lengths (dup). Every
    stage is keyed on doc_id (or doc_id+gram) — map-side combinable
    aggs, no cross-doc state, linear at any corpus size. The per-n
    frames are narrow per-doc aggregates, so the final doc_id joins
    are cheap (and broadcast-eligible when the doc count is small).
    """
    words = F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit(_WORD_RE), F.lit(0))
    # deliberately NOT persisted: each per-n branch re-runs the pruned
    # (doc_id, text) scan + tokenize — 9 linear scans beat pinning the
    # corpus's words column in executor memory at real scale (callers
    # with small inputs can .persist() the documents frame themselves)
    toks = documents.select(
        "doc_id", words.alias("w"),
        F.aggregate(F.transform(words, lambda x: F.length(x)),
                    F.lit(0), lambda a, x: a + x).alias("total_chars"))

    def grams_of(n: int) -> DataFrame:
        gram = F.concat_ws(
            " ", *[F.col("w")[F.col("i") + j] for j in range(n)])
        return (toks
                .filter(F.size("w") >= n)
                .select("doc_id", "total_chars",
                        F.explode(F.sequence(
                            F.lit(0), F.size("w") - n)).alias("i"),
                        "w")
                .select("doc_id", "total_chars", "i",
                        gram.alias("gram")))

    out = documents.select("doc_id")
    for n in top_ns:
        counts = (grams_of(n)
                  .groupBy("doc_id", "total_chars", "gram")
                  .agg(F.count(F.lit(1)).alias("cnt")))
        # word chars of the gram = len(gram) - (n-1) single-space joins
        mass = F.col("cnt") * (F.length("gram") - (n - 1))
        col = f"top_{n}_char_frac"
        top = (counts.groupBy("doc_id")
               .agg(F.max(mass).alias("m"),
                    F.first("total_chars").alias("tc"))
               .select("doc_id",
                       F.when(F.col("tc") > 0,
                              F.round(F.col("m").cast("double")
                                      / F.col("tc"), 6))
                       .otherwise(F.lit(0.0)).alias(col)))
        out = out.join(top, "doc_id", "left")
        out = out.na.fill({col: 0.0})
    for n in dup_ns:
        g = grams_of(n)
        dup_pos = (g.groupBy("doc_id", "total_chars", "gram")
                   .agg(F.collect_list("i").alias("pos"))
                   .filter(F.size("pos") >= 2)
                   .select("doc_id", "total_chars",
                           F.explode("pos").alias("i")))
        covered = (dup_pos
                   .select("doc_id", "total_chars",
                           F.explode(F.sequence(
                               F.col("i"),
                               F.col("i") + (n - 1))).alias("j"))
                   .distinct())
        wl = toks.select(
            "doc_id",
            F.posexplode(F.transform("w", lambda x: F.length(x)))
            .alias("j", "wlen"))
        col = f"dup_{n}_char_frac"
        dup = (covered.join(wl, ["doc_id", "j"])
               .groupBy("doc_id")
               .agg(F.sum("wlen").alias("cov"),
                    F.first("total_chars").alias("tc"))
               .select("doc_id",
                       F.when(F.col("tc") > 0,
                              F.round(F.col("cov").cast("double")
                                      / F.col("tc"), 6))
                       .otherwise(F.lit(0.0)).alias(col)))
        out = out.join(dup, "doc_id", "left")
        out = out.na.fill({col: 0.0})
    flags = [
        (F.col(f"top_{n}_char_frac") <= TOP_NGRAM_THRESHOLDS[n])
        .alias(f"ok_top_{n}") for n in top_ns
    ] + [
        (F.col(f"dup_{n}_char_frac") <= DUP_NGRAM_THRESHOLDS[n])
        .alias(f"ok_dup_{n}") for n in dup_ns
    ]
    return out.select("doc_id",
                      *[f"top_{n}_char_frac" for n in top_ns],
                      *[f"dup_{n}_char_frac" for n in dup_ns],
                      *flags)


def tfidf_keywords(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the tagging/topic
    primitive of a curation pipeline (and the same weighting the
    intent-classifier featurizer uses, re-expressed as a corpus-level
    DataFrame op). tf = in-doc term count; idf = ln((N+1)/(df+1)) + 1
    (smoothed, never zero); score = tf·idf rounded to 6 dp BEFORE
    ranking so the rank order is reproducible across engines; ties
    break lexicographically.

    Output: (doc_id, rank, word, tf, score), rank 1..k.

    Scale shape: one explode → (doc, word) count (map-side
    combinable) → word-keyed df agg joined back (the df side is
    vocabulary-sized, broadcast-eligible) → per-doc top-k window
    (partitioned by doc_id — no global ordering). The corpus-size
    scalar joins in as a broadcast 1-row frame, not a collect.
    """
    from pyspark.sql import Window

    words = F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit(_WORD_RE), F.lit(0))
    occ = (documents.select("doc_id", F.explode(words).alias("word")))
    tf = (occ.groupBy("doc_id", "word")
          .agg(F.count(F.lit(1)).alias("tf")))
    df = (occ.select("doc_id", "word").distinct()
          .groupBy("word").agg(F.count(F.lit(1)).alias("df")))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (tf.join(F.broadcast(df), "word")
              .crossJoin(F.broadcast(n_docs))
              .select("doc_id", "word", "tf",
                      F.round(F.col("tf")
                              * (F.log((F.col("n_docs") + 1.0)
                                       / (F.col("df") + 1.0)) + 1.0),
                              6).alias("score")))
    w = (Window.partitionBy("doc_id")
         .orderBy(F.desc("score"), F.asc("word")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "word", "tf", "score"))

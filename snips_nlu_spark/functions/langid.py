"""Trained language identification: char-bigram Naive Bayes.

The fastText-style upgrade over the marker-word heuristic in
``functions/text.py::language_id``: a supervised character-n-gram
classifier trained on the engine's own 8 language packs (stop words +
noise vocabularies — deterministic package resources, no external
data), scored corpus-wide in pure JVM.

Layout is the repo's driver-trained / broadcast-scored convention: the
model is a (ngram, lang, logp) table a few thousand rows long
(broadcast), scoring is one explode of the document's char bigrams +
one broadcast join + one per-(doc, lang) sum with an out-of-vocabulary
penalty, then an argmax over the 8 languages. Nothing scales with
corpus size except the one scoring pass.

The prediction is integer/string-valued (doc_id, lang_pred), so the
correctness gate is float-robust: Spark's parallel log-prob summation
and the oracle's sequential one differ at ~1e-13, far below any real
score gap, and exact ties break on the language code in both paths.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

LANGID_LANGS = ("de", "en", "es", "fr", "it", "ja", "ko", "pt")


def _training_text(lang: str) -> str:
    from ..resources import get_resources

    r = get_resources(lang)
    words = sorted(set(r.get("stop_words", ()))
                   | set(r.get("noise", ())))
    return " " + " ".join(words) + " "


def _bigrams(text: str) -> list[str]:
    return [text[i:i + 2] for i in range(len(text) - 1)]


def train_langid(langs: tuple = LANGID_LANGS
                 ) -> tuple[list[tuple[str, str, float]],
                            dict[str, float]]:
    """Add-1-smoothed char-bigram log-probabilities per language over
    the packs' stop-word + noise vocabularies. Returns (the dense
    (ngram, lang, logp) table over the JOINT vocabulary, the per-lang
    OOV log-prob). Deterministic: resources are sorted, smoothing is
    closed-form, no RNG."""
    counts = {lang: Counter(_bigrams(_training_text(lang).lower()))
              for lang in langs}
    vocab = sorted(set().union(*counts.values()))
    v = len(vocab)
    rows: list[tuple[str, str, float]] = []
    oov: dict[str, float] = {}
    for lang in langs:
        total = sum(counts[lang].values())
        denom = float(total + v)
        oov[lang] = math.log(1.0 / denom)
        for ng in vocab:
            rows.append((ng, lang,
                         math.log((counts[lang][ng] + 1) / denom)))
    return rows, oov


def trained_language_scores(documents: DataFrame,
                            langs: tuple = LANGID_LANGS) -> DataFrame:
    """(doc_id, n_grams, lang_pred, lang_logp): the argmax language
    under the char-bigram NB model (uniform priors), with the total
    log-probability for audit. Docs with no bigrams (len < 2) predict
    "und".

    Scale shape: one explode over the document's bigrams → broadcast
    join against the model table → per-(doc, lang) sum; unmatched
    bigrams pay the per-language OOV penalty via (n_grams − matched)
    arithmetic; the 8-way argmax is a min over a (−score, lang)
    struct. All JVM."""
    spark = documents.sparkSession
    rows, oov = train_langid(langs)
    model = F.broadcast(spark.createDataFrame(
        rows, "ngram string, lang string, logp double"))
    lang_df = F.broadcast(spark.createDataFrame(
        [(lang, oov[lang]) for lang in langs],
        "lang string, oov double"))

    # bigrams via split + zip_with-against-own-tail: indexing a
    # computed string inside a higher-order lambda would re-lowercase
    # the text PER ELEMENT (the O(n²) HOF trap documented in
    # functions/text.py::repetition_cols)
    chars = F.split(F.lower(F.col("text")), "")
    n_c = F.size("_c")
    grams = F.when(
        n_c >= 2,
        F.zip_with(F.slice("_c", 1, n_c - 1), F.slice("_c", 2, n_c - 1),
                   lambda a, b: F.concat(a, b))
    ).otherwise(F.array().cast("array<string>"))
    base = (documents.select("doc_id", chars.alias("_c"))
            .select("doc_id", grams.alias("_grams")))
    totals = base.select("doc_id", F.size("_grams").alias("n_grams"))
    matched = (base
               .select("doc_id", F.explode("_grams").alias("ngram"))
               .join(model, "ngram")
               .groupBy("doc_id", "lang")
               .agg(F.sum("logp").alias("_msum"),
                    F.count(F.lit(1)).alias("_mn")))
    scored = (totals.join(lang_df)
              .join(matched, ["doc_id", "lang"], "left")
              .select(
                  "doc_id", "n_grams", "lang",
                  (F.coalesce("_msum", F.lit(0.0))
                   + (F.col("n_grams")
                      - F.coalesce("_mn", F.lit(0)))
                   * F.col("oov")).alias("score")))
    best = (scored
            .groupBy("doc_id")
            .agg(F.min(F.struct((-F.col("score")).alias("neg"),
                                F.col("lang").alias("lang"),
                                F.col("score").alias("score"),
                                F.col("n_grams").alias("n_grams")))
                 .alias("b")))
    return best.select(
        "doc_id",
        F.col("b.n_grams").alias("n_grams"),
        F.when(F.col("b.n_grams") > 0, F.col("b.lang"))
        .otherwise(F.lit("und")).alias("lang_pred"),
        F.when(F.col("b.n_grams") > 0, F.round(F.col("b.score"), 6))
        .otherwise(F.lit(0.0)).alias("lang_logp"))

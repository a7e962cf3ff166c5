"""GPT-3 / CCNet-style quality classifier for corpus curation.

The canon pipeline step: train a linear classifier to tell "curated"
text (Wikipedia/books — here: the ``positive_sources`` slice of the
corpus) from raw crawl, then score every document and keep the ones
that look curated. Features are hashed unigram buckets (md5-prefix —
byte-identical in Spark, Python and DuckDB), length-normalized;
training is deterministic full-batch gradient descent on a BOUNDED
driver-side sample (the same driver-trained / broadcast-scored layout
as the IVF quantizers in ``functions/similarity.py`` — at 100 TB the
sample is capped, the scoring pass is the only corpus-wide stage).

Scoring is pure JVM: explode → (doc, bucket) count → broadcast join
against the weight table → one per-doc sum. No Python touches the
corpus-wide path.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

QUALITY_BUCKETS = 4096
QUALITY_SAMPLE_CAP = 2000


def hash_bucket(word: str, n_buckets: int = QUALITY_BUCKETS) -> int:
    """md5-prefix bucket — the driver-side twin of the Spark/DuckDB
    expression ``conv(substr(md5(w), 1, 8), 16, 10) % n``."""
    return int(hashlib.md5(word.encode("utf8")).hexdigest()[:8],
               16) % n_buckets


def featurize_rows(texts, n_buckets: int = QUALITY_BUCKETS) -> np.ndarray:
    """Length-normalized hashed bag-of-words matrix (float64)."""
    import re

    word_re = re.compile("[a-z0-9]+")
    x = np.zeros((len(texts), n_buckets), dtype=np.float64)
    for i, text in enumerate(texts):
        words = word_re.findall((text or "").lower())
        for w in words:
            x[i, hash_bucket(w, n_buckets)] += 1.0
        if words:
            x[i] /= float(len(words))
    return x


def train_logreg(x: np.ndarray, y: np.ndarray, n_iter: int = 200,
                 lr: float = 1.0, l2: float = 1e-4
                 ) -> tuple[np.ndarray, float]:
    """Deterministic full-batch GD logistic regression (no RNG, no
    early stopping — reproducibility beats convergence adaptivity for
    a gated operator)."""
    n, d = x.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        g = p - y
        w -= lr * ((x.T @ g) / n + l2 * w)
        b -= lr * float(g.mean())
    return w, b


def quality_classifier_scores(documents: DataFrame,
                              positive_sources: list[str],
                              n_buckets: int = QUALITY_BUCKETS,
                              sample_n: int = QUALITY_SAMPLE_CAP,
                              n_iter: int = 200) -> DataFrame:
    """(doc_id, quality_logit, quality_prob, keep) for every document.

    Train on the first ``sample_n`` documents by doc_id (deterministic,
    bounded — the ONLY driver-side data movement), label = source in
    ``positive_sources``; score the whole corpus JVM-side with the
    broadcast weight table. ``keep`` = prob > 0.5. Both score columns
    rounded to 6 dp.
    """
    spark = documents.sparkSession
    sample = (documents.select("doc_id", "text", "source")
              .orderBy("doc_id").limit(sample_n).collect())
    x = featurize_rows([r["text"] for r in sample], n_buckets)
    y = np.array([1.0 if r["source"] in positive_sources else 0.0
                  for r in sample])
    w, b = train_logreg(x, y, n_iter=n_iter)
    weights = spark.createDataFrame(
        [(int(i), float(w[i])) for i in np.nonzero(w)[0]],
        "bucket long, weight double")

    words = F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit("[a-z0-9]+"), F.lit(0))
    occ = (documents.select("doc_id", F.explode(words).alias("word"))
           .select("doc_id",
                   F.pmod(F.conv(F.substring(F.md5("word"), 1, 8),
                                 16, 10).cast("bigint"),
                          F.lit(n_buckets)).alias("bucket")))
    counts = (occ.groupBy("doc_id", "bucket")
              .agg(F.count(F.lit(1)).alias("cnt")))
    dots = (counts
            .join(F.broadcast(weights), "bucket", "left")
            .groupBy("doc_id")
            .agg(F.sum("cnt").alias("n_words"),
                 F.sum(F.col("cnt")
                       * F.coalesce("weight", F.lit(0.0))).alias("dot")))
    logit = F.col("dot") / F.col("n_words") + F.lit(float(b))
    prob = 1.0 / (1.0 + F.exp(-logit))
    return (documents.select("doc_id")
            .join(dots, "doc_id", "left")
            .select("doc_id",
                    F.round(F.coalesce(logit, F.lit(float(b))), 6)
                    .alias("quality_logit"),
                    F.round(F.coalesce(
                        prob,
                        F.lit(float(1.0 / (1.0 + np.exp(-b))))), 6)
                    .alias("quality_prob"))
            .withColumn("keep", F.col("quality_prob") > 0.5))


# deterministic labeled corpus for the classifier gate: the parquet
# documents table draws every source/lang from ONE shared vocabulary
# (verified: converged LR plateaus at 0.62-0.74 train accuracy on its
# source and lang labels — there is nothing linear to learn), so the
# gate synthesizes the labeled shape the operator exists for, exactly
# like the semantic-dedup gates synthesize near-duplicate embeddings.
_CURATED_VOCAB = [f"word{i:02d}" for i in range(50)] + [
    "analysis", "report", "system", "method", "result", "design",
    "model", "study", "process", "review", "theory", "practice",
    "section", "chapter", "figure", "table", "data", "value",
    "measure", "sample", "detail", "context", "summary", "outline",
    "factor", "aspect", "element", "feature", "pattern", "structure"]
_CRAWL_VOCAB = [f"word{i:02d}" for i in range(30, 80)] + [
    "click", "subscribe", "cookie", "login", "menu", "footer",
    "advert", "banner", "popup", "redirect", "tracker", "widget",
    "sidebar", "navbar", "signup", "offer", "deal", "discount",
    "promo", "buy", "cart", "checkout", "shipping", "newsletter",
    "spam", "casino", "jackpot", "winner", "prize", "free"]


def _qhash(doc_id: int, i: int) -> int:
    return int(hashlib.md5(f"q:{doc_id}:{i}".encode("utf8"))
               .hexdigest()[:8], 16)


def synth_quality_text(doc_id: int) -> tuple[str, str]:
    """(text, source) — pure function of doc_id; even ids are curated
    prose-like draws, odd ids are crawl-like with a repeated loop (the
    vocabularies overlap on 20 shared words so separation is learned,
    not given)."""
    n_words = 20 + _qhash(doc_id, 0) % 21
    if doc_id % 2 == 0:
        words = [_CURATED_VOCAB[_qhash(doc_id, i + 1)
                                % len(_CURATED_VOCAB)]
                 for i in range(n_words)]
        return " ".join(words), "curated"
    loop = [_CRAWL_VOCAB[_qhash(doc_id, j + 1) % len(_CRAWL_VOCAB)]
            for j in range(3)]
    words = []
    for i in range(n_words):
        if _qhash(doc_id, 100 + i) % 3 == 0:
            words.append(_CRAWL_VOCAB[_qhash(doc_id, 200 + i)
                                      % len(_CRAWL_VOCAB)])
        else:
            words.append(loop[i % 3])
    return " ".join(words), "crawl"


def synthesize_quality_corpus(spark: SparkSession,
                              n: int = 1000) -> DataFrame:
    rows = []
    for doc_id in range(n):
        text, source = synth_quality_text(doc_id)
        rows.append((doc_id, text, source))
    return spark.createDataFrame(rows,
                                 "doc_id long, text string, "
                                 "source string")

"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. The
  query side is broadcast (queries ≪ corpus); the corpus scan stays
  partition-parallel with no shuffle until the per-query top-k.
- lsh_bucketed_topk: random-hyperplane LSH — each corpus vector lands in
  one (table, bucket); queries probe their buckets only. The scale path:
  at 10^9+ vectors the cross product is infeasible, bucket probing reads
  a tiny fraction. Candidates are scored exactly, so results match
  brute force whenever the true top-k collide in ≥1 table (recall knob =
  n_tables × n_bits).

Determinism: similarities are rounded to 6 dp and ranked by
(rounded_sim DESC, vec_id ASC), so ordering is stable across engines and
float summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y:
                                 x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(embeddings: DataFrame, k: int = 5,
                     n_queries: int = 20) -> DataFrame:
    """(query_id, neighbor_id, sim, rank): exact cosine top-k of each of
    the first ``n_queries`` vectors against the whole corpus (self
    excluded)."""
    queries = (embeddings.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q")))
    corpus = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                               F.col("embedding").alias("v"))
    scored = (corpus.join(F.broadcast(queries),
                          F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(_cosine(F.col("q"), F.col("v")), 6)
                      .alias("sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 42):
    """Deterministic random hyperplanes (driver-side numpy, broadcast as
    literal arrays — tables × bits × dim doubles, a few KB)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, n_bits, dim)


def lsh_bucketed_topk(embeddings: DataFrame, k: int = 5,
                      n_queries: int = 20, n_tables: int = 8,
                      n_bits: int = 8, dim: int = 64,
                      seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH ANN: per-table sign-bucket join, exact
    re-scoring of candidates, per-query top-k."""
    planes = _hyperplanes(dim, n_tables, n_bits, seed)

    def bucket_col(vec, table: int):
        bits = []
        for b in range(n_bits):
            plane = F.array(*[F.lit(float(x)) for x in planes[table, b]])
            proj = F.aggregate(
                F.zip_with(vec, plane,
                           lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, v: acc + v)
            bits.append(F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
        out = bits[0]
        for bit in bits[1:]:
            out = out + bit
        return out

    corpus = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                               F.col("embedding").alias("v"))
    queries = (embeddings.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q")))

    corpus_b = []
    query_b = []
    for t in range(n_tables):
        corpus_b.append(corpus.select(
            "neighbor_id", "v", F.lit(t).alias("table"),
            bucket_col(F.col("v"), t).alias("bucket")))
        query_b.append(queries.select(
            "query_id", "q", F.lit(t).alias("table"),
            bucket_col(F.col("q"), t).alias("bucket")))
    corpus_all = corpus_b[0]
    for extra in corpus_b[1:]:
        corpus_all = corpus_all.unionByName(extra)
    query_all = query_b[0]
    for extra in query_b[1:]:
        query_all = query_all.unionByName(extra)

    candidates = (corpus_all.join(
        F.broadcast(query_all), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q", "v")
        .dropDuplicates(["query_id", "neighbor_id"]))

    scored = candidates.select(
        "query_id", "neighbor_id",
        F.round(_cosine(F.col("q"), F.col("v")), 6).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))

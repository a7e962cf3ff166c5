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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from ._util import rebalance_input


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
    embeddings = rebalance_input(embeddings)
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


def cosine_duplicate_pairs(embeddings: DataFrame,
                           threshold: float = 0.5) -> DataFrame:
    """(vec_a, vec_b, sim): all pairs with cosine ≥ threshold — the
    embedding-near-duplicate analogue of ``jaccard_duplicate_pairs``.
    Quadratic BY DESIGN (the exact correctness baseline, like the brute
    Jaccard pairs); the scale path is ``cosine_duplicate_pairs_lsh``."""
    embeddings = rebalance_input(embeddings)
    a = embeddings.select(F.col("vec_id").alias("vec_a"),
                          F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"),
                          F.col("embedding").alias("eb"))
    return (a.join(b, F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b",
                    F.round(_cosine(F.col("ea"), F.col("eb")), 6)
                    .alias("sim"))
            .filter(F.col("sim") >= threshold))


def cosine_duplicate_pairs_lsh(embeddings: DataFrame,
                               threshold: float = 0.5,
                               n_tables: int = 16, n_bits: int = 6,
                               dim: int = 64, seed: int = 42) -> DataFrame:
    """Scale path for embedding near-dup pairs: random-hyperplane LSH
    buckets generate candidate pairs (same (table, bucket) collision),
    candidates are scored exactly and filtered by threshold. Recall is
    the LSH knob: a pair at cosine s collides in one table w.p.
    (1 - arccos(s)/π)^n_bits; misses over n_tables independent tables
    decay geometrically. Replaces the all-pairs cross join with bucket
    joins — the 10^9-vector shape."""
    planes = _hyperplanes(dim, n_tables, n_bits, seed)
    buckets = _bucket_udf(planes)
    signed = embeddings.withColumn("buckets",
                                   buckets(F.col("embedding")))
    banded = signed.select(
        "vec_id", "embedding",
        F.posexplode("buckets").alias("table", "bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (a.join(b, (F.col("a.table") == F.col("b.table"))
                         & (F.col("a.bucket") == F.col("b.bucket"))
                         & (F.col("a.vec_id") < F.col("b.vec_id")))
                  .select(F.col("a.vec_id").alias("vec_a"),
                          F.col("b.vec_id").alias("vec_b"),
                          F.col("a.embedding").alias("ea"),
                          F.col("b.embedding").alias("eb"))
                  .dropDuplicates(["vec_a", "vec_b"]))
    return (candidates
            .select("vec_a", "vec_b",
                    F.round(_cosine(F.col("ea"), F.col("eb")), 6)
                    .alias("sim"))
            .filter(F.col("sim") >= threshold))


def semantic_dedup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                         n_clusters: int = 32, seed: int = 42,
                         sample_cap: int = 20000,
                         n_iter: int = 10) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means the corpus
    into cells, then emit all within-cell pairs with cosine ≥
    ``threshold`` (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023).

    Output: (vec_a, vec_b, cell, sim) with vec_a < vec_b, sim rounded
    to 6 dp (HALF_UP, matching F.round / the numpy oracle).

    Scale shape — the canonical web-scale semantic dedup layout:
    the quantizer is trained driver-side on a bounded deterministic
    sample and broadcast (the corpus never moves for training); cell
    assignment is one Arrow matmul per batch; the only shuffle is the
    groupBy(cell), after which each cell's pairwise scores are ONE
    numpy gram matrix. Cost is Σ_cells m_c² instead of N² — with
    k ∝ N (SemDeDup runs ~100k clusters at 10⁹ docs) expected cell
    size is constant, so total work is linear in N. A pathologically
    hot cell is the skew caveat: cap it upstream by raising
    ``n_clusters`` (the knob the paper itself uses).

    Feed the output to ``duplicate_clusters`` (hash-min or star) for
    the keep-one-per-cluster step.
    """
    cent = _ivf_centroids(embeddings, n_clusters, seed, sample_cap,
                          n_iter)
    cell = _cell_udf(cent)
    with_cell = embeddings.select(
        "vec_id", "embedding", cell(F.col("embedding")).alias("cell"))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cell": [], "sim": []})
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in pdf["embedding"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ (mat / norms).T
        ia, ib = np.triu_indices(len(ids), k=1)
        s = sims[ia, ib]
        # HALF_UP to 6 dp — same convention as F.round and the
        # committed numpy oracle
        s = np.copysign(np.floor(np.abs(s) * 1e6 + 0.5) / 1e6, s)
        keep = s >= threshold
        return pd.DataFrame({
            "vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]],
            "cell": np.full(int(keep.sum()),
                            int(pdf["cell"].iloc[0]), dtype="int32"),
            "sim": s[keep]})

    return with_cell.groupBy("cell").applyInPandas(
        kernel, "vec_a long, vec_b long, cell int, sim double")


def _hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 42):
    """Deterministic random hyperplanes (driver-side numpy, captured by
    the Arrow signature kernel — tables × bits × dim doubles, a few KB)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_tables, n_bits, dim)


def _bucket_udf(planes):
    """Arrow-batched signature kernel: ONE numpy matmul computes every
    table's sign-bucket for the whole batch (replaces the round-1 plan
    that inlined tables×bits×dim literal columns — thousands of literals
    bloating the expression tree)."""
    from pyspark.sql.functions import pandas_udf

    n_tables, n_bits, dim = planes.shape
    flat_t = planes.reshape(n_tables * n_bits, dim).T  # (dim, T*B)
    pows = 1 << np.arange(n_bits)

    @pandas_udf("array<int>")
    def buckets(col: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        proj = mat @ flat_t                       # (n, T*B)
        bits = (proj >= 0).reshape(len(mat), n_tables, n_bits)
        vals = (bits * pows).sum(axis=2).astype("int32")
        return pd.Series(list(vals))

    return buckets


def lsh_bucketed_topk(embeddings: DataFrame, k: int = 5,
                      n_queries: int = 20, n_tables: int = 8,
                      n_bits: int = 8, dim: int = 64,
                      seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH ANN: per-table sign-bucket join, exact
    re-scoring of candidates, per-query top-k."""
    embeddings = rebalance_input(embeddings)
    planes = _hyperplanes(dim, n_tables, n_bits, seed)
    buckets = _bucket_udf(planes)

    signed = embeddings.withColumn("buckets",
                                   buckets(F.col("embedding")))
    corpus_all = signed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("v"),
        F.posexplode("buckets").alias("table", "bucket"))
    query_all = (signed.filter(F.col("vec_id") < n_queries)
                 .select(F.col("vec_id").alias("query_id"),
                         F.col("embedding").alias("q"),
                         F.posexplode("buckets").alias("table", "bucket")))

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


# --- IVF (inverted-file) ANN ------------------------------------------------

def _normalized_sample(embeddings: DataFrame,
                       sample_cap: int = 20000) -> np.ndarray:
    """Deterministic driver-side training sample (vec_id order, capped,
    L2-normalized) shared by the coarse and PQ quantizer trainers."""
    sample = (embeddings.orderBy("vec_id").limit(sample_cap)
              .select("embedding").toPandas())
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in sample["embedding"]])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _ivf_centroids(embeddings: DataFrame, n_centroids: int,
                   seed: int = 42, sample_cap: int = 20000,
                   n_iter: int = 10,
                   sample: np.ndarray | None = None) -> np.ndarray:
    """Deterministic driver-side Lloyd's k-means over a deterministic
    sample (vec_id order, capped) — the coarse quantizer. Standard IVF
    practice at scale: the quantizer is trained on a sample (the 100 TB
    corpus never moves), then broadcast; only assignment is distributed.
    Rows and centroids are L2-normalized so argmax-dot = cosine cell.
    Returns (n_centroids, dim) float64."""
    mat = _normalized_sample(embeddings, sample_cap) \
        if sample is None else sample
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)),
                          replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(mat @ cent.T, axis=1)
        # group rows by centroid via ONE stable argsort instead of a
        # boolean mask scan per centroid (bit-identical: a stable sort
        # keeps each group's rows in original order, and np.mean over
        # the contiguous slice reduces in the same order as over the
        # mask-gathered copy)
        order = np.argsort(assign, kind="stable")
        s_mat, s_assign = mat[order], assign[order]
        bounds = np.searchsorted(s_assign, np.arange(len(cent) + 1))
        for c in range(len(cent)):
            lo, hi = bounds[c], bounds[c + 1]
            if hi > lo:
                m = s_mat[lo:hi].mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def _cell_udf(centroids: np.ndarray):
    """Arrow-batched cell assignment: one matmul per batch against the
    broadcast-captured centroid matrix."""
    from pyspark.sql.functions import pandas_udf

    cent_t = centroids.T  # (dim, C)

    @pandas_udf("int")
    def cell(col: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cent_t
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return cell


def _probe_udf(centroids: np.ndarray, n_probe: int):
    from pyspark.sql.functions import pandas_udf

    cent_t = centroids.T

    @pandas_udf("array<int>")
    def probe(col: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cent_t
        # n_probe nearest cells, best first; stable ties by cell id via
        # lexsort on (-sim, id)
        order = np.lexsort((np.arange(sims.shape[1])[None, :]
                            .repeat(len(mat), 0), -sims), axis=1)
        return pd.Series(list(order[:, :n_probe].astype("int32")))

    return probe


def ivf_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 20,
             n_centroids: int = 32, n_probe: int = 8,
             seed: int = 42) -> DataFrame:
    """IVF ANN: corpus vectors are partitioned into k-means cells (the
    inverted file); each query probes only its ``n_probe`` nearest
    cells, candidates are re-scored exactly, per-query top-k. The
    alternative scale path to ``lsh_bucketed_topk``: one int cell key
    per corpus vector (vs n_tables bucket rows), so the corpus-side
    index is O(N) rows, and a real deployment writes the corpus
    partitioned/bucketed BY cell so a probe is a partition-pruned scan —
    the 10^9-vector layout. Recall knob = n_probe/n_centroids.
    Deterministic: quantizer trained on a vec_id-ordered sample,
    similarities rounded to 6 dp, ties broken by neighbor_id."""
    embeddings = rebalance_input(embeddings)
    cents = _ivf_centroids(embeddings, n_centroids, seed=seed)
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("v"),
        _cell_udf(cents)(F.col("embedding")).alias("cell"))
    queries = (embeddings.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q"),
                       F.explode(_probe_udf(cents, n_probe)(
                           F.col("embedding"))).alias("cell")))
    candidates = (corpus.join(F.broadcast(queries), "cell")
                  .filter(F.col("neighbor_id") != F.col("query_id"))
                  .select("query_id", "neighbor_id", "q", "v"))
    scored = candidates.select(
        "query_id", "neighbor_id",
        F.round(_cosine(F.col("q"), F.col("v")), 6).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _pq_codebooks(embeddings: DataFrame, m: int = 8, ksub: int = 16,
                  seed: int = 43, sample_cap: int = 20000,
                  n_iter: int = 10,
                  sample: np.ndarray | None = None) -> np.ndarray:
    """Product-quantization codebooks trained driver-side on the same
    deterministic sample policy as the coarse quantizer: the dim axis is
    split into ``m`` contiguous subspaces and each gets a seeded
    Lloyd's k-means with ``ksub`` centroids (euclidean, on L2-normalized
    vectors). Returns (m, ksub, dim//m) float64."""
    mat = _normalized_sample(embeddings, sample_cap) \
        if sample is None else sample
    dim = mat.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        sub = mat[:, s * dsub:(s + 1) * dsub]
        cent = sub[rng.choice(len(sub), size=min(ksub, len(sub)),
                              replace=False)].copy()
        for _ in range(n_iter):
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; the ||x||^2 term is
            # constant per row so argmin over c ignores it — one matmul
            # instead of an (n, ksub, dsub) broadcast diff (6x faster at
            # ksub=256, the scale-gate knob)
            # in-place add: one (n, ksub) temporary instead of two —
            # the broadcasted `A + B` form allocated an extra 41 MB
            # temporary per iteration (~13 GB across the m×n_iter loop
            # at ksub=256). NOTE `-2.0 * sub` scales BEFORE the matmul
            # exactly as the original `-2.0 * sub @ cent.T` parses
            # (`*` and `@` are left-associative), so d2 is
            # bit-identical.
            d2 = (-2.0 * sub) @ cent.T
            d2 += (cent ** 2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            # one stable argsort + contiguous slices instead of a
            # boolean mask per centroid — ksub×n_iter×m mask scans were
            # ~9 s of the 100k-vector gate query; bit-identical means
            # (stable order preserved, same np.mean reduction)
            order = np.argsort(assign, kind="stable")
            s_sub, s_assign = sub[order], assign[order]
            bounds = np.searchsorted(s_assign,
                                     np.arange(len(cent) + 1))
            for c in range(len(cent)):
                lo, hi = bounds[c], bounds[c + 1]
                if hi > lo:
                    cent[c] = s_sub[lo:hi].mean(axis=0)
        books[s, :len(cent)] = cent
        if len(cent) < ksub:  # degenerate tiny samples
            books[s, len(cent):] = cent[-1]
    return books


def _pq_encode_udf(books: np.ndarray):
    """Arrow-batched PQ encoding of L2-normalized vectors: per subspace
    argmin euclidean distance to the codebook → one small int code."""
    from pyspark.sql.functions import pandas_udf

    m, ksub, dsub = books.shape

    @pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        codes = np.empty((len(mat), m), dtype=np.int32)
        for s in range(m):
            sub = mat[:, s * dsub:(s + 1) * dsub]
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 — argmin over c
            d2 = (-2.0 * sub @ books[s].T
                  + (books[s] ** 2).sum(axis=1)[None, :])
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return encode


def ivf_pq_topk(embeddings: DataFrame, k: int = 5, n_queries: int = 20,
                n_centroids: int = 32, n_probe: int = 12, m: int = 8,
                ksub: int = 16, rerank: int = 64,
                seed: int = 42) -> DataFrame:
    """IVF-PQ ANN with asymmetric-distance (ADC) scoring and exact
    refinement — the canonical 10^9-vector memory layout: the corpus
    index stores one int cell + ``m`` small-int codes per vector
    (m·log2(ksub) bits ≈ 4 bytes here vs 256 bytes of float32), probes
    scan codes with per-query lookup tables (one table per query per
    batch, numpy fancy-indexed over all its candidates), the ADC
    top-``rerank`` per query are re-scored EXACTLY against the raw
    vectors, and the final top-k is exact cosine over that refined set.
    Recall knobs: n_probe/n_centroids (coarse) and rerank (PQ error).
    Deterministic end-to-end (seeded quantizers, 6-dp rounding,
    neighbor_id tie-breaks)."""
    embeddings = rebalance_input(embeddings)
    train = _normalized_sample(embeddings)  # ONE sample collection
    cents = _ivf_centroids(embeddings, n_centroids, seed=seed,
                           sample=train)
    books = _pq_codebooks(embeddings, m=m, ksub=ksub, seed=seed + 1,
                          sample=train)
    dsub = books.shape[2]

    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        _cell_udf(cents)(F.col("embedding")).alias("cell"),
        _pq_encode_udf(books)(F.col("embedding")).alias("codes"))
    queries = (embeddings.filter(F.col("vec_id") < n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q"),
                       F.explode(_probe_udf(cents, n_probe)(
                           F.col("embedding"))).alias("cell")))
    candidates = (corpus.join(F.broadcast(queries), "cell")
                  .filter(F.col("neighbor_id") != F.col("query_id"))
                  .select("query_id", "neighbor_id", "q", "codes"))

    def adc_kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_scores = np.empty(len(pdf))
            for qid, grp in pdf.groupby("query_id", sort=False):
                qv = np.asarray(grp["q"].iloc[0], dtype=np.float64)
                n = np.linalg.norm(qv)
                if n > 0:
                    qv = qv / n
                # ADC table: table[s, j] = <q_sub_s, books[s, j]>
                table = np.stack([
                    books[s] @ qv[s * dsub:(s + 1) * dsub]
                    for s in range(books.shape[0])])
                codes = np.stack([np.asarray(c, dtype=np.int64)
                                  for c in grp["codes"]])
                scores = table[np.arange(books.shape[0])[None, :],
                               codes].sum(axis=1)
                out_scores[pdf.index.get_indexer(grp.index)] = scores
            yield pd.DataFrame({
                "query_id": pdf["query_id"],
                "neighbor_id": pdf["neighbor_id"],
                "adc": np.round(out_scores, 9)})

    adc = candidates.mapInPandas(
        adc_kernel, "query_id long, neighbor_id long, adc double")
    w_adc = Window.partitionBy("query_id").orderBy(
        F.desc("adc"), F.asc("neighbor_id"))
    shortlist = (adc.withColumn("r", F.row_number().over(w_adc))
                 .filter(F.col("r") <= rerank)
                 .select("query_id", "neighbor_id"))

    # exact refinement: join raw vectors back for the shortlist only
    qvec = (embeddings.filter(F.col("vec_id") < n_queries)
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q")))
    nvec = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                             F.col("embedding").alias("v"))
    refined = (F.broadcast(shortlist)
               .join(nvec, "neighbor_id")
               .join(F.broadcast(qvec), "query_id")
               .select("query_id", "neighbor_id",
                       F.round(_cosine(F.col("q"), F.col("v")), 6)
                       .alias("sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id"))
    return (refined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 keys → well-mixed uint64.
    Counter-based RNG: the value depends only on the key, so any id
    slice reproduces byte-identically regardless of batching — in Spark
    AND in the committed numpy oracle (both call this same function)."""
    z = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _hash_normal(keys: np.ndarray, dim: int) -> np.ndarray:
    """(n,) uint64 keys → (n, dim) standard normals via per-(key, col)
    hashing + Box-Muller. Deterministic, vectorized, batch-invariant."""
    cols = np.arange(dim, dtype=_U64)
    base = keys[:, None] * _U64(0x9E3779B97F4A7C15) + cols[None, :]
    half = 1.0 / (1 << 53)
    u1 = ((_splitmix64(base) >> _U64(11)).astype(np.float64) + 0.5) * half
    u2 = ((_splitmix64(base ^ _U64(0xDEADBEEFCAFEF00D)) >> _U64(11))
          .astype(np.float64) + 0.5) * half
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def synth_matrix(ids, dim: int = 64, n_clusters: int = 256,
                 spread: float = 0.35, seed: int = 7) -> np.ndarray:
    """The (ids → vectors) function behind synthesize_embeddings — pure
    and vectorized, so the numpy oracle replays it exactly. Vector i =
    unit center(i % n_clusters) + noise(i) scaled so E‖noise‖ ≈ spread
    (i.e. ``spread`` is the noise-to-center NORM ratio — within-cluster
    cosine ≈ 1/(1+spread²) ≈ 0.89 at the 0.35 default, like embeddings
    of near-duplicate text); float32."""
    ids = np.asarray(ids, dtype=np.int64).astype(_U64)
    centers = _hash_normal(
        np.arange(n_clusters, dtype=_U64) + _U64(seed * 1_000_003), dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    noise = _hash_normal(ids + _U64(seed * 77_000_001), dim)
    c = (ids % _U64(n_clusters)).astype(np.int64)
    return (centers[c]
            + (spread / np.sqrt(dim)) * noise).astype(np.float32)


def synthesize_embeddings(spark, n: int, dim: int = 64,
                          n_clusters: int = 256, spread: float = 0.35,
                          seed: int = 7) -> DataFrame:
    """Deterministic clustered Gaussian embeddings at arbitrary scale —
    the ≥100k-vector ANN-gate input (the driver's parquet fixtures top
    out at 2k vectors). Embedding-like structure (tight clusters like
    near-duplicate text embeddings) via ``synth_matrix``; counter-based
    hashing makes the table a pure function of the id range, so the
    generation itself is shuffle-free and scales to any n."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            vecs = synth_matrix(ids, dim, n_clusters, spread, seed)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(map(list, vecs))})
    return spark.range(n).mapInPandas(
        gen, "vec_id long, embedding array<float>")


def _cell_sim_udf(centroids: np.ndarray):
    """Arrow-batched (cell, centroid_sim) assignment: argmax cell plus
    the cosine to that centroid (HALF_UP 6 dp for determinism)."""
    from pyspark.sql.functions import pandas_udf

    cent_t = centroids.T

    @pandas_udf("struct<cell:int, centroid_sim:double>")
    def cell_sim(col: pd.Series) -> pd.DataFrame:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ cent_t
        cells = np.argmax(sims, axis=1)
        best = sims[np.arange(len(mat)), cells]
        best = np.copysign(np.floor(np.abs(best) * 1e6 + 0.5) / 1e6,
                           best)
        return pd.DataFrame({"cell": cells.astype("int32"),
                             "centroid_sim": best})

    return cell_sim


def semantic_dedup_keep(embeddings: DataFrame, threshold: float = 0.9,
                        n_clusters: int = 32, seed: int = 42,
                        sample_cap: int = 20000,
                        n_iter: int = 10) -> DataFrame:
    """The full SemDeDup keep policy: near-dup pairs from
    :func:`semantic_dedup_pairs`, transitive closure via
    :func:`duplicate_clusters` (star variant), then within each dup
    cluster KEEP the member with the LOWEST cosine to its k-means
    centroid (ties → min vec_id) — the paper's diversity-preserving
    choice (the most typical members are the most redundant with the
    rest of the cell; the outlier carries the information).

    Output: one audit row per input vector — (vec_id, cluster_id,
    centroid_sim, kept); singletons keep themselves.

    Scale: adds one Arrow matmul (cell+sim in one kernel) and one
    min-by agg per dup cluster on top of the pair/closure stages.
    """
    from .dedup import duplicate_clusters

    cent = _ivf_centroids(embeddings, n_clusters, seed, sample_cap,
                          n_iter)
    cs = _cell_sim_udf(cent)
    sims = embeddings.select(
        "vec_id", cs(F.col("embedding")).alias("s")
    ).select("vec_id", F.col("s.centroid_sim").alias("centroid_sim"))

    pairs = semantic_dedup_pairs(embeddings, threshold, n_clusters,
                                 seed, sample_cap, n_iter)
    labels = duplicate_clusters(
        pairs.select(F.col("vec_a").alias("doc_a"),
                     F.col("vec_b").alias("doc_b")),
        embeddings.select(F.col("vec_id").alias("doc_id")),
        strategy="star")
    labeled = (labels.select(F.col("doc_id").alias("vec_id"),
                             "cluster_id")
               .join(sims, "vec_id"))
    keeper = (labeled.groupBy("cluster_id")
              .agg(F.min(F.struct("centroid_sim", "vec_id"))
                   .alias("k"))
              .select("cluster_id", F.col("k.vec_id").alias("keep_id")))
    return (labeled.join(keeper, "cluster_id")
            .select("vec_id", "cluster_id", "centroid_sim",
                    (F.col("vec_id") == F.col("keep_id")).alias("kept")))

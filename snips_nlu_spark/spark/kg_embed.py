"""TransE knowledge-graph embeddings: driver-trained, broadcast-scored.

The link-prediction layer of a KG build (Bordes et al. 2013,
"Translating Embeddings for Modeling Multi-relational Data"): embed
entities and relations so that e_subj + r_pred ≈ e_obj for true facts,
then score every assertion by the translation residual and evaluate by
ranking the true object against corrupted candidates.

Layout follows the repo's driver-trained / broadcast-scored convention
(IVF quantizers in ``functions/similarity.py``, the quality classifier
in ``functions/quality.py``): training runs on a BOUNDED deterministic
sample of facts in numpy on the driver — full distributed embedding
training (parameter servers, async SGD) is out of scope by design —
and the corpus-wide stages Spark owns are the scoring pass (broadcast
embedding tables + pure-JVM ``zip_with``/``aggregate`` arithmetic, no
Python on the data path) and the ranking pass (one join against the
deterministic negative draw + one count aggregate).

Determinism: embedding init and the per-epoch corrupted objects derive
from a fixed seed / md5 hashes, entity rows are L2-normalized per epoch
(the paper's constraint), and updates are full-batch — the oracle
replays training bit-exactly and re-executes scoring/ranking in numpy
(the distance fold is written to match the JVM's sequential
left-to-right IEEE order exactly, so integer ranks hash-match).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

TRANSE_DIM = 16
TRANSE_EPOCHS = 200
TRANSE_LR = 0.05
TRANSE_MARGIN = 1.0
TRANSE_SAMPLE_CAP = 20000
TRANSE_SEED = 42


def _fact_hash(subj: str, pred: str, obj: str,
               seed: int = TRANSE_SEED) -> int:
    return int(hashlib.md5(f"{subj}|{pred}|{obj}:{seed}"
                           .encode("utf8")).hexdigest()[:8], 16)


def train_transe(facts: list[tuple[str, str, str]],
                 dim: int = TRANSE_DIM, epochs: int = TRANSE_EPOCHS,
                 lr: float = TRANSE_LR, margin: float = TRANSE_MARGIN,
                 seed: int = TRANSE_SEED
                 ) -> tuple[dict[str, np.ndarray], dict[str, np.ndarray]]:
    """Deterministic full-batch margin-ranking TransE on the driver.

    Negatives corrupt the object with another entity chosen by the
    fact's md5 slot shifted past the true index — (h + epoch) mod
    (n_ent − 1) — so each epoch sees a fresh but reproducible
    corruption (no RNG draw order to preserve). Returns (entity →
    vector, relation → vector) with the final epoch's entity
    normalization applied.
    """
    ents = sorted({s for s, _, _ in facts} | {o for _, _, o in facts})
    rels = sorted({p for _, p, _ in facts})
    e_idx = {e: i for i, e in enumerate(ents)}
    n_ent = len(ents)
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    ent_m = rng.uniform(-bound, bound, (n_ent, dim))
    rel_m = rng.uniform(-bound, bound, (len(rels), dim))
    rel_m /= np.maximum(np.linalg.norm(rel_m, axis=1, keepdims=True),
                        1e-12)
    if not facts or n_ent < 2:
        return ({e: ent_m[i] for e, i in e_idx.items()},
                {r: rel_m[i] for i, r in enumerate(rels)})
    r_idx = {r: i for i, r in enumerate(rels)}
    s_i = np.array([e_idx[s] for s, _, _ in facts])
    p_i = np.array([r_idx[p] for _, p, _ in facts])
    o_i = np.array([e_idx[o] for _, _, o in facts])
    h = np.array([_fact_hash(s, p, o, seed) for s, p, o in facts],
                 dtype=np.int64)
    for epoch in range(epochs):
        ent_m /= np.maximum(np.linalg.norm(ent_m, axis=1,
                                           keepdims=True), 1e-12)
        neg = (h + epoch) % (n_ent - 1)
        neg = neg + (neg >= o_i)
        v_pos = ent_m[s_i] + rel_m[p_i] - ent_m[o_i]
        v_neg = ent_m[s_i] + rel_m[p_i] - ent_m[neg]
        viol = (margin + (v_pos ** 2).sum(1)
                - (v_neg ** 2).sum(1)) > 0.0
        if not viol.any():
            continue
        g = 2.0 * lr
        np.add.at(ent_m, s_i[viol], -g * (v_pos[viol] - v_neg[viol]))
        np.add.at(ent_m, o_i[viol], g * v_pos[viol])
        np.add.at(ent_m, neg[viol], -g * v_neg[viol])
        np.add.at(rel_m, p_i[viol], -g * (v_pos[viol] - v_neg[viol]))
    ent_m /= np.maximum(np.linalg.norm(ent_m, axis=1, keepdims=True),
                        1e-12)
    return ({e: ent_m[i] for e, i in e_idx.items()},
            {r: rel_m[i] for i, r in enumerate(rels)})


def _sample_facts(triples: DataFrame, sample_cap: int, *,
                  distinct_done: bool = False
                  ) -> list[tuple[str, str, str]]:
    """Bounded deterministic training sample: first ``sample_cap``
    distinct facts along the md5 permutation (TakeOrdered — no full
    sort materializes on the driver). ``distinct_done=True`` skips the
    dedup shuffle when the caller already passes the distinct fact set
    (the rank pipelines materialize it once and share it)."""
    base = triples.select("subj", "pred", "obj")
    if not distinct_done:
        base = base.distinct()
    rows = (base
            .withColumn("_ord", F.md5(F.concat_ws("|", "subj", "pred",
                                                  "obj")))
            .orderBy("_ord").limit(sample_cap).collect())
    return [(r["subj"], r["pred"], r["obj"]) for r in rows]


def _distinct_facts(triples: DataFrame) -> DataFrame:
    """The distinct (subj, pred, obj) fact set, localCheckpoint-ed: the
    rank pipelines read it three times (training sample, positive side
    of the negative draw, object universe) — one dedup shuffle +
    materialization instead of three, and the checkpoint gives AQE
    exact sizes for the downstream joins."""
    return (triples.select("subj", "pred", "obj").distinct()
            .localCheckpoint())


def _embedding_frames(spark, ent: dict, rel: dict):
    ent_df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in sorted(ent.items())],
        "node string, vec array<double>")
    rel_df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in sorted(rel.items())],
        "rel string, vec array<double>")
    return ent_df, rel_df


def _dist(s_vec, p_vec, o_vec):
    """||e_s + r_p − e_o||₂² as a sequential JVM fold — the oracle
    replays the same left-to-right IEEE order."""
    diff = F.zip_with(F.zip_with(s_vec, p_vec, lambda a, b: a + b),
                      o_vec, lambda a, b: a - b)
    return F.aggregate(diff, F.lit(0.0),
                       lambda acc, x: acc + x * x)


def transe_score_triples(triples: DataFrame, dim: int = TRANSE_DIM,
                         epochs: int = TRANSE_EPOCHS,
                         sample_cap: int = TRANSE_SAMPLE_CAP
                         ) -> DataFrame:
    """(subj, pred, obj, transe_dist): translation residual per
    distinct fact (lower = more plausible). Facts whose subject,
    predicate or object fell outside the bounded training sample are
    dropped (inner joins — no embedding, no score).

    Scale shape: three broadcast joins against the embedding tables
    (entity table bounded by the sample cap) + pure-JVM array
    arithmetic; one dedup shuffle on the fact key.
    """
    spark = triples.sparkSession
    facts = _sample_facts(triples, sample_cap)
    ent, rel = train_transe(facts, dim=dim, epochs=epochs)
    ent_df, rel_df = _embedding_frames(spark, ent, rel)
    base = (triples.select("subj", "pred", "obj").distinct()
            .join(F.broadcast(ent_df.withColumnRenamed("node", "subj")
                              .withColumnRenamed("vec", "_sv")), "subj")
            .join(F.broadcast(rel_df.withColumnRenamed("rel", "pred")
                              .withColumnRenamed("vec", "_pv")), "pred")
            .join(F.broadcast(ent_df.withColumnRenamed("node", "obj")
                              .withColumnRenamed("vec", "_ov")), "obj"))
    return base.select(
        "subj", "pred", "obj",
        F.round(_dist(F.col("_sv"), F.col("_pv"), F.col("_ov")), 6)
        .alias("transe_dist"))


def train_distmult(facts: list[tuple[str, str, str]],
                   dim: int = TRANSE_DIM, epochs: int = TRANSE_EPOCHS,
                   lr: float = TRANSE_LR, margin: float = TRANSE_MARGIN,
                   seed: int = TRANSE_SEED
                   ) -> tuple[dict, dict]:
    """Deterministic full-batch margin-ranking DistMult (Yang et al.
    2015): score(s, p, o) = Σ e_s ⊙ r_p ⊙ e_o, HIGHER = more
    plausible. Same layout and corruption scheme as
    :func:`train_transe`; updates are simultaneous (all four gradient
    scatters read pre-update snapshots)."""
    ents = sorted({s for s, _, _ in facts} | {o for _, _, o in facts})
    rels = sorted({p for _, p, _ in facts})
    e_idx = {e: i for i, e in enumerate(ents)}
    r_idx = {r: i for i, r in enumerate(rels)}
    n_ent = len(ents)
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    ent_m = rng.uniform(-bound, bound, (n_ent, dim))
    rel_m = rng.uniform(-bound, bound, (len(rels), dim))
    if not facts or n_ent < 2:
        return ({e: ent_m[i] for e, i in e_idx.items()},
                {r: rel_m[i] for i, r in enumerate(rels)})
    s_i = np.array([e_idx[s] for s, _, _ in facts])
    p_i = np.array([r_idx[p] for _, p, _ in facts])
    o_i = np.array([e_idx[o] for _, _, o in facts])
    h = np.array([_fact_hash(s, p, o, seed) for s, p, o in facts],
                 dtype=np.int64)
    for epoch in range(epochs):
        ent_m /= np.maximum(np.linalg.norm(ent_m, axis=1,
                                           keepdims=True), 1e-12)
        neg = (h + epoch) % (n_ent - 1)
        neg = neg + (neg >= o_i)
        s_pos = (ent_m[s_i] * rel_m[p_i] * ent_m[o_i]).sum(1)
        s_neg = (ent_m[s_i] * rel_m[p_i] * ent_m[neg]).sum(1)
        viol = (margin - s_pos + s_neg) > 0.0
        if not viol.any():
            continue
        ev = ent_m[s_i[viol]].copy()
        eo = ent_m[o_i[viol]].copy()
        en = ent_m[neg[viol]].copy()
        rv = rel_m[p_i[viol]].copy()
        np.add.at(ent_m, s_i[viol], lr * rv * (eo - en))
        np.add.at(ent_m, o_i[viol], lr * rv * ev)
        np.add.at(ent_m, neg[viol], -lr * rv * ev)
        np.add.at(rel_m, p_i[viol], lr * ev * (eo - en))
    ent_m /= np.maximum(np.linalg.norm(ent_m, axis=1, keepdims=True),
                        1e-12)
    return ({e: ent_m[i] for e, i in e_idx.items()},
            {r: rel_m[i] for i, r in enumerate(rels)})


def _dm_score(s_vec, p_vec, o_vec):
    """Σ e_s ⊙ r_p ⊙ e_o as a sequential JVM fold (replay-identical:
    (s·p)·o per dimension, left-to-right accumulation)."""
    prod = F.zip_with(F.zip_with(s_vec, p_vec, lambda a, b: a * b),
                      o_vec, lambda a, b: a * b)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _ranks_against_negatives(facts_source: DataFrame, ent: dict,
                             rel: dict, n_neg: int, score_fn,
                             higher_is_better: bool,
                             test_facts: DataFrame | None = None
                             ) -> DataFrame:
    """Shared ranking pyramid: deterministic negative draw → four
    broadcast embedding joins → per-fact strict-beat count. rank =
    1 + |{candidates scoring strictly better than the truth}|.

    The draw runs with ``unique=True`` — the per-fact explode is capped
    at the predicate's pool size, which emits exactly the distinct
    (fact, neg_obj) set the old ``dropDuplicates`` produced (set
    equality verified both directions at sf1.0) without the 41M-row
    dedup shuffle (round-6 measurement: 9.8 s → 2.2 s for the draw)."""
    from .kg import negative_samples

    spark = facts_source.sparkSession
    ent_df, rel_df = _embedding_frames(spark, ent, rel)
    negs = negative_samples(facts_source, n_neg=n_neg, unique=True)
    if test_facts is not None:
        negs = negs.join(test_facts.distinct(),
                         ["subj", "pred", "obj"], "semi")
    base = (negs
            .join(F.broadcast(ent_df.withColumnRenamed("node", "subj")
                              .withColumnRenamed("vec", "_sv")), "subj")
            .join(F.broadcast(rel_df.withColumnRenamed("rel", "pred")
                              .withColumnRenamed("vec", "_pv")), "pred")
            .join(F.broadcast(ent_df.withColumnRenamed("node", "obj")
                              .withColumnRenamed("vec", "_ov")), "obj")
            .join(F.broadcast(ent_df.withColumnRenamed("node", "neg_obj")
                              .withColumnRenamed("vec", "_nv")),
                  "neg_obj"))
    s_true = score_fn(F.col("_sv"), F.col("_pv"), F.col("_ov"))
    s_neg = score_fn(F.col("_sv"), F.col("_pv"), F.col("_nv"))
    beat = (s_neg > s_true) if higher_is_better else (s_neg < s_true)
    return (base
            .select("subj", "pred", "obj",
                    beat.cast("int").alias("_beat"))
            .groupBy("subj", "pred", "obj")
            .agg(F.count(F.lit(1)).alias("n_candidates"),
                 (F.sum("_beat") + 1).cast("int").alias("transe_rank")))


def distmult_link_prediction_ranks(triples: DataFrame, n_neg: int = 50,
                                   dim: int = TRANSE_DIM,
                                   epochs: int = TRANSE_EPOCHS,
                                   sample_cap: int = TRANSE_SAMPLE_CAP
                                   ) -> DataFrame:
    """Link-prediction ranks under the DistMult scorer — the
    bilinear-diagonal alternative to TransE, same deterministic
    machinery (bounded driver training, broadcast zip_with scoring,
    integer ranks). Output schema matches
    :func:`link_prediction_ranks` (the rank column keeps its name so
    the eval rollup works unchanged)."""
    facts_df = _distinct_facts(triples)
    facts = _sample_facts(facts_df, sample_cap, distinct_done=True)
    ent, rel = train_distmult(facts, dim=dim, epochs=epochs)
    return _ranks_against_negatives(
        facts_df, ent, rel, n_neg, _dm_score, higher_is_better=True)


def link_prediction_ranks(triples: DataFrame, n_neg: int = 50,
                          dim: int = TRANSE_DIM,
                          epochs: int = TRANSE_EPOCHS,
                          sample_cap: int = TRANSE_SAMPLE_CAP
                          ) -> DataFrame:
    """Filtered-style link-prediction evaluation: rank the true object
    of every fact against its deterministic corrupted candidates (the
    :func:`snips_nlu_spark.spark.kg.negative_samples` draw — same-
    predicate objects, collision-free with the truth). rank = 1 +
    |{candidates with strictly smaller distance}| — an INTEGER, so the
    gate hash is float-robust. Duplicate candidates from a wrapped
    draw (object pool smaller than n_neg) are deduplicated so no
    candidate is counted twice.

    Output: (subj, pred, obj, n_candidates, transe_rank).

    Scale shape: the negative draw is linear (n_neg-fold explode), the
    embedding joins broadcast, and the rank is one count aggregate
    keyed on the fact — no per-predicate candidate blowup (sampled
    evaluation is the standard at web scale; exhaustive ranking over a
    predicate's full object universe is the documented alternative
    when the universe is small).
    """
    facts_df = _distinct_facts(triples)
    facts = _sample_facts(facts_df, sample_cap, distinct_done=True)
    ent, rel = train_transe(facts, dim=dim, epochs=epochs)
    return _ranks_against_negatives(
        facts_df, ent, rel, n_neg, _dist, higher_is_better=False)


HOLDOUT_SEED = 7
# md5-prefix threshold for the deterministic 80/20 holdout: a fact is
# TEST when the first 8 hex chars of md5("s|p|o:ho<seed>") fall below
# frac·2³² (uniform by construction, replayable anywhere md5 exists)
HOLDOUT_FRAC = 0.2


def value_cooccurrence_facts(triples: DataFrame) -> DataFrame:
    """Value-level KG facts from the co-occurrence graph: nodes are
    entity VALUES, relations are entity-TYPE pairs ("beverage_type~
    room"), one fact per distinct unordered co-occurring value pair
    (canonical direction from the co-occurrence ordering). Unlike the
    turn-level store — whose subjects are unique turns with ≤3 facts
    each, so TransE can only memorize — values recur across thousands
    of turns, giving the embedding real relational structure to
    generalize from."""
    from .graph import entity_cooccurrence_edges

    co = entity_cooccurrence_edges(triples)
    return co.select(
        F.concat_ws("|", "entity_a", "obj_a").alias("subj"),
        F.concat_ws("~", "entity_a", "entity_b").alias("pred"),
        F.concat_ws("|", "entity_b", "obj_b").alias("obj"))


def _holdout_test(seed: int = HOLDOUT_SEED,
                  frac: float = HOLDOUT_FRAC):
    h = F.conv(F.substring(
        F.md5(F.concat(F.concat_ws("|", "subj", "pred", "obj"),
                       F.lit(f":ho{seed}"))), 1, 8), 16, 10) \
         .cast("long")
    return h < int(frac * 2 ** 32)


def value_link_prediction_ranks(triples: DataFrame, n_neg: int = 50,
                                dim: int = TRANSE_DIM,
                                epochs: int = TRANSE_EPOCHS,
                                sample_cap: int = TRANSE_SAMPLE_CAP
                                ) -> DataFrame:
    """HELD-OUT link prediction over the value-level KG: split the
    co-occurrence facts 80/20 by an md5 threshold, train TransE on the
    TRAIN side only, rank every TEST fact's true object against the
    deterministic negative draw (candidate universe = ALL facts'
    objects). This measures generalization, not memorization — the
    model never saw the test pairs. Test facts whose endpoints never
    appear in a train fact have no embedding and are dropped (inner
    joins; the standard transductive protocol).

    Output: (subj, pred, obj, n_candidates, transe_rank).
    """
    facts = value_cooccurrence_facts(triples).localCheckpoint()
    is_test = _holdout_test()
    train = facts.filter(~is_test)
    test = facts.filter(is_test)
    ent, rel = train_transe(
        _sample_facts(train, sample_cap, distinct_done=True),
        dim=dim, epochs=epochs)
    return _ranks_against_negatives(facts, ent, rel, n_neg, _dist,
                                    higher_is_better=False,
                                    test_facts=test)


def link_prediction_eval(ranks: DataFrame) -> DataFrame:
    """Per-predicate rollup of the rank table: (pred, n_facts, mrr,
    hits_at_1, hits_at_3), 6 dp. Derives only from integer ranks, so
    the oracle can recompute it in SQL over the committed rank table."""
    return (ranks.groupBy("pred")
            .agg(F.count(F.lit(1)).alias("n_facts"),
                 F.round(F.avg(1.0 / F.col("transe_rank")), 6)
                 .alias("mrr"),
                 F.round(F.avg((F.col("transe_rank") <= 1)
                               .cast("double")), 6).alias("hits_at_1"),
                 F.round(F.avg((F.col("transe_rank") <= 3)
                               .cast("double")), 6).alias("hits_at_3")))


def train_complex(facts: list[tuple[str, str, str]],
                  dim: int = TRANSE_DIM, epochs: int = TRANSE_EPOCHS,
                  lr: float = TRANSE_LR, margin: float = TRANSE_MARGIN,
                  seed: int = TRANSE_SEED) -> tuple[dict, dict]:
    """Deterministic full-batch margin-ranking ComplEx (Trouillon et
    al. 2016): complex-valued embeddings, score(s, p, o) =
    Re(⟨e_s, r_p, conj(e_o)⟩) — the scorer that models ASYMMETRIC
    relations DistMult cannot. Vectors are stored as length-2·dim
    arrays (real half ‖ imaginary half) so the Spark side stays pure
    array arithmetic. Same corruption scheme and simultaneous-update
    discipline as the other trainers; entity rows are L2-normalized
    over the full 2·dim vector per epoch."""
    ents = sorted({s for s, _, _ in facts} | {o for _, _, o in facts})
    rels = sorted({p for _, p, _ in facts})
    e_idx = {e: i for i, e in enumerate(ents)}
    r_idx = {r: i for i, r in enumerate(rels)}
    n_ent = len(ents)
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    ent_m = rng.uniform(-bound, bound, (n_ent, 2 * dim))
    rel_m = rng.uniform(-bound, bound, (len(rels), 2 * dim))
    if not facts or n_ent < 2:
        return ({e: ent_m[i] for e, i in e_idx.items()},
                {r: rel_m[i] for i, r in enumerate(rels)})
    s_i = np.array([e_idx[s] for s, _, _ in facts])
    p_i = np.array([r_idx[p] for _, p, _ in facts])
    o_i = np.array([e_idx[o] for _, _, o in facts])
    h = np.array([_fact_hash(s, p, o, seed) for s, p, o in facts],
                 dtype=np.int64)

    def _score(e_s, r_p, e_o):
        sr, si = e_s[:, :dim], e_s[:, dim:]
        pr, pi = r_p[:, :dim], r_p[:, dim:]
        orr, oi = e_o[:, :dim], e_o[:, dim:]
        return ((sr * pr - si * pi) * orr
                + (sr * pi + si * pr) * oi).sum(1)

    for epoch in range(epochs):
        ent_m /= np.maximum(np.linalg.norm(ent_m, axis=1,
                                           keepdims=True), 1e-12)
        neg = (h + epoch) % (n_ent - 1)
        neg = neg + (neg >= o_i)
        viol = (margin - _score(ent_m[s_i], rel_m[p_i], ent_m[o_i])
                + _score(ent_m[s_i], rel_m[p_i], ent_m[neg])) > 0.0
        if not viol.any():
            continue
        sv, pv = s_i[viol], p_i[viol]
        ov, nv = o_i[viol], neg[viol]
        es, rp = ent_m[sv].copy(), rel_m[pv].copy()
        eo, en = ent_m[ov].copy(), ent_m[nv].copy()
        sr, si = es[:, :dim], es[:, dim:]
        pr, pi = rp[:, :dim], rp[:, dim:]

        def grads(eobj):
            orr, oi = eobj[:, :dim], eobj[:, dim:]
            g_s = np.concatenate([pr * orr + pi * oi,
                                  -pi * orr + pr * oi], axis=1)
            g_o = np.concatenate([sr * pr - si * pi,
                                  sr * pi + si * pr], axis=1)
            g_p = np.concatenate([sr * orr + si * oi,
                                  -si * orr + sr * oi], axis=1)
            return g_s, g_o, g_p

        gs_pos, go_pos, gp_pos = grads(eo)
        gs_neg, go_neg, gp_neg = grads(en)
        np.add.at(ent_m, sv, lr * (gs_pos - gs_neg))
        np.add.at(ent_m, ov, lr * go_pos)
        np.add.at(ent_m, nv, -lr * go_neg)
        np.add.at(rel_m, pv, lr * (gp_pos - gp_neg))
    ent_m /= np.maximum(np.linalg.norm(ent_m, axis=1, keepdims=True),
                        1e-12)
    return ({e: ent_m[i] for e, i in e_idx.items()},
            {r: rel_m[i] for i, r in enumerate(rels)})


def _cx_score(dim: int):
    """ComplEx Re(⟨s, p, conj(o)⟩) as JVM array arithmetic over the
    real‖imag layout: A = sr⊙pr − si⊙pi, B = sr⊙pi + si⊙pr, score =
    Σ (A⊙o_re + B⊙o_im) — the replay computes the same per-dim
    expression left-to-right."""
    def score(s_vec, p_vec, o_vec):
        def half(v, first):
            return F.slice(v, 1 if first else dim + 1, dim)
        sr, si = half(s_vec, True), half(s_vec, False)
        pr, pi = half(p_vec, True), half(p_vec, False)
        orr, oi = half(o_vec, True), half(o_vec, False)
        mul = lambda a, b: F.zip_with(a, b, lambda x, y: x * y)  # noqa: E731
        sub = lambda a, b: F.zip_with(a, b, lambda x, y: x - y)  # noqa: E731
        add = lambda a, b: F.zip_with(a, b, lambda x, y: x + y)  # noqa: E731
        a_arr = sub(mul(sr, pr), mul(si, pi))
        b_arr = add(mul(sr, pi), mul(si, pr))
        total = add(mul(a_arr, orr), mul(b_arr, oi))
        return F.aggregate(total, F.lit(0.0),
                           lambda acc, x: acc + x)
    return score


def complex_link_prediction_ranks(triples: DataFrame, n_neg: int = 50,
                                  dim: int = TRANSE_DIM,
                                  epochs: int = TRANSE_EPOCHS,
                                  sample_cap: int = TRANSE_SAMPLE_CAP
                                  ) -> DataFrame:
    """Link-prediction ranks under the ComplEx scorer — same
    deterministic machinery, complex geometry (handles asymmetric
    relations). Output schema matches :func:`link_prediction_ranks`."""
    facts_df = _distinct_facts(triples)
    facts = _sample_facts(facts_df, sample_cap, distinct_done=True)
    ent, rel = train_complex(facts, dim=dim, epochs=epochs)
    return _ranks_against_negatives(
        facts_df, ent, rel, n_neg, _cx_score(dim),
        higher_is_better=True)

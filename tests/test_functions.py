"""Training-data pipeline ops: dedup, similarity, text analysis,
multimodal plumbing."""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.spark

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),
    (2, "completely different text about spark query engines and shuffles"),
    (3, "The quick brown fox jumps over the lazy dog near the river bank"),
    (4, "the  quick   brown fox jumps over the lazy dog near the river "
        "bank"),
    (5, "short"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_exact_duplicates(docs):
    from snips_nlu_spark.functions.dedup import exact_duplicates
    rows = {(r["keep_doc_id"], r["dup_doc_id"])
            for r in exact_duplicates(docs).collect()}
    # 0, 3 (case) and 4 (whitespace) share a normalized fingerprint
    assert rows == {(0, 3), (0, 4)}


def test_jaccard_pairs(docs):
    from snips_nlu_spark.functions.dedup import jaccard_duplicate_pairs
    rows = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_duplicate_pairs(docs, threshold=0.5).collect()}
    assert (0, 3) in rows and rows[(0, 3)] == 1.0
    assert (0, 4) in rows and rows[(0, 4)] == 1.0
    assert (0, 1) in rows and 0.5 < rows[(0, 1)] < 1.0  # one word differs
    assert not any(2 in pair or 5 in pair for pair in rows)


def test_minhash_matches_bruteforce(docs):
    from snips_nlu_spark.functions.dedup import (jaccard_duplicate_pairs,
                                                 minhash_duplicate_pairs)
    brute = sorted(tuple(r) for r in
                   jaccard_duplicate_pairs(docs, threshold=0.5).collect())
    lsh = sorted(tuple(r) for r in
                 minhash_duplicate_pairs(docs, threshold=0.5).collect())
    assert lsh == brute


def test_simhash_near_pairs(docs):
    from snips_nlu_spark.functions.dedup import (simhash_near_pairs,
                                                 simhash_signatures)
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs).collect()}
    assert len(sigs) == len(DOCS)
    # identical normalized token multisets → identical signatures
    assert sigs[0] == sigs[3] == sigs[4]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 3)] == 0 and pairs[(0, 4)] == 0
    assert (0, 2) not in pairs


def test_text_profile(docs):
    from snips_nlu_spark.functions.text import text_profile
    prof = {r["doc_id"]: r for r in text_profile(docs).collect()}
    assert prof[0]["n_tokens"] == 13
    assert prof[0]["lang_pred"] == "en"
    assert prof[5]["lang_pred"] == "und"
    assert prof[0]["fingerprint"] == prof[3]["fingerprint"] \
        == prof[4]["fingerprint"]
    assert 0.0 <= prof[5]["quality"] < prof[0]["quality"] <= 1.0


def test_brute_force_topk(spark):
    from snips_nlu_spark.functions.similarity import brute_force_topk
    import numpy as np
    rng = np.random.RandomState(0)
    base = rng.randn(30, 8).astype("float32")
    base[7] = base[3] + 0.01 * rng.randn(8).astype("float32")  # near-dup
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    top = brute_force_topk(emb, k=3, n_queries=5).collect()
    by_query = {}
    for r in top:
        by_query.setdefault(r["query_id"], []).append(r)
    assert set(by_query) == {0, 1, 2, 3, 4}
    for q, rs in by_query.items():
        assert [r["rank"] for r in
                sorted(rs, key=lambda r: r["rank"])] == [1, 2, 3]
    # vec 7 is the planted nearest neighbor of vec 3
    q3 = sorted(by_query[3], key=lambda r: r["rank"])
    assert q3[0]["neighbor_id"] == 7
    assert q3[0]["sim"] > 0.99


def test_lsh_topk_recall(spark):
    from snips_nlu_spark.functions.similarity import (brute_force_topk,
                                                      lsh_bucketed_topk)
    import numpy as np
    rng = np.random.RandomState(1)
    base = rng.randn(60, 16).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    brute = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, k=1, n_queries=8).collect()}
    lsh = {(r["query_id"], r["neighbor_id"])
           for r in lsh_bucketed_topk(emb, k=1, n_queries=8, n_tables=12,
                                      n_bits=4, dim=16).collect()}
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.75  # recall knob, not exactness


def test_cosine_duplicate_pairs_and_lsh_recall(spark):
    from snips_nlu_spark.functions.similarity import (
        cosine_duplicate_pairs, cosine_duplicate_pairs_lsh)
    import numpy as np
    rng = np.random.RandomState(3)
    base = rng.randn(40, 16).astype("float32")
    # plant near-duplicate clusters
    base[11] = base[2] + 0.02 * rng.randn(16).astype("float32")
    base[23] = base[2] + 0.03 * rng.randn(16).astype("float32")
    base[37] = base[15] + 0.01 * rng.randn(16).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(40)],
        ["vec_id", "embedding"])
    brute = {(r["vec_a"], r["vec_b"])
             for r in cosine_duplicate_pairs(emb, threshold=0.9).collect()}
    assert {(2, 11), (2, 23), (11, 23), (15, 37)} <= brute
    # high-cosine pairs collide with near-certainty in ≥1 of 16 tables
    lsh = {(r["vec_a"], r["vec_b"])
           for r in cosine_duplicate_pairs_lsh(
               emb, threshold=0.9, n_tables=16, n_bits=4,
               dim=16).collect()}
    assert lsh <= brute  # exact re-scoring: no false positives
    assert len(lsh & brute) / len(brute) >= 0.75


def test_multimodal_plumbing(spark):
    from snips_nlu_spark.functions.multimodal import (
        extract_media_features, frame_sample_plan, synthesize_media)
    media = synthesize_media(spark, n=12).cache()
    feats = extract_media_features(media).collect()
    assert len(feats) == 12
    assert all(len(r["feature"]) == 32 for r in feats)
    # deterministic: same payload -> same features
    again = extract_media_features(media).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))
    plan = frame_sample_plan(media, fps=0.5)
    vids = plan.filter(F.col("kind") == "video")
    assert vids.count() > 0
    assert plan.filter(F.col("kind") != "video").count() == 0


def test_ivf_topk_recall_and_determinism(spark):
    from snips_nlu_spark.functions.similarity import (brute_force_topk,
                                                      ivf_topk)
    import numpy as np
    rng = np.random.RandomState(3)
    # 6 well-separated clusters so the coarse quantizer has structure
    centers = rng.randn(6, 16) * 4
    base = np.concatenate([
        centers[i % 6] + rng.randn(1, 16) for i in range(72)
    ]).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(72)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    brute = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, k=1, n_queries=8).collect()}
    ivf = ivf_topk(emb, k=1, n_queries=8, n_centroids=6, n_probe=2)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    recall = len(brute & got) / len(brute)
    assert recall >= 0.75  # probe knob, not exactness

    again = {(r["query_id"], r["neighbor_id"])
             for r in ivf_topk(emb, k=1, n_queries=8, n_centroids=6,
                               n_probe=2).collect()}
    assert got == again  # quantizer + assignment are deterministic


def test_ivf_topk_matches_committed_oracle(spark):
    """The driver-gate differential, run locally: Spark IVF ≡ the
    pure-numpy re-execution committed by make_oracle.py."""
    import pandas as pd
    import __spark_entry__ as em

    got = (em._q_ivf_topk(spark, "/root/testdata/sf0.01")
           .toPandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))
    want = (pd.read_parquet(REPO / "oracle" / "ivf_topk_sf0.01.parquet")
            .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].astype({"rank": "int32"}),
        want[sorted(want.columns)].astype({"rank": "int32"}))


@pytest.mark.spark
def test_semantic_dedup_pairs_equals_brute(spark):
    """On the clustered synthesizer the k-means cells capture every
    brute-force pair at threshold 0.92 (verified recall 1.0 for this
    seeded config), so the SemDeDup pair SET equals the quadratic
    baseline — while only ever scoring within cells."""
    from snips_nlu_spark.functions.similarity import (
        cosine_duplicate_pairs, semantic_dedup_pairs,
        synthesize_embeddings)

    embs = synthesize_embeddings(spark, 800)
    sem = {(r["vec_a"], r["vec_b"])
           for r in semantic_dedup_pairs(embs, threshold=0.92).collect()}
    brute = {(r["vec_a"], r["vec_b"])
             for r in cosine_duplicate_pairs(embs,
                                             threshold=0.92).collect()}
    assert sem == brute
    assert len(sem) > 10  # non-trivial fixture


@pytest.mark.spark
def test_semantic_dedup_pairs_partition_invariance(spark):
    """Quantizer training samples in vec_id order and per-cell scoring
    sorts by vec_id, so output is independent of input partitioning."""
    from snips_nlu_spark.functions.similarity import (
        semantic_dedup_pairs, synthesize_embeddings)

    embs = synthesize_embeddings(spark, 600)
    a = sorted(map(tuple, semantic_dedup_pairs(
        embs.repartition(7), threshold=0.92).collect()))
    b = sorted(map(tuple, semantic_dedup_pairs(
        embs.repartition(2), threshold=0.92).collect()))
    assert a == b
    assert all(x[0] < x[1] for x in a)


@pytest.mark.spark
def test_semantic_dedup_keep_policy(spark):
    """SemDeDup keep rule: exactly one kept member per dup cluster, and
    it is the member with the LOWEST (centroid_sim, vec_id); singletons
    keep themselves; the assignment is total."""
    from snips_nlu_spark.functions.similarity import (
        semantic_dedup_keep, synthesize_embeddings)

    n = 600
    rows = semantic_dedup_keep(synthesize_embeddings(spark, n),
                               threshold=0.92).collect()
    assert len(rows) == n
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == n
    n_multi = 0
    for members in by_cluster.values():
        kept = [m for m in members if m["kept"]]
        assert len(kept) == 1
        want = min(members,
                   key=lambda m: (m["centroid_sim"], m["vec_id"]))
        assert kept[0]["vec_id"] == want["vec_id"]
        if len(members) > 1:
            n_multi += 1
    assert n_multi > 0  # fixture exercises real dup clusters


@pytest.mark.spark
def test_semantic_dedup_no_dups_input(spark):
    """The parquet embeddings carry no near-dups (max pairwise cosine
    0.513) — the detector must emit nothing at 0.9."""
    from snips_nlu_spark.functions.similarity import semantic_dedup_pairs

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    assert semantic_dedup_pairs(embs, threshold=0.9).count() == 0


@pytest.mark.spark
def test_entity_pagerank_numpy_replay(spark):
    """Fixed-iteration PageRank over a hand graph equals an
    independent numpy power iteration; mass is conserved (no dangling
    nodes by construction, so ranks sum to 1)."""
    import numpy as np

    from snips_nlu_spark.spark.graph import entity_pagerank

    # turns asserting co-occurring values: t1 (A,B), t2 (A,B), t3 (B,C)
    triples = spark.createDataFrame(
        [("c", 1, "c:1", "slot", "A", "e", 0.9),
         ("c", 1, "c:1", "slot", "B", "e", 0.9),
         ("c", 2, "c:2", "slot", "A", "e", 0.9),
         ("c", 2, "c:2", "slot", "B", "e", 0.9),
         ("c", 3, "c:3", "slot", "B", "e", 0.9),
         ("c", 3, "c:3", "slot", "C", "e", 0.9)],
        ["conv_id", "turn_idx", "subj", "pred", "obj", "entity",
         "proba"])
    got = {r["node"]: r["rank"]
           for r in entity_pagerank(triples).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # numpy replay: nodes A,B,C; weights A-B:2, B-C:1
    nodes = ["e|A", "e|B", "e|C"]
    w = np.array([[0, 2, 0], [2, 0, 1], [0, 1, 0]], dtype=float)
    outw = w.sum(axis=1)
    r = np.full(3, 1 / 3)
    for _ in range(10):
        r = 0.15 / 3 + 0.85 * (w / outw[:, None]).T @ r
    want = {n: round(v, 6) for n, v in zip(nodes, r)}
    assert got == want
    # the hub (B) outranks the leaves
    assert got["e|B"] > got["e|A"] > got["e|C"]


@pytest.mark.spark
def test_contextual_intents_carry_over(spark):
    """Hand fixture: slot-only follow-ups inherit the last matched
    intent; turns before any match stay NULL; conversations without any
    intent stay NULL throughout."""
    from snips_nlu_spark.spark.graph import contextual_intents

    triples = spark.createDataFrame(
        [("c", 0, "c:0", "intent", "bookFlight", 0.9),
         ("c", 2, "c:2", "intent", "setLight", 0.8),
         ("c", 2, "c:2", "room", "kitchen", 0.8)],
        ["conv_id", "turn_idx", "subj", "pred", "obj", "proba"])
    turns = spark.createDataFrame(
        [("c", i) for i in range(4)] + [("d", 0), ("d", 1)],
        ["conv_id", "turn_idx"])
    got = {(r["conv_id"], r["turn_idx"]):
           (r["intent"], r["effective_intent"], r["carried"])
           for r in contextual_intents(triples, turns).collect()}
    assert got == {
        ("c", 0): ("bookFlight", "bookFlight", False),
        ("c", 1): (None, "bookFlight", True),
        ("c", 2): ("setLight", "setLight", False),
        ("c", 3): (None, "setLight", True),
        ("d", 0): (None, None, False),
        ("d", 1): (None, None, False),
    }


@pytest.mark.spark
def test_duplicate_clusters_transitive_closure(spark):
    """A~B and B~C collapse into one cluster even though A~C was never
    emitted; disjoint components keep distinct labels; singletons get
    their own id."""
    from snips_nlu_spark.functions.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["doc_a", "doc_b"])
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 7, 9)],
                                 ["doc_id"])
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(pairs, docs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 7: 7, 9: 7}


@pytest.mark.spark
def test_duplicate_clusters_chain_diameter(spark):
    """A longer chain (diameter > 2) still converges to one component
    within the iteration budget."""
    from snips_nlu_spark.functions.dedup import duplicate_clusters

    chain = [(i, i + 1) for i in range(10, 18)]
    pairs = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(pairs).collect()}
    assert set(got.values()) == {10}
    assert set(got) == set(range(10, 19))


@pytest.mark.spark
def test_duplicate_clusters_star_chain(spark):
    """The large-star/small-star variant resolves a diameter-63 chain —
    a graph the O(diameter) hash-min strategy cannot finish within the
    same iteration budget — in O(log n) rounds."""
    from snips_nlu_spark.functions.dedup import (duplicate_clusters,
                                                 duplicate_clusters_star)

    chain = [(i, i + 1) for i in range(63)]
    pairs = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    got = {(r["doc_id"], r["cluster_id"])
           for r in duplicate_clusters_star(pairs, max_iter=10).collect()}
    assert got == {(i, 0) for i in range(64)}
    # same graph through the dispatching front door
    via_dispatch = {(r["doc_id"], r["cluster_id"])
                    for r in duplicate_clusters(
                        pairs, strategy="star").collect()}
    assert via_dispatch == got
    # and the hash-min strategy genuinely cannot: diameter 63 > 20 rounds
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iter=20).collect()


@pytest.mark.spark
def test_duplicate_clusters_star_equals_hashmin(spark):
    """Seeded random graphs: both strategies produce the identical total
    assignment (components, labels, singletons)."""
    import random

    from snips_nlu_spark.functions.dedup import (duplicate_clusters,
                                                 duplicate_clusters_star)

    rng = random.Random(1234)
    for trial in range(3):
        n = 30 + 10 * trial
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(n * 3 // 4)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
        docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        hm = {(r["doc_id"], r["cluster_id"])
              for r in duplicate_clusters(pairs, docs,
                                          max_iter=60).collect()}
        st = {(r["doc_id"], r["cluster_id"])
              for r in duplicate_clusters_star(pairs, docs).collect()}
        assert hm == st
        # total assignment: every doc labeled exactly once
        assert len({d for d, _ in st}) == n


@pytest.mark.spark
def test_pack_sequences_stream_invariants(spark):
    """The packing plan lays a gapless token stream: sorted by
    start_tok, every doc starts where the previous ended; sequence ids
    and offsets are consistent with seq_len; zero-token docs excluded;
    output is partitioning-invariant."""
    from snips_nlu_spark.functions.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, "word " * (5 + (i * 7) % 40)) for i in range(60)]
        + [(99, "")],
        ["doc_id", "text"])
    L = 32
    rows = sorted(map(tuple, pack_sequences(docs, seq_len=L).collect()),
                  key=lambda r: r[2])
    assert len(rows) == 60  # empty doc excluded
    pos = 0
    for doc_id, n, start, sf, sl, off in rows:
        assert start == pos
        assert sf == start // L and off == start % L
        assert sl == (start + n - 1) // L
        pos += n
    # partitioning must not change the layout
    again = sorted(map(tuple, pack_sequences(
        docs.repartition(7), seq_len=L).collect()), key=lambda r: r[2])
    assert again == rows


@pytest.mark.spark
def test_bigram_lm_scores_hand_computed(spark):
    """Add-0.5 bigram LM on a 4-doc corpus, scores checked against the
    closed-form values; sub-2-word docs get NULL."""
    import math

    from snips_nlu_spark.functions.text import bigram_lm_scores

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "z z"), (3, "a")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
           for r in bigram_lm_scores(docs).collect()}
    # V=3; cb: (a,b)=3, (b,a)=1, (z,z)=1; cp: a=3, b=1, z=1; k*V=1.5
    lp_ab = math.log(3.5 / 4.5)
    lp_ba = math.log(1.5 / 2.5)
    lp_zz = math.log(1.5 / 2.5)
    want = {
        0: (3, round(-(2 * lp_ab + lp_ba) / 3, 6)),
        1: (1, round(-lp_ab, 6)),
        2: (1, round(-lp_zz, 6)),
        3: (0, None),
    }
    assert got == want
    # the corpus-typical bigram scores lower NLL than the rare one
    assert got[1][1] < got[2][1]


@pytest.mark.spark
def test_dedup_corpus_keep_one(spark):
    """Composed pipeline: near-identical docs collapse to one kept
    survivor (the min doc_id); unique docs all survive; output is a
    total audit assignment."""
    from snips_nlu_spark.functions.dedup import dedup_corpus

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " today"), (5, base + " tomorrow"),
         (7, "completely different text about spark shuffles and joins "
             "at scale")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["cluster_id"], r["kept"])
           for r in dedup_corpus(docs).collect()}
    assert got == {1: (1, True), 2: (1, False), 5: (1, False),
                   7: (7, True)}


@pytest.mark.spark
def test_duplicate_clusters_star_stress(spark):
    """Planted-structure stress: a 2048-node chain (the adversarial
    diameter case), 100 disjoint 6-cliques, and cross-linked stars must
    all resolve to exact components within an O(log n) iteration budget
    (14 rounds for n=2048 — the explicit bound the star algorithm
    promises; hash-min would need 2047)."""
    from snips_nlu_spark.functions.dedup import duplicate_clusters_star

    edges = [(i, i + 1) for i in range(2047)]  # chain 0..2047
    base = 10_000
    for c in range(100):  # 6-cliques
        ids = [base + c * 6 + k for k in range(6)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    base2 = 50_000
    for s in range(20):  # stars cross-linked pairwise into 10 comps
        hub = base2 + s * 100
        edges += [(hub, hub + k) for k in range(1, 30)]
        if s % 2 == 1:
            edges.append((hub, hub - 100 + 1))
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {(r["doc_id"], r["cluster_id"])
           for r in duplicate_clusters_star(pairs, max_iter=14).collect()}
    # exact expectations
    want = {(i, 0) for i in range(2048)}
    for c in range(100):
        ids = [base + c * 6 + k for k in range(6)]
        want |= {(i, ids[0]) for i in ids}
    for s in range(20):
        hub = base2 + s * 100
        root = hub - 100 if s % 2 == 1 else hub
        want |= {(hub + k, root) for k in range(1, 30)}
        want.add((hub, root))
    assert got == want


@pytest.mark.spark
def test_benchmark_contamination(spark):
    """Hand-computed coverage fractions: a verbatim copy is flagged at
    1.0, a half-overlapping doc sits exactly at the threshold, and a
    disjoint doc is not emitted."""
    from snips_nlu_spark.functions.cleaning import benchmark_contamination

    # bench item: 6 words -> 2 distinct 5-gram shingles
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        ["bench_id", "text"])
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta tail words here"),
         (2, "prefix alpha beta gamma delta epsilon other stuff"),
         (3, "totally unrelated words that never overlap at all")],
        ["doc_id", "text"])
    got = {(r["doc_id"], r["overlap_ngrams"], r["bench_ngrams"],
            r["overlap_frac"])
           for r in benchmark_contamination(docs, bench, n=5,
                                            threshold=0.5).collect()}
    assert got == {(1, 2, 2, 1.0), (2, 1, 2, 0.5)}
    # raising the threshold drops the borderline doc
    strict = {r["doc_id"]
              for r in benchmark_contamination(docs, bench, n=5,
                                               threshold=0.75).collect()}
    assert strict == {1}


@pytest.mark.spark
def test_snippet_benchmark_windows(spark):
    """The synthesized benchmark is the exact 10-word window starting
    at word 6, only for residue-class docs that are long enough."""
    from snips_nlu_spark.functions.cleaning import snippet_benchmark

    words = " ".join(f"w{i}" for i in range(1, 21))  # w1..w20
    docs = spark.createDataFrame(
        [(5, words), (34, "too short"), (6, words)], ["doc_id", "text"])
    got = {(r["bench_id"], r["text"])
           for r in snippet_benchmark(docs).collect()}
    assert got == {(5, " ".join(f"w{i}" for i in range(6, 16)))}


@pytest.mark.spark
def test_remove_boilerplate_lines(spark):
    from snips_nlu_spark.functions.cleaning import remove_boilerplate_lines

    docs = [(i, "COMMON FOOTER\nunique %d\nalso common" % i)
            for i in range(10)]
    docs.append((99, "COMMON FOOTER\nalso common"))  # loses every line
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["text"]
           for r in remove_boilerplate_lines(df, min_df=5).collect()}
    assert got[3] == "unique 3"
    assert got[99] == ""  # fully-boilerplate doc keeps an empty row
    assert len(got) == 11


@pytest.mark.spark
def test_mask_pii(spark):
    from snips_nlu_spark.functions.cleaning import mask_pii

    df = spark.createDataFrame(
        [(0, "mail a.b+c@x-y.co or ring +49 30 1234 5678 now"),
         (1, "no pii here, order 42"),
         (2, "us style (415) 555-0123 and dotted 415.555.0123 ok"),
         (3, "wire DE89 3704 0044 0532 0130 00 or GB29NWBK60161331926819"),
         (4, "host 192.168.0.1 port 8080; version 2.0.1 untouched"),
         (5, "IBAN-less caps text WORDS LIKE THESE stay")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["text"] for r in mask_pii(df).collect()}
    assert got[0] == "mail <EMAIL> or ring <PHONE> now"
    assert got[1] == "no pii here, order 42"  # short digit runs untouched
    assert got[2] == "us style <PHONE> and dotted <PHONE> ok"
    assert got[3] == "wire <IBAN> or <IBAN>"
    assert got[4] == "host <IP> port 8080; version 2.0.1 untouched"
    assert got[5] == "IBAN-less caps text WORDS LIKE THESE stay"


@pytest.mark.spark
def test_gopher_quality_flags(spark):
    from snips_nlu_spark.functions.cleaning import gopher_quality_flags

    long_ok = " ".join(["word"] * 60)
    df = spark.createDataFrame(
        [(0, long_ok), (1, "too short"), (2, "$$$ %% ### !!")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert got[0]["ok_word_count"] and got[0]["ok_mean_word_len"]
    assert got[0]["n_words"] == 60 and got[0]["mean_word_len"] == 4.0
    assert not got[1]["ok_word_count"]
    assert not got[2]["ok_symbol_frac"]


@pytest.mark.spark
def test_token_counts_and_bpe_pieces(spark):
    from snips_nlu_spark.functions.text import token_counts

    df = spark.createDataFrame(
        [(0, "I'll have 2 coffees, thanks!"), (1, "")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in token_counts(df).collect()}
    # words: I ll have 2 coffees thanks = 6
    assert got[0]["n_words"] == 6
    # pieces: I|'ll|have|2|coffees|,|thanks|! = 8 (+0 residual ws)
    assert got[0]["n_bpe_pieces"] == 8
    assert got[1]["n_words"] == 0 and got[1]["n_bpe_pieces"] == 0


@pytest.mark.spark
def test_repetition_flags(spark):
    from snips_nlu_spark.functions.text import repetition_flags

    clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    loopy = "buy now " * 10            # top bigram dominates
    dup_lines = "a line\nb line\na line\na line"  # 2 of 4 duplicated
    df = spark.createDataFrame(
        [(0, clean), (1, loopy.strip()), (2, dup_lines)],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in repetition_flags(df).collect()}
    assert got[0]["ok_top_bigram"] and got[0]["ok_dup_lines"]
    assert got[0]["top_bigram_frac"] == 0.2  # 1 of 10 words x2
    assert not got[1]["ok_top_bigram"]
    assert got[2]["dup_line_frac"] == 0.5
    assert not got[2]["ok_dup_lines"]


@pytest.mark.spark
def test_ivf_pq_topk_recall_and_determinism(spark):
    """IVF-PQ (coarse cells + product-quantized codes + ADC + exact
    refine): recall vs brute force on the structureless synthetic
    embeddings (ANN worst case — no cluster structure) and byte-stable
    across runs. The gate query cross-checks against the committed
    numpy re-execution of the same spec."""
    from snips_nlu_spark.functions.similarity import (brute_force_topk,
                                                      ivf_pq_topk)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    brute = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(emb, k=5, n_queries=12).collect()}
    pq = ivf_pq_topk(emb, k=5, n_queries=12)
    a = sorted(map(tuple, pq.collect()))
    got = {(r[0], r[1]) for r in a}
    recall = len(brute & got) / len(brute)
    assert recall >= 0.55, recall  # probe/rerank knobs, not exactness
    assert a == sorted(map(tuple, pq.collect()))


@pytest.mark.spark
def test_sample_by_token_budget(spark):
    """First-fit token-budget draw in a deterministic md5 order: kept
    docs' running totals stay within budget, order is stable across
    runs, and strata each get their own budget."""
    from snips_nlu_spark.functions.sampling import sample_by_token_budget

    docs = [(i, "en" if i % 2 == 0 else "fr",
             " ".join(["w"] * (5 + i % 7))) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    a = sorted(map(tuple, sample_by_token_budget(df, 60).collect()))
    b = sorted(map(tuple, sample_by_token_budget(df, 60).collect()))
    assert a == b and a  # deterministic, non-empty
    assert max(r[-1] for r in a) <= 60  # cum within budget
    strat = sample_by_token_budget(df, 40, strata_col="lang").collect()
    by_lang = {}
    for r in strat:
        by_lang.setdefault(r["lang"], []).append(r["cum_tokens"])
    assert set(by_lang) == {"en", "fr"}
    assert all(max(v) <= 40 for v in by_lang.values())

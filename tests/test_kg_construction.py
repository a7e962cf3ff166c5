"""Hand-computed fixtures for the KG-construction layer
(snips_nlu_spark/spark/kg.py): N-Triples export, predicate schema
induction, noisy-OR confidence fusion, entity-mention resolution and
TransE-style negative sampling, plus the two-pass bucketed dense index
they share with the stratified split."""

import pyspark.sql.functions as F

from snips_nlu_spark.functions.sampling import stratified_split
from snips_nlu_spark.spark.kg import (bucketed_dense_index,
                                      negative_samples, ntriples_export,
                                      predicate_schema,
                                      resolve_entity_mentions,
                                      triple_confidence)

SCHEMA = ("conv_id string, turn_idx int, subj string, pred string, "
          "obj string, entity string, span_start int, span_end int, "
          "raw_value string, proba double")


def _triples(spark, rows):
    full = [("c0", 0, s, p, o, e, 0, 1, rv, pr)
            for (s, p, o, e, rv, pr) in rows]
    return spark.createDataFrame(full, SCHEMA)


def test_ntriples_escaping_and_terms(spark):
    out = {r["obj"]: r["ntriple"] for r in ntriples_export(_triples(
        spark, [
            ("t1", "intent", "bookFlight", None, None, 1.0),
            ("t1", "note", 'say "hi"\tnow\nplease\\ok', "note",
             "x", 0.5),
        ])).collect()}
    assert out["bookFlight"] == (
        "<urn:kg:turn:t1> <urn:kg:pred:intent> "
        "<urn:kg:intent:bookFlight> .")
    assert out['say "hi"\tnow\nplease\\ok'] == (
        '<urn:kg:turn:t1> <urn:kg:pred:note> '
        '"say \\"hi\\"\\tnow\\nplease\\\\ok" .')


def test_ntriples_distinct_facts(spark):
    # the same fact asserted twice (two spans) serializes once
    rows = [("t1", "room", "attic", "room", "attic", 1.0)] * 2
    assert ntriples_export(_triples(spark, rows)).count() == 1


def test_predicate_schema_functionality(spark):
    # pred "f": each subject once (functional); pred "m": t1 has two
    # objects -> 3 pairs, 2 subjects -> functionality 2/3
    rows = [
        ("t1", "f", "a", "e", "a", 1.0),
        ("t2", "f", "a", "e", "a", 1.0),
        ("t1", "m", "x", "e", "x", 1.0),
        ("t1", "m", "y", "e", "y", 1.0),
        ("t2", "m", "x", "e", "x", 1.0),
    ]
    got = {r["pred"]: r for r in
           predicate_schema(_triples(spark, rows)).collect()}
    f, m = got["f"], got["m"]
    assert (f["n_assertions"], f["n_subjects"], f["n_objects"],
            f["n_pairs"]) == (2, 2, 1, 2)
    assert f["functionality"] == 1.0
    assert f["inverse_functionality"] == 0.5
    assert (m["n_assertions"], m["n_pairs"]) == (3, 3)
    assert m["functionality"] == round(2 / 3, 6)


def test_triple_confidence_noisy_or(spark):
    rows = [
        ("t1", "room", "attic", "room", "attic", 0.5),
        ("t1", "room", "attic", "room", "attic", 0.5),
        ("t2", "room", "attic", "room", "attic", 1.0),
        ("t3", "room", "attic", "room", "attic", 0.2),
    ]
    got = {r["subj"]: r for r in
           triple_confidence(_triples(spark, rows)).collect()}
    # two independent 0.5s corroborate to 0.75
    assert got["t1"]["n_assertions"] == 2
    assert got["t1"]["confidence"] == 0.75
    # p = 1.0 stays 1.0 through the 1e-12 clamp
    assert got["t2"]["confidence"] == 1.0
    assert got["t3"]["confidence"] == 0.2


def _mention_rows(values, entity="beverage"):
    return [(f"t{i}", "slot", v, entity, v, 1.0)
            for i, v in enumerate(values)]


def test_resolution_merges_and_normalizes(spark):
    # "expresso" (distance 1) and "Green-Tea" (normalizes to
    # "green tea") merge; "coffee" stays its own cluster
    rows = _mention_rows(["espresso", "expresso", "green tea",
                          "Green-Tea", "coffee"])
    got = {r["raw_value"]: r["canonical_value"] for r in
           resolve_entity_mentions(_triples(spark, rows)).collect()}
    assert got["expresso"] == "espresso"
    assert got["espresso"] == "espresso"
    # canonical is the lexicographic min RAW form in the cluster
    assert got["green tea"] == "Green-Tea"
    assert got["Green-Tea"] == "Green-Tea"
    assert got["coffee"] == "coffee"


def test_resolution_transitive_chain(spark):
    # aaaa ~ aaab ~ aabb chain: a~c is distance 2 (no direct edge) but
    # the component closure still merges all three
    rows = _mention_rows(["aaaa", "aaab", "aabb"])
    got = {r["raw_value"]: r["canonical_value"] for r in
           resolve_entity_mentions(_triples(spark, rows)).collect()}
    assert set(got.values()) == {"aaaa"}


def test_resolution_respects_entity_type_and_builtin(spark):
    rows = (_mention_rows(["lounge"], entity="room")
            + _mention_rows(["lounge"], entity="venue")
            + _mention_rows(["1832", "1032"], entity="snips/number"))
    out = resolve_entity_mentions(_triples(spark, rows))
    got = {(r["entity"], r["raw_value"]): r["canonical_value"]
           for r in out.collect()}
    # same surface form in two entity types never merges across types
    assert got[("room", "lounge")] == "lounge"
    assert got[("venue", "lounge")] == "lounge"
    # builtin values are excluded entirely (grammar-resolved facts)
    assert not [k for k in got if k[0] == "snips/number"]


def test_negative_samples_contract(spark):
    rows = [("t%d" % i, "room", v, "room", v, 1.0)
            for i, v in enumerate(["attic", "lounge", "kitchen"])]
    rows += [("t9", "single", "only", "e", "only", 1.0)]
    out = negative_samples(_triples(spark, rows), n_neg=2).collect()
    # the single-object predicate has nothing to corrupt
    assert not [r for r in out if r["pred"] == "single"]
    assert len(out) == 3 * 2
    for r in out:
        assert r["neg_obj"] != r["obj"]
        assert r["neg_obj"] in {"attic", "lounge", "kitchen"}
    # deterministic across runs
    again = negative_samples(_triples(spark, rows), n_neg=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_negative_samples_two_object_pool_wraps(spark):
    # n_obj = 2: only one corruptible object -> both draws repeat it
    rows = [("t1", "room", "attic", "room", "attic", 1.0),
            ("t2", "room", "lounge", "room", "lounge", 1.0)]
    out = negative_samples(_triples(spark, rows), n_neg=2).collect()
    by_pos = {}
    for r in out:
        by_pos.setdefault(r["obj"], set()).add(r["neg_obj"])
    assert by_pos == {"attic": {"lounge"}, "lounge": {"attic"}}


def test_bucketed_dense_index_equals_global_rank(spark):
    df = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.md5(F.col("id").cast("string")).alias("_ord"))
    got = bucketed_dense_index(df, ["grp"], "_ord", "idx").collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], []).append((r["_ord"], r["idx"]))
    for rows in by_grp.values():
        rows.sort()
        assert [i for _, i in rows] == list(range(len(rows)))


def test_bucketed_dense_index_no_monolithic_window(spark):
    # the only window partitions include the md5-prefix bucket column,
    # so no single task ever ranks a whole group
    df = spark.range(100).select(
        F.lit("g").alias("grp"),
        F.md5(F.col("id").cast("string")).alias("_ord"))
    plan = bucketed_dense_index(
        df, ["grp"], "_ord", "idx")._jdf.queryExecution() \
        .executedPlan().toString()
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "_bkt" in line


def test_stratified_split_exact_fractions(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 2).cast("string"))
        .alias("source"), F.lit("x").alias("text"))
    out = stratified_split(docs).collect()
    assert len(out) == 200
    for src in ("src0", "src1"):
        counts = {}
        for r in out:
            if r["source"] == src:
                counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert counts == {"train": 80, "val": 10, "test": 10}
    # deterministic
    again = stratified_split(docs).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_transe_trainer_deterministic():
    import numpy as np

    from snips_nlu_spark.spark.kg_embed import train_transe

    facts = [(f"s{i}", "p", f"o{i % 4}") for i in range(20)]
    e1, r1 = train_transe(facts, epochs=50)
    e2, r2 = train_transe(facts, epochs=50)
    assert sorted(e1) == sorted(e2) and sorted(r1) == sorted(r2)
    for k in e1:
        assert np.array_equal(e1[k], e2[k])
    for k in r1:
        assert np.array_equal(r1[k], r2[k])
    # entity rows come out unit-normalized (the paper's constraint)
    for k in e1:
        assert abs(float(np.linalg.norm(e1[k])) - 1.0) < 1e-9


def test_transe_ranks_memorize_planted_kg(spark):
    """Transductive memorization: every subject asserts one object per
    predicate out of a 6-value pool; after training, the true object
    must rank far above random (random MRR over a 6-object filtered
    pool is ~0.41)."""
    from snips_nlu_spark.spark.kg_embed import (link_prediction_eval,
                                                link_prediction_ranks)

    rows = []
    for i in range(30):
        rows.append((f"c{i}", i, f"t{i}", "color", f"col{i % 6}",
                     "color", 0, 1, f"col{i % 6}", 1.0))
        rows.append((f"c{i}", i, f"t{i}", "room", f"rm{(i * 7) % 6}",
                     "room", 0, 1, f"rm{(i * 7) % 6}", 1.0))
    t = spark.createDataFrame(rows, SCHEMA)
    ranks = link_prediction_ranks(t, n_neg=10)
    got = ranks.collect()
    assert len(got) == 60
    assert all(1 <= r["transe_rank"] <= r["n_candidates"] + 1
               for r in got)
    ev = {r["pred"]: r for r in
          link_prediction_eval(ranks).collect()}
    assert ev["color"]["n_facts"] == 30
    assert ev["color"]["mrr"] > 0.8
    assert ev["room"]["mrr"] > 0.8
    # rollup consistency with the rank table
    mrr = round(sum(1.0 / r["transe_rank"] for r in got
                    if r["pred"] == "color") / 30, 6)
    assert abs(ev["color"]["mrr"] - mrr) < 1e-9


def test_transe_scores_prefer_true_facts(spark):
    """transe_dist of a trained fact beats the distance of a corrupted
    variant for most facts (margin-ranking objective)."""
    from snips_nlu_spark.spark.kg_embed import (train_transe,
                                                transe_score_triples)

    rows = [(f"c{i}", i, f"t{i}", "color", f"col{i % 4}", "color",
             0, 1, None, 1.0) for i in range(24)]
    t = spark.createDataFrame(rows, SCHEMA)
    scored = {(r["subj"], r["obj"]): r["transe_dist"]
              for r in transe_score_triples(t).collect()}
    assert len(scored) == 24
    ent, rel = train_transe(
        sorted({(f"t{i}", "color", f"col{i % 4}") for i in range(24)}))
    import numpy as np
    wins = 0
    for i in range(24):
        true_o, wrong_o = f"col{i % 4}", f"col{(i + 1) % 4}"
        d_true = float(((ent[f"t{i}"] + rel["color"]
                         - ent[true_o]) ** 2).sum())
        d_wrong = float(((ent[f"t{i}"] + rel["color"]
                          - ent[wrong_o]) ** 2).sum())
        assert abs(round(d_true, 6)
                   - scored[(f"t{i}", true_o)]) < 1e-5
        wins += d_true < d_wrong
    assert wins >= 20


def test_fact_validity_windows(spark):
    import datetime as dt

    from snips_nlu_spark.spark.kg import fact_validity

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = [
        ("c0", 0, "c0:0", "room", "attic", "room", 0, 1, "attic", 1.0),
        ("c0", 1, "c0:1", "room", "attic", "room", 0, 1, "attic", 1.0),
        ("c1", 0, "c1:0", "room", "attic", "room", 0, 1, "attic", 1.0),
        ("c1", 0, "c1:0", "intent", "book", None, None, None, None, 1.0),
    ]
    t = spark.createDataFrame(rows, SCHEMA)
    turns = spark.createDataFrame(
        [("c0", 0, t0), ("c0", 1, t0 + dt.timedelta(seconds=45)),
         ("c1", 0, t0 + dt.timedelta(minutes=11))],
        "conv_id string, turn_idx int, ts timestamp")
    got = {(r["pred"], r["obj"]): r
           for r in fact_validity(t, turns).collect()}
    attic = got[("room", "attic")]
    assert (attic["n_obs"], attic["n_convs"]) == (3, 2)
    assert attic["first_seen"] == t0
    assert attic["last_seen"] == t0 + dt.timedelta(minutes=11)
    intent = got[("intent", "book")]
    assert intent["entity"] is None
    assert (intent["n_obs"], intent["n_convs"]) == (1, 1)


def test_train_bpe_hand_corpus(spark):
    from snips_nlu_spark.functions.text import train_bpe

    docs = spark.createDataFrame(
        [(0, "aaab aaab", "s"), (1, "aaab", "s")],
        "doc_id long, text string, source string")
    # types: "aaab" (x3 across both docs), " aaab" (x1 -> pruned by
    # min_count=2). merge 0: (a,a) freq 6. "aaab" -> [aa,a,b]; now
    # (aa,a) and (a,b) tie at 3 -> lexicographic min ('a','b') wins
    # (tuple order: 'a' < 'aa'). "aaab" -> [aa,ab]; merge 2 (aa,ab).
    got = [(r["rank"], r["left"], r["right"])
           for r in train_bpe(docs, n_merges=10).collect()]
    got.sort()
    assert got == [(0, "a", "a"), (1, "a", "b"), (2, "aa", "ab")]


def test_train_bpe_matches_pandas_replay(spark):
    import re
    from collections import Counter

    from snips_nlu_spark.functions.text import (BPE_SPLIT_RE,
                                                bpe_train_merges,
                                                train_bpe)

    texts = ["spark window merge table", "window table spark spark",
             "merge the big table now", "now now window"]
    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string")
    spark_merges = [(r["rank"], r["left"], r["right"])
                    for r in train_bpe(docs, n_merges=20).collect()]
    spark_merges.sort()
    pat = re.compile(BPE_SPLIT_RE)
    freqs: Counter = Counter()
    for t in texts:
        freqs.update(m.group(0) for m in pat.finditer(t))
    expect = bpe_train_merges(
        {w: c for w, c in freqs.items() if c >= 2}, 20)
    assert spark_merges == [(i, a, b)
                            for i, (a, b) in enumerate(expect)]


def test_trained_langid_classifies_pack_sentences(spark):
    from snips_nlu_spark.functions.langid import (LANGID_LANGS,
                                                  trained_language_scores)
    from snips_nlu_spark.resources import get_resources

    rows, expected = [], {}
    i = 0
    for lang in LANGID_LANGS:
        noise = get_resources(lang)["noise"]
        for j in (0, 10, 30):
            text = " ".join(noise[j:j + 8])
            rows.append((i, text, "s"))
            expected[i] = lang
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    got = {r["doc_id"]: r["lang_pred"]
           for r in trained_language_scores(docs).collect()}
    acc = sum(got[k] == v for k, v in expected.items()) / len(expected)
    # noise words overlap with the training vocab, so accuracy should
    # be near-perfect; allow a couple of cognate confusions (es/pt/it)
    assert acc >= 0.85, (acc, {k: (got[k], expected[k])
                               for k in expected if got[k] != expected[k]})
    # CJK scripts are unambiguous
    for k, v in expected.items():
        if v in ("ja", "ko"):
            assert got[k] == v


def test_trained_langid_edges(spark):
    from snips_nlu_spark.functions.langid import trained_language_scores

    docs = spark.createDataFrame(
        [(0, "", "s"), (1, "x", "s"), (2, "der die und das ist", "s")],
        "doc_id long, text string, source string")
    got = {r["doc_id"]: r for r in
           trained_language_scores(docs).collect()}
    assert got[0]["lang_pred"] == "und" and got[0]["n_grams"] == 0
    assert got[1]["lang_pred"] == "und"
    assert got[2]["lang_pred"] == "de"
    again = {r["doc_id"]: r["lang_pred"] for r in
             trained_language_scores(docs).collect()}
    assert again == {k: v["lang_pred"] for k, v in got.items()}


def test_cardinality_violations_hand_fixture(spark):
    from snips_nlu_spark.spark.kg import cardinality_violations

    # pred "d": 24 clean single-valued subjects + 1 violator (t0
    # asserts two values); pred "rare": multi-valued but only 2
    # subjects -> below min_support, never reported
    rows = [(f"t{i}", "d", f"v{i}", "e", None, 1.0) for i in range(25)]
    rows += [("t0", "d", "OTHER", "e", None, 1.0)]
    rows += [("r1", "rare", "a", "e", None, 1.0),
             ("r1", "rare", "b", "e", None, 1.0),
             ("r2", "rare", "c", "e", None, 1.0)]
    out = cardinality_violations(_triples(spark, rows),
                                 min_support=20).collect()
    assert len(out) == 1
    v = out[0]
    assert (v["pred"], v["subj"], v["n_objs"]) == ("d", "t0", 2)
    assert v["objs"] == "OTHER|v0"


def test_chunk_documents_windows(spark):
    from snips_nlu_spark.functions.text import chunk_documents

    texts = {
        0: " ".join(f"w{i}" for i in range(10)),   # one short chunk
        1: " ".join(f"w{i}" for i in range(100)),  # 2 chunks @64/16
        2: "",                                     # no rows
        3: " ".join(f"w{i}" for i in range(64)),   # exactly one window
    }
    docs = spark.createDataFrame(
        [(k, v, "s") for k, v in texts.items()],
        "doc_id long, text string, source string")
    got = {}
    for r in chunk_documents(docs, chunk_tokens=64,
                             overlap=16).collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert 2 not in got
    assert [c["n_chunk_tokens"] for c in sorted(
        got[0], key=lambda c: c["chunk_idx"])] == [10]
    assert [c["n_chunk_tokens"] for c in sorted(
        got[3], key=lambda c: c["chunk_idx"])] == [64]
    c1 = sorted(got[1], key=lambda c: c["chunk_idx"])
    assert [c["n_chunk_tokens"] for c in c1] == [64, 52]
    # the second window starts at the stride boundary (48), repeating
    # the 16-token overlap
    assert c1[0]["chunk_text"].split()[48:] == \
        c1[1]["chunk_text"].split()[:16]
    assert c1[1]["chunk_text"].split()[0] == "w48"


def test_cross_corpus_dup_pairs(spark):
    from snips_nlu_spark.functions.dedup import cross_corpus_dup_pairs

    mk = "the quick brown fox jumps over the lazy dog tonight"
    new = spark.createDataFrame(
        [(1, mk, "s"),                               # dup of ref 100
         (2, "completely different words here folks nothing", "s"),
         (100, mk + " again", "s")],                 # id collides w/ ref
        "doc_id long, text string, source string")
    ref = spark.createDataFrame(
        [(100, mk, "s"),
         (200, "unrelated reference text goes right here now", "s")],
        "doc_id long, text string, source string")
    got = {(r["doc_id"], r["ref_doc_id"]): r["jaccard"]
           for r in cross_corpus_dup_pairs(new, ref).collect()}
    assert (1, 100) in got and got[(1, 100)] == 1.0
    # id spaces are independent: new 100 vs ref 100 is a valid pair
    assert (100, 100) in got
    assert not [k for k in got if k[0] == 2]


def test_entity_distances_hand_graph(spark):
    from snips_nlu_spark.spark.graph import entity_distances

    # t1 pairs locality L with A; t2 pairs A with B; C isolated;
    # L2 is a locality that co-occurs with nothing (distance 0 still)
    rows = [
        ("t1", "destination", "paris", "locality", "paris", 1.0),
        ("t1", "slot", "A", "e", None, 1.0),
        ("t2", "slot", "A", "e", None, 1.0),
        ("t2", "slot", "B", "e", None, 1.0),
        ("t3", "slot", "C", "e", None, 1.0),
        ("t4", "destination", "rome", "locality", "rome", 1.0),
    ]
    got = {r["node"]: r["distance"] for r in
           entity_distances(_triples(spark, rows)).collect()}
    assert got["locality|paris"] == 0
    assert got["locality|rome"] == 0      # isolated source still at 0
    assert got["e|A"] == 1
    assert got["e|B"] == 2
    assert "e|C" not in got               # disconnected

    # max_hops bound: B drops out at max_hops=1
    got1 = {r["node"]: r["distance"] for r in
            entity_distances(_triples(spark, rows),
                             max_hops=1).collect()}
    assert "e|B" not in got1 and got1["e|A"] == 1


def test_value_link_prediction_generalizes(spark):
    """Planted bipartite structure: colors 0-4 co-occur ONLY with rooms
    0-4, colors 5-9 only with rooms 5-9, across many turns. The
    held-out 20% of pairs was never trained on, yet ranking the true
    room against corruptions must beat the random baseline decisively
    (the corruption pool spans both blocks)."""
    from snips_nlu_spark.spark.kg_embed import (
        link_prediction_eval, value_cooccurrence_facts,
        value_link_prediction_ranks)

    rows, t = [], 0
    for block in (0, 1):
        for c in range(5):
            for r in range(5):
                for rep in range(2):   # each pair seen in 2 turns
                    turn = f"t{t}"
                    t += 1
                    rows.append(("c0", 0, turn, "color",
                                 f"col{block * 5 + c}", "color",
                                 0, 1, None, 1.0))
                    rows.append(("c0", 0, turn, "room",
                                 f"rm{block * 5 + r}", "room",
                                 0, 1, None, 1.0))
    triples = _triples_kg(spark, rows)
    facts = value_cooccurrence_facts(triples)
    assert facts.count() == 50  # 2 blocks x 25 distinct pairs
    ranks = value_link_prediction_ranks(triples, n_neg=10)
    got = ranks.collect()
    assert len(got) >= 5  # ~20% of 50 held out
    # every in-block room co-occurs with the SAME color set, so the 5
    # in-block candidates are mutually symmetric and the held-out rank
    # is ~uniform within them — the LEARNABLE signal is out-block
    # exclusion, so hits@5 (top half of the 10-candidate pool) is the
    # right statistic: random = 0.5, the trained model must clear 0.8
    # (12+/14 at p<0.01 under the null)
    hits5 = sum(r["transe_rank"] <= 5 for r in got) / len(got)
    assert hits5 >= 0.8, (hits5,
                          sorted((r["transe_rank"], r["n_candidates"])
                                 for r in got))
    # the eval rollup is consistent with the rank table
    ev = link_prediction_eval(ranks).collect()
    assert sum(r["n_facts"] for r in ev) == len(got)


def _triples_kg(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_merge_fact_batches_composes_noisy_or(spark):
    from snips_nlu_spark.spark.kg import (merge_fact_batches,
                                          triple_confidence)

    batch1 = _triples(spark, [
        ("t1", "room", "attic", "room", "attic", 0.5),
        ("t2", "room", "attic", "room", "attic", 0.4),  # only batch 1
    ])
    batch2 = _triples(spark, [
        ("t1", "room", "attic", "room", "attic", 0.5),
        ("t3", "room", "attic", "room", "attic", 0.9),  # only batch 2
    ])
    merged = {r["subj"]: r for r in merge_fact_batches(
        triple_confidence(batch1), batch2).collect()}
    # both-sides fact: noisy-OR composes associatively —
    # 1 - (1-0.5)(1-0.5) = 0.75, identical to re-fusing the union
    assert merged["t1"]["n_assertions"] == 2
    assert merged["t1"]["confidence"] == 0.75
    # one-sided facts pass through
    assert merged["t2"]["n_assertions"] == 1
    assert merged["t2"]["confidence"] == 0.4
    assert merged["t3"]["confidence"] == 0.9
    assert merged["t3"]["max_proba"] == 0.9
    # associativity vs re-fusing everything at once (6-dp storage)
    union = _triples(spark, [
        ("t1", "room", "attic", "room", "attic", 0.5),
        ("t2", "room", "attic", "room", "attic", 0.4),
        ("t1", "room", "attic", "room", "attic", 0.5),
        ("t3", "room", "attic", "room", "attic", 0.9),
    ])
    refused = {r["subj"]: r["confidence"]
               for r in triple_confidence(union).collect()}
    for k, v in refused.items():
        assert abs(merged[k]["confidence"] - v) < 2e-6


def test_distmult_memorizes_and_is_deterministic(spark):
    import numpy as np

    from snips_nlu_spark.spark.kg_embed import (
        distmult_link_prediction_ranks, link_prediction_eval,
        train_distmult)

    facts = sorted({(f"t{i}", "color", f"col{i % 6}")
                    for i in range(30)}
                   | {(f"t{i}", "room", f"rm{(i * 7) % 6}")
                      for i in range(30)})
    e1, r1 = train_distmult(facts, epochs=50)
    e2, r2 = train_distmult(facts, epochs=50)
    for k in e1:
        assert np.array_equal(e1[k], e2[k])
    for k in r1:
        assert np.array_equal(r1[k], r2[k])

    rows = []
    for i in range(30):
        rows.append(("c0", i, f"t{i}", "color", f"col{i % 6}", "color",
                     0, 1, None, 1.0))
        rows.append(("c0", i, f"t{i}", "room", f"rm{(i * 7) % 6}",
                     "room", 0, 1, None, 1.0))
    t = spark.createDataFrame(rows, SCHEMA)
    ranks = distmult_link_prediction_ranks(t, n_neg=10)
    got = ranks.collect()
    assert len(got) == 60
    assert all(1 <= r["transe_rank"] <= r["n_candidates"] + 1
               for r in got)
    ev = {r["pred"]: r for r in link_prediction_eval(ranks).collect()}
    # DistMult memorizes the planted KG essentially perfectly
    assert ev["color"]["mrr"] > 0.9
    assert ev["room"]["mrr"] > 0.9


def test_chunk_documents_reconstruction_sweep(spark):
    """Structural properties over a size sweep: chunk k starts at the
    stride boundary, every chunk except the last is full-width, and
    stitching chunk 0 + each later chunk's post-overlap tail exactly
    reconstructs the token sequence."""
    from snips_nlu_spark.functions.text import chunk_documents

    chunk, overlap = 64, 16
    stride = chunk - overlap
    docs = spark.createDataFrame(
        [(n, " ".join(f"w{n}_{i}" for i in range(n)), "s")
         for n in range(0, 200, 7)],
        "doc_id long, text string, source string")
    by_doc = {}
    for r in chunk_documents(docs, chunk_tokens=chunk,
                             overlap=overlap).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc  # empty doc -> no rows
    for n, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        toks = []
        for k, r in enumerate(rows):
            words = r["chunk_text"].split()
            assert r["n_chunk_tokens"] == len(words)
            if k < len(rows) - 1:
                assert len(words) == chunk
            assert words[0] == f"w{n}_{k * stride}"
            toks.extend(words if k == 0 else words[overlap:])
        assert toks == [f"w{n}_{i}" for i in range(n)]


def test_funnel_cohorts_are_nested(spark):
    """Each funnel step's cohort is a subset of the previous one —
    n_users is non-increasing in step_idx for ANY input, windowed or
    not."""
    import datetime as dt

    from snips_nlu_spark.functions.temporal import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    types = ["signup", "view", "click", "purchase"]
    rows = [(i, t0 + dt.timedelta(seconds=(i * 37) % 501),
             i % 20, types[(i * 13) % 4], 0.0, "{}")
            for i in range(300)]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    for window in (None, 120):
        got = sorted(
            ((r["step_idx"], r["n_users"]) for r in
             funnel_counts(events, types,
                           within_seconds=window).collect()))
        assert [s for s, _ in got] == [0, 1, 2, 3]
        counts = [n for _, n in got]
        assert all(a >= b for a, b in zip(counts, counts[1:])), got
        assert counts[0] > 0


def test_complex_memorizes_and_handles_asymmetry(spark):
    import numpy as np

    from snips_nlu_spark.spark.kg_embed import (
        complex_link_prediction_ranks, link_prediction_eval,
        train_complex)

    # determinism
    facts = sorted({(f"t{i}", "color", f"col{i % 6}")
                    for i in range(30)})
    e1, r1 = train_complex(facts, epochs=50)
    e2, r2 = train_complex(facts, epochs=50)
    for k in e1:
        assert np.array_equal(e1[k], e2[k])

    # ComplEx scores ASYMMETRIC relations: score(a, p, b) need not
    # equal score(b, p, a) — the property DistMult lacks
    ent, rel = train_complex(
        [("a", "follows", "b"), ("b", "follows", "c"),
         ("c", "follows", "a")], epochs=100)
    d = len(rel["follows"]) // 2

    def sc(s, o):
        es, rp, eo = ent[s], rel["follows"], ent[o]
        acc = 0.0
        for k in range(d):
            a_ = es[k] * rp[k] - es[d + k] * rp[d + k]
            b_ = es[k] * rp[d + k] + es[d + k] * rp[k]
            acc += a_ * eo[k] + b_ * eo[d + k]
        return acc
    assert sc("a", "b") > sc("b", "a")

    # planted-KG memorization through the full Spark rank pipeline
    rows = []
    for i in range(30):
        rows.append(("c0", i, f"t{i}", "color", f"col{i % 6}", "color",
                     0, 1, None, 1.0))
        rows.append(("c0", i, f"t{i}", "room", f"rm{(i * 7) % 6}",
                     "room", 0, 1, None, 1.0))
    t = spark.createDataFrame(rows, SCHEMA)
    ev = {r["pred"]: r for r in link_prediction_eval(
        complex_link_prediction_ranks(t, n_neg=10)).collect()}
    assert ev["color"]["mrr"] > 0.9
    assert ev["room"]["mrr"] > 0.9

"""Hand-computed fixtures for the round-5 training-pipeline additions:
exact-substring duplicate spans (Lee et al. 2021 window form), DSIR
importance resampling (Xie et al. 2023), and entity triangle counting /
local clustering over the co-occurrence graph."""

import pyspark.sql.functions as F

from snips_nlu_spark.functions.dedup import substring_dup_spans
from snips_nlu_spark.functions.sampling import dsir_importance_weights
from snips_nlu_spark.spark.graph import entity_triangles


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")


def test_substring_dup_spans_hand_fixture(spark):
    # window=3: "a b c" is shared between docs 1 and 2; "p q r" repeats
    # WITHIN doc 4 (both occurrences count); doc 3 is clean.
    docs = _docs(spark, [
        (1, "a b c d e", "s"),
        (2, "x y a b c q", "s"),
        (3, "unique tokens only here", "s"),
        (4, "p q r p q r", "s"),
    ])
    got = {r["doc_id"]: r for r in
           substring_dup_spans(docs, window=3).collect()}
    # doc 1: window "a b c" dup'd -> positions 0..2 covered, 3/5 chars
    assert got[1]["n_dup_windows"] == 1
    assert got[1]["dup_substring_char_frac"] == 0.6
    assert got[1]["has_corpus_dup"]
    # doc 2: same window at positions 2..4 -> 3/6 chars
    assert got[2]["n_dup_windows"] == 1
    assert got[2]["dup_substring_char_frac"] == 0.5
    # doc 3: clean
    assert got[3]["n_dup_windows"] == 0
    assert got[3]["dup_substring_char_frac"] == 0.0
    assert not got[3]["has_corpus_dup"]
    # doc 4: "p q r" occurs twice inside the doc -> both occurrences
    # are dup windows, coverage union spans every token
    assert got[4]["n_dup_windows"] == 2
    assert got[4]["dup_substring_char_frac"] == 1.0


def test_substring_dup_spans_short_docs_unflagged(spark):
    # docs shorter than the window produce no windows at all
    docs = _docs(spark, [(1, "too short", "s"), (2, "too short", "s")])
    rows = substring_dup_spans(docs, window=5).collect()
    assert all(r["n_dup_windows"] == 0 for r in rows)
    assert all(r["dup_substring_char_frac"] == 0.0 for r in rows)


def test_dsir_separates_planted_vocabulary_shift(spark):
    # target sources speak {alpha, beta}, the rest {gamma, delta}: every
    # target doc must out-score every non-target doc on the per-gram
    # average, and n_grams = unigrams + bigrams = n + (n-1)
    rows = ([(i, "alpha beta alpha beta", "tgt") for i in range(8)]
            + [(100 + i, "gamma delta gamma delta", "raw")
               for i in range(8)])
    docs = _docs(spark, rows)
    out = dsir_importance_weights(docs, ["tgt"], threshold=0.0)
    got = {r["doc_id"]: r for r in out.collect()}
    assert all(got[i]["n_grams"] == 4 + 3 for i in got)
    worst_target = min(got[i]["dsir_avg_logweight"] for i in range(8))
    best_raw = max(got[100 + i]["dsir_avg_logweight"] for i in range(8))
    assert worst_target > best_raw
    assert all(got[i]["selected"] for i in range(8))
    assert not any(got[100 + i]["selected"] for i in range(8))


def test_dsir_deterministic_and_empty_doc_unselected(spark):
    docs = _docs(spark, [(1, "alpha beta", "tgt"), (2, "", "raw"),
                         (3, "gamma delta", "raw")])
    a = sorted(dsir_importance_weights(docs, ["tgt"]).collect())
    b = sorted(dsir_importance_weights(docs, ["tgt"]).collect())
    assert a == b
    got = {r["doc_id"]: r for r in a}
    assert got[2]["n_grams"] == 0
    assert got[2]["dsir_logweight"] == 0.0
    assert not got[2]["selected"]


def _triples_frame(spark, turn_values):
    # turn_values: {turn: [value, ...]} -> slot triples (entity "e")
    rows = [(t, "slot", "e", v) for t, vs in turn_values.items()
            for v in vs]
    return spark.createDataFrame(
        rows, "subj string, pred string, entity string, obj string")


def test_entity_triangles_hand_graph(spark):
    # turn t1 co-occurs {A,B,C} (a triangle), t2 {A,D} (a pendant edge)
    tri = entity_triangles(_triples_frame(
        spark, {"t1": ["A", "B", "C"], "t2": ["A", "D"]}))
    got = {r["node"]: r for r in tri.collect()}
    assert got["e|A"]["degree"] == 3 and got["e|A"]["triangles"] == 1
    assert got["e|A"]["clustering"] == 0.333333
    for n in ("e|B", "e|C"):
        assert got[n]["degree"] == 2 and got[n]["triangles"] == 1
        assert got[n]["clustering"] == 1.0
    assert got["e|D"]["degree"] == 1 and got["e|D"]["triangles"] == 0
    assert got["e|D"]["clustering"] == 0.0


def test_entity_triangles_counts_each_triangle_once(spark):
    # K4 in one turn: C(4,3)=4 triangles; every node sits in 3 of them,
    # degree 3, clustering 2*3/(3*2) = 1.0
    tri = entity_triangles(_triples_frame(
        spark, {"t1": ["A", "B", "C", "D"]}))
    rows = tri.collect()
    assert len(rows) == 4
    assert all(r["degree"] == 3 and r["triangles"] == 3
               and r["clustering"] == 1.0 for r in rows)
    total = tri.agg(F.sum("triangles")).collect()[0][0]
    assert total == 3 * 4  # 4 triangles x 3 corners


def test_intent_triples_do_not_enter_cooccurrence_graph(spark):
    rows = [("t1", "intent", "", "bookFlight"),
            ("t1", "slot", "e", "A"), ("t1", "slot", "e", "B")]
    df = spark.createDataFrame(
        rows, "subj string, pred string, entity string, obj string")
    got = {r["node"] for r in entity_triangles(df).collect()}
    assert got == {"e|A", "e|B"}


from datetime import datetime


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double")


def _t(s):
    return datetime.fromisoformat(s)


def test_asof_join_backward_inclusive_with_ties_and_tolerance(spark):
    from snips_nlu_spark.functions.temporal import asof_join
    left = _events(spark, [
        (1, 100, _t("2024-01-01 10:00:00"), 5.0),   # ties with r 12 @10:00
        (1, 101, _t("2024-01-01 12:00:00"), 6.0),   # matches r 12
        (2, 200, _t("2024-01-01 09:00:00"), 7.0),   # no preceding right
        (3, 300, _t("2024-01-01 10:00:00"), 8.0),   # two rights same ts
    ])
    right = _events(spark, [
        (1, 11, _t("2024-01-01 09:30:00"), 1.0),
        (1, 12, _t("2024-01-01 10:00:00"), 2.0),
        (3, 31, _t("2024-01-01 09:00:00"), 3.0),
        (3, 32, _t("2024-01-01 09:00:00"), 4.0),    # same ts, higher key
    ])
    got = {r["event_id"]: r for r in asof_join(
        left, right, by=["user_id"], payload=["value"]).collect()}
    assert len(got) == 4
    # inclusive: equal timestamps match (and beat the older row)
    assert got[100]["right_event_id"] == 12 and got[100]["lag_s"] == 0.0
    assert got[101]["right_event_id"] == 12
    assert got[101]["lag_s"] == 7200.0
    assert got[101]["right_value"] == 2.0
    # no preceding right -> NULL match
    assert got[200]["right_event_id"] is None and got[200]["lag_s"] is None
    # deterministic tie-break: highest key at equal ts wins
    assert got[300]["right_event_id"] == 32
    # tolerance: the 2h-old match for 101 is dropped, 100 stays
    tol = {r["event_id"]: r for r in asof_join(
        left, right, by=["user_id"], payload=["value"],
        tolerance_s=1800).collect()}
    assert tol[101]["right_event_id"] is None
    assert tol[100]["right_event_id"] == 12


def test_asof_join_left_columns_survive(spark):
    from snips_nlu_spark.functions.temporal import asof_join
    left = _events(spark, [(1, 100, _t("2024-01-01 10:00:00"), 5.0)])
    right = _events(spark, [(1, 11, _t("2024-01-01 09:00:00"), 1.0)])
    row = asof_join(left, right, by=["user_id"]).collect()[0]
    assert row["value"] == 5.0 and row["user_id"] == 1
    assert row["right_event_id"] == 11


def test_range_join_containment_and_multibucket_intervals(spark):
    from pyspark.sql import functions as F
    from snips_nlu_spark.functions.temporal import range_join
    left = _events(spark, [
        (1, 100, _t("2024-01-01 10:00:00"), 0.0),  # inside
        (1, 101, _t("2024-01-01 11:00:00"), 0.0),  # boundary end: inside
        (1, 102, _t("2024-01-01 11:00:01"), 0.0),  # just outside
        (2, 200, _t("2024-01-01 10:30:00"), 0.0),  # wrong user
    ])
    right = spark.createDataFrame(
        [(1, 9, _t("2024-01-01 09:00:00"), _t("2024-01-01 11:00:00"))],
        "user_id long, interval_id long, start_ts timestamp, "
        "end_ts timestamp")
    # bucket 900s: the 2h interval spans 9 buckets (explode fan-out)
    got = range_join(left, right, by=["user_id"], bucket_s=900)
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [100, 101]
    assert "_bucket" not in got.columns
    # every bucket width must give identical matches
    for b in (60, 3600, 86400):
        alt = range_join(left, right, by=["user_id"], bucket_s=b)
        assert sorted(r["event_id"] for r in alt.collect()) == ids


def test_tfidf_keywords_hand_fixture(spark):
    from snips_nlu_spark.functions.text import tfidf_keywords
    docs = _docs(spark, [(1, "a a b", "s"), (2, "b c", "s")])
    rows = tfidf_keywords(docs, k=5).collect()
    got = {(r["doc_id"], r["rank"]): r for r in rows}
    # N=2; df: a=1, b=2, c=1; idf = ln((N+1)/(df+1)) + 1
    # doc 1: a -> 2*(ln(1.5)+1)=2.81093, b -> 1*1.0
    assert got[(1, 1)]["word"] == "a" and got[(1, 1)]["tf"] == 2
    assert got[(1, 1)]["score"] == 2.81093
    assert got[(1, 2)]["word"] == "b" and got[(1, 2)]["score"] == 1.0
    # doc 2: c (1.405465) above b (1.0)
    assert got[(2, 1)]["word"] == "c"
    assert got[(2, 1)]["score"] == 1.405465
    assert got[(2, 2)]["word"] == "b"
    assert len(rows) == 4


def test_tfidf_keywords_ties_break_lexicographically(spark):
    from snips_nlu_spark.functions.text import tfidf_keywords
    docs = _docs(spark, [(1, "zeta alpha", "s")])
    rows = sorted(tfidf_keywords(docs, k=2).collect(),
                  key=lambda r: r["rank"])
    assert [r["word"] for r in rows] == ["alpha", "zeta"]


def test_quality_classifier_generalizes_to_holdout(spark):
    from snips_nlu_spark.functions.quality import (
        quality_classifier_scores, synthesize_quality_corpus)
    corpus = synthesize_quality_corpus(spark, 1000)
    scored = quality_classifier_scores(corpus, ["curated"],
                                       sample_n=600)
    j = scored.join(corpus.select("doc_id", "source"), "doc_id")
    # keep must equal the true label EVERYWHERE, including the 400
    # docs the bounded training sample never saw
    wrong = j.filter((F.col("keep") & (F.col("source") != "curated"))
                     | (~F.col("keep")
                        & (F.col("source") == "curated"))).count()
    assert wrong == 0
    holdout = j.filter(F.col("doc_id") >= 600)
    assert holdout.count() == 400


def test_quality_classifier_deterministic(spark):
    from snips_nlu_spark.functions.quality import (
        quality_classifier_scores, synthesize_quality_corpus)
    corpus = synthesize_quality_corpus(spark, 200)
    a = sorted(quality_classifier_scores(
        corpus, ["curated"], sample_n=120).collect())
    b = sorted(quality_classifier_scores(
        corpus, ["curated"], sample_n=120).collect())
    assert a == b


def test_funnel_counts_hand_fixture(spark):
    """First-touch chain semantics: the anchor is the EARLIEST step-1
    event; each later step needs a strictly later event inside the
    window from the anchor."""
    import datetime as dt

    from snips_nlu_spark.functions.temporal import funnel_counts

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, u, typ, sec):
        return (i, t0 + dt.timedelta(seconds=sec), u, typ, 0.0, "{}")

    rows = [
        # u1 completes: signup@0 -> view@10 -> purchase@20
        ev(0, 1, "signup", 0), ev(1, 1, "view", 10),
        ev(2, 1, "purchase", 20),
        # u2: view BEFORE signup only -> stops at signup
        ev(3, 2, "view", 5), ev(4, 2, "signup", 50),
        # u3: view too late (outside the 60s window from anchor)
        ev(5, 3, "signup", 0), ev(6, 3, "view", 100),
        # u4: signup twice; anchor is the FIRST -> purchase@70 is
        # outside the window even though it is within 60s of the
        # second signup (first-touch, not any-touch)
        ev(7, 4, "signup", 0), ev(8, 4, "signup", 30),
        ev(9, 4, "view", 40), ev(10, 4, "purchase", 70),
        # u5 never signs up
        ev(11, 5, "view", 1), ev(12, 5, "purchase", 2),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r["step"]: (r["step_idx"], r["n_users"]) for r in
           funnel_counts(events, ["signup", "view", "purchase"],
                         within_seconds=60).collect()}
    assert got == {"signup": (0, 4), "view": (1, 2),
                   "purchase": (2, 1)}
    # no window: u3 and u4 now convert through view (u2's only view
    # still precedes its signup); u4's purchase@70 follows its chain
    # view@40 -> completes
    got2 = {r["step"]: r["n_users"] for r in
            funnel_counts(events,
                          ["signup", "view", "purchase"]).collect()}
    assert got2 == {"signup": 4, "view": 3, "purchase": 2}


def test_retention_cohorts_hand_fixture(spark):
    import datetime as dt

    from snips_nlu_spark.functions.temporal import retention_cohorts

    d0 = dt.datetime(2024, 1, 1, 12, 0)

    def ev(i, u, typ, days):
        return (i, d0 + dt.timedelta(days=days), u, typ, 0.0, "{}")

    rows = [
        # u1 signs up day 0, active day 0 (signup itself) + day 2
        ev(0, 1, "signup", 0), ev(1, 1, "click", 2),
        # u2 signs up day 0 (second signup day 3 ignored), active day 1
        ev(2, 2, "signup", 0), ev(3, 2, "signup", 3),
        ev(4, 2, "view", 1),
        # u3: pre-signup activity ignored, signs up day 1
        ev(5, 3, "click", 0), ev(6, 3, "signup", 1),
        # u4 never signs up -> not in any cohort
        ev(7, 4, "click", 0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(str(r["cohort_day"]), r["day_offset"]): r["n_active"]
           for r in retention_cohorts(events).collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # u1 + u2 active on their cohort day
        ("2024-01-01", 1): 1,   # u2 view
        ("2024-01-01", 2): 1,   # u1 click
        ("2024-01-01", 3): 1,   # u2's second signup counts as activity
        ("2024-01-02", 0): 1,   # u3 cohort day (pre-signup click gone)
    }

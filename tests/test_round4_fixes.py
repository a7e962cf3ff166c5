"""Round-4 regression pins: single-parse rollups, empty-store builds,
bounded shingle caches, and the datetime trigger gate."""

from pathlib import Path

import pandas as pd
import pytest

from snips_nlu_spark import datagen


@pytest.fixture(scope="module")
def model_json():
    bundle = (Path(__file__).resolve().parent.parent
              / "oracle" / "model_bundle.json")
    return bundle.read_text("utf8")


@pytest.mark.spark
def test_kg_nodes_parses_once_through_cache(spark, model_json):
    """The nodes rollup unions two branches over the deduped triples;
    round 3 re-ran the whole parse stage per branch (VERDICT #3). The
    eager persist in __spark_entry__._deduped makes both branches read
    the SAME InMemoryRelation — parse executes once, cache serves the
    union."""
    from snips_nlu_spark.spark.graph import dedup_triples, nodes_rollup
    from snips_nlu_spark.spark.stages import parse_transcripts

    pdf = datagen.generate_pandas(0, 400)
    df = spark.createDataFrame(pdf)
    deduped = dedup_triples(parse_transcripts(df, model_json)).persist()
    deduped.count()
    plan = (nodes_rollup(deduped)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert plan.count("InMemoryRelation") >= 2, plan
    deduped.unpersist()


@pytest.mark.spark
def test_build_kg_zero_triple_input(spark, model_json, tmp_path):
    """A pending parse yielding ZERO triples must not crash the store
    re-read (round-3 ADVICE: schema inference failed on a part-file-less
    dir; reads now carry an explicit schema)."""
    from snips_nlu_spark.spark.lineage import build_kg

    rows = [{"conv_id": f"c{i}", "turn_idx": 0, "role": "assistant",
             "text": "acknowledged, standing by", "tool": None,
             "ts": pd.Timestamp("2024-01-01 08:00:00")}
            for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    summary = build_kg(spark, df, model_json, str(tmp_path / "kg0"),
                       n_buckets=4)
    assert summary["n_triples"] == 0


@pytest.mark.spark
def test_minhash_shingle_cache_bounded(spark):
    """Repeated minhash calls release the prior call's persisted shingle
    table (round-3 ADVICE: caches accumulated for the session)."""
    from snips_nlu_spark.functions import dedup as dd

    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e g")], ["doc_id", "text"])
    dd.minhash_duplicate_pairs(df, threshold=0.5).count()
    dd.minhash_duplicate_pairs(df, threshold=0.5).count()
    assert len(dd._SHINGLE_CACHE) == 1


def test_datetime_trigger_gate_soundness():
    """The trigger gate skips the grammar walk only for texts that can't
    contain a datetime; tabled words, digit-initial clocks and word
    numbers all still parse."""
    import datetime as dt

    from snips_nlu_spark.entities.builtin import BuiltinEntityParser

    p = BuiltinEntityParser()
    anchor = dt.datetime(2024, 3, 14)
    assert p.parse("acknowledged, standing by req99x",
                   scope=["snips/datetime"], anchor=anchor) == []
    for text in ("at 8pm", "see you tomorrow", "in three weeks",
                 "end of the month", "next christmas"):
        assert p.parse(text, scope=["snips/datetime"], anchor=anchor), text


def test_corpus_unique_fraction():
    """The generated corpus stays ≥30% globally-unique (round-3 VERDICT
    #1: 261 distinct texts at every sf made every repeated-input number
    memo-bound)."""
    texts = [datagen.turn_record(i)["text"] for i in range(20000)]
    assert len(set(texts)) / len(texts) >= 0.30


def test_unique_rows_keep_exact_truth():
    """Unique-row injection preserves exact generation truth: the slot
    spans in expected_user_turn always slice the rendered text to the
    slot value."""
    for i in range(2000):
        truth = datagen.expected_user_turn(i)
        if truth is None:
            continue
        text = datagen.turn_record(i)["text"]
        for s in truth[1]:
            assert text[s["start"]:s["end"]] == s["value"], (i, text, s)


@pytest.mark.spark
def test_iceberg_commit_surface_wiring(spark):
    """The Iceberg surface implements the exact protocol of the local
    one (duck-typed — build_kg takes either) and degrades with a clear
    error when the runtime jar is absent (this sandbox)."""
    from snips_nlu_spark.spark.iceberg import (IcebergCommitSurface,
                                               iceberg_available)
    from snips_nlu_spark.spark.lineage import LocalCommitSurface

    from snips_nlu_spark.spark.iceberg import EmulatedIcebergSurface

    for meth in ("committed_buckets", "publish_commit", "pin_n_buckets",
                 "clear_pending_partitions", "store_exists",
                 "write_triples", "read_triples", "write_lineage",
                 "read_lineage", "write_rollup"):
        assert callable(getattr(IcebergCommitSurface, meth))
        assert callable(getattr(LocalCommitSurface, meth))
        assert callable(getattr(EmulatedIcebergSurface, meth))
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            IcebergCommitSurface(spark, "cat.db.kg")


@pytest.mark.spark
def test_build_kg_resume_detects_appended_input(spark, model_json,
                                                tmp_path):
    """Round-4 append detection: a committed bucket whose input GREW is
    reprocessed on resume (previously resume silently dropped new turns
    in committed buckets); the resumed store converges to the
    single-shot build of the full input."""
    from snips_nlu_spark.spark.lineage import build_kg

    base = datagen.generate_pandas(0, 400)
    extra = datagen.generate_pandas(400, 480)
    full = pd.concat([base, extra], ignore_index=True)
    n_buckets = 4

    inc_dir = tmp_path / "inc"
    build_kg(spark, spark.createDataFrame(base), model_json,
             str(inc_dir), n_buckets=n_buckets)
    summary = build_kg(spark, spark.createDataFrame(full), model_json,
                       str(inc_dir), n_buckets=n_buckets)
    # the appended rows land in already-committed buckets → reprocessed
    assert summary["pending_turns"] > 0

    ss_dir = tmp_path / "single"
    build_kg(spark, spark.createDataFrame(full), model_json,
             str(ss_dir), n_buckets=n_buckets)

    def ledger(d):
        return sorted(
            (r["bucket"], r["n_turns"], r["n_triples"], r["fingerprint"])
            for r in spark.read.parquet(str(d / "lineage")).collect())
    assert ledger(inc_dir) == ledger(ss_dir)


def test_datetime_out_of_range_magnitudes_no_crash():
    """'in 99999999 days' must not overflow datetime — absurd magnitudes
    are not dates and produce no mention (found by adversarial probe)."""
    import datetime as dt

    from snips_nlu_spark.entities.builtin import BuiltinEntityParser

    p = BuiltinEntityParser()
    anchor = dt.datetime(2024, 3, 14)
    for text in ("in 99999999 days", "in 999999999 years",
                 "within the next 99999999 weeks"):
        ms = [m for m in p.parse(text, scope=["snips/datetime"],
                                 anchor=anchor)]
        assert ms == [], (text, ms)
    # sane magnitudes still parse
    assert p.parse("in 3 weeks", scope=["snips/datetime"], anchor=anchor)


@pytest.mark.spark
def test_entity_cooccurrence_edges(spark):
    """Unordered same-turn value pairs, duplicates collapsed, weighted
    by turn count."""
    from snips_nlu_spark.spark.graph import entity_cooccurrence_edges

    rows = [
        # turn 1: berlin + tomorrow (+ a duplicate berlin assertion)
        ("c1", 0, "c1:0", "dest", "berlin", "city", 0, 6, "berlin", 1.0),
        ("c1", 0, "c1:0", "dest", "berlin", "city", 0, 6, "berlin", 1.0),
        ("c1", 0, "c1:0", "when", "tomorrow", "snips/datetime", 10, 18,
         "tomorrow", 1.0),
        ("c1", 0, "c1:0", "intent", "bookFlight", None, None, None, None,
         1.0),
        # turn 2: berlin + tomorrow again
        ("c2", 1, "c2:1", "dest", "berlin", "city", 0, 6, "berlin", 1.0),
        ("c2", 1, "c2:1", "when", "tomorrow", "snips/datetime", 10, 18,
         "tomorrow", 1.0),
        # turn 3: a single slot — no pair
        ("c3", 0, "c3:0", "dest", "oslo", "city", 0, 4, "oslo", 1.0),
    ]
    from snips_nlu_spark.spark.stages import TRIPLE_SCHEMA
    df = spark.createDataFrame(rows, schema=TRIPLE_SCHEMA)
    got = {(r["entity_a"], r["obj_a"], r["entity_b"], r["obj_b"]): r["n"]
           for r in entity_cooccurrence_edges(df).collect()}
    assert got == {("city", "berlin", "snips/datetime", "tomorrow"): 2}


@pytest.mark.spark
def test_build_kg_resume_detects_content_change(spark, model_json,
                                                tmp_path):
    """A COUNT-PRESERVING edit (one turn's text replaced) still
    invalidates its committed bucket: the ledger's input fingerprint
    changes even though n_turns doesn't (round-4 review finding)."""
    from snips_nlu_spark.spark.lineage import build_kg

    base = datagen.generate_pandas(0, 200)
    edited = base.copy()
    # replace one user turn's text — same row count
    edited.loc[0, "text"] = "make me nine cups of espresso"
    n_buckets = 4

    d = tmp_path / "edit"
    build_kg(spark, spark.createDataFrame(base), model_json, str(d),
             n_buckets=n_buckets)
    summary = build_kg(spark, spark.createDataFrame(edited), model_json,
                       str(d), n_buckets=n_buckets)
    assert summary["pending_turns"] > 0  # the edited bucket reprocessed

    ss = tmp_path / "single"
    build_kg(spark, spark.createDataFrame(edited), model_json, str(ss),
             n_buckets=n_buckets)

    def ledger(p):
        return sorted(
            (r["bucket"], r["n_turns"], r["input_fp"], r["n_triples"],
             r["fingerprint"])
            for r in spark.read.parquet(str(p / "lineage")).collect())
    assert ledger(d) == ledger(ss)

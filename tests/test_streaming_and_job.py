"""Structured Streaming parse + spark-submit job entry."""

import json
import subprocess
import sys

import pytest

pytestmark = pytest.mark.spark


def test_streaming_triples_match_batch(spark, tmp_path):
    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.stages import parse_transcripts
    from snips_nlu_spark.spark.streaming import run_stream_to_parquet
    import __spark_entry__ as em

    src = tmp_path / "src"
    pdf = datagen.generate_pandas(0, 300)
    df = spark.createDataFrame(pdf)
    df.coalesce(4).write.parquet(str(src))

    model_json = em._model_json()
    q = run_stream_to_parquet(spark, str(src), model_json,
                              str(tmp_path / "out"),
                              str(tmp_path / "ckpt"), once=True)
    q.awaitTermination(120)

    streamed = {tuple(r) for r in
                spark.read.parquet(str(tmp_path / "out")).collect()}
    batch = {tuple(r) for r in
             parse_transcripts(df, model_json).collect()}
    assert streamed == batch


def test_streaming_dedups_replayed_turns(spark, tmp_path):
    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.streaming import run_stream_to_parquet
    import __spark_entry__ as em

    src = tmp_path / "src2"
    pdf = datagen.generate_pandas(0, 120)
    df = spark.createDataFrame(pdf)
    # write the same rows twice (simulated replay)
    df.coalesce(2).write.mode("append").parquet(str(src))
    df.coalesce(2).write.mode("append").parquet(str(src))

    q = run_stream_to_parquet(spark, str(src), em._model_json(),
                              str(tmp_path / "out2"),
                              str(tmp_path / "ckpt2"), once=True)
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out2"))
    # no duplicated triples despite duplicated input files
    assert out.count() == out.dropDuplicates(
        ["subj", "pred", "obj", "span_start", "span_end"]).count()


def test_streaming_stateful_conversation_rollup(spark, tmp_path):
    """applyInPandasWithState rollup: per-conversation state folded
    across micro-batches must converge to the batch-computed rollup,
    however turns are split across triggers."""
    from pyspark.sql import functions as F
    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.stages import parse_transcripts
    from snips_nlu_spark.spark.streaming import (
        streaming_conversation_rollup, streaming_transcripts)
    import __spark_entry__ as em

    src = tmp_path / "src3"
    pdf = datagen.generate_pandas(0, 240)
    df = spark.createDataFrame(pdf)
    # many small files → several micro-batches, conversations split
    df.repartition(6).write.parquet(str(src))

    rollup = streaming_conversation_rollup(
        streaming_transcripts(spark, str(src), max_files_per_trigger=2),
        em._model_json())
    q = (rollup.writeStream.format("memory").queryName("conv_rollup")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt3"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got_rows = spark.sql("SELECT * FROM conv_rollup").collect()
    # update mode emits one row per (conv, trigger); counts are monotone,
    # so the final state is the max-n_triples row per conversation
    final = {}
    for r in got_rows:
        cur = final.get(r["conv_id"])
        if cur is None or r["n_triples"] > cur["n_triples"]:
            final[r["conv_id"]] = r
    got = {c: (r["n_turns"], r["n_triples"], r["last_turn_idx"],
               r["last_intent"]) for c, r in final.items()}

    triples = parse_transcripts(df, em._model_json()).cache()
    intents = triples.filter(F.col("pred") == "intent")
    last = intents.groupBy("conv_id").agg(
        F.max_by("obj", "turn_idx").alias("last_intent"),
        F.max("turn_idx").alias("last_turn_idx"),
        F.count(F.lit(1)).alias("n_turns"))
    counts = triples.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_triples"))
    want = {r["conv_id"]: (r["n_turns"], r["n_triples"],
                           r["last_turn_idx"], r["last_intent"])
            for r in last.join(counts, "conv_id").collect()}
    triples.unpersist()
    assert got == want


def test_streaming_contextual_intents_match_batch(spark, tmp_path):
    """Stateful carry-over stream ≡ batch window operator when turns
    arrive in order per conversation, however they are split across
    micro-batches (three sequential waves by turn_idx, one file per
    trigger)."""
    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.graph import contextual_intents
    from snips_nlu_spark.spark.stages import parse_transcripts
    from snips_nlu_spark.spark.streaming import (
        streaming_contextual_intents, streaming_transcripts)
    import __spark_entry__ as em

    src = tmp_path / "src_ctx"
    pdf = datagen.generate_pandas(0, 240)
    df = spark.createDataFrame(pdf)
    # sequential waves by turn_idx: per-conversation order is preserved
    # across triggers (file source processes by mtime; writes are
    # sequential so mtimes ascend)
    for lo, hi in ((0, 3), (3, 6), (6, 10_000)):
        wave = df.filter((df.turn_idx >= lo) & (df.turn_idx < hi))
        wave.coalesce(1).write.mode("append").parquet(str(src))

    out = streaming_contextual_intents(
        streaming_transcripts(spark, str(src), max_files_per_trigger=1),
        em._model_json())
    q = (out.writeStream.format("memory").queryName("ctx_intents")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_ctx"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {tuple(r) for r in
           spark.sql("SELECT * FROM ctx_intents").collect()}
    want = {tuple(r) for r in
            contextual_intents(parse_transcripts(df, em._model_json()),
                               df).collect()}
    assert got == want
    assert any(r[4] for r in want)  # fixture exercises carrying


def test_streaming_contextual_intents_out_of_order(spark, tmp_path):
    """Gap-buffered variant: waves arrive REVERSED (later turns first),
    so every conversation's early turns land in a later trigger — the
    reassembly buffer must still reproduce the batch output exactly."""
    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.graph import contextual_intents
    from snips_nlu_spark.spark.stages import parse_transcripts
    from snips_nlu_spark.spark.streaming import (
        streaming_contextual_intents_ordered, streaming_transcripts)
    import __spark_entry__ as em

    src = tmp_path / "src_ctx_ooo"
    pdf = datagen.generate_pandas(0, 200)
    df = spark.createDataFrame(pdf)
    # reversed waves: high turn indexes first — maximal disorder
    for lo, hi in ((6, 10_000), (3, 6), (0, 3)):
        wave = df.filter((df.turn_idx >= lo) & (df.turn_idx < hi))
        wave.coalesce(1).write.mode("append").parquet(str(src))

    out = streaming_contextual_intents_ordered(
        streaming_transcripts(spark, str(src), max_files_per_trigger=1),
        em._model_json())
    q = (out.writeStream.format("memory").queryName("ctx_intents_ooo")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_ooo"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {tuple(r) for r in
           spark.sql("SELECT * FROM ctx_intents_ooo").collect()}
    want = {tuple(r) for r in
            contextual_intents(parse_transcripts(df, em._model_json()),
                               df).collect()}
    assert got == want


def test_streaming_exact_dedup(spark, tmp_path):
    """Watermark-bounded streaming dedup: planted verbatim duplicates
    across micro-batches collapse to one survivor per fingerprint, and
    the surviving fingerprint set equals the batch-distinct set."""
    import pandas as pd
    from snips_nlu_spark.spark.streaming import (streaming_exact_dedup,
                                                 streaming_transcripts)

    src = tmp_path / "src_dedup"
    base = pd.Timestamp("2024-05-01 12:00:00")
    rows = []
    for i in range(120):
        text = f"unique document number {i % 40}"  # each text x3
        rows.append(("c%03d" % i, 0, "user", text, None,
                     base + pd.Timedelta(seconds=i)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "ts"])
    df = spark.createDataFrame(pdf)
    df = (df.withColumn("turn_idx", df["turn_idx"].cast("int"))
          .withColumn("tool", df["tool"].cast("string")))
    for part in range(3):  # dups split across micro-batches
        df.filter((df.conv_id.substr(2, 3).cast("int") % 3) == part) \
          .coalesce(1).write.mode("append").parquet(str(src))

    out = streaming_exact_dedup(
        streaming_transcripts(spark, str(src), max_files_per_trigger=1))
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM dedup_stream").collect()
    fps = [r["fingerprint"] for r in got]
    assert len(fps) == len(set(fps)) == 40  # one survivor per text
    texts = {r["text"] for r in got}
    assert texts == {f"unique document number {i}" for i in range(40)}


def test_spark_submit_job(tmp_path):
    """Drive jobs/build_kg.py through spark-submit with --py-files (the
    north-rule execution mode)."""
    import pyspark
    from pathlib import Path
    repo = Path(__file__).resolve().parent.parent
    subprocess.run([sys.executable, str(repo / "scripts" / "package.py")],
                   check=True, capture_output=True)
    spark_submit = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    out_dir = tmp_path / "kg"
    proc = subprocess.run(
        [str(spark_submit), "--master", "local[4]",
         "--py-files", str(repo / "snips_nlu_spark.zip"),
         str(repo / "jobs" / "build_kg.py"),
         "--generate-sf", "0.0005",
         "--output", str(out_dir), "--n-buckets", "8"],
        capture_output=True, text=True, timeout=420,
        cwd=str(repo))
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_triples"] > 0
    assert (out_dir / "lineage").exists()
    assert (out_dir / "nodes").exists()


def test_streaming_fact_fusion_matches_batch(spark, tmp_path):
    """applyInPandasWithState noisy-OR fusion: the final fused row per
    fact must equal the batch triple_confidence however assertions
    split across micro-batches (associativity of the fusion)."""
    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.kg import triple_confidence
    from snips_nlu_spark.spark.stages import parse_transcripts
    from snips_nlu_spark.spark.streaming import (streaming_fact_fusion,
                                                 streaming_transcripts)
    import __spark_entry__ as em

    src = tmp_path / "src_fusion"
    pdf = datagen.generate_pandas(0, 240)
    df = spark.createDataFrame(pdf)
    df.repartition(6).write.parquet(str(src))

    fused = streaming_fact_fusion(
        streaming_transcripts(spark, str(src), max_files_per_trigger=2),
        em._model_json())
    q = (fused.writeStream.format("memory").queryName("fact_fusion")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt_fusion"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got_rows = spark.sql("SELECT * FROM fact_fusion").collect()
    # update mode: one row per (fact, trigger); n_assertions is
    # monotone, so the final state is the max-n row per fact
    final = {}
    for r in got_rows:
        k = (r["subj"], r["pred"], r["obj"])
        if k not in final or r["n_assertions"] > final[k]["n_assertions"]:
            final[k] = r
    got = {k: (r["n_assertions"], r["max_proba"], r["confidence"])
           for k, r in final.items()}

    want = {(r["subj"], r["pred"], r["obj"]):
            (r["n_assertions"], r["max_proba"], r["confidence"])
            for r in triple_confidence(
                parse_transcripts(df, em._model_json())).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 2e-6, k
        assert abs(got[k][2] - want[k][2]) < 2e-6, k

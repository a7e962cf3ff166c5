"""End-to-end Spark pipeline tests: differential vs the single-process
oracle loop, determinism, resume, and rollups (SURVEY.md §5 strategy)."""

import json

import pytest

from snips_nlu_spark import datagen
from snips_nlu_spark.engine import NluEngine
from snips_nlu_spark.fixtures import combined_dataset
from snips_nlu_spark.spark.stages import (TRIPLE_COLUMNS, parse_transcripts,
                                          turn_to_triples)

N_ROWS = 400

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def engine():
    return NluEngine(parser_units=("lookup_intent_parser",
                                   "deterministic_intent_parser")) \
        .fit(combined_dataset())


@pytest.fixture(scope="module")
def model_json(engine):
    return json.dumps(engine.to_dict(), sort_keys=True)


def oracle_triples(engine, n_rows):
    """Single-process oracle: plain Python loop, no Spark, no caching."""
    rows = []
    for i in range(n_rows):
        rec = datagen.turn_record(i)
        rows.extend(turn_to_triples(engine, rec["conv_id"],
                                    rec["turn_idx"], rec["text"],
                                    rec["ts"]))
    return sorted(rows, key=lambda r: (r[0], r[1], r[3], r[4], str(r[6])))


def spark_triples(spark, model_json, n_rows):
    pdf = datagen.generate_pandas(0, n_rows)
    df = spark.createDataFrame(pdf)
    out = parse_transcripts(df, model_json).collect()
    rows = [tuple(r[c] for c in TRIPLE_COLUMNS) for r in out]
    return sorted(rows, key=lambda r: (r[0], r[1], r[3], r[4], str(r[6])))


def test_spark_matches_oracle_row_for_row(spark, engine, model_json):
    expected = oracle_triples(engine, N_ROWS)
    actual = spark_triples(spark, model_json, N_ROWS)
    assert len(actual) == len(expected)
    assert actual == expected


def test_spark_parse_deterministic_across_runs(spark, model_json):
    a = spark_triples(spark, model_json, 200)
    b = spark_triples(spark, model_json, 200)
    assert a == b


def test_datagen_spark_matches_local(spark):
    sdf = datagen.generate_spark(spark, 0.0005, num_partitions=4)
    sp = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in sdf.collect())
    pdf = datagen.generate_pandas(0, datagen.n_turns(0.0005))
    loc = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text,
         None if r.tool is None else r.tool)
        for r in pdf.itertuples())
    assert sp == loc


def test_rollups(spark, model_json):
    from snips_nlu_spark.spark.graph import (dedup_triples, edges_rollup,
                                             intent_distribution,
                                             nodes_rollup)
    pdf = datagen.generate_pandas(0, N_ROWS)
    triples = parse_transcripts(spark.createDataFrame(pdf), model_json)
    triples = dedup_triples(triples).cache()
    dist = {r["intent"]: r["n_turns"]
            for r in intent_distribution(triples).collect()}
    assert sum(dist.values()) > 0
    nodes = nodes_rollup(triples)
    edges = edges_rollup(triples)
    kinds = {r["kind"] for r in nodes.select("kind").distinct().collect()}
    assert kinds <= {"turn", "intent", "entity_value"}
    assert edges.count() > 0
    triples.unpersist()


def test_build_kg_resume_identical_state(spark, model_json, tmp_path):
    """Kill-and-resume: building buckets in two steps converges to the
    same lineage fingerprints as a single-shot build."""
    from pyspark.sql import functions as F
    from snips_nlu_spark.spark.lineage import (LocalCommitSurface,
                                               _bucketed, build_kg)

    pdf = datagen.generate_pandas(0, N_ROWS)
    df = spark.createDataFrame(pdf)
    n_buckets = 8

    # full build
    full_dir = tmp_path / "full"
    build_kg(spark, df, model_json, str(full_dir), n_buckets=n_buckets)

    # partial build: only half the buckets first (simulated interrupt)...
    part_dir = tmp_path / "partial"
    half = df.filter(
        F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int") < 4)
    build_kg(spark, half, model_json, str(part_dir), n_buckets=n_buckets)
    done_after_half = LocalCommitSurface(str(part_dir)).committed_buckets()
    assert sorted(done_after_half) == [0, 1, 2, 3]

    # ...then resume with the full input: only buckets 4-7 are reprocessed
    summary = build_kg(spark, df, model_json, str(part_dir),
                       n_buckets=n_buckets)
    assert summary["resumed_buckets"] == 4

    def lineage_fps(d):
        rows = spark.read.parquet(str(d / "lineage")).collect()
        return sorted((r["bucket"], r["n_turns"], r["n_triples"],
                       r["fingerprint"]) for r in rows)

    assert lineage_fps(part_dir) == lineage_fps(full_dir)

    def triple_count(d):
        return spark.read.parquet(str(d / "triples")).count()

    assert triple_count(part_dir) == triple_count(full_dir)

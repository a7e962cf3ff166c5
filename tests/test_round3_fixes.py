"""Round-3 structural regression pins.

The round-2→3 perf fixes are plan-shape properties, not numbers; these
tests pin the shapes so a refactor cannot silently reintroduce the
shuffles (round-2 VERDICT perf items #3/#4).
"""

import pytest


@pytest.mark.spark
def test_build_kg_plan_shuffles_triples_not_input(spark):
    """The checkpointed build parses from the scan's own partitions
    (shuffle-free compute stage) and repartitions the TRIPLE side for
    the partitioned write — triples are the narrower dataset (~0.55× the
    input bytes at 8M turns), so the single exchange must sit ABOVE the
    mapInPandas parse, never below it (shuffling the full-text input
    cost +10 s at 8M turns)."""
    import json as _json

    from pyspark.sql import functions as F

    from snips_nlu_spark.engine import NluEngine
    from snips_nlu_spark.fixtures import beverage_dataset
    from snips_nlu_spark.spark.lineage import _bucketed
    from snips_nlu_spark.spark.stages import parse_transcripts

    engine = NluEngine().fit(beverage_dataset())
    model_json = _json.dumps(engine.to_dict(), sort_keys=True)
    tr = spark.createDataFrame(
        [(f"c{i}", 0, "make me two cups of coffee", None)
         for i in range(8)],
        "conv_id string, turn_idx int, text string, ts timestamp")

    # the exact dataflow build_kg uses for the triple store write
    triples = parse_transcripts(_bucketed(tr, 8), model_json,
                                extra_columns=("bucket",))
    staged = triples.repartition(8, F.col("bucket"))
    plan = staged._jdf.queryExecution().optimizedPlan().toString()

    # one shuffle total, and it sits above the Python parse stage
    # (optimizedPlan prints parents first)
    assert plan.count("RepartitionByExpression") == 1, plan
    assert "MapInPandas" in plan
    assert plan.index("RepartitionByExpression") < plan.index(
        "MapInPandas"), plan


@pytest.mark.spark
def test_minhash_plan_has_no_collect_set(spark):
    """Verification must never materialize per-doc shingle sets in agg
    buffers (unbounded task memory at corpus scale) — the candidate
    semi-join formulation keeps the exploded layout end-to-end."""
    from snips_nlu_spark.functions.dedup import minhash_duplicate_pairs
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e g")], ["doc_id", "text"])
    plan = (minhash_duplicate_pairs(df, threshold=0.5)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "collect_set" not in plan
    assert "collect_list" not in plan

"""Scale-behavior tests: skew defusal, shingle DF capping, no-op resume."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


def test_salted_repartition_spreads_hot_conversation(spark):
    """One conversation with 20k turns (hot key) + 100 normal convs: after
    salted repartition no partition holds more than ~2x the mean."""
    from snips_nlu_spark.spark.stages import salted_repartition
    n_hot, n_cold = 20000, 800
    pdf = pd.DataFrame({
        "conv_id": ["conv_hot"] * n_hot
        + [f"conv_{i % 100}" for i in range(n_cold)],
        "turn_idx": list(range(n_hot)) + [i // 100 for i in range(n_cold)],
        "text": "hello there",
        "ts": dt.datetime(2024, 1, 1),
    })
    df = salted_repartition(spark.createDataFrame(pdf), 16)
    sizes = [r["count"] for r in
             df.groupBy(F.spark_partition_id().alias("p"))
             .count().collect()]
    assert len(sizes) >= 4  # AQE may coalesce, but not to a hot single
    mean = sum(sizes) / len(sizes)
    assert max(sizes) < 2 * mean
    # plain conv_id partitioning would put all 20k hot rows in ONE
    # partition; salting must not
    assert max(sizes) < n_hot / 2


def test_shingle_max_df_caps_hot_shingles(spark):
    """Boilerplate shingles shared by every doc explode the pair join;
    max_df drops them (the scale guard for the Jaccard join)."""
    from snips_nlu_spark.functions.dedup import _shingles
    docs = spark.createDataFrame(
        [(i, "common boiler plate " + f"unique{i} word{i} tail{i}")
         for i in range(20)], ["doc_id", "text"])
    unfiltered = _shingles(docs, n=3).groupBy("shingle").count()
    assert unfiltered.agg(F.max("count")).collect()[0][0] == 20
    capped = _shingles(docs, n=3, max_df=5).groupBy("shingle").count()
    assert capped.agg(F.max("count")).collect()[0][0] <= 5


def test_noop_resume_skips_recompute(spark, tmp_path):
    import json
    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.lineage import build_kg
    import __spark_entry__ as em

    df = spark.createDataFrame(datagen.generate_pandas(0, 200))
    mj = em._model_json()
    out = tmp_path / "kg"
    s1 = build_kg(spark, df, mj, str(out), n_buckets=4)
    s2 = build_kg(spark, df, mj, str(out), n_buckets=4)
    assert s2["pending_turns"] == 0
    assert s2["resumed_buckets"] == 4
    assert s2["n_triples"] == s1["n_triples"]

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


def test_star_cc_gate_scale_planted_components(spark):
    """ROADMAP #4: a 10^5-edge planted graph pins the star-CC round
    budget and exactness at gate scale — a 30k-node chain (the
    adversarial diameter no label-propagation budget survives), 2,000
    10-cliques, and 500 hundred-spoke stars, all resolved exactly
    within a fixed O(log n) iteration cap."""
    from snips_nlu_spark.functions.dedup import duplicate_clusters

    chain_n, chain_base = 30_000, 1_000_000
    chain = spark.range(chain_n - 1).select(
        (F.col("id") + chain_base).alias("doc_a"),
        (F.col("id") + chain_base + 1).alias("doc_b"))
    clique_base = 2_000_000
    pairs10 = spark.createDataFrame(
        [(j, k) for j in range(10) for k in range(j + 1, 10)],
        ["j", "k"])
    cliques = (spark.range(2_000).crossJoin(F.broadcast(pairs10))
               .select((clique_base + F.col("id") * 10 + F.col("j"))
                       .alias("doc_a"),
                       (clique_base + F.col("id") * 10 + F.col("k"))
                       .alias("doc_b")))
    star_base = 3_000_000
    stars = (spark.range(500).crossJoin(
        F.broadcast(spark.range(99).select(
            (F.col("id") + 1).alias("spoke"))))
        .select((star_base + F.col("id") * 1000).alias("doc_a"),
                (star_base + F.col("id") * 1000 + F.col("spoke"))
                .alias("doc_b")))
    pairs = chain.union(cliques).union(stars)
    assert pairs.count() == (chain_n - 1) + 2_000 * 45 + 500 * 99

    labels = duplicate_clusters(pairs, max_iter=22, strategy="star")
    expected = F.when(
        F.col("doc_id") < clique_base, F.lit(chain_base)
    ).when(
        F.col("doc_id") < star_base,
        (F.floor((F.col("doc_id") - clique_base) / 10) * 10
         + clique_base)
    ).otherwise(
        F.floor((F.col("doc_id") - star_base) / 1000) * 1000 + star_base)
    mismatches = labels.filter(F.col("cluster_id")
                               != expected.cast("long")).count()
    assert mismatches == 0
    n_clusters = labels.select("cluster_id").distinct().count()
    assert n_clusters == 1 + 2_000 + 500

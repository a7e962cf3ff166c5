"""Shared physical-layout helpers for the corpus operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition an input whose scan yields fewer
    partitions than the session has cores (guide §2.5: a single
    unsplittable file — e.g. a one-row-group parquet — serializes every
    downstream map stage; the sf1.0 documents table scans as ≤3
    partitions, so tokenize-heavy operators ran on 3 of 32 cores).

    No-op whenever the scan is already at least core-parallel, so at
    production scale (thousands of splits) this never fires and no
    corpus-wide shuffle is added; when it does fire the shuffled bytes
    are by construction a small input (fewer splits than cores).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

"""SparkSession factory with the project's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "snips-nlu-spark",
              cpus: int | None = None,
              max_partition_bytes: int | None = None) -> SparkSession:
    """local[N] session; N from SPARK_GRAFT_CPUS (default all cores).

    Config notes (tuned for the 100 TB design point, applied even locally):
    - AQE on: runtime shuffle coalescing + skew-join splitting
    - shuffle.partitions sized to parallelism (driver overrides per job)
    - Arrow batch size bounds the pandas-kernel working set
    - ``max_partition_bytes``: transcript parsing is compute-bound, not
      byte-bound — a 1 MB parquet split carries ~30k turns ≈ seconds of
      Python kernel work, so CPU-heavy jobs should set this far below the
      128 MB default to get shuffle-free parallelism from the scan itself
      (rather than paying a repartition exchange).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    parallelism = cpus or (os.cpu_count() or 8)
    builder = (
        SparkSession.builder
        .appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(parallelism, 8)))
        # floor on SCAN parallelism (guide §6): a table smaller than
        # cores × maxPartitionBytes otherwise scans with fewer tasks
        # than cores (at sf1.0 the 5.7 MB documents table scanned as 3
        # partitions → every tokenize-heavy doc query ran on 3 of 32
        # cores). Derived from the session's core count, not a fixed
        # number, so it stays scale-adaptive; on a real cluster the
        # same floor simply matches split count to total cores.
        .config("spark.sql.files.minPartitionNum",
                str(max(parallelism, 8)))
        # joins (guide §3.1/§9): let the planner pick shuffled-hash
        # over sort-merge when its size conditions hold (no sort, same
        # spill safety via AQE), let AQE rewrite SMJ→SHJ for small
        # post-shuffle partitions, and raise the broadcast threshold
        # moderately — the repo's small sides (object universes,
        # embedding tables, candidate lists) are vocabulary-sized and
        # their estimates routinely overshoot after aggs. Measured
        # 10-20% off the join-heavy queries at sf1.0; all three are
        # size-conditioned, so outsized inputs still get sort-merge.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if max_partition_bytes is not None:
        builder = builder.config("spark.sql.files.maxPartitionBytes",
                                 str(max_partition_bytes))
    return builder.getOrCreate()

"""Checkpointed KG build with per-partition lineage + exact resume.

The transcript table is bucketed by ``pmod(xxhash64(conv_id), n_buckets)``;
each bucket is an atomic commit unit. A lineage table
(run-scoped parquet) records per bucket: turn count, triple count, a
value fingerprint, and status. Resume = anti-join pending buckets against
committed lineage — re-running a partially-completed build reprocesses
only missing buckets and converges to the identical final state
(BASELINE.json north_rule: "resumable from checkpoint with per-partition
lineage + metrics").

On a real cluster the parquet sink would be an Iceberg table (bucket
transform partitioning + snapshot commits); the commit protocol here is
the same shape with plain parquet dirs.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

from .graph import dedup_triples, edges_rollup, nodes_rollup
from .stages import parse_transcripts

LINEAGE_SCHEMA = ("bucket int, n_turns long, n_triples long, "
                  "fingerprint long, status string")


def _bucketed(transcripts: DataFrame, n_buckets: int) -> DataFrame:
    return transcripts.withColumn(
        "bucket",
        F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int"))


def _completed_buckets(spark: SparkSession, lineage_path: str) -> list[int]:
    if not (Path(lineage_path) / "_SUCCESS").exists():
        return []
    rows = (spark.read.parquet(lineage_path)
            .filter(F.col("status") == "done")
            .select("bucket").distinct().collect())
    return [r["bucket"] for r in rows]


def triple_fingerprint_col():
    """Order-insensitive value fingerprint of a bucket's triples: bit_xor
    of per-row xxhash64 over all value columns (deterministic, mergeable,
    overflow-free under ANSI mode)."""
    return F.expr(
        "bit_xor(xxhash64(subj, pred, obj, coalesce(entity, ''), "
        "coalesce(span_start, -1), coalesce(span_end, -1), "
        "coalesce(raw_value, '')))"
    ).alias("fingerprint")


def build_kg(spark: SparkSession, transcripts: DataFrame, model_json: str,
             out_dir: str, n_buckets: int = 64,
             resume: bool = True) -> dict:
    """Run (or resume) the full KG build. Returns summary counts.

    Layout under ``out_dir``:
      triples/bucket=<b>/...   — partitioned triple store
      lineage/                 — per-bucket commit records
      nodes/, edges/           — rollups (recomputed at the end)
    """
    out = Path(out_dir)
    triples_path = str(out / "triples")
    lineage_path = str(out / "lineage")

    bucketed = _bucketed(transcripts, n_buckets)
    done = _completed_buckets(spark, lineage_path) if resume else []
    pending = bucketed
    if done:
        pending = bucketed.filter(~F.col("bucket").isin(done))

    n_pending_turns = pending.count()
    if n_pending_turns:
        # repartition the parse output on the bucket key so each task owns
        # exactly one bucket dir (without this, every parse task spills a
        # file into every bucket: tasks × buckets small files)
        triples = (parse_transcripts(pending, model_json,
                                     extra_columns=("bucket",))
                   .repartition(n_buckets, F.col("bucket"))
                   .persist())
        triples.write.partitionBy("bucket").mode("append") \
            .parquet(triples_path)

        # lineage: every pending bucket gets a row, even if 0 triples;
        # stats come from the persisted parse output — one parse total
        turns_per_bucket = pending.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_turns"))
        stats = triples.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_triples"),
            triple_fingerprint_col())
        lineage = (turns_per_bucket.join(stats, "bucket", "left")
                   .na.fill({"n_triples": 0, "fingerprint": 0})
                   .withColumn("status", F.lit("done")))
        lineage.write.mode("append").parquet(lineage_path)
        triples.unpersist()

    summary = {"pending_turns": int(n_pending_turns),
               "resumed_buckets": len(done)}
    if n_pending_turns == 0 and done and (Path(out / "nodes")).exists():
        # no-op resume: everything committed, rollups already built
        total = (spark.read.parquet(lineage_path)
                 .agg(F.sum("n_triples")).collect()[0][0])
        summary["n_triples"] = int(total or 0)
        return summary
    if (Path(triples_path) / "_SUCCESS").exists():
        all_triples = spark.read.parquet(triples_path)
        deduped = dedup_triples(all_triples).persist()
        nodes_rollup(deduped).write.mode("overwrite") \
            .parquet(str(out / "nodes"))
        edges_rollup(deduped).write.mode("overwrite") \
            .parquet(str(out / "edges"))
        deduped.unpersist()
        # total from the lineage ledger — no extra scan of the store
        total = (spark.read.parquet(lineage_path)
                 .agg(F.sum("n_triples")).collect()[0][0])
        summary["n_triples"] = int(total or 0)
    return summary

"""Structured Streaming variant of the parse stage.

The reference is strictly request/response (SURVEY.md §2.10); this module
is the streaming extension: the same fused parse kernel runs under
``readStream`` with a watermark on ``ts`` and ``dropDuplicates`` on
(conv_id, turn_idx) for late/replayed turns. Parsing is per-turn
independent, so no stateful operator is needed — the only state is the
dedup watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .stages import parse_transcripts

TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp")


def streaming_transcripts(spark: SparkSession, source_dir: str,
                          max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a transcript parquet directory (stand-in
    for a Kafka/Iceberg CDC source on a real deployment)."""
    return (spark.readStream
            .schema(TRANSCRIPT_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir))


def streaming_triples(stream_df: DataFrame, model_json: str,
                      watermark: str = "1 hour") -> DataFrame:
    """Late-data-safe exactly-once-ish triple stream: watermark + turn
    dedup, then the same mapInPandas parse kernel as the batch path."""
    deduped = (stream_df
               .withWatermark("ts", watermark)
               .dropDuplicates(["conv_id", "turn_idx", "ts"]))
    return parse_transcripts(deduped, model_json)


def run_stream_to_parquet(spark: SparkSession, source_dir: str,
                          model_json: str, out_dir: str,
                          checkpoint_dir: str, once: bool = True):
    """Start the stream writing partitioned parquet with a checkpoint;
    ``once=True`` processes all available input then stops (used by
    tests; a production run would leave the trigger continuous)."""
    triples = streaming_triples(
        streaming_transcripts(spark, source_dir), model_json)
    writer = (triples.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

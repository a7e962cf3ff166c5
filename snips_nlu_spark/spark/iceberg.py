"""Iceberg sink adapter (capability-gated).

The checkpointed KG build's commit protocol (spark/lineage.py) is
Iceberg-shaped: bucket-partitioned triple store + per-bucket commit
records + atomic publish. On a cluster with the Iceberg runtime jar and a
configured catalog this module maps that protocol onto real Iceberg
tables — `writeTo(...).partitionedBy(bucket(N, conv_id))` with
`overwritePartitions()` as the converging per-bucket commit and the
table snapshot as the atomic publish point (replacing the parquet path's
`_COMMITTED.json` rename).

The sandbox has no Iceberg jar, so everything here is gated on
``iceberg_available`` and the parquet fallback in lineage.py remains the
tested default; the adapter's wiring (not the jar) is what the tests
cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def require_iceberg(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not available: add the "
            "iceberg-spark-runtime jar and configure a catalog "
            "(spark.sql.catalog.<name>=org.apache.iceberg.spark."
            "SparkCatalog); the parquet sink (spark/lineage.py::build_kg) "
            "is the jar-free fallback")


def write_triples(triples: DataFrame, table: str, n_buckets: int) -> None:
    """Create-or-replace the bucket-partitioned Iceberg triple table."""
    require_iceberg(triples.sparkSession)
    (triples.writeTo(table)
     .partitionedBy(F.bucket(n_buckets, F.col("conv_id")))
     .createOrReplace())


def overwrite_buckets(triples: DataFrame, table: str) -> None:
    """Converging per-bucket commit: replaces exactly the partitions the
    incoming triples touch (the Iceberg analogue of the parquet path's
    dynamic partition overwrite + commit marker; the snapshot IS the
    atomic commit)."""
    require_iceberg(triples.sparkSession)
    triples.writeTo(table).overwritePartitions()

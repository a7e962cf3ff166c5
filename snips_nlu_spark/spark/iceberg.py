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


class IcebergCommitSurface:
    """Iceberg mapping of the build's commit-METADATA surface
    (lineage.py::LocalCommitSurface is the jar-free default).

    NOT yet a drop-in for ``build_kg``: the build's data writes are
    parquet-path-based today, so ``build_kg`` refuses non-local
    surfaces (NotImplementedError) until the ``writeTo`` data path
    (``write_triples``/``overwrite_buckets`` above) is wired into the
    build loop — at which point ``pin_n_buckets`` persists its value as
    the ``kg.n_buckets`` table property at table creation. The protocol
    itself maps 1:1:

    - ``clear_pending_partitions`` → no-op: ``overwritePartitions``
      replaces exactly the touched partitions atomically at snapshot
      commit, so there is no partial-output window to sweep;
    - ``publish_commit`` → a table property update
      (``kg.committed_buckets``) committed in its own metadata
      transaction — the snapshot is the atomic publish point;
    - ``committed_buckets`` → read of that property;
    - ``pin_n_buckets`` → the ``kg.n_buckets`` table property (set once
      at table creation, read on resume);
    - ``store_exists`` → catalog ``tableExists``.

    Instantiating requires the Iceberg runtime on the classpath
    (``require_iceberg``); the class is import-safe without it so the
    wiring stays testable in jar-free environments.
    """

    BUCKETS_PROP = "kg.committed_buckets"
    N_BUCKETS_PROP = "kg.n_buckets"

    def __init__(self, spark: SparkSession, table_prefix: str) -> None:
        require_iceberg(spark)
        self.spark = spark
        self.table_prefix = table_prefix  # e.g. "catalog.db.kg"

    def _table(self, rel: str) -> str:
        return f"{self.table_prefix}_{rel}"

    def _props(self, rel: str) -> dict:
        rows = self.spark.sql(
            f"SHOW TBLPROPERTIES {self._table(rel)}").collect()
        return {r["key"]: r["value"] for r in rows}

    def committed_buckets(self) -> list[int]:
        import json as _json
        if not self.store_exists("lineage"):
            return []
        raw = self._props("lineage").get(self.BUCKETS_PROP)
        return _json.loads(raw) if raw else []

    def publish_commit(self, buckets: list[int]) -> None:
        import json as _json
        payload = _json.dumps(sorted(buckets))
        self.spark.sql(
            f"ALTER TABLE {self._table('lineage')} SET TBLPROPERTIES "
            f"('{self.BUCKETS_PROP}' = '{payload}')")

    def pin_n_buckets(self, requested, transcripts) -> int:
        """Reads the pin from the triples table's ``kg.n_buckets``
        property. The WRITE side of the pin belongs to table creation
        (``write_triples`` sets it with the bucket transform) — until
        that data path is wired into build_kg, a derived count here is
        NOT durable, which is one reason build_kg refuses this
        surface."""
        if self.store_exists("triples"):
            pinned = self._props("triples").get(self.N_BUCKETS_PROP)
            if pinned:
                return int(pinned)
        if requested is None:
            from .lineage import TURNS_PER_BUCKET
            n_turns = transcripts.count()
            requested = max(64, -(-n_turns // TURNS_PER_BUCKET))
        return int(requested)

    def clear_pending_partitions(self, rel: str, buckets) -> None:
        """No-op: Iceberg partition overwrite is atomic — a failed prior
        attempt left no published partial output."""

    def store_exists(self, rel: str) -> bool:
        return self.spark.catalog.tableExists(self._table(rel))

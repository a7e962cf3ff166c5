"""spark-submit entry point for the KG build.

    spark-submit --py-files snips_nlu_spark.zip jobs/build_kg.py \
        --input /path/to/transcripts_parquet_or_table \
        --model /path/to/model_bundle.json \
        --output /path/to/kg_out \
        [--n-buckets 512] [--no-resume] [--generate-sf 0.1] \
        [--iceberg-prefix catalog.db.kg] [--input-table catalog.db.turns]

Packaging: ``python scripts/package.py`` produces snips_nlu_spark.zip.
On a real cluster pass ``--input-table`` (the Iceberg transcript table)
and ``--iceberg-prefix`` (requires the iceberg-spark-runtime jar + a
configured catalog): the sinks become Iceberg tables
(``<prefix>_triples`` etc., identity-partitioned on the build's bucket
column) with snapshot-commit semantics. Without them, ``--input`` is a
parquet path and ``--output`` parquet dirs carry the same commit
protocol.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcript parquet path / table")
    ap.add_argument("--model", help="model bundle JSON (fit output); "
                    "default: fit on the built-in fixtures")
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--generate-sf", type=float, default=None,
                    help="generate a synthetic transcript input at this "
                         "scale factor instead of --input")
    ap.add_argument("--input-table", default=None,
                    help="read transcripts from a catalog table "
                         "(e.g. an Iceberg table) instead of --input")
    ap.add_argument("--iceberg-prefix", default=None,
                    help="write through IcebergCommitSurface to tables "
                         "<prefix>_triples/_lineage/_nodes/_edges "
                         "(requires the Iceberg runtime + catalog)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("build-kg").getOrCreate()

    if args.model:
        model_json = Path(args.model).read_text("utf8")
    else:
        from snips_nlu_spark.engine import NluEngine
        from snips_nlu_spark.fixtures import combined_dataset
        model_json = json.dumps(
            NluEngine().fit(combined_dataset()).to_dict(), sort_keys=True)

    if args.generate_sf is not None:
        from snips_nlu_spark.datagen import generate_spark
        transcripts = generate_spark(spark, args.generate_sf)
    elif args.input_table:
        transcripts = spark.table(args.input_table)
    else:
        if not args.input:
            raise SystemExit("either --input, --input-table or "
                             "--generate-sf is required")
        transcripts = spark.read.parquet(args.input)

    from snips_nlu_spark.spark.lineage import build_kg
    surface = None
    if args.iceberg_prefix:
        from snips_nlu_spark.spark.iceberg import IcebergCommitSurface
        surface = IcebergCommitSurface(spark, args.iceberg_prefix)
    t0 = time.time()
    summary = build_kg(spark, transcripts, model_json, args.output,
                       n_buckets=args.n_buckets,
                       resume=not args.no_resume, surface=surface)
    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

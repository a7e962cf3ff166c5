"""Attribute the cold-path gap: Spark wall vs in-kernel compute vs the
no-Spark multiprocessing ceiling, all in ONE session (same box load).

Prints three numbers:
  burn_tps    — 32-process multiprocessing burn, no Spark (the box
                ceiling BASELINE.md documents, re-measured now);
  spark_tps   — bench-identical cold_unique_parse throughput;
  kernel_frac — sum of in-kernel seconds across tasks / (wall × cores):
                the share of the Spark wall the parse kernel actually
                ran; the remainder is Arrow exchange + scheduling +
                feed stalls.

Run: python scripts/profile_spark_overhead.py [n_texts_per_core]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CPUS = 32


def cold_texts(n: int, tag: str) -> list[str]:
    return [f"make me {i} cups of coffee variant {tag}_{i}"
            for i in range(n)]


def _burn_worker(args) -> float:
    wid, n = args
    from snips_nlu_spark.engine import NluEngine
    root = Path(__file__).resolve().parent.parent
    eng = NluEngine.from_dict(
        json.loads((root / "oracle/model_bundle.json").read_text("utf8")))
    texts = cold_texts(n, f"b{wid}")
    eng.parse_batch(texts[:50], [None] * 50)  # warm resources
    t0 = time.perf_counter()
    eng.parse_batch(texts, [None] * n)
    return time.perf_counter() - t0


def run_burn(n_per_core: int) -> float:
    with mp.Pool(CPUS) as pool:
        t0 = time.perf_counter()
        pool.map(_burn_worker, [(w, n_per_core) for w in range(CPUS)])
        wall = time.perf_counter() - t0
    return CPUS * n_per_core / wall


def run_spark(n_total: int) -> tuple[float, float]:
    from pyspark.sql import functions as F

    from snips_nlu_spark.spark.session import get_spark
    from snips_nlu_spark.spark.stages import parse_transcripts
    import __spark_entry__ as em

    spark = get_spark("overhead", cpus=CPUS)
    model_json = em._model_json()
    kernel_acc = spark.sparkContext.accumulator(0.0)

    def batch(tag, n=None):
        return spark.range(n or n_total).select(
            F.concat(F.lit("conv_u"), (F.col("id") / 50).cast("long")
                     .cast("string")).alias("conv_id"),
            F.pmod(F.col("id"), F.lit(50)).cast("int").alias("turn_idx"),
            F.concat(F.lit("make me "), F.col("id").cast("string"),
                     F.lit(f" cups of coffee variant {tag}_"),
                     F.col("id").cast("string")).alias("text"),
            F.lit(None).cast("timestamp").alias("ts"))

    # instrumented variant: time the kernel inside each task
    import snips_nlu_spark.spark.stages as stages
    orig = stages._parse_batch

    def timed(engine, pdf):
        t0 = time.perf_counter()
        out = orig(engine, pdf)
        kernel_acc.add(time.perf_counter() - t0)
        return out

    stages._parse_batch = timed
    try:
        # warm EVERY worker (a .limit() here would collapse to one task
        # and leave 31 engine builds inside the timed window)
        parse_transcripts(batch("warm", CPUS * 200), model_json).count()
        warm_kernel = kernel_acc.value
        t0 = time.perf_counter()
        parse_transcripts(batch("r0"), model_json).count()
        wall = time.perf_counter() - t0
    finally:
        stages._parse_batch = orig
    kernel_sec = kernel_acc.value - warm_kernel
    spark.stop()
    return n_total / wall, kernel_sec / (wall * CPUS)


if __name__ == "__main__":
    import statistics

    n_per_core = int(sys.argv[1]) if len(sys.argv) > 1 else 1600
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    # INTERLEAVED sampling (same rationale as bench.py's scaling legs):
    # host-side load spikes corrupt single samples, and alternating legs
    # puts both under the same load regime
    burns, sparks, fracs = [], [], []
    for _ in range(reps):
        burns.append(run_burn(n_per_core))
        tps, frac = run_spark(n_per_core * CPUS)
        sparks.append(tps)
        fracs.append(frac)
    burn = statistics.median(burns)
    spark_tps = statistics.median(sparks)
    print(json.dumps({
        "burn_tps": round(burn, 1),
        "spark_tps": round(spark_tps, 1),
        "ratio": round(spark_tps / burn, 3),
        "kernel_frac_of_wall": round(statistics.median(fracs), 3),
        "burn_samples": [round(b, 1) for b in burns],
        "spark_samples": [round(s, 1) for s in sparks],
    }))

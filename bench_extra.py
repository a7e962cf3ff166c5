"""Extra benchmarks: noop-sink isolation per query (guide §1.4) + plan
capture. Does NOT replace bench.py (frozen); numbers quoted in
OPTIMIZATION_r06.md come from here.

Usage:
  python bench_extra.py [--queries q1,q2] [--plans plans/r06 --tag before]
      [--repeats 2]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans", default="")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--stages", action="store_true",
                    help="also time internal stages of composite queries")
    args = ap.parse_args()

    import __spark_entry__ as em
    from snips_nlu_spark.spark.session import get_spark

    spark = get_spark("bench-extra", cpus=CPUS,
                      max_partition_bytes=2 << 20)
    sc = spark.sparkContext
    qs = em.queries()
    wanted = [q.strip() for q in args.queries.split(",") if q.strip()] \
        or list(qs)

    # warm the parse engine once (bench.py does the same) so the first
    # timed query is not paying worker fork + broadcast ship
    from snips_nlu_spark.spark.stages import parse_transcripts
    tr = em._transcripts(spark, SF_DIR)
    parse_transcripts(tr.limit(CPUS * 100), em._model_json()).count()

    results: dict[str, list[float]] = {}
    for name in wanted:
        fn = qs[name]
        walls = []
        for rep in range(args.repeats):
            # fresh dedup cache per repeat would hide the shared-parse
            # design; keep semantics identical to the driver (construct
            # then collect). We time construction + execution together.
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            noop(df)
            walls.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        results[name] = walls
        print(f"{name}: {walls}", flush=True)
        if args.plans:
            out = Path(args.plans)
            out.mkdir(parents=True, exist_ok=True)
            plan = fn(spark, SF_DIR)._jdf.queryExecution() \
                .explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted"))
            (out / f"{name}_{args.tag}.txt").write_text(plan, "utf8")

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS,
                      "results": results}))


if __name__ == "__main__":
    main()

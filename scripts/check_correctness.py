"""Local simulation of the driver's correctness gate: run each
__spark_entry__ query on Spark at sf0.01 and its oracle SQL in DuckDB,
compare row counts + order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    import __spark_entry__ as entrymod
    from snips_nlu_spark.spark.session import get_spark

    spark = get_spark("correctness-check", cpus=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    # mirror the driver: pre-register each testdata table as a view
    for table in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"):
        path = Path(sf_dir) / f"{table}.parquet"
        if path.exists():
            con.sql(f"CREATE VIEW {table} AS "
                    f"SELECT * FROM read_parquet('{path}')")
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        spark_cols = sdf.columns
        spark_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows={len(spark_rows)} (rows-only check)")
            continue
        rel = con.sql(oracles[name])
        duck_cols = rel.columns
        duck_rows = rel.fetchall()
        a = normalize(spark_rows, spark_cols)
        b = normalize(duck_rows, duck_cols)
        status = "OK" if a == b else "MISMATCH"
        if a != b:
            failures += 1
            diff_a = [x for x in a if x not in set(b)][:3]
            diff_b = [x for x in b if x not in set(a)][:3]
            print(f"{name}: {status} spark={len(a)} duck={len(b)}")
            print("  spark-only:", diff_a)
            print("  duck-only :", diff_b)
        else:
            print(f"{name}: {status} ({len(a)} rows)")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main())

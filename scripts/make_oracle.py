"""Generate the single-process oracle triples parquet for the driver's
DuckDB correctness gate.

The oracle is the plain-Python reference execution of the SAME deterministic
spec: loop over the synthetic transcript rows (pure function of row index),
parse each with the fitted engine, explode to triples. The Spark pipeline
must reproduce it row-for-row (tests/test_spark_pipeline.py) and the driver
cross-checks via __spark_entry__.oracle_sql reading this parquet.

Usage: python scripts/make_oracle.py [sf ...]   (default: 0.001 0.01)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from snips_nlu_spark import datagen  # noqa: E402
from snips_nlu_spark.engine import NluEngine  # noqa: E402
from snips_nlu_spark.fixtures import combined_dataset  # noqa: E402
from snips_nlu_spark.spark.stages import (TRIPLE_COLUMNS,  # noqa: E402
                                          turn_to_triples)

ORACLE_DIR = Path(__file__).resolve().parent.parent / "oracle"

SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("entity", pa.string()),
    ("span_start", pa.int32()),
    ("span_end", pa.int32()),
    ("raw_value", pa.string()),
    ("proba", pa.float64()),
])


def build_engine() -> NluEngine:
    return NluEngine().fit(combined_dataset())


def persist_model_bundle(engine: NluEngine) -> Path:
    """Write the fitted bundle so __spark_entry__ loads instead of
    refitting (~40 s) on every driver invocation."""
    import json
    ORACLE_DIR.mkdir(exist_ok=True)
    out = ORACLE_DIR / "model_bundle.json"
    out.write_text(json.dumps(engine.to_dict(), sort_keys=True),
                   encoding="utf8")
    print(f"model bundle -> {out} ({out.stat().st_size / 1e6:.1f} MB)")
    return out


INTENTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("subj", pa.string()),
    ("intent", pa.string()),
    ("proba", pa.float64()),
    ("rank", pa.int32()),
])


def make_intents_oracle(engine: NluEngine, sf: float,
                        top_n: int = 3) -> Path:
    """n-best intent ranking oracle (mirrors spark/stages.rank_intents)."""
    n = datagen.n_turns(sf)
    rows: list[tuple] = []
    for i in range(n):
        rec = datagen.turn_record(i)
        anchor = rec["ts"].replace(hour=0, minute=0, second=0)
        subj = f"{rec['conv_id']}:{rec['turn_idx']}"
        rank = 0
        for res in engine.get_intents(rec["text"], anchor=anchor):
            if res["intentName"] is None:
                continue
            rank += 1
            rows.append((rec["conv_id"], rec["turn_idx"], subj,
                         res["intentName"], float(res["probability"]),
                         rank))
            if rank >= top_n:
                break
    cols = list(zip(*rows)) if rows else [[] for _ in INTENTS_SCHEMA.names]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type)
         for c, f in zip(cols, INTENTS_SCHEMA)], schema=INTENTS_SCHEMA)
    ORACLE_DIR.mkdir(exist_ok=True)
    out = ORACLE_DIR / f"intents_sf{sf:g}.parquet"
    pq.write_table(table, out)
    print(f"sf={sf}: intents n-best -> {len(rows)} rows -> {out}")
    return out


def make_oracle(engine: NluEngine, sf: float) -> Path:
    n = datagen.n_turns(sf)
    t0 = time.time()
    rows: list[tuple] = []
    for i in range(n):
        rec = datagen.turn_record(i)
        rows.extend(turn_to_triples(engine, rec["conv_id"],
                                    rec["turn_idx"], rec["text"],
                                    rec["ts"]))
    elapsed = time.time() - t0
    cols = list(zip(*rows)) if rows else [[] for _ in TRIPLE_COLUMNS]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, SCHEMA)],
        schema=SCHEMA)
    ORACLE_DIR.mkdir(exist_ok=True)
    out = ORACLE_DIR / f"triples_sf{sf:g}.parquet"
    pq.write_table(table, out)
    print(f"sf={sf}: {n} turns -> {len(rows)} triples in {elapsed:.1f}s "
          f"({n / elapsed:.0f} turns/s) -> {out}")
    return out


if __name__ == "__main__":
    sfs = [float(a) for a in sys.argv[1:]] or [0.001, 0.01]
    engine = build_engine()
    persist_model_bundle(engine)
    for sf in sfs:
        make_oracle(engine, sf)
        make_intents_oracle(engine, sf)

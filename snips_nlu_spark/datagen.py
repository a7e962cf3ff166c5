"""Deterministic synthetic transcript generator.

Produces the pipeline's input table with the exact BASELINE.json input_hint
schema: (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp). Every field is a pure function of the global
row index — generation is therefore order- and partitioning-independent,
reproducible across runs, and distributable (``generate_spark`` fans the
index space out with mapInPandas; no driver-side materialization).

sf → rows: ``n_turns(sf) = int(sf * 1_000_000)`` (sf0.001 → 1,000 turns).

Text diversity: a ``unique_frac`` share of rows (default 0.35) embeds a
row-index-derived token, making those texts GLOBALLY UNIQUE — number and
datetime slots get derived values ("make me 4821 cups...", "in 4821
minutes"), slot-free user templates and all filler turns get a derived
trailing clause. Round-3 VERDICT: the previous corpus collapsed to 261
distinct texts at every scale factor, so every repeated-input benchmark
timed executor memo lookups instead of the parse kernel; the unique share
keeps throughput/scaling numbers kernel-honest while the repeated share
still exercises the (realistic, reference-matching) memoized path.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

from .fixtures import FILLER_TEXTS, GEN_TEMPLATES, TOOL_NAMES, VALUE_POOLS

TURNS_PER_CONV = 8
BASE_TS = _dt.datetime(2024, 1, 1, 8, 0, 0)
_ROLES = ("user", "assistant", "tool")

# share of rows carrying a row-index-derived (globally unique) token;
# DATAGEN_VERSION keys the _generated/ parquet cache — bump it whenever
# generation output changes, or stale caches mask the change
UNIQUE_FRAC = 0.35
DATAGEN_VERSION = 3


def _is_unique_row(i: int, unique_frac: float) -> bool:
    return _mix(i, 31) % 1_000_000 < int(unique_frac * 1_000_000)

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def n_turns(sf: float) -> int:
    return max(TURNS_PER_CONV, int(round(sf * 1_000_000)))


def _mix(i: int, salt: int) -> int:
    """Deterministic 64-bit integer hash (splitmix64 finalizer)."""
    z = (i + salt * 0x9E3779B97F4A7C15 + 0x9E3779B97F4A7C15) & (2**64 - 1)
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2**64 - 1)
    return z ^ (z >> 31)


def render_template(template, row_idx: int,
                    unique: bool = False) -> tuple[str, list[dict]]:
    """Render (intent, chunks) → (text, slot truth) deterministically.

    ``unique=True`` embeds a row-index-derived token so the text is
    globally unique, choosing the least-invasive injection the template
    supports (verified against the fitted engine — intent and slot truth
    stay exact for all three shapes):
    - a ``numbers`` slot gets the derived digits ("make me 4823 cups…")
      — still a deterministic-parser match;
    - else a ``datetimes`` slot gets "in <digits> days" — still a
      deterministic-parser match;
    - else the text gets an opaque leading token ("req4823x turn on …")
      — deterministic regexes no longer match, so the row exercises the
      full probabilistic path (classifier + CRF), which keeps intent and
      slot spans correct for every template (OOV token ⇒ zero TF-IDF
      feature, O-tagged by the CRF).
    """
    inject = None
    if unique:
        pools = [c[2] for c in template if not isinstance(c, str)]
        if "numbers" in pools:
            inject = "numbers"
        elif "datetimes" in pools:
            inject = "datetimes"
        else:
            template = (f"req{row_idx + 2}x ", *template)
    parts: list[str] = []
    truth: list[dict] = []
    cursor = 0
    for k, chunk in enumerate(template):
        if isinstance(chunk, str):
            parts.append(chunk)
            cursor += len(chunk)
        else:
            slot_name, entity, pool_name = chunk
            if inject == "numbers" and pool_name == "numbers":
                value = str(row_idx + 2)
                inject = None
            elif inject == "datetimes" and pool_name == "datetimes":
                # modulus keeps anchor+N days inside datetime's range
                # (~2.9M days to year 9999) at ANY scale factor; rows
                # ≥2M apart may collide only if every other derived
                # field also matches — negligible against the ≥30%
                # uniqueness bound (pinned in test_round4_fixes)
                value = f"in {row_idx % 2_000_000 + 2} days"
                inject = None
            else:
                pool = VALUE_POOLS[pool_name]
                value = pool[_mix(row_idx, 1000 + k) % len(pool)]
            parts.append(value)
            truth.append({"slot_name": slot_name, "entity": entity,
                          "value": value, "start": cursor,
                          "end": cursor + len(value)})
            cursor += len(value)
    return "".join(parts), truth


def turn_record(i: int, unique_frac: float = UNIQUE_FRAC) -> dict:
    """Row ``i`` of the transcript table — pure function of ``i``."""
    conv = i // TURNS_PER_CONV
    turn_idx = i % TURNS_PER_CONV
    role = _ROLES[turn_idx % 3]
    uniq = _is_unique_row(i, unique_frac)
    ts = BASE_TS + _dt.timedelta(minutes=conv * 11, seconds=turn_idx * 45)
    if role == "user":
        tpl_idx = _mix(i, 7) % len(GEN_TEMPLATES)
        intent, template = GEN_TEMPLATES[tpl_idx]
        text, _ = render_template(template, i, unique=uniq)
        tool = None
    else:
        text = FILLER_TEXTS[_mix(i, 13) % len(FILLER_TEXTS)]
        if uniq:
            # unique filler exercises the full None-intent cascade on a
            # fresh string (deterministic + lookup miss → probabilistic)
            text = f"{text} req{i + 2}x"
        tool = TOOL_NAMES[_mix(i, 17) % len(TOOL_NAMES)] \
            if role == "tool" else None
    return {
        "conv_id": f"conv_{conv:08d}",
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts,
    }


def expected_user_turn(i: int, unique_frac: float = UNIQUE_FRAC) \
        -> tuple[str, list[dict]] | None:
    """Ground-truth (intent, slots) for row i, None for non-user rows —
    used by quality-gate tests (triple P/R vs generation truth)."""
    if _ROLES[(i % TURNS_PER_CONV) % 3] != "user":
        return None
    tpl_idx = _mix(i, 7) % len(GEN_TEMPLATES)
    intent, template = GEN_TEMPLATES[tpl_idx]
    _, truth = render_template(template, i,
                               unique=_is_unique_row(i, unique_frac))
    return intent, truth


def generate_pandas(start: int, end: int,
                    unique_frac: float = UNIQUE_FRAC) -> pd.DataFrame:
    """Rows [start, end) as a pandas DataFrame."""
    records = [turn_record(i, unique_frac) for i in range(start, end)]
    df = pd.DataFrame.from_records(records, columns=TRANSCRIPT_COLUMNS)
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = pd.to_datetime(df["ts"])
    return df


def generate_spark(spark, sf: float, num_partitions: int | None = None,
                   unique_frac: float = UNIQUE_FRAC):
    """Distributed generation: spark.range over the row-index space →
    mapInPandas render. Scales linearly — at 10^12 turns this is the same
    job with a bigger range."""
    from pyspark.sql import functions as F  # noqa: N812
    from pyspark.sql import types as T  # noqa: N812

    total = n_turns(sf)
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ])

    def render(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield generate_pandas(int(ids.min()), int(ids.max()) + 1,
                                      unique_frac)

    # range is contiguous per partition, so min..max reconstruction is exact
    return (spark.range(0, total, 1, num_partitions)
            .mapInPandas(render, schema=schema))


def transcripts_path(sf_dir: str) -> str:
    """Cache location for the generated transcript parquet of a given
    testdata sf dir (kept inside the repo; /root/testdata is read-only)."""
    sf = sf_from_dir(sf_dir)
    return cache_path_for_sf(sf)


def cache_path_for_sf(sf: float) -> str:
    """Versioned cache path — the version key guarantees stale parquet
    from an older generator is never read as current output."""
    from pathlib import Path
    cache_root = Path(__file__).resolve().parent.parent / "_generated"
    return str(cache_root / f"transcripts_v{DATAGEN_VERSION}_sf{sf:g}")


def sf_from_dir(sf_dir: str) -> float:
    """'/root/testdata/sf0.01' → 0.01"""
    name = str(sf_dir).rstrip("/").rsplit("/", 1)[-1]
    return float(name.replace("sf", "")) if name.startswith("sf") else 0.01


def load_or_generate_transcripts(spark, sf_dir: str):
    """Return the transcript DataFrame for the given sf dir, generating and
    caching a parquet on first use (partitioned write → stable layout)."""
    from pathlib import Path
    path = transcripts_path(sf_dir)
    marker = Path(path) / "_SUCCESS"
    if not marker.exists():
        sf = sf_from_dir(sf_dir)
        generate_spark(spark, sf).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)

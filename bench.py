"""Benchmark harness — prints ONE JSON line with headline metrics.

Runs the KG pipeline's headline queries on the deterministic synthetic
transcript table for $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1 →
100k turns) on local[$SPARK_GRAFT_CPUS] (default 32).

Scaling evidence (BASELINE.json north_rule): the same parse job at two
parallelism levels — local[8] vs local[32], the sandbox stand-in for N vs
4N executors — on the same pre-generated input, at a size where kernel
compute dominates fixed stage overheads ($SPARK_GRAFT_SCALE_SF, default
4.0 → 4M turns; at sf0.1 a run is ~1s of which ~0.5s is scheduler/stage
constants, which would measure Spark's fixed costs, not the pipeline).
Reported: turns/sec at both levels + efficiency thr(4N)/(4·thr(N)).
Disable with SPARK_GRAFT_SCALING=0.

Methodology notes:
- the timed parse is shuffle-free: the parquet scan is split via
  spark.sql.files.maxPartitionBytes (compute-bound stage → small splits);
  salted repartition (spark/stages.py) remains the documented path for
  skewed inputs and is exercised in tests, not in the timed path.
- a warm-up pass forks the Python workers, ships the broadcast and builds
  the engine once per worker — one-time costs a long-running job
  amortizes; throughput is steady-state.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
# N→4N pair: 4 vs 16 cores by default. On this 32-core box, local[8] vs
# local[32] saturates the machine — executor-JVM threads (scan, Arrow,
# shuffle, agg) and the 32 Python workers then compete for the same cores,
# which measures box saturation, not pipeline scaling; 4→16 leaves the JVM
# headroom, like separate executor hosts on a real cluster. Both pairs are
# documented in BASELINE.md.
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
# 0.5 → 500k turns. Round 3 used sf8 (8M turns), but that corpus was
# memo-bound (261 distinct texts); with the round-4 diversified corpus
# (35% globally-unique texts) the scaling legs time the real parse
# kernel, and 500k turns already gives a 4-core leg tens of seconds of
# kernel compute — far above fixed stage overheads.
SCALE_SF = float(os.environ.get("SPARK_GRAFT_SCALE_SF", "0.5"))
# best-of-N timing for every query: single samples are hostage to box
# load (round-2 driver capture recorded a phantom 1.5x parse regression
# that a quiet-box rerun contradicted)
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
# the scaling pairs feed a RATIO gate — median-of-5 by default: this box
# sees external (host-side) load spikes of 4-6 that a 3-sample median
# cannot always reject (observed primed ratios 0.64-0.93 across runs of
# identical code)
SCALE_REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "5"))

# compute-bound stage: ~2 MB parquet ≈ 60k turns ≈ 2-3 s of kernel work
SPLIT_BYTES = 2 << 20


def _fresh_spark(cpus: int):
    from snips_nlu_spark.spark.session import get_spark
    return get_spark(f"bench-{cpus}", cpus=cpus,
                     max_partition_bytes=SPLIT_BYTES)


def _model_json() -> str:
    import __spark_entry__ as entrymod
    return entrymod._model_json()


def _transcripts(spark, sf_dir: str):
    from snips_nlu_spark.datagen import load_or_generate_transcripts
    return load_or_generate_transcripts(spark, sf_dir)


def _scale_input(spark):
    """Pre-generated parquet for the scaling runs (cached across runs;
    versioned path — a generator change invalidates the cache)."""
    from snips_nlu_spark.datagen import cache_path_for_sf, generate_spark
    path = Path(cache_path_for_sf(SCALE_SF))
    if not (path / "_SUCCESS").exists():
        generate_spark(spark, SCALE_SF, num_partitions=128) \
            .write.mode("overwrite").parquet(str(path))
    return spark.read.parquet(str(path))


def _warm_engine(spark, model_json, df, cpus: int) -> None:
    """Fork Python workers + ship the broadcast + build the engine once
    per worker (one-time costs a long-running job amortizes)."""
    from snips_nlu_spark.spark.stages import parse_transcripts
    parse_transcripts(df.limit(cpus * 100), model_json).count()


def _prime_cache(df) -> None:
    """Prime the OS page cache with the actual data pages (count() alone
    reads only parquet metadata), so both parallelism levels see
    identical I/O conditions."""
    from pyspark.sql import functions as F
    df.agg(F.sum(F.length("text"))).collect()


def _warm(spark, model_json, df, cpus: int) -> None:
    _prime_cache(df)
    _warm_engine(spark, model_json, df, cpus)


def _best_of(fn, repeats: int = 0) -> float:
    """Best wall time over `repeats` runs of fn (peak steady-state)."""
    repeats = repeats or REPEATS
    best = None
    for i in range(repeats):
        t0 = time.time()
        fn(i)
        run = time.time() - t0
        best = run if best is None else min(best, run)
    return best


def _timed_parse(spark, model_json, df, repeats: int = 1,
                 stat: str = "best") -> dict:
    """Steady-state throughput. stat="best" reports the best wall time
    (peak steady-state — right for absolute headline numbers);
    stat="median" reports the median (right for the N→4N efficiency
    RATIO, where a lucky sample in either level's denominator skews the
    quotient both ways — observed ±15% on the 4-core leg)."""
    from snips_nlu_spark.spark.stages import parse_transcripts
    n_turns = df.count()
    walls = []
    n_triples = 0
    for _ in range(repeats):
        t0 = time.time()
        n_triples = parse_transcripts(df, model_json).count()
        walls.append(time.time() - t0)
    first = walls[0]
    walls = sorted(walls)
    wall = walls[0] if stat == "best" else walls[len(walls) // 2]
    return {"wall_sec": wall, "first_wall_sec": first,
            "n_turns": n_turns, "n_triples": n_triples,
            "turns_per_sec": n_turns / wall,
            "first_turns_per_sec": n_turns / first,
            "triples_per_sec": n_triples / wall}


_BURN_ENGINE = None


def _burn_init() -> None:
    """Pool initializer: build + warm the engine once per worker, so the
    timed maps measure parsing only (a per-task engine build overlaps
    other workers' timed regions and collapses the reading)."""
    global _BURN_ENGINE
    from snips_nlu_spark.engine import NluEngine
    _BURN_ENGINE = NluEngine.from_dict(json.loads(_model_json()))
    _BURN_ENGINE.parse_batch(["make me 2 cups of coffee burnwarm"],
                             [None])


def _burn_worker(args) -> int:
    wid, n, tag = args
    texts = [f"make me {i} cups of coffee variant {tag}w{wid}_{i}"
             for i in range(n)]
    _BURN_ENGINE.parse_batch(texts, [None] * n)
    return n


def _make_burn_pool(cpus: int):
    """Persistent pool with warm engines; fork it and run a sync map so
    every worker is initialized before any timed sample."""
    import multiprocessing as mp
    pool = mp.Pool(cpus, initializer=_burn_init)
    pool.map(_burn_worker, [(w, 20, "poolwarm") for w in range(cpus)])
    return pool


def _burn_tps(pool, cpus: int, n_per_core: int, tag: str) -> float:
    """Aggregate no-Spark multiprocessing throughput (wall-based): the
    box's saturated Python ceiling under the CURRENT load."""
    t0 = time.perf_counter()
    pool.map(_burn_worker, [(w, n_per_core, tag) for w in range(cpus)])
    return cpus * n_per_core / (time.perf_counter() - t0)


def _loadavg() -> float:
    """1-min load at sample time. This box sees host-side load spikes
    (observed 4-18 with zero local processes — round-4 VERDICT #1: the
    driver's capture ran at elevated load and understated the repo by
    ~1.7x); stamping the load into the JSON makes a skewed capture
    self-describing."""
    return round(os.getloadavg()[0], 2)


def main() -> None:
    from snips_nlu_spark.datagen import UNIQUE_FRAC
    sf = float(Path(SF_DIR).name.replace("sf", "") or 0.1)
    queries: dict[str, float] = {}
    load_start = _loadavg()
    if load_start > 4:
        print(f"bench: WARNING 1-min load {load_start} at start — "
              "headline samples may understate the repo", file=sys.stderr)

    spark = _fresh_spark(CPUS)
    model_json = _model_json()
    transcripts = _transcripts(spark, SF_DIR)
    _warm(spark, model_json, transcripts, CPUS)

    # q1: full parse (transcripts → triples), the flagship stage.
    # HEADLINE = the median FIRST-run wall across REPEATS independent
    # sessions: a first run is the only memo-honest sample (repeats in
    # one session re-hit the worker-lifetime parse memo — round-3
    # VERDICT #1), and restarting the session per sample makes every
    # sample cold while the median rejects host-load spikes (single
    # first-run samples on this box vary ~2x). The warm number is still
    # reported separately — honest steady-state for a repetitive
    # corpus, just not the headline.
    import statistics
    firsts = []
    headline_loads = []
    for rep in range(REPEATS):
        if rep > 0:
            spark.stop()
            spark = _fresh_spark(CPUS)
            transcripts = _transcripts(spark, SF_DIR)
            _warm(spark, model_json, transcripts, CPUS)
        headline_loads.append(_loadavg())
        r = _timed_parse(spark, model_json, transcripts)
        firsts.append(r)
    median_wall = statistics.median(r["first_wall_sec"] for r in firsts)
    parse_stats = dict(firsts[0], first_wall_sec=median_wall,
                       first_turns_per_sec=firsts[0]["n_turns"]
                       / median_wall)
    queries["parse_triples"] = round(median_wall, 3)
    # warm steady-state in the (memo-full) final session
    warm = _timed_parse(spark, model_json, transcripts, repeats=2)
    queries["parse_triples_warm"] = round(warm["wall_sec"], 3)

    # q2: graph rollups (dedup + nodes + edges) over parsed triples
    from snips_nlu_spark.spark.graph import (dedup_triples, edges_rollup,
                                             nodes_rollup)
    from snips_nlu_spark.spark.stages import parse_transcripts
    triples = parse_transcripts(transcripts, model_json).cache()
    triples.count()

    def _rollups(_):
        d = dedup_triples(triples)
        nodes_rollup(d).count()
        edges_rollup(d).count()
    queries["graph_rollups"] = round(_best_of(_rollups), 3)

    # q2a: KG-construction layer over the cached triples — the
    # two-pass bucketed negative draw (round-5d) and the TransE rank
    # pass (driver-trained embeddings + broadcast zip_with scoring);
    # both reuse the cached parse so they time the construction
    # machinery, not the parse.
    from snips_nlu_spark.spark.kg import negative_samples
    from snips_nlu_spark.spark.kg_embed import link_prediction_ranks
    queries["kg_negative_samples"] = round(_best_of(
        lambda _: negative_samples(triples, n_neg=2).count()), 3)
    queries["kg_transe_ranks"] = round(_best_of(
        lambda _: link_prediction_ranks(triples).count()), 3)
    triples.unpersist()

    # q2b: n-best intent ranking (round-1 verdict: was the slowest
    # per-turn kernel; now batched through one classifier matmul)
    from snips_nlu_spark.spark.stages import rank_intents
    queries["intent_nbest"] = round(_best_of(
        lambda _: rank_intents(transcripts, model_json, top_n=3).count()), 3)

    # q2c: training-data ops (LSH-based dedup + ANN — the round-1 verdict
    # perf-weak items; timed so BENCH tracks them across rounds)
    from snips_nlu_spark.functions.dedup import minhash_duplicate_pairs
    from snips_nlu_spark.functions.similarity import lsh_bucketed_topk
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    queries["doc_minhash_pairs"] = round(_best_of(
        lambda _: minhash_duplicate_pairs(docs, threshold=0.5).count()), 3)
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries["emb_lsh_topk"] = round(_best_of(
        lambda _: lsh_bucketed_topk(embs, k=5, n_queries=20).count()), 3)
    from snips_nlu_spark.functions.similarity import ivf_topk
    queries["emb_ivf_topk"] = round(_best_of(
        lambda _: ivf_topk(embs, k=5, n_queries=20).count()), 3)
    from snips_nlu_spark.functions.similarity import ivf_pq_topk
    queries["emb_ivf_pq_topk"] = round(_best_of(
        lambda _: ivf_pq_topk(embs, k=5, n_queries=20).count()), 3)

    # q2c': round-5b pipeline compositions — keep-one dedup (pairs →
    # star closure → survivor), corpus-LM scoring, and the packing plan
    from snips_nlu_spark.functions.dedup import dedup_corpus
    from snips_nlu_spark.functions.sampling import pack_sequences
    from snips_nlu_spark.functions.text import bigram_lm_scores
    queries["doc_dedup_corpus"] = round(_best_of(
        lambda _: dedup_corpus(docs).count()), 3)
    queries["doc_lm_scores"] = round(_best_of(
        lambda _: bigram_lm_scores(docs).count()), 3)
    queries["doc_pack_plan"] = round(_best_of(
        lambda _: pack_sequences(docs, seq_len=2048).count()), 3)

    # q2c'': round-5c additions — window-fingerprint substring dedup
    # (the heaviest new shuffle shape: per-token windows → one hash
    # agg → coverage union) and the as-of carry-forward merge
    from pyspark.sql import functions as _F
    from snips_nlu_spark.functions.dedup import substring_dup_spans
    from snips_nlu_spark.functions.temporal import asof_join
    queries["doc_substring_dups"] = round(_best_of(
        lambda _: substring_dup_spans(docs).count()), 3)
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    queries["event_asof_attribution"] = round(_best_of(
        lambda _: asof_join(
            events.filter(_F.col("event_type") == "purchase"),
            events.filter(_F.col("event_type") == "click"),
            by=["user_id"], payload=["value"]).count()), 3)

    # q2d: cold path — fully-unique texts defeat every executor memo, so
    # this measures the raw per-string engine (BASELINE.md cold-path
    # section tracks the optimization work on it). Each repeat uses a
    # DISTINCT text set — the parse memo lives on the per-worker engine
    # and survives across jobs, so re-running identical texts would time
    # memo lookups, not the engine.
    from pyspark.sql import functions as F
    from snips_nlu_spark.spark.stages import parse_transcripts as _pt

    def _unique_batch(tag: str, n: int = 50_000, parts: int | None = None):
        return spark.range(n, numPartitions=parts).select(
            F.concat(F.lit("conv_u"), (F.col("id") / 50).cast("long")
                     .cast("string")).alias("conv_id"),
            F.pmod(F.col("id"), F.lit(50)).cast("int").alias("turn_idx"),
            F.concat(F.lit("make me "), F.col("id").cast("string"),
                     F.lit(f" cups of coffee variant {tag}_"),
                     F.col("id").cast("string")).alias("text"),
            F.lit(None).cast("timestamp").alias("ts"))
    _pt(_unique_batch("warm").limit(CPUS * 50), model_json).count()
    cold_sec = _best_of(lambda i: _pt(_unique_batch(f"r{i}"),
                                      model_json).count())
    queries["cold_unique_parse"] = round(cold_sec, 3)
    cold_tps = round(50_000 / cold_sec, 1)

    # q2e: cold path vs the SAME-SESSION multiprocessing-burn ceiling
    # (round-4 VERDICT: the box saturates at ~68% per-core retention
    # with NO Spark — the honest bar for the Spark path is that burn
    # number measured under the same load, not a stale constant).
    # Interleaved burn/Spark samples; the Spark leg uses 200k texts so
    # the ~0.8s fixed job cost (plan+submit ~0.4s, task ramp ~0.3s —
    # measured via in-kernel timelines, scripts/profile_spark_overhead
    # .py) is <10% of the wall: at 50k texts those fixed costs alone
    # cap the ratio at ~0.76 and the number measures job latency, not
    # pipeline throughput.
    # host load spikes hit single samples hard (observed a full-bench
    # capture where one spike window read the burn 5x slow): sample
    # BACK-TO-BACK burn/Spark pairs so each pair shares one load regime,
    # take the median of per-pair ratios, and export every sample so a
    # skewed capture is self-describing.
    import statistics as _stats
    burn_samples, spark_samples = [], []
    n_cold = 200_000
    burn_pool = _make_burn_pool(CPUS)
    for rep in range(5):
        burn_samples.append(_burn_tps(burn_pool, CPUS, 1600, f"b{rep}"))
        t0 = time.time()
        # 2 waves of CPUS tasks: one wave leaves the wall hostage to the
        # slowest task (+15-25% under core contention); more waves pay
        # local-mode per-task overhead (both measured, sweep at 400k)
        _pt(_unique_batch(f"big{rep}", n_cold, parts=2 * CPUS),
            model_json).count()
        spark_samples.append(n_cold / (time.time() - t0))
    burn_pool.terminate()
    burn_tps = _stats.median(burn_samples)
    cold_at_scale = _stats.median(spark_samples)
    cold_ratio = _stats.median(
        s / b for s, b in zip(spark_samples, burn_samples))
    queries["cold_unique_parse_200k"] = round(n_cold / cold_at_scale, 3)

    # q3: checkpointed end-to-end build (parse + partitioned write +
    # lineage + rollup sinks); fresh output dir per repeat so each run
    # is a full build, not a resume no-op.
    # MEMO STATE MATTERS here and the cold legs above just filled the
    # worker memos with ~1M throwaway unique texts (the corpus memo is
    # gone), so time BOTH states explicitly: build_kg_cold = the first
    # build on the defeated memo (≈ the true cold end-to-end a fresh
    # cluster pays: one full parse + write + ledger + rollups);
    # build_kg_checkpointed = subsequent builds with the corpus memo
    # warm (the steady-state number, protocol-comparable with r4's
    # capture which ran before the 200k legs existed).
    from snips_nlu_spark.spark.lineage import build_kg
    out_dirs = [tempfile.mkdtemp(prefix="bench_kg_")
                for _ in range(REPEATS + 1)]
    t0 = time.time()
    build_kg(spark, transcripts, model_json, out_dirs[-1],
             n_buckets=max(CPUS, 8))
    queries["build_kg_cold"] = round(time.time() - t0, 3)
    queries["build_kg_checkpointed"] = round(_best_of(
        lambda i: build_kg(spark, transcripts, model_json, out_dirs[i],
                           n_buckets=max(CPUS, 8))), 3)
    for d in out_dirs:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()

    first_tps = parse_stats["first_turns_per_sec"]
    result = {
        "metric": "turns_per_sec",
        "value": round(first_tps, 1),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_turns": parse_stats["n_turns"],
        "n_triples": parse_stats["n_triples"],
        "triples_per_sec": round(
            parse_stats["n_triples"] / parse_stats["first_wall_sec"], 1),
        "warm_turns_per_sec": round(warm["turns_per_sec"], 1),
        "cold_unique_turns_per_sec": cold_tps,
        "cold_at_scale_turns_per_sec": round(cold_at_scale, 1),
        "burn_ceiling_turns_per_sec": round(burn_tps, 1),
        "cold_vs_burn_ratio": round(cold_ratio, 3),
        "cold_burn_samples": [round(b, 1) for b in burn_samples],
        "cold_spark_samples": [round(s, 1) for s in spark_samples],
        "unique_text_frac": UNIQUE_FRAC,
        "cpus": CPUS,
        "loadavg": {"start": load_start, "end": _loadavg(),
                    "headline_samples": headline_loads},
    }

    if SCALING:
        # INTERLEAVED sampling: alternate N and 4N sessions so both legs
        # of the ratio sample the same external-load regime — round 3
        # observed host-side load spikes of 4-6 on an otherwise idle VM,
        # and the old phase-per-leg protocol let one spike land entirely
        # on one leg (primed ratios 0.64-0.93 for identical code). The
        # ratio is median(thr_4N samples) / (4 * median(thr_N samples)).
        # "unprimed" = the first-touch pair (page cache as found; round-1
        # verdict asked for it alongside the primed number); every later
        # sample runs after an explicit cache prime so both levels see
        # identical I/O conditions.
        primed: dict[int, list] = {SCALE_N: [], 4 * SCALE_N: []}
        unprimed = {}
        n_scale_turns = 0
        for rep in range(SCALE_REPEATS):
            for cpus in (SCALE_N, 4 * SCALE_N):
                s = _fresh_spark(cpus)
                df = _scale_input(s)
                _warm_engine(s, model_json, df, cpus)
                if rep == 0:
                    unprimed[cpus] = _timed_parse(s, model_json, df)
                    # the unprimed run filled the worker-lifetime parse
                    # memos; restart the session so the rep-0 primed
                    # sample is kernel-cold like every other sample
                    # (page-cache priming is the only intended
                    # difference between the legs)
                    s.stop()
                    s = _fresh_spark(cpus)
                    df = _scale_input(s)
                    _warm_engine(s, model_json, df, cpus)
                _prime_cache(df)
                r = _timed_parse(s, model_json, df)
                primed[cpus].append(r["turns_per_sec"])
                n_scale_turns = r["n_turns"]
                s.stop()
        thr_n = statistics.median(primed[SCALE_N])
        thr_4n = statistics.median(primed[4 * SCALE_N])
        u_n = unprimed[SCALE_N]["turns_per_sec"]
        u_4n = unprimed[4 * SCALE_N]["turns_per_sec"]
        result["scaling"] = {
            "scale_sf": SCALE_SF,
            "n_turns": n_scale_turns,
            "cores_n": SCALE_N, "cores_4n": 4 * SCALE_N,
            "turns_per_sec_n": round(thr_n, 1),
            "turns_per_sec_4n": round(thr_4n, 1),
            "efficiency_n_to_4n": round(thr_4n / (4 * thr_n), 3),
            "unprimed_turns_per_sec_n": round(u_n, 1),
            "unprimed_turns_per_sec_4n": round(u_4n, 1),
            "unprimed_efficiency_n_to_4n": round(u_4n / (4 * u_n), 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()

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


def _fnv1a(token: str) -> int:
    """Per-char FNV-1a fold — deliberately the SLOW independent
    implementation (the Spark kernel is a vectorized numpy rewrite;
    tests/test_round2_fixes.py pins their equality, and this oracle keeps
    the driver gate independent of the vectorized code path)."""
    h = 0xCBF29CE484222325
    for ch in token.encode("utf8"):
        h = ((h ^ ch) * 0x100000001B3) % (1 << 64)
    return h


def make_simhash_oracle(sf: float) -> Path:
    import re

    import pandas as pd

    docs = pd.read_parquet(f"/root/testdata/sf{sf:g}/documents.parquet",
                           columns=["doc_id", "text"])
    sigs = []
    for text in docs["text"].astype(str):
        tokens = re.findall("[a-z0-9]+", text.lower())
        votes = [0] * 64
        for tok in tokens:
            h = _fnv1a(tok)
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        sig = sum(1 << b for b in range(64) if votes[b] > 0)
        sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
    table = pa.table({"doc_id": docs["doc_id"],
                      "simhash": pa.array(sigs, type=pa.int64())})
    out = ORACLE_DIR / f"simhash_sf{sf:g}.parquet"
    pq.write_table(table, out)
    print(f"sf={sf}: simhash oracle -> {len(sigs)} rows -> {out}")
    return out


def make_lsh_topk_oracle(sf: float, k: int = 5, n_queries: int = 20,
                         n_tables: int = 8, n_bits: int = 8,
                         dim: int = 64, seed: int = 42) -> Path:
    """Pure-numpy re-execution of functions/similarity.lsh_bucketed_topk
    (same hyperplanes, independent candidate generation + scoring) — the
    differential for the Spark bucket-join plumbing."""
    import math

    import numpy as np
    import pandas as pd

    emb = pd.read_parquet(f"/root/testdata/sf{sf:g}/embeddings.parquet")
    vec_ids = emb["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb["embedding"]])
    planes = np.random.RandomState(seed).randn(n_tables, n_bits, dim)
    proj = mat @ planes.reshape(n_tables * n_bits, dim).T
    bits = (proj >= 0).reshape(len(mat), n_tables, n_bits)
    buckets = (bits * (1 << np.arange(n_bits))).sum(axis=2)  # (n, T)

    def round6(x: float) -> float:  # HALF_UP like Spark's F.round
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    norms = np.sqrt((mat * mat).sum(axis=1))
    rows = []
    q_idx = np.nonzero(vec_ids < n_queries)[0]
    for qi in q_idx:
        cand = np.zeros(len(mat), dtype=bool)
        for t in range(n_tables):
            cand |= buckets[:, t] == buckets[qi, t]
        cand[qi] = False
        idxs = np.nonzero(cand)[0]
        sims = []
        for ci in idxs:
            denom = norms[qi] * norms[ci]
            sim = float(mat[qi] @ mat[ci] / denom) if denom > 0 else 0.0
            sims.append((round6(sim), int(vec_ids[ci])))
        sims.sort(key=lambda s: (-s[0], s[1]))
        for rank, (sim, nid) in enumerate(sims[:k], start=1):
            rows.append((int(vec_ids[qi]), nid, sim, rank))
    table = pa.table({
        "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "sim": pa.array([r[2] for r in rows], type=pa.float64()),
        "rank": pa.array([r[3] for r in rows], type=pa.int32())})
    out = ORACLE_DIR / f"lsh_topk_sf{sf:g}.parquet"
    pq.write_table(table, out)
    print(f"sf={sf}: lsh topk oracle -> {len(rows)} rows -> {out}")
    return out


MULTILANG_SCHEMA = pa.schema([("lang", pa.string())]
                             + list(SCHEMA))


def make_multilang_oracle() -> Path:
    """Fit one engine per non-en language pack, persist the bundles (the
    Spark query broadcasts them) and the expected triples for the
    deterministic multilang_turns() table (single-process reference
    execution of the same spec — mirrors spark/stages.parse_multilang
    incl. the date-floored anchor)."""
    import datetime as _dt
    import json

    from snips_nlu_spark.fixtures import (multilang_datasets,
                                          multilang_turns)
    from snips_nlu_spark.spark.stages import triples_from_result

    engines = {lang: NluEngine().fit(ds)
               for lang, ds in sorted(multilang_datasets().items())}
    bundles = {lang: eng.to_dict() for lang, eng in engines.items()}
    ORACLE_DIR.mkdir(exist_ok=True)
    bpath = ORACLE_DIR / "multilang_bundles.json"
    bpath.write_text(json.dumps(bundles, sort_keys=True), encoding="utf8")
    print(f"multilang bundles -> {bpath} "
          f"({bpath.stat().st_size / 1e6:.1f} MB)")

    rows: list[tuple] = []
    for rec in multilang_turns():
        eng = engines[rec["lang"]]
        ts = rec["ts"]
        anchor = _dt.datetime(ts.year, ts.month, ts.day)
        res = eng.parse(rec["text"], anchor=anchor)
        for row in triples_from_result(res, rec["conv_id"],
                                       rec["turn_idx"]):
            rows.append((rec["lang"], *row))
    cols = list(zip(*rows)) if rows else [[] for _ in MULTILANG_SCHEMA]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type)
         for c, f in zip(cols, MULTILANG_SCHEMA)], schema=MULTILANG_SCHEMA)
    out = ORACLE_DIR / "multilang.parquet"
    pq.write_table(table, out)
    print(f"multilang oracle -> {len(rows)} triples -> {out}")
    return out


def make_ivf_topk_oracle(sf: float, k: int = 5, n_queries: int = 20,
                         n_centroids: int = 32, n_probe: int = 8,
                         seed: int = 42, sample_cap: int = 20000,
                         n_iter: int = 10) -> Path:
    """Pure-numpy re-execution of functions/similarity.ivf_topk (same
    deterministic Lloyd's quantizer spec, independent assignment /
    probe / scoring code) — the differential for the Spark cell-join
    plumbing."""
    import math

    import numpy as np
    import pandas as pd

    emb = (pd.read_parquet(f"/root/testdata/sf{sf:g}/embeddings.parquet")
           .sort_values("vec_id").reset_index(drop=True))
    vec_ids = emb["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb["embedding"]])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms

    train = matn[:sample_cap]
    rng = np.random.RandomState(seed)
    cent = train[rng.choice(len(train),
                            size=min(n_centroids, len(train)),
                            replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(len(cent)):
            members = train[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n

    cells = np.argmax(matn @ cent.T, axis=1)

    def round6(x: float) -> float:  # HALF_UP like Spark's F.round
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    raw_norms = np.linalg.norm(mat, axis=1)
    rows = []
    for qi in np.nonzero(vec_ids < n_queries)[0]:
        sims_c = matn[qi] @ cent.T
        probed = np.lexsort((np.arange(len(cent)), -sims_c))[:n_probe]
        cand = np.isin(cells, probed)
        cand[qi] = False
        sims = []
        for ci in np.nonzero(cand)[0]:
            denom = raw_norms[qi] * raw_norms[ci]
            sim = float(mat[qi] @ mat[ci] / denom) if denom > 0 else 0.0
            sims.append((round6(sim), int(vec_ids[ci])))
        sims.sort(key=lambda s: (-s[0], s[1]))
        for rank, (sim, nid) in enumerate(sims[:k], start=1):
            rows.append((int(vec_ids[qi]), nid, sim, rank))
    table = pa.table({
        "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "sim": pa.array([r[2] for r in rows], type=pa.float64()),
        "rank": pa.array([r[3] for r in rows], type=pa.int32())})
    out = ORACLE_DIR / f"ivf_topk_sf{sf:g}.parquet"
    pq.write_table(table, out)
    print(f"sf={sf}: ivf topk oracle -> {len(rows)} rows -> {out}")
    return out


def make_bpe_oracle(sf: float) -> Path:
    """Independent replay of functions/text.bpe_token_counts: applies
    the committed merge table SEQUENTIALLY in rank order (replace every
    occurrence of each pair, lowest rank first) — provably equivalent
    to the runtime's greedy lowest-rank-first loop (any pair involving
    a merged symbol was learned after it, so its rank is higher), but a
    different code path, so the gate is a true differential."""
    import re

    import pandas as pd

    from snips_nlu_spark.functions.bpe_vocab import MERGES
    from snips_nlu_spark.functions.text import BPE_SPLIT_RE

    docs = pd.read_parquet(
        f"/root/testdata/sf{sf:g}/documents.parquet")
    pat = re.compile(BPE_SPLIT_RE)

    def n_tokens_word(word: str) -> int:
        sym = list(word)
        for a, b in MERGES:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i:i + 2] = [a + b]
                else:
                    i += 1
        return len(sym)

    memo: dict[str, int] = {}
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        total = 0
        for m in pat.finditer(text or ""):
            w = m.group(0)
            n = memo.get(w)
            if n is None:
                n = memo[w] = n_tokens_word(w)
            total += n
        rows.append((int(doc_id), total))
    out = ORACLE_DIR / f"bpe_counts_sf{sf:g}.parquet"
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "n_bpe_tokens": pa.array([r[1] for r in rows],
                                 type=pa.int32())})
    pq.write_table(table, out)
    print(f"sf={sf}: bpe token-count oracle -> {len(rows)} rows -> {out}")
    return out


def make_ivf_pq_oracle(sf: float, **kw) -> Path:
    """Pure-numpy re-execution of functions/similarity.ivf_pq_topk
    (same deterministic quantizer + codebook spec, independent encode /
    ADC / rerank code) — the differential for the Spark PQ plumbing."""
    import numpy as np
    import pandas as pd

    emb = (pd.read_parquet(f"/root/testdata/sf{sf:g}/embeddings.parquet")
           .sort_values("vec_id").reset_index(drop=True))
    vec_ids = emb["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in emb["embedding"]])
    return _ivf_pq_replay(vec_ids, mat,
                          ORACLE_DIR / f"ivf_pq_topk_sf{sf:g}.parquet",
                          **kw)


def make_ivf_pq_scale_oracle(n: int = 100_000) -> Path:
    """VERDICT r4 #7: the >=100k-vector ANN gate. Corpus = the
    counter-hash clustered synthesizer (similarity.synth_matrix — a pure
    function of the id, replayed here exactly), knobs = the scale
    config (sqrt(N) cells, 8-bit PQ codes, 256-deep rerank) whose
    recall@5 vs brute force is asserted >=0.9 in
    tests/test_round5_fixes.py."""
    import numpy as np

    from snips_nlu_spark.functions.similarity import synth_matrix

    ids = np.arange(n, dtype=np.int64)
    mat = synth_matrix(ids).astype(np.float64)
    return _ivf_pq_replay(ids, mat, ORACLE_DIR / "ivf_pq_scale.parquet",
                          n_centroids=316, n_probe=16, m=16, ksub=256,
                          rerank=256)


def make_semantic_dedup_oracle(n: int = 2000, threshold: float = 0.92,
                               n_clusters: int = 32, seed: int = 42,
                               sample_cap: int = 20000,
                               n_iter: int = 10) -> Path:
    """Independent replay of functions/similarity.semantic_dedup_pairs
    on the deterministic clustered synthesizer: same quantizer spec
    (first-sample_cap normalized rows, seeded Lloyd's), independent
    assignment and per-cell pairwise scoring code — the differential
    for the Spark applyInPandas cell-gram plumbing."""
    import numpy as np

    from snips_nlu_spark.functions.similarity import synth_matrix

    ids = np.arange(n, dtype=np.int64)
    mat = synth_matrix(ids).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms

    train = matn[:sample_cap]
    rng = np.random.RandomState(seed)
    cent = train[rng.choice(len(train),
                            size=min(n_clusters, len(train)),
                            replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(len(cent)):
            members = train[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cent[c] = m / nrm
    cells = np.argmax(matn @ cent.T, axis=1)

    rows = []
    for c in np.unique(cells):
        members = np.nonzero(cells == c)[0]  # vec_id order already
        if len(members) < 2:
            continue
        sub = mat[members]
        sub_norms = np.linalg.norm(sub, axis=1, keepdims=True)
        sub_norms[sub_norms == 0] = 1.0
        subn = sub / sub_norms
        sims = subn @ subn.T
        ia, ib = np.triu_indices(len(members), k=1)
        s = sims[ia, ib]
        s = np.copysign(np.floor(np.abs(s) * 1e6 + 0.5) / 1e6, s)
        keep = s >= threshold
        for a, b, sim in zip(members[ia[keep]], members[ib[keep]],
                             s[keep]):
            rows.append((int(ids[a]), int(ids[b]), int(c), float(sim)))
    table = pa.table({
        "vec_a": pa.array([r[0] for r in rows], type=pa.int64()),
        "vec_b": pa.array([r[1] for r in rows], type=pa.int64()),
        "cell": pa.array([r[2] for r in rows], type=pa.int32()),
        "sim": pa.array([r[3] for r in rows], type=pa.float64())})
    out = ORACLE_DIR / "semantic_dups.parquet"
    pq.write_table(table, out)
    print(f"semantic dedup oracle ({n} vectors) -> {len(rows)} rows "
          f"-> {out}")
    return out


def make_semantic_keep_oracle(n: int = 2000, threshold: float = 0.92,
                              n_clusters: int = 32, seed: int = 42,
                              sample_cap: int = 20000,
                              n_iter: int = 10) -> Path:
    """Independent replay of similarity.semantic_dedup_keep: the pair
    stage replayed as in make_semantic_dedup_oracle, transitive closure
    via union-find (a different algorithm than the Spark star rounds),
    then the SemDeDup keep policy — per dup cluster keep the member
    with the LOWEST centroid cosine, ties to min vec_id."""
    import numpy as np

    from snips_nlu_spark.functions.similarity import synth_matrix

    ids = np.arange(n, dtype=np.int64)
    mat = synth_matrix(ids).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms

    train = matn[:sample_cap]
    rng = np.random.RandomState(seed)
    cent = train[rng.choice(len(train),
                            size=min(n_clusters, len(train)),
                            replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(len(cent)):
            members = train[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cent[c] = m / nrm
    all_sims = matn @ cent.T
    cells = np.argmax(all_sims, axis=1)
    csim = all_sims[np.arange(n), cells]
    csim = np.copysign(np.floor(np.abs(csim) * 1e6 + 0.5) / 1e6, csim)

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in np.unique(cells):
        members = np.nonzero(cells == c)[0]
        if len(members) < 2:
            continue
        sub = mat[members]
        sub_norms = np.linalg.norm(sub, axis=1, keepdims=True)
        sub_norms[sub_norms == 0] = 1.0
        subn = sub / sub_norms
        sims = subn @ subn.T
        ia, ib = np.triu_indices(len(members), k=1)
        s = sims[ia, ib]
        s = np.copysign(np.floor(np.abs(s) * 1e6 + 0.5) / 1e6, s)
        for a, b in zip(members[ia[s >= threshold]],
                        members[ib[s >= threshold]]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    cluster = [find(i) for i in range(n)]
    keepers = {}
    for i in range(n):
        c = cluster[i]
        cur = keepers.get(c)
        cand = (csim[i], i)
        if cur is None or cand < cur:
            keepers[c] = cand
    rows = [(int(ids[i]), int(ids[cluster[i]]), float(csim[i]),
             keepers[cluster[i]][1] == i) for i in range(n)]
    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "cluster_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "centroid_sim": pa.array([r[2] for r in rows],
                                 type=pa.float64()),
        "kept": pa.array([r[3] for r in rows], type=pa.bool_())})
    out = ORACLE_DIR / "semantic_keep.parquet"
    pq.write_table(table, out)
    n_dropped = sum(1 for r in rows if not r[3])
    print(f"semantic keep oracle ({n} vectors, {n_dropped} dropped) "
          f"-> {out}")
    return out


def _ivf_pq_replay(vec_ids, mat, out: Path, k: int = 5,
                   n_queries: int = 20, n_centroids: int = 32,
                   n_probe: int = 12, m: int = 8, ksub: int = 16,
                   rerank: int = 64, seed: int = 42,
                   sample_cap: int = 20000, n_iter: int = 10) -> Path:
    import math

    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms

    # coarse quantizer (same spec as _ivf_centroids, seed=seed)
    train = matn[:sample_cap]
    rng = np.random.RandomState(seed)
    cent = train[rng.choice(len(train),
                            size=min(n_centroids, len(train)),
                            replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(train @ cent.T, axis=1)
        for c in range(len(cent)):
            members = train[assign == c]
            if len(members):
                mcent = members.mean(axis=0)
                n = np.linalg.norm(mcent)
                if n > 0:
                    cent[c] = mcent / n
    cells = np.argmax(matn @ cent.T, axis=1)

    # PQ codebooks (same spec as _pq_codebooks, seed=seed+1)
    dim = matn.shape[1]
    dsub = dim // m
    rng2 = np.random.RandomState(seed + 1)
    books = np.empty((m, ksub, dsub))
    for s_ in range(m):
        sub = train[:, s_ * dsub:(s_ + 1) * dsub]
        bc = sub[rng2.choice(len(sub), size=min(ksub, len(sub)),
                             replace=False)].copy()
        for _ in range(n_iter):
            # same matmul form as similarity._pq_codebooks (the two
            # sides must round identically)
            d2 = (-2.0 * sub @ bc.T + (bc ** 2).sum(axis=1)[None, :])
            assign = np.argmin(d2, axis=1)
            for c in range(len(bc)):
                members = sub[assign == c]
                if len(members):
                    bc[c] = members.mean(axis=0)
        books[s_, :len(bc)] = bc
        if len(bc) < ksub:
            books[s_, len(bc):] = bc[-1]

    # encode corpus
    codes = np.empty((len(matn), m), dtype=np.int64)
    for s_ in range(m):
        sub = matn[:, s_ * dsub:(s_ + 1) * dsub]
        d2 = (-2.0 * sub @ books[s_].T
              + (books[s_] ** 2).sum(axis=1)[None, :])
        codes[:, s_] = np.argmin(d2, axis=1)

    def round6(x: float) -> float:  # HALF_UP like Spark's F.round
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    raw_norms = np.linalg.norm(mat, axis=1)
    rows = []
    for qi in np.nonzero(vec_ids < n_queries)[0]:
        sims_c = matn[qi] @ cent.T
        probed = np.lexsort((np.arange(len(cent)), -sims_c))[:n_probe]
        cand = np.isin(cells, probed)
        cand[qi] = False
        idxs = np.nonzero(cand)[0]
        # ADC scores
        table = np.stack([books[s_] @ matn[qi][s_ * dsub:(s_ + 1) * dsub]
                          for s_ in range(m)])
        adc = np.round(
            table[np.arange(m)[None, :], codes[idxs]].sum(axis=1), 9)
        # top-rerank by (adc desc, neighbor_id asc)
        order = sorted(range(len(idxs)),
                       key=lambda j: (-adc[j], int(vec_ids[idxs[j]])))
        short = [idxs[j] for j in order[:rerank]]
        sims = []
        for ci in short:
            denom = raw_norms[qi] * raw_norms[ci]
            sim = float(mat[qi] @ mat[ci] / denom) if denom > 0 else 0.0
            sims.append((round6(sim), int(vec_ids[ci])))
        sims.sort(key=lambda s: (-s[0], s[1]))
        for rank, (sim, nid) in enumerate(sims[:k], start=1):
            rows.append((int(vec_ids[qi]), nid, sim, rank))
    table_out = pa.table({
        "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "neighbor_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "sim": pa.array([r[2] for r in rows], type=pa.float64()),
        "rank": pa.array([r[3] for r in rows], type=pa.int32())})
    pq.write_table(table_out, out)
    print(f"ivf-pq replay ({len(mat)} vectors) -> {len(rows)} rows "
          f"-> {out}")
    return out


def make_quality_oracle(n: int = 1000, sample_n: int = 600,
                        n_buckets: int = 4096, n_iter: int = 200) -> Path:
    """Independent numpy replay of functions/quality.
    quality_classifier_scores over the deterministic synthesized
    labeled corpus (synth_quality_text is the shared pure-function
    spec, like synth_matrix for the ANN gates): inline featurization,
    an inline GD loop with the same update formulas, and per-doc
    dot-product scoring — a different code path from the Spark
    explode/join/agg pipeline."""
    import hashlib
    import re

    import numpy as np

    from snips_nlu_spark.functions.quality import synth_quality_text

    word_re = re.compile("[a-z0-9]+")

    def bucket(w: str) -> int:
        return int(hashlib.md5(w.encode("utf8")).hexdigest()[:8],
                   16) % n_buckets

    texts, labels = [], []
    for doc_id in range(n):
        t, src = synth_quality_text(doc_id)
        texts.append(t)
        labels.append(1.0 if src == "curated" else 0.0)

    x = np.zeros((sample_n, n_buckets), dtype=np.float64)
    for i in range(sample_n):
        ws = word_re.findall(texts[i].lower())
        for w in ws:
            x[i, bucket(w)] += 1.0
        if ws:
            x[i] /= float(len(ws))
    y = np.array(labels[:sample_n])
    w = np.zeros(n_buckets, dtype=np.float64)
    b = 0.0
    lr, l2 = 1.0, 1e-4
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        g = p - y
        w -= lr * ((x.T @ g) / sample_n + l2 * w)
        b -= lr * float(g.mean())

    rows = []
    for doc_id in range(n):
        ws = word_re.findall(texts[doc_id].lower())
        if ws:
            dot = 0.0
            counts: dict[int, int] = {}
            for t in ws:
                counts[bucket(t)] = counts.get(bucket(t), 0) + 1
            for bk in sorted(counts):
                dot += counts[bk] * w[bk]
            logit = dot / len(ws) + b
        else:
            logit = b
        prob = 1.0 / (1.0 + np.exp(-logit))
        rows.append((doc_id, round(logit, 6), round(prob, 6),
                     round(prob, 6) > 0.5))
    out = ORACLE_DIR / "quality_scores.parquet"
    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "quality_logit": pa.array([r[1] for r in rows],
                                  type=pa.float64()),
        "quality_prob": pa.array([r[2] for r in rows],
                                 type=pa.float64()),
        "keep": pa.array([r[3] for r in rows], type=pa.bool_())})
    pq.write_table(table, out)
    print(f"quality classifier oracle -> {len(rows)} rows -> {out}")
    return out


def make_distmult_oracle(n_neg: int = 50) -> Path:
    """Numpy replay of spark/kg_embed.distmult_link_prediction_ranks
    over the committed sf0.01 triples oracle — shared deterministic
    trainer, independent draw/score/rank replay (product fold in the
    JVM's (s·p)·o left-to-right order, strict greater-than beats)."""
    import hashlib

    from snips_nlu_spark.spark.kg_embed import (TRANSE_SAMPLE_CAP,
                                                TRANSE_SEED,
                                                train_distmult)

    t = pq.read_table(ORACLE_DIR / "triples_sf0.01.parquet",
                      columns=["subj", "pred", "obj"]).to_pylist()
    facts = sorted({(r["subj"], r["pred"], r["obj"]) for r in t})

    def fact_key(f):
        return hashlib.md5("|".join(f).encode("utf8")).hexdigest()

    sample = sorted(facts, key=fact_key)[:TRANSE_SAMPLE_CAP]
    ent, rel = train_distmult(sample)

    objs: dict[str, list[str]] = {}
    for p, o in sorted({(p, o) for _, p, o in facts}):
        objs.setdefault(p, []).append(o)
    for p in objs:
        objs[p].sort(key=lambda o: hashlib.md5(o.encode("utf8"))
                     .hexdigest())

    def score(s, p, o):
        es, rp, eo = ent[s], rel[p], ent[o]
        acc = 0.0
        for k in range(len(es)):
            acc += (float(es[k]) * float(rp[k])) * float(eo[k])
        return acc

    rows = []
    for s, p, o in facts:
        pool = objs[p]
        n = len(pool)
        if (n < 2 or s not in ent or o not in ent or p not in rel):
            continue
        true_idx = pool.index(o)
        h = int(hashlib.md5(f"{s}|{p}|{o}:{TRANSE_SEED}"
                            .encode("utf8")).hexdigest()[:8], 16)
        cands = set()
        for j in range(n_neg):
            idx = (h + j) % (n - 1)
            if idx >= true_idx:
                idx += 1
            cands.add(pool[idx])
        cands = {c for c in cands if c in ent}
        s_true = score(s, p, o)
        beat = sum(1 for c in cands if score(s, p, c) > s_true)
        rows.append((s, p, o, len(cands), beat + 1))
    out = ORACLE_DIR / "distmult_ranks_sf0.01.parquet"
    table = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
        "n_candidates": pa.array([r[3] for r in rows],
                                 type=pa.int64()),
        "transe_rank": pa.array([r[4] for r in rows],
                                type=pa.int32())})
    pq.write_table(table, out)
    print(f"distmult rank oracle -> {len(rows)} rows -> {out}")
    return out


def make_complex_oracle(n_neg: int = 50) -> Path:
    """Numpy replay of spark/kg_embed.complex_link_prediction_ranks —
    shared trainer, independent replay of the Re(⟨s, p, conj(o)⟩)
    fold in the JVM's per-dim expression order."""
    import hashlib

    from snips_nlu_spark.spark.kg_embed import (TRANSE_DIM,
                                                TRANSE_SAMPLE_CAP,
                                                TRANSE_SEED,
                                                train_complex)

    t = pq.read_table(ORACLE_DIR / "triples_sf0.01.parquet",
                      columns=["subj", "pred", "obj"]).to_pylist()
    facts = sorted({(r["subj"], r["pred"], r["obj"]) for r in t})

    def fact_key(f):
        return hashlib.md5("|".join(f).encode("utf8")).hexdigest()

    sample = sorted(facts, key=fact_key)[:TRANSE_SAMPLE_CAP]
    ent, rel = train_complex(sample)
    d = TRANSE_DIM

    objs: dict[str, list[str]] = {}
    for p, o in sorted({(p, o) for _, p, o in facts}):
        objs.setdefault(p, []).append(o)
    for p in objs:
        objs[p].sort(key=lambda o: hashlib.md5(o.encode("utf8"))
                     .hexdigest())

    def score(s, p, o):
        es, rp, eo = ent[s], rel[p], ent[o]
        acc = 0.0
        for k in range(d):
            a = (float(es[k]) * float(rp[k])) \
                - (float(es[d + k]) * float(rp[d + k]))
            b = (float(es[k]) * float(rp[d + k])) \
                + (float(es[d + k]) * float(rp[k]))
            acc += (a * float(eo[k])) + (b * float(eo[d + k]))
        return acc

    rows = []
    for s, p, o in facts:
        pool = objs[p]
        n = len(pool)
        if (n < 2 or s not in ent or o not in ent or p not in rel):
            continue
        true_idx = pool.index(o)
        h = int(hashlib.md5(f"{s}|{p}|{o}:{TRANSE_SEED}"
                            .encode("utf8")).hexdigest()[:8], 16)
        cands = set()
        for j in range(n_neg):
            idx = (h + j) % (n - 1)
            if idx >= true_idx:
                idx += 1
            cands.add(pool[idx])
        cands = {c for c in cands if c in ent}
        s_true = score(s, p, o)
        beat = sum(1 for c in cands if score(s, p, c) > s_true)
        rows.append((s, p, o, len(cands), beat + 1))
    out = ORACLE_DIR / "complex_ranks_sf0.01.parquet"
    table = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
        "n_candidates": pa.array([r[3] for r in rows],
                                 type=pa.int64()),
        "transe_rank": pa.array([r[4] for r in rows],
                                type=pa.int32())})
    pq.write_table(table, out)
    print(f"complex rank oracle -> {len(rows)} rows -> {out}")
    return out


def make_value_transe_oracle(n_neg: int = 50) -> Path:
    """Numpy replay of spark/kg_embed.value_link_prediction_ranks over
    the committed sf0.01 triples oracle: python re-derivation of the
    value-level co-occurrence facts, the md5-threshold holdout split,
    the shared trainer on the TRAIN side, and an independent
    re-execution of the negative draw / distance fold / ranking."""
    import hashlib

    from snips_nlu_spark.spark.kg_embed import (HOLDOUT_FRAC,
                                                HOLDOUT_SEED,
                                                TRANSE_SAMPLE_CAP,
                                                TRANSE_SEED,
                                                train_transe)

    t = pq.read_table(ORACLE_DIR / "triples_sf0.01.parquet",
                      columns=["subj", "pred", "entity",
                               "obj"]).to_pylist()
    by_turn: dict[str, set] = {}
    for r in t:
        if r["pred"] == "intent":
            continue
        by_turn.setdefault(r["subj"], set()).add((r["entity"],
                                                  r["obj"]))
    facts = set()
    for slots in by_turn.values():
        ss = sorted(slots)
        for i in range(len(ss)):
            for j in range(len(ss)):
                (ea, oa), (eb, ob) = ss[i], ss[j]
                if oa < ob or (oa == ob and ea < eb):
                    facts.add((f"{ea}|{oa}", f"{ea}~{eb}",
                               f"{eb}|{ob}"))
    facts = sorted(facts)

    def _h(s: str) -> int:
        return int(hashlib.md5(s.encode("utf8")).hexdigest()[:8], 16)

    cut = int(HOLDOUT_FRAC * 2 ** 32)
    test = [f for f in facts
            if _h("|".join(f) + f":ho{HOLDOUT_SEED}") < cut]
    train = [f for f in facts
             if _h("|".join(f) + f":ho{HOLDOUT_SEED}") >= cut]

    def fact_key(f):
        return hashlib.md5("|".join(f).encode("utf8")).hexdigest()

    sample = sorted(train, key=fact_key)[:TRANSE_SAMPLE_CAP]
    ent, rel = train_transe(sample)

    objs: dict[str, list[str]] = {}
    for p, o in sorted({(p, o) for _, p, o in facts}):
        objs.setdefault(p, []).append(o)
    for p in objs:
        objs[p].sort(key=lambda o: hashlib.md5(o.encode("utf8"))
                     .hexdigest())

    def dist(s, p, o):
        es, rp, eo = ent[s], rel[p], ent[o]
        acc = 0.0
        for k in range(len(es)):
            d = (float(es[k]) + float(rp[k])) - float(eo[k])
            acc += d * d
        return acc

    rows = []
    for s, p, o in test:
        pool = objs[p]
        n = len(pool)
        if (n < 2 or s not in ent or o not in ent or p not in rel):
            continue
        true_idx = pool.index(o)
        h = _h(f"{s}|{p}|{o}:{TRANSE_SEED}")
        cands = set()
        for j in range(n_neg):
            idx = (h + j) % (n - 1)
            if idx >= true_idx:
                idx += 1
            cands.add(pool[idx])
        cands = {c for c in cands if c in ent}
        d_true = dist(s, p, o)
        beat = sum(1 for c in cands if dist(s, p, c) < d_true)
        rows.append((s, p, o, len(cands), beat + 1))
    out = ORACLE_DIR / "value_transe_ranks_sf0.01.parquet"
    table = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
        "n_candidates": pa.array([r[3] for r in rows],
                                 type=pa.int64()),
        "transe_rank": pa.array([r[4] for r in rows],
                                type=pa.int32())})
    pq.write_table(table, out)
    mrr = (sum(1.0 / r[4] for r in rows) / len(rows)) if rows else 0.0
    print(f"value transe oracle -> {len(rows)} held-out ranks "
          f"(MRR {mrr:.3f}) -> {out}")
    return out


def make_bpe_train_oracle(n_merges: int = 64, min_count: int = 2,
                          max_vocab: int = 200_000) -> Path:
    """Pandas replay of functions/text.train_bpe over the sf0.01
    documents table: an ``re``-module frequency pass (vs Spark's
    explode/count) feeding the shared deterministic merge-loop spec."""
    import re
    from collections import Counter

    import pandas as pd

    from snips_nlu_spark.functions.text import (BPE_SPLIT_RE,
                                                bpe_train_merges)

    texts = pd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet")["text"]
    pat = re.compile(BPE_SPLIT_RE)
    freqs: Counter = Counter()
    for t in texts:
        freqs.update(m.group(0) for m in pat.finditer(t or ""))
    kept = sorted(((w, c) for w, c in freqs.items()
                   if c >= min_count),
                  key=lambda wc: (-wc[1], wc[0]))[:max_vocab]
    merges = bpe_train_merges(dict(kept), n_merges)
    out = ORACLE_DIR / "bpe_merges_sf0.01.parquet"
    table = pa.table({
        "rank": pa.array(range(len(merges)), type=pa.int32()),
        "left": pa.array([a for a, _ in merges]),
        "right": pa.array([b for _, b in merges])})
    pq.write_table(table, out)
    print(f"bpe merge-table oracle -> {len(merges)} merges -> {out}")
    return out


def make_langid_oracle() -> Path:
    """Python replay of functions/langid.trained_language_scores over
    the sf0.01 documents table: the closed-form NB table is the shared
    deterministic spec (train_langid); extraction, OOV arithmetic and
    the 8-way argmax are re-executed sequentially here. Only the
    integer/string columns are committed (the float total differs from
    Spark's parallel sum at ~1e-13 — below any argmax gap)."""
    import pandas as pd

    from snips_nlu_spark.functions.langid import (LANGID_LANGS,
                                                  train_langid)

    rows_tab, oov = train_langid()
    logp: dict[tuple[str, str], float] = {(ng, lang): lp
                                          for ng, lang, lp in rows_tab}
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "text"])
    out_rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        low = (text or "").lower()
        grams = [low[i:i + 2] for i in range(len(low) - 1)]
        if not grams:
            out_rows.append((int(doc_id), 0, "und"))
            continue
        best = None
        for lang in LANGID_LANGS:
            s = 0.0
            for g in grams:
                s += logp.get((g, lang), oov[lang])
            if best is None or s > best[0]:
                best = (s, lang)
        out_rows.append((int(doc_id), len(grams), best[1]))
    out = ORACLE_DIR / "langid_sf0.01.parquet"
    table = pa.table({
        "doc_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
        "n_grams": pa.array([r[1] for r in out_rows],
                            type=pa.int32()),
        "lang_pred": pa.array([r[2] for r in out_rows])})
    pq.write_table(table, out)
    print(f"trained lang-id oracle -> {len(out_rows)} rows -> {out}")
    return out


def make_transe_oracle(n_neg: int = 50) -> Path:
    """Numpy replay of spark/kg_embed.link_prediction_ranks over the
    committed sf0.01 triples oracle. The TRAINER is the shared
    deterministic spec (it runs driver-side numpy in BOTH paths by
    design — what Spark owns is the corpus-wide machinery); the
    negative draw, the sequential distance fold (matching the JVM
    zip_with/aggregate left-to-right IEEE order) and the ranking are
    re-executed here from scratch."""
    import hashlib

    from snips_nlu_spark.spark.kg_embed import (TRANSE_SAMPLE_CAP,
                                                TRANSE_SEED,
                                                train_transe)

    t = pq.read_table(ORACLE_DIR / "triples_sf0.01.parquet",
                      columns=["subj", "pred", "obj"]).to_pylist()
    facts = sorted({(r["subj"], r["pred"], r["obj"]) for r in t})

    def fact_key(f):
        return hashlib.md5("|".join(f).encode("utf8")).hexdigest()

    sample = sorted(facts, key=fact_key)[:TRANSE_SAMPLE_CAP]
    ent, rel = train_transe(sample)

    objs: dict[str, list[str]] = {}
    for p, o in sorted({(p, o) for _, p, o in facts}):
        objs.setdefault(p, []).append(o)
    for p in objs:
        objs[p].sort(key=lambda o: hashlib.md5(o.encode("utf8"))
                     .hexdigest())

    def dist(s, p, o):
        es, rp, eo = ent[s], rel[p], ent[o]
        acc = 0.0
        for k in range(len(es)):
            d = (float(es[k]) + float(rp[k])) - float(eo[k])
            acc += d * d
        return acc

    rows = []
    for s, p, o in facts:
        pool = objs[p]
        n = len(pool)
        if (n < 2 or s not in ent or o not in ent or p not in rel):
            continue
        true_idx = pool.index(o)
        h = int(hashlib.md5(f"{s}|{p}|{o}:{TRANSE_SEED}"
                            .encode("utf8")).hexdigest()[:8], 16)
        cands = set()
        for j in range(n_neg):
            idx = (h + j) % (n - 1)
            if idx >= true_idx:
                idx += 1
            cands.add(pool[idx])
        cands = {c for c in cands if c in ent}
        d_true = dist(s, p, o)
        beat = sum(1 for c in cands if dist(s, p, c) < d_true)
        rows.append((s, p, o, len(cands), beat + 1))
    out = ORACLE_DIR / "transe_ranks_sf0.01.parquet"
    table = pa.table({
        "subj": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj": pa.array([r[2] for r in rows]),
        "n_candidates": pa.array([r[3] for r in rows],
                                 type=pa.int64()),
        "transe_rank": pa.array([r[4] for r in rows],
                                type=pa.int32())})
    pq.write_table(table, out)
    print(f"transe rank oracle -> {len(rows)} rows -> {out}")
    return out


if __name__ == "__main__":
    sfs = [float(a) for a in sys.argv[1:]] or [0.001, 0.01]
    engine = build_engine()
    persist_model_bundle(engine)
    make_multilang_oracle()
    for sf in sfs:
        make_oracle(engine, sf)
        make_intents_oracle(engine, sf)
        if sf == 0.01:  # the driver's gate scale
            make_simhash_oracle(sf)
            make_lsh_topk_oracle(sf)
            make_ivf_topk_oracle(sf)
            make_ivf_pq_oracle(sf)
            make_ivf_pq_scale_oracle()
            make_semantic_dedup_oracle()
            make_semantic_keep_oracle()
            make_bpe_oracle(sf)
            make_quality_oracle()
            make_transe_oracle()
            make_distmult_oracle()
            make_complex_oracle()
            make_value_transe_oracle()
            make_bpe_train_oracle()
            make_langid_oracle()

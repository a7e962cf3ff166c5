"""Component-level cold-path profiler (single core, unique texts).

Times each kernel stage in isolation on a fresh engine so optimization
rounds can A/B the exact component they touch. Run:

    python scripts/profile_cold.py [n_texts]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def cold_texts(n: int) -> list[str]:
    """Mixed unique corpus mirroring datagen's unique-row shapes."""
    out = []
    for i in range(n):
        m = i % 4
        if m == 0:
            out.append(f"make me {i} cups of coffee variant r0_{i}")
        elif m == 1:
            out.append(f"req{i}x switch on the light in the kitchen")
        elif m == 2:
            out.append(f"book me a flight to paris in {i + 2} days")
        else:
            out.append(f"the report has been generated req{i}x")
    return out


def timeit(label: str, fn, best_of: int = 3) -> float:
    best = None
    for _ in range(best_of):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"{label:38s} {best * 1e6 / N:8.1f} us/text  "
          f"({N / best:8.0f}/s)")
    return best


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    from snips_nlu_spark.engine import NluEngine
    root = Path(__file__).resolve().parent.parent
    eng = NluEngine.from_dict(
        json.loads((root / "oracle/model_bundle.json").read_text("utf8")))
    texts = cold_texts(N)
    anchors = [None] * N
    eng.parse_batch(texts[:50], anchors[:50])  # warm imports/resources

    from snips_nlu_spark import textcore
    bundle = eng._bundle
    builtin = bundle.builtin
    gaz = bundle.gazetteer

    # NOTE: components are memoized — each timing uses its own fresh
    # text variants so lru hits don't fake a win
    def v(tag):
        return [f"{t} {tag}" for t in texts]

    vt = v("tk")
    timeit("tokenize", lambda: [textcore.tokenize(t) for t in vt],
           best_of=1)
    vs = v("st")
    timeit("builtin static scan", lambda: [builtin._static_memo(t)
                                           for t in vs], best_of=1)
    vd = v("dt")
    timeit("builtin datetime scan", lambda: [builtin._dt_memo(t, None)
                                             for t in vd], best_of=1)
    vg = v("gz")
    timeit("gazetteer scan", lambda: [gaz._scan_memo(t) for t in vg],
           best_of=1)

    lookup = eng.intent_parsers[0]
    vl = v("lk")
    timeit("lookup parse (scans pre-warmed)",
           lambda: [lookup.parse(t, bundle) for t in vl], best_of=1)

    prob = eng.intent_parsers[1]
    vp = v("pb")
    timeit("probabilistic parse_batch",
           lambda: prob.parse_batch(vp, bundle, [None] * N), best_of=1)

    vf = v("fz")
    timeit("classifier featurize+rank",
           lambda: prob.intent_classifier.get_intents_batch(
               vf, bundle, [None] * N), best_of=1)

    v2 = v("e2e")
    t0 = time.perf_counter()
    eng.parse_batch(v2, [None] * N)
    el = time.perf_counter() - t0
    print(f"{'FULL parse_batch (cold)':38s} {el * 1e6 / N:8.1f} us/text  "
          f"({N / el:8.0f}/s)")

"""Capture physical plans for the headline queries into PLANS.md —
evidence that column pruning, partial aggregation, broadcast joins and
AQE reach the executed plans.

Usage: python scripts/dump_plans.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent.parent / "PLANS.md"

HEADER = """# PLANS — executed physical plans (auto-generated)

`python scripts/dump_plans.py` regenerates this file. Highlights to check:
- the transcript scan reads ONLY (conv_id, turn_idx, text, ts) — role and
  tool are pruned before the parquet reader (ReadSchema);
- rollups use two-phase hash aggregation (partial_ before the exchange =
  map-side combine);
- the similarity query broadcasts the small query side
  (BroadcastExchange / BroadcastNestedLoopJoin);
- AdaptiveSparkPlan wraps every query (AQE on: runtime coalescing +
  skew handling).
"""


def simplify(plan: str, max_lines: int = 40) -> str:
    lines = []
    for line in plan.splitlines():
        line = re.sub(r"#\d+L?", "", line)
        line = re.sub(r"Location: \S+", "Location: ...", line)
        line = line.rstrip()
        if line:
            lines.append(line[:160])
        if len(lines) >= max_lines:
            lines.append("... (truncated)")
            break
    return "\n".join(lines)


def main() -> None:
    from snips_nlu_spark.spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("plans", cpus=4)
    sections = []
    for name in ("kg_triples", "kg_multilang_triples",
                 "kg_intent_distribution", "kg_nodes",
                 "kg_entity_cooccurrence",
                 "doc_text_profile", "doc_minhash_pairs",
                 "doc_dup_clusters", "doc_contamination",
                 "doc_lm_scores", "kg_contextual_intents",
                 "doc_pack_plan", "doc_token_mix",
                 "doc_ngram_repetition", "kg_entity_similarity",
                 "kg_entity_triangles", "doc_substring_dups",
                 "doc_dsir_selection", "doc_tfidf_keywords",
                 "doc_jaccard_pairs_capped", "emb_topk_cosine",
                 "emb_lsh_topk", "emb_ivf_topk", "emb_cosine_dups",
                 "emb_semantic_dups",
                 "event_sessions",
                 "event_asof_attribution", "event_error_window_join",
                 "kg_ntriples", "kg_predicate_schema",
                 "kg_triple_confidence", "kg_entity_resolution",
                 "kg_negative_samples", "doc_train_split",
                 "kg_fact_validity", "kg_transe_ranks",
                 "kg_cardinality_violations", "doc_bpe_train",
                 "doc_langid_trained", "doc_chunks",
                 "kg_entity_distances", "doc_cross_corpus_dups",
                 "kg_merge_batches", "kg_transe_ranks",
                 "event_funnel"):
        df = em.queries()[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        sections.append(f"## {name}\n\n```\n{simplify(plan)}\n```\n")
    OUT.write_text(HEADER + "\n" + "\n".join(sections), encoding="utf8")
    print(OUT)
    spark.stop()


if __name__ == "__main__":
    main()

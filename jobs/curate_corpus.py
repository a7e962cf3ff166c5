"""spark-submit entry point for the training-corpus curation pipeline.

    spark-submit --py-files snips_nlu_spark.zip jobs/curate_corpus.py \
        --input /path/to/documents_parquet \
        --output /path/to/curated_out \
        [--benchmark /path/to/benchmark_parquet]  # (bench_id, text)
        [--jaccard-threshold 0.5] [--contamination-threshold 0.5]
        [--budget-tokens N] [--pack-seq-len 2048]

The composed pipeline every pretraining corpus runs, in audit-friendly
order (each stage writes WHY a document was dropped, not just the
survivors):

  1. near-duplicate keep-one dedup — MinHash-LSH verified pairs →
     connected components → min-id survivor (functions/dedup.py);
  1b. cross-corpus dedup (optional, --ref-corpus) — drop docs that
     near-duplicate an existing reference corpus (the dedup-against-
     last-model's-training-set step, functions/dedup.py::
     cross_corpus_dup_pairs);
  2. eval-set decontamination (optional) — n-gram coverage vs the
     benchmark table, benchmark shingles broadcast;
  3. exact-substring duplicate drop (optional,
     --max-substring-dup-frac) — docs whose corpus-duplicated
     20-token-window char mass exceeds the cap (Lee et al. 2021);
  4. quality filters — Gopher word/char heuristics + within-doc
     repetition flags, all pure JVM expressions;
  4b. language filter (optional, --langid-keep) — trained char-bigram
     NB language-ID (functions/langid.py), docs predicted outside the
     keep set dropped;
  5. DSIR importance selection (optional, --dsir-target-sources) —
     hashed-ngram importance weights vs the target domain, docs below
     the per-gram threshold dropped (Xie et al. 2023);
  6. PII masking over the survivors (emails/phones/IBANs/IPs);
  7. token accounting + optional token-budget sampling (deterministic
     md5-permutation draw, two-pass bucketed cumsum — no global
     window);
  8. optional sequence-packing plan (concat-and-chunk placement).

Layout under --output:
  curated/          — surviving documents, PII-masked
  audit/dropped/    — (doc_id, reason) for every dropped doc
  audit/tokens/     — per-doc token counts of the survivors
  sample/           — budget-draw selection table (--budget-tokens)
  pack_plan/        — placement table when --pack-seq-len is given
One JSON summary line goes to stdout.
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
    ap.add_argument("--input", required=True,
                    help="documents parquet: (doc_id, text, ...)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--benchmark", default=None,
                    help="eval-set parquet (bench_id, text); enables "
                         "decontamination")
    ap.add_argument("--jaccard-threshold", type=float, default=0.5)
    ap.add_argument("--contamination-threshold", type=float, default=0.5)
    ap.add_argument("--budget-tokens", type=int, default=None)
    ap.add_argument("--pack-seq-len", type=int, default=None)
    ap.add_argument("--max-substring-dup-frac", type=float, default=None,
                    help="drop docs whose corpus-duplicated 20-token-"
                         "window char fraction exceeds this cap")
    ap.add_argument("--dsir-target-sources", default=None,
                    help="comma-separated source values; enables DSIR "
                         "importance selection against that target")
    ap.add_argument("--dsir-threshold", type=float, default=None,
                    help="per-gram avg logweight cut (default: the "
                         "operator's DSIR_THRESHOLD)")
    ap.add_argument("--ref-corpus", default=None,
                    help="reference documents parquet; enables "
                         "cross-corpus dedup against it")
    ap.add_argument("--langid-keep", default=None,
                    help="comma-separated language codes; enables the "
                         "trained language-ID filter")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("curate-corpus").getOrCreate()
    t0 = time.time()
    out = args.output

    stage_sec = {}
    _last = [t0]

    def mark(name: str) -> None:
        now = time.time()
        stage_sec[name] = round(now - _last[0], 2)
        _last[0] = now

    docs = spark.read.parquet(args.input)
    summary = {"n_input": docs.count()}
    mark("input_count")

    # 1. near-dup keep-one dedup (full audit assignment). The
    # assignment is narrow (doc_id, cluster_id, kept) and feeds every
    # downstream branch — persist it so the MinHash-LSH + iterative-CC
    # lineage runs once, not once per terminal action.
    from snips_nlu_spark.functions.dedup import dedup_corpus
    assignment = dedup_corpus(
        docs, threshold=args.jaccard_threshold).persist()
    summary["n_dup_clusters"] = (
        assignment.filter(~F.col("kept")).count())  # forces the persist
    mark("dedup_assignment")
    dropped_dups = (assignment.filter(~F.col("kept"))
                    .select("doc_id", F.lit("near_duplicate")
                            .alias("reason")))
    survivors = docs.join(assignment.filter(F.col("kept"))
                          .select("doc_id"), "doc_id")

    # 1b. cross-corpus dedup (optional): drop survivors that
    # near-duplicate ANY reference doc. The minhash machinery
    # references its input several times internally, so CUT the
    # lineage first — without it every internal reference re-plans the
    # whole upstream join tree and Catalyst planning time explodes
    # with stage depth (the plan-level twin of the quality-filter
    # flag-join pathology). At 100 TB the equivalent cut is the
    # parquet write stage 7 already performs; localCheckpoint is the
    # gate-scale stand-in.
    dropped_ref = None
    if args.ref_corpus:
        from snips_nlu_spark.functions.dedup import cross_corpus_dup_pairs
        survivors = survivors.localCheckpoint()
        ref = spark.read.parquet(args.ref_corpus)
        flagged = (cross_corpus_dup_pairs(
            survivors, ref, threshold=args.jaccard_threshold)
            .select("doc_id").distinct())
        dropped_ref = flagged.select(
            "doc_id", F.lit("reference_duplicate").alias("reason"))
        survivors = survivors.join(flagged, "doc_id", "left_anti")
        mark("cross_corpus_dedup")

    # 2. decontamination (optional)
    dropped_contaminated = None
    if args.benchmark:
        from snips_nlu_spark.functions.cleaning import (
            benchmark_contamination)
        bench = spark.read.parquet(args.benchmark)
        flagged = (benchmark_contamination(
            survivors, bench, threshold=args.contamination_threshold)
            .select("doc_id").distinct())
        dropped_contaminated = flagged.select(
            "doc_id", F.lit("benchmark_contamination").alias("reason"))
        survivors = survivors.join(flagged, "doc_id", "left_anti")

    # 3. exact-substring duplicate drop (optional): the fraction comes
    # from the window-fingerprint op; survivors re-filter by doc_id
    dropped_substring = None
    if args.max_substring_dup_frac is not None:
        from snips_nlu_spark.functions.dedup import substring_dup_spans
        frac = substring_dup_spans(survivors)
        flagged = (frac.filter(F.col("dup_substring_char_frac")
                               > args.max_substring_dup_frac)
                   .select("doc_id"))
        dropped_substring = flagged.select(
            "doc_id", F.lit("substring_duplicate").alias("reason"))
        survivors = survivors.join(flagged, "doc_id", "left_anti")

    # 4. quality filters (Gopher heuristics + repetition), composed as
    # ONE filter over one projection — joining two flag frames derived
    # from the same scan blows up Catalyst constraint propagation
    # (200+ s of driver planning at 500 rows; see quality_filter's
    # docstring).
    from snips_nlu_spark.functions.cleaning import quality_filter
    quality_kept = quality_filter(survivors)
    dropped_quality = (survivors.select("doc_id")
                       .join(quality_kept.select("doc_id"),
                             "doc_id", "left_anti")
                       .select("doc_id",
                               F.lit("quality_filter").alias("reason")))
    survivors = quality_kept

    # 4b. language filter (optional): trained char-bigram NB lang-ID
    # (same lineage cut as 1b — the scorer fans out over its input)
    dropped_lang = None
    if args.langid_keep:
        from snips_nlu_spark.functions.langid import (
            trained_language_scores)
        keep_langs = args.langid_keep.split(",")
        survivors = survivors.localCheckpoint()
        preds = trained_language_scores(survivors)
        low = (preds.filter(~F.col("lang_pred").isin(keep_langs))
               .select("doc_id"))
        dropped_lang = low.select(
            "doc_id", F.lit("language_filter").alias("reason"))
        survivors = survivors.join(low, "doc_id", "left_anti")

    # 5. DSIR importance selection (optional): needs a source column
    # on the input; docs below the per-gram threshold are dropped
    dropped_dsir = None
    if args.dsir_target_sources:
        from snips_nlu_spark.functions.sampling import (
            DSIR_THRESHOLD, dsir_importance_weights)
        thr = (args.dsir_threshold if args.dsir_threshold is not None
               else DSIR_THRESHOLD)
        weights = dsir_importance_weights(
            survivors, args.dsir_target_sources.split(","),
            threshold=thr)
        low = (weights.filter(~F.col("selected")).select("doc_id"))
        dropped_dsir = low.select(
            "doc_id", F.lit("dsir_low_importance").alias("reason"))
        survivors = survivors.join(low, "doc_id", "left_anti")

    # 6. PII masking IN PLACE (one withColumn over the surviving rows —
    # no join of a masked frame back to its own parent)
    from snips_nlu_spark.functions.cleaning import mask_pii_col
    curated = survivors.withColumn("text", mask_pii_col(F.col("text")))

    # 7. materialize the curated set ONCE; every later pass (token
    # audit, budget draw, packing plan) re-reads the written parquet —
    # a disk-backed lineage cut. Persisting the full text corpus in
    # executor memory would not survive 100 TB; the parquet re-read
    # does, and it keeps the sampling/packing scans free of the
    # curation expression trees.
    from snips_nlu_spark.functions.text import token_counts
    curated.write.mode("overwrite").parquet(f"{out}/curated")
    mark("curated_write")
    curated_back = spark.read.parquet(f"{out}/curated")

    # one audit table of every drop, with its reason
    dropped = dropped_dups.union(dropped_quality)
    if dropped_contaminated is not None:
        dropped = dropped.union(dropped_contaminated)
    if dropped_substring is not None:
        dropped = dropped.union(dropped_substring)
    if dropped_dsir is not None:
        dropped = dropped.union(dropped_dsir)
    if dropped_ref is not None:
        dropped = dropped.union(dropped_ref)
    if dropped_lang is not None:
        dropped = dropped.union(dropped_lang)
    dropped.write.mode("overwrite").parquet(f"{out}/audit/dropped")
    mark("dropped_write")
    (token_counts(curated_back)
     .write.mode("overwrite").parquet(f"{out}/audit/tokens"))
    mark("tokens_write")

    # 7b. optional budget draw — written as a SELECTION TABLE (doc_id,
    # n_tokens, cum_tokens), not a rewritten corpus: at 100 TB you join
    # readers against the sample, you don't copy the text a second time.
    train_set = curated_back
    if args.budget_tokens:
        from snips_nlu_spark.functions.sampling import (
            sample_by_token_budget)
        (sample_by_token_budget(curated_back, args.budget_tokens)
         .write.mode("overwrite").parquet(f"{out}/sample"))
        mark("sample_write")
        sample_back = spark.read.parquet(f"{out}/sample")
        summary["n_sampled"] = sample_back.count()
        train_set = curated_back.join(
            sample_back.select("doc_id"), "doc_id")

    # 8. optional packing plan over the training set
    if args.pack_seq_len:
        from snips_nlu_spark.functions.sampling import pack_sequences
        (pack_sequences(train_set, seq_len=args.pack_seq_len)
         .write.mode("overwrite").parquet(f"{out}/pack_plan"))
        mark("pack_write")

    summary["n_curated"] = curated_back.count()
    summary["n_dropped"] = spark.read.parquet(
        f"{out}/audit/dropped").count()
    summary["n_tokens"] = int(
        spark.read.parquet(f"{out}/audit/tokens")
        .agg(F.sum("n_bpe_pieces")).collect()[0][0] or 0)
    mark("final_counts")
    summary["stage_sec"] = stage_sec
    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()

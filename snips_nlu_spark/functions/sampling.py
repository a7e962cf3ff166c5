"""Deterministic corpus sampling for training-data mixing.

``sample_by_token_budget`` draws documents until a token budget is
filled — the data-mixing primitive that turns per-source corpora into a
training mix with fixed token proportions. Selection order is a
deterministic pseudo-random permutation (md5 of doc_id + seed — chosen
because Spark and DuckDB produce byte-identical md5 hex, so the oracle
replays the exact same draw), and the cumulative token count is a
window cumsum: one shuffle per strata, no driver-side state, stable
under repartitioning. Selection is MAXIMAL-PREFIX: the permutation is
walked until the running total including the next doc would exceed the
budget, and everything after the crossing point is dropped (the budget
may be slightly under-filled; simple, order-stable, and exactly what
the SQL oracle replays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

from .text import bpe_token_count


def sample_by_token_budget(documents: DataFrame, budget_tokens: int,
                           strata_col: str | None = None,
                           seed: int = 42) -> DataFrame:
    """(doc_id[, strata], n_tokens, cum_tokens) for the sampled docs —
    per strata when ``strata_col`` is given, else one global budget."""
    order = F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(f":{seed}")))
    toks = bpe_token_count(F.col("text"))
    part = [strata_col] if strata_col else []
    out_cols = ["doc_id", *part]
    w = (Window.partitionBy(*part)
         .orderBy(F.col("_ord"), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (documents
            .select(*out_cols, toks.alias("n_tokens"),
                    order.alias("_ord"))
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") <= budget_tokens)
            .select(*out_cols, "n_tokens", "cum_tokens"))

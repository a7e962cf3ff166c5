"""Temporal join operators Spark lacks as built-ins.

``asof_join`` — backward INCLUSIVE as-of join (pandas ``merge_asof`` /
kdb ``aj`` semantics): every left row picks the latest right row with
``right.ts <= left.ts`` within the same ``by`` group, optionally within
a tolerance window. Spark has no native ASOF; the scalable formulation
is NOT a per-row UDF or a range self-join but a UNION-TAG MERGE: tag
both sides, union them, and carry the last-seen right payload forward
with an ``ignorenulls`` window over (ts, side) — exactly the single
merge-sort pass a time-series engine runs, expressed as one shuffle on
the ``by`` key plus a per-group sort. Cost is O((|L|+|R|) log) per
group with NO join explosion, at any scale; a hot ``by`` key is the
skew risk (same profile as sessionization — AQE handles moderate skew,
and extreme keys can be time-sliced because carry-forward only needs
the previous slice's last right row as a seed).

``range_join`` — interval containment join (left.ts ∈ [right.start,
right.end] per ``by`` group). The naive formulation is a cross join
with a filter (Spark falls back to BroadcastNestedLoopJoin); the scale
path BUCKETIZES time: intervals explode into fixed-width buckets, the
join becomes an equi-join on (by, bucket), and the exact containment
predicate filters the bucket collisions. Bucket width trades fan-out
(long intervals explode into many buckets) against collision rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F  # noqa: N812

# sentinel that sorts AFTER every real right-side key at equal (ts,
# side) — makes the carry-forward tie-break identical in Spark and
# DuckDB regardless of their NULL-ordering defaults
_KEY_MAX = 1 << 62


def _epoch_s(c) -> F.Column:
    """Fractional epoch seconds; NTZ-safe for DIFFERENCES (the LTZ-cast
    offset cancels — same idiom as the sessionization gate)."""
    return F.unix_micros(c.cast("timestamp_ltz")) / F.lit(1000000.0)


def asof_join(left: DataFrame, right: DataFrame, by: list[str],
              ts_col: str = "ts", key_col: str = "event_id",
              payload: list[str] | None = None,
              tolerance_s: float | None = None) -> DataFrame:
    """Backward inclusive as-of join.

    Every ``left`` row gains ``right_<ts_col>``, ``right_<key_col>``
    and ``right_<c>`` for each payload column, from the latest right
    row with ``ts <= left.ts`` in its ``by`` group — NULLs when no
    right row precedes it (or the match falls outside
    ``tolerance_s``). Ties: right rows sorting at the same timestamp
    resolve to the highest ``key_col`` (deterministic; pass a right
    side unique per (by, ts) when the tie-break must not matter).
    ``lag_s`` carries left.ts − matched.ts in seconds (6 dp).
    """
    payload = [c for c in (payload or []) if c != key_col]
    r_struct = F.struct(
        F.col(ts_col).alias("r_ts"),
        F.col(key_col).cast("long").alias("r_key"),
        *[F.col(c).alias(f"r_{c}") for c in payload])
    r_side = right.select(
        *by, F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"),
        r_struct.alias("_r"))
    left_cols = [c for c in left.columns if c not in by]
    l_side = left.select(
        *by, F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"),
        F.lit(None).cast(r_side.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left_cols]).alias("_l"))
    u = r_side.withColumn(
        "_l", F.lit(None).cast(l_side.schema["_l"].dataType)
    ).unionByName(l_side)
    w = (Window.partitionBy(*by)
         .orderBy(F.col("_ts"), F.col("_side"),
                  F.coalesce(F.col("_r.r_key"), F.lit(_KEY_MAX)))
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = (u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
               .filter(F.col("_side") == 1))
    lag = F.round(_epoch_s(F.col("_ts")) - _epoch_s(F.col("_m.r_ts")), 6)
    if tolerance_s is not None:
        keep = lag <= F.lit(float(tolerance_s))
        matched = matched.withColumn(
            "_m", F.when(keep, F.col("_m")))
        lag = F.round(_epoch_s(F.col("_ts"))
                      - _epoch_s(F.col("_m.r_ts")), 6)
    return matched.select(
        *by,
        *[F.col(f"_l.{c}").alias(c) for c in left_cols],
        F.col("_m.r_ts").alias(f"right_{ts_col}"),
        F.col("_m.r_key").alias(f"right_{key_col}"),
        *[F.col(f"_m.r_{c}").alias(f"right_{c}") for c in payload],
        lag.alias("lag_s"))


def range_join(left: DataFrame, right: DataFrame, by: list[str],
               ts_col: str = "ts", start_col: str = "start_ts",
               end_col: str = "end_ts",
               bucket_s: int = 3600) -> DataFrame:
    """Interval containment join: left rows matched to every right
    interval of the same ``by`` group with ``start <= ts <= end``
    (inclusive both ends). Implemented as the bucketed equi-join: right
    intervals explode into ``bucket_s``-second time buckets, the join
    keys on (by…, bucket) — collision candidates only — and the exact
    predicate filters. Left rows with no containing interval are
    dropped (inner semantics); wrap with a left join on the output keys
    when audit rows are needed.
    """
    b = F.lit(int(bucket_s))
    # bucket ids only gate CANDIDATE generation (the exact predicate
    # below decides matches), so any consistent epoch basis works —
    # both sides use the same one, which is all correctness needs
    l_b = left.withColumn(
        "_bucket", F.floor(_epoch_s(F.col(ts_col)) / b))
    r_b = right.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(_epoch_s(F.col(start_col)) / b).cast("long"),
            F.floor(_epoch_s(F.col(end_col)) / b).cast("long"))))
    joined = l_b.join(r_b, [*by, "_bucket"])
    return (joined
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) <= F.col(end_col)))
            .drop("_bucket"))


def funnel_counts(events: DataFrame, steps: list[str],
                  within_seconds: int | None = None,
                  by: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """First-touch funnel analysis: how many ``by`` keys progress
    through the ordered ``steps`` ("click → purchase"), each step
    strictly after the previous one, optionally all within
    ``within_seconds`` of the FIRST step. Greedy first-touch chain
    semantics (the Amplitude/Mixpanel convention): step 1 anchors at
    the key's earliest step-1 event; step k at the earliest step-k
    event after the chain's step k−1. Deterministic and
    monotone — each step's cohort is a subset of the previous.

    Output: (step_idx, step, n_users) — integer counts, hash-exact.

    Scale shape: one min-aggregate per step, each a map-side-
    combinable groupBy on the key joined back broadcast-free (the
    per-step cohort frames are (key, ts) — narrow); K steps = K
    shuffles on the key, no windows, no explosion. Funnels are
    typically ≤ 5 steps.
    """
    t1 = (events.filter(F.col(type_col) == steps[0])
          .groupBy(by).agg(F.min(ts_col).alias("_t1")))
    chain = t1.select(by, F.col("_t1").alias("_anchor"),
                      F.col("_t1").alias("_prev"))
    counts = [(0, steps[0], chain)]
    for k, step in enumerate(steps[1:], start=1):
        nxt = (events.filter(F.col(type_col) == step)
               .select(by, F.col(ts_col).alias("_ts"))
               .join(chain, by)
               .filter(F.col("_ts") > F.col("_prev")))
        if within_seconds is not None:
            # integer microsecond arithmetic (exact in Spark and the
            # DuckDB oracle — float epoch seconds would round); the
            # parquet column is TIMESTAMP_NTZ, so cast first (both
            # sides shift by the same session offset, the difference
            # is offset-free — same idiom as range_join's buckets)
            nxt = nxt.filter(
                F.unix_micros(F.col("_ts").cast("timestamp"))
                - F.unix_micros(F.col("_anchor").cast("timestamp"))
                <= within_seconds * 1_000_000)
        chain = (nxt.groupBy(by, "_anchor")
                 .agg(F.min("_ts").alias("_prev")))
        counts.append((k, step, chain))
    spark = events.sparkSession
    out = None
    for k, step, frame in counts:
        row = frame.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(k).alias("step_idx"), F.lit(step).alias("step"),
            "n_users")
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(events: DataFrame,
                      anchor_type: str = "signup",
                      activity_type: str | None = None,
                      by: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type") -> DataFrame:
    """Cohort retention matrix: keys cohorted by the DAY of their
    first ``anchor_type`` event; each later active day counts them as
    retained at that day offset ("of users who signed up on 1/3, how
    many were active 7 days later"). ``activity_type`` restricts what
    counts as activity (default: any event).

    Output: (cohort_day, day_offset, n_active) — day 0 row equals the
    cohort size (the anchor day itself is active); offsets are
    non-negative (pre-anchor activity is ignored); integer counts,
    hash-exact.

    Scale shape: one min-agg on the key for the cohort day, one
    equi-join back on the key, one distinct-count agg on
    (cohort_day, day_offset) — all map-side combinable, no windows.
    """
    anchor = (events.filter(F.col(type_col) == anchor_type)
              .groupBy(by)
              .agg(F.to_date(F.min(ts_col)).alias("cohort_day")))
    activity = events if activity_type is None else \
        events.filter(F.col(type_col) == activity_type)
    acts = activity.select(by, F.to_date(ts_col).alias("_day"))
    return (acts.join(anchor, by)
            .withColumn("day_offset",
                        F.datediff("_day", "cohort_day"))
            .filter(F.col("day_offset") >= 0)
            .groupBy("cohort_day", "day_offset")
            .agg(F.countDistinct(by).alias("n_active")))

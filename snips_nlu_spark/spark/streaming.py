"""Structured Streaming variant of the parse stage.

The reference is strictly request/response (SURVEY.md §2.10); this module
is the streaming extension: the same fused parse kernel runs under
``readStream`` with a watermark on ``ts`` and ``dropDuplicates`` on
(conv_id, turn_idx) for late/replayed turns. Parsing is per-turn
independent — the triple stream itself needs no state beyond the dedup
watermark. Conversation-LEVEL outputs do need state:
``streaming_conversation_rollup`` maintains a bounded per-conversation
state via ``applyInPandasWithState`` (idle conversations time out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .stages import parse_transcripts

TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp")


def streaming_transcripts(spark: SparkSession, source_dir: str,
                          max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a transcript parquet directory (stand-in
    for a Kafka/Iceberg CDC source on a real deployment)."""
    return (spark.readStream
            .schema(TRANSCRIPT_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir))


def streaming_triples(stream_df: DataFrame, model_json: str,
                      watermark: str = "1 hour") -> DataFrame:
    """Late-data-safe exactly-once-ish triple stream: watermark + turn
    dedup, then the same mapInPandas parse kernel as the batch path."""
    deduped = (stream_df
               .withWatermark("ts", watermark)
               .dropDuplicates(["conv_id", "turn_idx", "ts"]))
    return parse_transcripts(deduped, model_json)


CONV_STATE_SCHEMA = ("n_turns long, n_triples long, last_turn_idx int, "
                     "last_intent string")
CONV_ROLLUP_SCHEMA = ("conv_id string, n_turns long, n_triples long, "
                      "last_turn_idx int, last_intent string")


def streaming_conversation_rollup(stream_df: DataFrame, model_json: str,
                                  idle_timeout_ms: int = 7_200_000
                                  ) -> DataFrame:
    """Custom STATEFUL streaming operator: incremental per-conversation
    rollup via ``applyInPandasWithState`` keyed on conv_id.

    State per conversation: (n_turns, n_triples, last_turn_idx,
    last_intent). Each trigger folds that conversation's new triples into
    the state and emits the updated rollup row; a conversation idle past
    ``idle_timeout_ms`` (processing-time) has its state dropped — the
    bounded-state requirement for an unbounded conversation keyspace at
    10^12-turn scale. Updates are monotone merges, so the final row per
    conversation equals the batch rollup regardless of how turns are
    split across triggers (asserted in tests).

    This is the query's ONLY stateful operator (Spark does not support
    chaining the watermark-dedup stage before flatMapGroupsWithState in
    update mode) — replay protection belongs upstream (the file source is
    exactly-once) or downstream via the idempotent-merge property.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    triples = parse_transcripts(stream_df, model_json)

    def update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return iter(())
        if state.exists:
            n_turns, n_triples, last_idx, last_intent = state.get
        else:
            n_turns, n_triples, last_idx, last_intent = 0, 0, -1, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_triples += len(pdf)
            intents = pdf[pdf["pred"] == "intent"]
            n_turns += len(intents)
            if len(intents):
                top = intents.loc[intents["turn_idx"].idxmax()]
                if int(top["turn_idx"]) >= last_idx:
                    last_idx = int(top["turn_idx"])
                    last_intent = top["obj"]
        state.update((n_turns, n_triples, last_idx, last_intent))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({
            "conv_id": [conv_id], "n_turns": [n_turns],
            "n_triples": [n_triples], "last_turn_idx": [last_idx],
            "last_intent": [last_intent]})

    return (triples
            .groupBy("conv_id")
            .applyInPandasWithState(
                update,
                outputStructType=CONV_ROLLUP_SCHEMA,
                stateStructType=CONV_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def run_stream_to_parquet(spark: SparkSession, source_dir: str,
                          model_json: str, out_dir: str,
                          checkpoint_dir: str, once: bool = True):
    """Start the stream writing partitioned parquet with a checkpoint;
    ``once=True`` processes all available input then stops (used by
    tests; a production run would leave the trigger continuous)."""
    triples = streaming_triples(
        streaming_transcripts(spark, source_dir), model_json)
    writer = (triples.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


CTX_STATE_SCHEMA = "last_intent string, last_turn_idx int"
CTX_OUT_SCHEMA = ("conv_id string, turn_idx int, intent string, "
                  "effective_intent string, carried boolean")


def streaming_contextual_intents(stream_df: DataFrame, model_json: str,
                                 idle_timeout_ms: int = 7_200_000
                                 ) -> DataFrame:
    """Stateful dialogue-state carry-over: the streaming twin of
    ``graph.contextual_intents``. Keyed on conv_id via
    ``applyInPandasWithState``; state = (last matched intent, its
    turn_idx). Each trigger parses that conversation's new turns (same
    engine/anchor semantics as the batch kernel — stages.parse_cached),
    emits one row per turn with its effective intent, and advances the
    state; idle conversations time out so state stays bounded on an
    unbounded conversation keyspace.

    Consumes the RAW turn stream, not the triple stream: intent-less
    turns (the ones that need carrying) emit no triples at all.

    Ordering: turns within a trigger are processed in turn_idx order; a
    late turn older than the state's last_turn_idx is emitted
    best-effort against the current state and does not move the state
    backwards (same monotonicity convention as the rollup operator).
    With in-order delivery per conversation the emitted rows equal the
    batch operator's output exactly (asserted in tests across
    micro-batch splits).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    from .stages import _engine_from_json, parse_cached

    def update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return iter(())
        last_intent, last_idx = state.get if state.exists else (None, -1)
        batches = [p for p in pdfs if len(p)]
        rows = []
        if batches:
            engine = _engine_from_json(model_json)
            pdf = (pd.concat(batches) if len(batches) > 1 else batches[0]
                   ).sort_values("turn_idx")
            ts_series = pd.to_datetime(pdf["ts"]) \
                if "ts" in pdf.columns else pd.Series([None] * len(pdf))
            for tidx, text, ts in zip(pdf["turn_idx"], pdf["text"],
                                      ts_series):
                if text is None:
                    continue
                result = parse_cached(engine, str(text),
                                      None if pd.isna(ts) else ts)
                intent = result["intent"]["intentName"]
                if intent is not None and int(tidx) >= last_idx:
                    last_intent, last_idx = intent, int(tidx)
                eff = intent if intent is not None else last_intent
                rows.append((conv_id, int(tidx), intent, eff,
                             intent is None and eff is not None))
        state.update((last_intent, last_idx))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                          "intent", "effective_intent",
                                          "carried"])

    return (stream_df
            .groupBy("conv_id")
            .applyInPandasWithState(
                update,
                outputStructType=CTX_OUT_SCHEMA,
                stateStructType=CTX_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


CTX_ORD_STATE_SCHEMA = ("last_intent string, next_idx int, "
                        "buf_idx array<int>, buf_text array<string>, "
                        "buf_ts array<long>")


def streaming_contextual_intents_ordered(stream_df: DataFrame,
                                         model_json: str,
                                         idle_timeout_ms: int
                                         = 7_200_000) -> DataFrame:
    """Out-of-order-safe variant of
    :func:`streaming_contextual_intents`: turns are reassembled into
    per-conversation ``turn_idx`` sequence order before the carry-over
    runs (TCP-style gap buffering — a turn is processed only once every
    earlier turn of its conversation has arrived; later arrivals wait
    in state). Emission is therefore EXACTLY the batch operator's
    output however turns are shuffled across micro-batches, at the cost
    of buffering out-of-order tails in state (bounded by the
    conversation length and dropped with the idle timeout).

    Assumes per-conversation turn_idx is contiguous from 0 (the
    transcript contract). State holds (last carried intent, next
    expected turn_idx, the gap buffer as parallel arrays).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    from .stages import _engine_from_json, parse_cached

    def update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            state.remove()
            return iter(())
        if state.exists:
            last_intent, next_idx, bidx, btext, bts = state.get
            buf = {int(i): (t, ts)
                   for i, t, ts in zip(bidx, btext, bts)}
        else:
            last_intent, next_idx, buf = None, 0, {}
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_series = pd.to_datetime(pdf["ts"]) \
                if "ts" in pdf.columns else pd.Series([None] * len(pdf))
            for tidx, text, ts in zip(pdf["turn_idx"], pdf["text"],
                                      ts_series):
                ts_ms = None if pd.isna(ts) else int(ts.value // 10**6)
                buf[int(tidx)] = (None if text is None else str(text),
                                  ts_ms)
        rows = []
        engine = None
        while next_idx in buf:
            text, ts_ms = buf.pop(next_idx)
            intent = None
            if text is not None:
                if engine is None:
                    engine = _engine_from_json(model_json)
                ts = None if ts_ms is None \
                    else pd.Timestamp(ts_ms, unit="ms")
                result = parse_cached(engine, text, ts)
                intent = result["intent"]["intentName"]
            if intent is not None:
                last_intent = intent
            eff = intent if intent is not None else last_intent
            rows.append((conv_id, next_idx, intent, eff,
                         intent is None and eff is not None))
            next_idx += 1
        items = sorted(buf.items())
        state.update((last_intent, next_idx,
                      [i for i, _ in items],
                      [v[0] for _, v in items],
                      [v[1] for _, v in items]))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                          "intent", "effective_intent",
                                          "carried"])

    return (stream_df
            .groupBy("conv_id")
            .applyInPandasWithState(
                update,
                outputStructType=CTX_OUT_SCHEMA,
                stateStructType=CTX_ORD_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def streaming_exact_dedup(stream_df: DataFrame,
                          text_col: str = "text",
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup for an unbounded document/turn stream: a
    128-bit content fingerprint per row, then
    ``dropDuplicatesWithinWatermark`` keyed on the fingerprint — the
    first arrival within a watermark window survives, replays and
    verbatim re-crawls inside the window are dropped, and the
    fingerprint state is EVICTED once the watermark passes (bounded
    state on an unbounded stream — the property a plain
    ``dropDuplicates`` cannot give without keying state to event
    time). Mirrors the batch ``exact_duplicates`` fingerprint exactly,
    so a batch backfill and the stream agree on what is a duplicate.
    """
    from pyspark.sql import functions as F  # noqa: N812

    from ..functions.text import doc_fingerprint

    return (stream_df
            .withWatermark("ts", watermark)
            .withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
            .dropDuplicatesWithinWatermark(["fingerprint"]))


FUSION_STATE_SCHEMA = "n long, mx double, lg double"
FUSION_OUT_SCHEMA = ("subj string, pred string, obj string, "
                     "n_assertions long, max_proba double, "
                     "confidence double")


def streaming_fact_fusion(stream_df: DataFrame, model_json: str,
                          idle_timeout_ms: int = 7_200_000
                          ) -> DataFrame:
    """Streaming KG construction: incremental noisy-OR confidence
    fusion via ``applyInPandasWithState`` keyed on the FACT
    (subj, pred, obj). State per fact is the sufficient statistic of
    the fusion — (assertion count, max proba, Σ ln(1 − pᵢ) clamped) —
    so each trigger folds the new assertions in O(batch) and emits the
    fact's refreshed fused row; noisy-OR's associativity (the batch
    twin is ``spark.kg.triple_confidence``, the incremental twin
    ``spark.kg.merge_fact_batches``) guarantees the final row equals
    the batch fusion REGARDLESS of how assertions split across
    triggers (asserted in tests at 6-dp precision — the stored
    precision of the fused table).

    Facts idle past ``idle_timeout_ms`` have their state dropped: the
    fused row already left the stream, and a late re-assertion of an
    evicted fact re-enters through the downstream merge
    (``merge_fact_batches``) exactly because the fusion is
    associative — bounded state on an unbounded fact keyspace.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    triples = parse_transcripts(stream_df, model_json)

    def update(key, pdfs, state: GroupState):
        subj, pred, obj = key
        if state.hasTimedOut:
            state.remove()
            return iter(())
        if state.exists:
            n, mx, lg = state.get
        else:
            n, mx, lg = 0, 0.0, 0.0
        for pdf in pdfs:
            for p in pdf["proba"]:
                p = float(p)
                n += 1
                mx = max(mx, p)
                lg += math.log(max(1.0 - p, 1e-12))
        state.update((n, mx, lg))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({
            "subj": [subj], "pred": [pred], "obj": [obj],
            "n_assertions": [n], "max_proba": [round(mx, 6)],
            "confidence": [round(1.0 - math.exp(lg), 6)]})

    return (triples
            .groupBy("subj", "pred", "obj")
            .applyInPandasWithState(
                update,
                outputStructType=FUSION_OUT_SCHEMA,
                stateStructType=FUSION_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))

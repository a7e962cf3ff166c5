"""Round-2 regression tests: memo-overflow eviction, none_proba
last-parser-wins, SimHash vectorized-kernel golden parity, MinHash-LSH
candidate-scoped verification plan."""

import json
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def engine():
    from snips_nlu_spark.engine import NluEngine
    bundle = REPO / "oracle" / "model_bundle.json"
    return NluEngine.from_dict(json.loads(bundle.read_text("utf8")))


def test_parse_memo_overflow_keeps_batch_hits(engine, monkeypatch):
    """Eviction at the memo cap must not drop entries the CURRENT batch
    still needs (round-1 ADVICE high: memo.clear() erased this batch's
    cache-hit keys, so pass 3 crashed with KeyError)."""
    from snips_nlu_spark.spark import stages

    monkeypatch.setattr(stages, "_PARSE_MEMO_CAP", 1)
    engine.parse_memo = {}
    engine.has_datetime = lambda text: False

    pdf1 = pd.DataFrame({
        "conv_id": ["c0"], "turn_idx": [0],
        "text": ["make me a coffee"], "ts": [None]})
    out1 = stages._parse_batch(engine, pdf1)
    assert ("make me a coffee", None) in engine.parse_memo

    # second batch: one memo HIT + two misses → overflow eviction fires
    pdf2 = pd.DataFrame({
        "conv_id": ["c0", "c0", "c0"], "turn_idx": [0, 1, 2],
        "text": ["make me a coffee", "turn on the lights in the kitchen",
                 "gibberish nothing matches here"],
        "ts": [None, None, None]})
    out2 = stages._parse_batch(engine, pdf2)  # crashed before the fix
    hit_rows = out2[out2["turn_idx"] == 0]
    assert hit_rows[["subj", "pred", "obj"]].apply(tuple, axis=1).tolist() \
        == [(f"c0:0", r.pred, r.obj) for r in
            out1.itertuples()] != []
    del engine.parse_memo, engine.has_datetime


def test_none_proba_last_parser_wins(engine):
    """Unmatched texts must report the LAST parser's empty-result score
    (the probabilistic classifier's None proba), not lookup's 1.0 —
    reference nlu_engine.py parse-loop semantics."""
    text = "xqzv blorp unmatched gibberish"
    res = engine.parse(text)
    assert res["intent"]["intentName"] is None
    prob_parser = engine.intent_parsers[-1]
    expected = prob_parser.parse(text, engine._bundle)
    assert res["intent"]["probability"] == \
        expected["intent"]["probability"] < 1.0
    # batch path mirrors the single path exactly
    batch = engine.parse_batch([text])
    assert batch[0]["intent"]["probability"] == \
        res["intent"]["probability"]


def test_get_intents_batch_matches_single(engine):
    texts = ["make me a coffee", "xqzv blorp", ""]
    batch = engine.get_intents_batch(texts)
    for text, ranked in zip(texts, batch):
        single = engine.get_intents(text)
        assert [(r["intentName"], r["probability"]) for r in ranked] == \
            [(r["intentName"], r["probability"]) for r in single]


def test_batched_crf_decode_matches_single(engine):
    """predict_batch / get_slots_batch / parse_batch are row-identical to
    their single-text counterparts on mixed-length, mixed-intent
    inputs (incl. empty and no-token rows)."""
    texts = ["make me two cups of coffee",
             "switch on the light in the kitchen",
             "book me a flight to paris tomorrow",
             "fly me to tokyo on monday at 8pm",
             "", "...", "xqzv gibberish nothing",
             "set the light in the bedroom to blue please"]
    import datetime
    anchors = [datetime.datetime(2024, 5, 2)] * len(texts)
    batch = engine.parse_batch(texts, anchors)
    for text, anchor, got in zip(texts, anchors, batch):
        assert got == engine.parse(text, anchor=anchor), text

    prob = engine.intent_parsers[-1]
    filler = next(iter(prob.slot_fillers.values()))
    single = [filler.get_slots(t, engine._bundle) for t in texts]
    batched = filler.get_slots_batch(texts, engine._bundle)
    assert batched == single


def test_open_parser_registry_custom_unit_in_cascade():
    """A custom parser registered via the open registry runs in the
    cascade and round-trips through the JSON bundle (VERDICT: open
    processing-unit registration, ref pipeline/processing_unit.py:28-72)."""
    from snips_nlu_spark.engine import NluEngine
    from snips_nlu_spark.fixtures import beverage_dataset
    from snips_nlu_spark.registry import register_intent_parser
    from snips_nlu_spark.result import empty_result, parsing_result

    @register_intent_parser("toy_keyword_parser")
    class ToyKeywordParser:
        def __init__(self):
            self.keyword = None

        def fit(self, dataset, resources, entity_bundle=None,
                random_seed=42):
            self.keyword = "abracadabra"
            return self

        def parse(self, text, entity_bundle, intents=None, top_n=None,
                  anchor=None):
            if self.keyword in text:
                return parsing_result(
                    text, {"intentName": "magic", "probability": 1.0}, [])
            return empty_result(text, 0.0)

        def get_intents(self, text, entity_bundle, anchor=None):
            hit = self.keyword in text
            return [{"intentName": "magic" if hit else None,
                     "probability": 1.0}]

        def get_slots(self, text, entity_bundle, intent, anchor=None):
            return []

        def to_dict(self):
            return {"unit_name": "toy_keyword_parser",
                    "keyword": self.keyword}

        @classmethod
        def from_dict(cls, d):
            p = cls()
            p.keyword = d["keyword"]
            return p

    eng = NluEngine(parser_units=("toy_keyword_parser",
                                  "lookup_intent_parser"))
    eng.fit(beverage_dataset())
    assert eng.parse("abracadabra please")["intent"]["intentName"] == \
        "magic"
    # the rest of the cascade still runs when the custom unit passes
    res = eng.parse("make me two cups of coffee")
    assert res["intent"]["intentName"] == "prepareBeverage"
    # bundle round-trip restores the custom unit through the registry
    reloaded = NluEngine.from_dict(eng.to_dict())
    assert reloaded.parse("abracadabra please")["intent"][
        "intentName"] == "magic"

    with pytest.raises(ValueError, match="unknown intent parser"):
        NluEngine(parser_units=("not_registered",)).fit(beverage_dataset())


def test_lookup_mention_overflow_falls_back_gracefully(engine):
    """Texts with more mentions than the subset bound apply the per-kind
    training budget before truncating (round-1 ADVICE low): the retained
    mentions are the textually-first ones each training key can actually
    contain, not an arbitrary prefix, and parsing stays deterministic."""
    from snips_nlu_spark.fixtures import combined_dataset
    from snips_nlu_spark.parsers.lookup import (LookupIntentParser,
                                                MAX_ENTITIES_PER_SCOPE)
    from snips_nlu_spark.resources import get_resources

    ds = combined_dataset()
    lookup = LookupIntentParser().fit(ds, get_resources("en"))
    bev = next(g for g in lookup._entity_scopes
               if g["intent_group"] == ["prepareBeverage"])
    assert bev["max_per_kind"] == {"snips/number": 1, "beverage_type": 1}

    text = ("make me two cups of coffee then one then three then four "
            "then five espresso latte cocoa")
    n_mentions = len(engine._bundle.parse_custom(text, ["beverage_type"])
                     ) + len(engine._bundle.parse_builtin(
                         text, ["snips/number"], None))
    assert n_mentions > MAX_ENTITIES_PER_SCOPE  # overflow really triggers

    for _cand, mentions in lookup._candidates(text, engine._bundle,
                                              None, None):
        assert len(mentions) <= 2  # bounded by the per-kind budget
        for m in mentions:
            # first-in-text-order mention of each kind is the one kept
            assert m["value"] in ("two", "coffee")
    # end-to-end parse is stable (no exact key covers the junk tail)
    res = lookup.parse(text, engine._bundle)
    assert res["intent"]["intentName"] is None


def _fnv1a_slow(token: str) -> int:
    h = 0xCBF29CE484222325
    for ch in token.encode("utf8"):
        h = ((h ^ ch) * 0x100000001B3) % (1 << 64)
    return h


def _simhash_slow(text: str, bits: int = 64) -> int:
    import re
    tokens = re.findall("[a-z0-9]+", text.lower())
    if not tokens:
        return 0
    votes = [0] * bits
    for tok in tokens:
        h = _fnv1a_slow(tok)
        for b in range(bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(bits):
        if votes[b] > 0:
            sig |= 1 << b
    # two's complement int64
    return sig - (1 << 64) if sig >= (1 << 63) else sig


@pytest.mark.spark
def test_simhash_vectorized_golden(spark):
    """The vectorized numpy kernel must emit byte-identical signatures to
    the straightforward per-char FNV-1a fold it replaced."""
    from snips_nlu_spark.functions.dedup import simhash_signatures
    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "Text with MIXED case, punctuation!! and numbers 42 7x9"),
        (2, ""),
        (3, "...!!!"),  # no word tokens → signature 0
        (4, "repeated repeated repeated words words"),
        (5, "unicode café naïve über straße tokens"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"]
           for r in simhash_signatures(df).collect()}
    want = {doc_id: _simhash_slow(text) for doc_id, text in docs}
    assert got == want
    assert got[2] == got[3] == 0


@pytest.mark.spark
def test_build_kg_resume_converges_after_crash_window(spark, tmp_path):
    """A failure BETWEEN the triple write and the lineage write must not
    duplicate rows on resume (round-1 ADVICE medium: append-mode writes
    re-appended every bucket). Simulated by deleting the lineage ledger
    after a full build — resume reprocesses everything and must converge
    to the identical store."""
    import shutil

    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.lineage import build_kg
    import __spark_entry__ as em

    df = spark.createDataFrame(datagen.generate_pandas(0, 200))
    mj = em._model_json()
    out = tmp_path / "kg"
    build_kg(spark, df, mj, str(out), n_buckets=4)
    baseline = sorted(
        tuple(r) for r in
        spark.read.parquet(str(out / "triples"))
        .drop("bucket").collect())

    # crash window: triples committed, lineage lost
    shutil.rmtree(out / "lineage")
    summary = build_kg(spark, df, mj, str(out), n_buckets=4)
    assert summary["resumed_buckets"] == 0
    resumed = sorted(
        tuple(r) for r in
        spark.read.parquet(str(out / "triples"))
        .drop("bucket").collect())
    assert resumed == baseline  # no duplicates, identical final state


@pytest.mark.spark
def test_build_kg_derives_and_pins_n_buckets(spark, tmp_path):
    """n_buckets=None derives from input size and is pinned in _meta.json
    so resume keeps the conv_id→bucket mapping."""
    import json as _json

    from snips_nlu_spark import datagen
    from snips_nlu_spark.spark.lineage import build_kg
    import __spark_entry__ as em

    df = spark.createDataFrame(datagen.generate_pandas(0, 150))
    out = tmp_path / "kg2"
    s1 = build_kg(spark, df, em._model_json(), str(out))
    assert s1["n_buckets"] == 64  # floor for small inputs
    meta = _json.loads((out / "_meta.json").read_text("utf8"))
    assert meta["n_buckets"] == 64
    # a caller passing a DIFFERENT count on resume must not remap buckets
    s2 = build_kg(spark, df, em._model_json(), str(out), n_buckets=8)
    assert s2["n_buckets"] == 64 and s2["pending_turns"] == 0


@pytest.mark.spark
def test_iceberg_adapter_capability_gated(spark):
    """No Iceberg jar in this sandbox: the probe must say so and the
    adapter must fail loudly with the fallback pointer, never write."""
    from snips_nlu_spark.spark import iceberg

    assert iceberg.iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="parquet sink"):
        iceberg.IcebergCommitSurface(spark, "cat.db.kg")


@pytest.mark.spark
def test_minhash_plan_has_no_allpairs_verify(spark):
    """The verification step must be candidate-driven (shingle-set
    intersection), never the full co-shingle pair enumeration (round-1
    VERDICT #2: LSH saved nothing at scale)."""
    from snips_nlu_spark.functions.dedup import minhash_duplicate_pairs
    df = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c d e g")], ["doc_id", "text"])
    out = minhash_duplicate_pairs(df, threshold=0.5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # no full-corpus per-doc shingle-set materialization in agg buffers
    # (round-2 VERDICT #5: collect_set per doc is unbounded task memory)
    assert "collect_set" not in plan
    # every shingle equi-join must be candidate-pair-scoped: its join
    # condition also carries a doc-id equality. The round-1 all-pairs
    # verify joined on shingle ALONE (with only doc_id < doc_id beside
    # it), which this assertion rejects. (Round 6: shingles are 64-bit
    # hash columns named ``h`` — same invariant, new column name.)
    import re
    shingle_joins = [
        cond for cond in re.findall(r"Join \w+, \((.*)\)", plan)
        if re.search(r"\bh#\d+L? = h#\d+L?", cond)]
    assert shingle_joins, "verification no longer joins on shingles?"
    for cond in shingle_joins:
        assert re.search(r"doc_\w+#\d+L? = doc_\w+#\d+L?", cond), cond


def test_lookup_prune_is_result_invariant(engine):
    """The OOV-vocab and subset-size prunes in LookupIntentParser only
    skip guaranteed map misses: parse / get_intents over fixture
    utterances, mutated variants, OOV-laden, and entity-heavy texts must
    be identical with pruning disabled."""
    import datetime
    from snips_nlu_spark.fixtures import combined_dataset

    lookup = next(p for p in engine.intent_parsers
                  if type(p).__name__ == "LookupIntentParser")

    class _AllVocab(set):
        def __contains__(self, _):  # claims every token → prune off
            return True

    import copy
    off = copy.copy(lookup)
    off._key_vocab = _AllVocab()
    off._max_key_slots = 10 ** 9
    # the preprocess memo is bound to the original instance and is pure —
    # sharing it is fine

    texts = []
    ds = combined_dataset()
    for intent in ds["intents"].values():
        for utt in intent["utterances"][:12]:
            t = "".join(c.get("text", c.get("value", ""))
                        for c in utt["data"])
            texts.append(t)
            texts.append(t + " zzquux")       # trailing OOV
            texts.append("please " + t)        # leading stop word
            texts.append(t.upper())
    texts += ["", "zz yy xx", "two three four five six seven eight nine",
              "coffee tea coffee tea coffee tea coffee tea coffee tea"]
    anchor = datetime.datetime(2024, 5, 2)
    for t in texts:
        a = engine._bundle
        assert lookup.parse(t, a, anchor=anchor) == \
            off.parse(t, a, anchor=anchor), t
        assert lookup.get_intents(t, a, anchor=anchor) == \
            off.get_intents(t, a, anchor=anchor), t


def test_multilang_query_matches_committed_oracle(spark):
    """kg_multilang_triples: all seven non-en language packs through the
    distributed parse stage reproduce the committed single-process
    oracle row-for-row, and the run is deterministic."""
    import pandas as pd
    import __spark_entry__ as em

    got = (em._q_multilang_triples(spark, "unused")
           .toPandas()
           .sort_values(["lang", "conv_id", "turn_idx", "pred", "obj",
                         "span_start"], na_position="first")
           .reset_index(drop=True))
    want = (pd.read_parquet(REPO / "oracle" / "multilang.parquet")
            .sort_values(["lang", "conv_id", "turn_idx", "pred", "obj",
                          "span_start"], na_position="first")
            .reset_index(drop=True))
    assert sorted(got.columns) == sorted(want.columns)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])
    # every language contributed triples (nothing silently unparsed)
    assert set(got["lang"]) == {"fr", "es", "de", "it", "pt", "ja", "ko"}

    again = (em._q_multilang_triples(spark, "unused")
             .toPandas()
             .sort_values(["lang", "conv_id", "turn_idx", "pred", "obj",
                           "span_start"], na_position="first")
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)

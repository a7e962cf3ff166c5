"""Probabilistic stack: classifier + CRF generalization, extensibility
rules, and the quality gates (intent accuracy / slot F1 vs generation
truth — mirrors the reference integration gate thresholds,
/root/reference/snips_nlu/tests/integration_test.py:15-16)."""

import datetime as dt

import pytest

from snips_nlu_spark import datagen
from snips_nlu_spark.engine import NluEngine
from snips_nlu_spark.fixtures import FILLER_TEXTS, combined_dataset

ANCHOR = dt.datetime(2024, 3, 14, 10, 30)


@pytest.fixture(scope="module")
def engine():
    # default units = lookup -> probabilistic (en reference cascade)
    return NluEngine().fit(combined_dataset())


def test_crf_generalizes_to_unseen_extensible_value(engine):
    res = engine.parse("prepare a cup of oolong tea", anchor=ANCHOR)
    assert res["intent"]["intentName"] == "prepareBeverage"
    slots = {s["slotName"]: s for s in res["slots"]}
    assert slots["beverage_type"]["value"] == {"kind": "Custom",
                                               "value": "oolong tea"}
    assert slots["beverage_type"]["rawValue"] == "oolong tea"


def test_non_extensible_unseen_slot_dropped(engine):
    # "teal" is not a known color and color is not automatically
    # extensible -> slot dropped (ref: nlu_engine.py:444-449)
    res = engine.parse("make the lights teal", anchor=ANCHOR)
    assert res["intent"]["intentName"] == "setLightColor"
    assert all(s["slotName"] != "color" for s in res["slots"])


def test_fillers_mostly_classify_as_none(engine):
    none_count = sum(
        engine.parse(t, anchor=ANCHOR)["intent"]["intentName"] is None
        for t in FILLER_TEXTS)
    assert none_count >= int(0.9 * len(FILLER_TEXTS))


def test_on_off_distinction_survives_feature_stopwords(engine):
    assert engine.parse("switch on the light in the attic",
                        anchor=ANCHOR)["intent"]["intentName"] \
        == "turnLightOn"
    assert engine.parse("switch off the light in the attic",
                        anchor=ANCHOR)["intent"]["intentName"] \
        == "turnLightOff"


def test_probabilistic_roundtrip_through_dict(engine):
    clone = NluEngine.from_dict(engine.to_dict())
    for text in ("prepare a cup of oolong tea", "turn off the lights",
                 "processing your request"):
        assert clone.parse(text, anchor=ANCHOR) == \
            engine.parse(text, anchor=ANCHOR)


def test_fit_is_reproducible():
    # same seed => byte-identical model dicts
    # (ref: test_nlu_engine.py:1381 test_training_should_be_reproducible)
    a = NluEngine(random_seed=7).fit(combined_dataset()).to_dict()
    b = NluEngine(random_seed=7).fit(combined_dataset()).to_dict()
    assert a == b


def test_quality_gates_vs_generation_truth(engine):
    """Intent accuracy >= 0.95 and slot F1 >= 0.85 on synthetic user turns
    (generation truth is exact by construction)."""
    n_eval = 3000
    intent_tp = intent_total = 0
    slot_tp = slot_pred = slot_true = 0
    for i in range(n_eval):
        truth = datagen.expected_user_turn(i)
        if truth is None:
            continue
        want_intent, want_slots = truth
        rec = datagen.turn_record(i)
        res = engine.parse(rec["text"], anchor=rec["ts"])
        intent_total += 1
        intent_tp += res["intent"]["intentName"] == want_intent

        pred = {(s["slotName"], s["range"]["start"], s["range"]["end"])
                for s in res["slots"]}
        # drop expected slots whose value cannot be resolved for
        # non-extensible entities (the engine MUST drop those)
        want = set()
        for s in want_slots:
            if s["entity"] == "color" and s["value"] in ("teal",):
                continue
            want.add((s["slot_name"], s["start"], s["end"]))
        slot_pred += len(pred)
        slot_true += len(want)
        slot_tp += len(pred & want)

    intent_acc = intent_tp / intent_total
    precision = slot_tp / slot_pred if slot_pred else 0.0
    recall = slot_tp / slot_true if slot_true else 0.0
    f1 = 2 * precision * recall / (precision + recall) \
        if precision + recall else 0.0
    print(f"intent_acc={intent_acc:.4f} slot_p={precision:.4f} "
          f"slot_r={recall:.4f} slot_f1={f1:.4f}")
    assert intent_acc >= 0.95
    assert f1 >= 0.85

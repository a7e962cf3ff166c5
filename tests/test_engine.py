"""Engine cascade + parsers on the fixture datasets — golden expectations
mirror the reference's parser tests (exact slot char ranges, the
1/(1+n_slots) ambiguity weighting, extensibility drop rule)."""

import datetime as dt

import pytest

from snips_nlu_spark.engine import NluEngine
from snips_nlu_spark.fixtures import (beverage_dataset, combined_dataset,
                                      lights_dataset)

ANCHOR = dt.datetime(2024, 3, 14, 10, 30)

LOOKUP_DET = ("lookup_intent_parser", "deterministic_intent_parser")


@pytest.fixture(scope="module")
def engine():
    return NluEngine(parser_units=LOOKUP_DET).fit(combined_dataset())


def test_lookup_exact_training_utterance(engine):
    res = engine.parse("make me two cups of coffee", anchor=ANCHOR)
    assert res["intent"]["intentName"] == "prepareBeverage"
    assert res["intent"]["probability"] == 1.0
    slots = {s["slotName"]: s for s in res["slots"]}
    assert slots["number_of_cups"]["value"] == {"kind": "Number",
                                                "value": 2.0}
    assert slots["number_of_cups"]["rawValue"] == "two"
    assert slots["beverage_type"]["value"] == {"kind": "Custom",
                                               "value": "coffee"}


def test_lookup_generalizes_to_new_entity_values(engine):
    # same template, different entity values → placeholder key matches
    res = engine.parse("make me five cups of green tea", anchor=ANCHOR)
    assert res["intent"]["intentName"] == "prepareBeverage"
    slots = {s["slotName"]: s for s in res["slots"]}
    assert slots["number_of_cups"]["value"]["value"] == 5.0
    assert slots["beverage_type"]["value"]["value"] == "green tea"
    # exact char ranges
    assert slots["beverage_type"]["range"] == {"start": 21, "end": 30}
    assert res["input"][21:30] == "green tea"


def test_synonym_canonicalization(engine):
    res = engine.parse("prepare a cup of expresso", anchor=ANCHOR)
    assert res["intent"]["intentName"] == "prepareBeverage"
    assert res["slots"][0]["value"] == {"kind": "Custom",
                                        "value": "espresso"}
    assert res["slots"][0]["rawValue"] == "expresso"


def test_unseen_entity_value_falls_through_exact_parsers(engine):
    # "oolong tea" is not in the gazetteer: the exact (lookup/regex)
    # parsers cannot match the placeholder key → None intent. The
    # probabilistic (CRF) stage is the one that generalizes to unseen
    # values of extensible entities (covered in test_probabilistic).
    res = engine.parse("prepare a cup of oolong tea", anchor=ANCHOR)
    assert res["intent"]["intentName"] is None


def test_known_synonym_resolves_to_canonical_color():
    engine = NluEngine(parser_units=LOOKUP_DET).fit(lights_dataset())
    res = engine.parse("make the lights crimson", anchor=ANCHOR)
    assert res["intent"]["intentName"] == "setLightColor"
    assert res["slots"][0]["value"] == {"kind": "Custom", "value": "red"}
    # the non-extensible drop rule (unseen "teal" → slot removed, ref:
    # nlu_engine.py:444-449) needs the CRF stage to even tag the slot;
    # covered in the probabilistic-parser tests


def test_datetime_slot_resolves_against_anchor(engine):
    res = engine.parse("book me a flight to paris tomorrow", anchor=ANCHOR)
    assert res["intent"]["intentName"] == "bookFlight"
    slots = {s["slotName"]: s for s in res["slots"]}
    assert slots["departure_date"]["value"]["value"] == \
        "2024-03-15 00:00:00"
    assert slots["destination"]["value"]["value"] == "paris"


def test_none_intent_on_filler(engine):
    res = engine.parse("the operation completed successfully",
                       anchor=ANCHOR)
    assert res["intent"]["intentName"] is None
    assert res["slots"] == []


def test_intent_cascade_no_slots(engine):
    res = engine.parse("turn off the lights", anchor=ANCHOR)
    assert res["intent"]["intentName"] == "turnLightOff"
    assert res["slots"] == []


def test_get_intents_length(engine):
    intents = engine.get_intents("turn on the lights", anchor=ANCHOR)
    names = [r["intentName"] for r in intents]
    # n_intents + 1 (None), each exactly once
    assert len(names) == 6 + 1
    assert names[0] == "turnLightOn"
    assert None in names


def test_engine_roundtrip_through_dict(engine):
    clone = NluEngine.from_dict(engine.to_dict())
    a = engine.parse("make me two cups of coffee", anchor=ANCHOR)
    b = clone.parse("make me two cups of coffee", anchor=ANCHOR)
    assert a == b


def test_deterministic_parser_direct():
    from snips_nlu_spark.engine import EntityBundle
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    from snips_nlu_spark.entities.gazetteer import GazetteerParser
    from snips_nlu_spark.dataset import validate_and_format_dataset
    from snips_nlu_spark.parsers.deterministic import (
        DeterministicIntentParser)
    from snips_nlu_spark.resources import get_resources

    ds = validate_and_format_dataset(beverage_dataset())
    parser = DeterministicIntentParser().fit(ds, get_resources("en"))
    gaz = GazetteerParser.build(
        {"beverage_type": ds["entities"]["beverage_type"]["utterances"]})
    bundle = EntityBundle(gaz, BuiltinEntityParser())

    res = parser.parse("brew ten cups of latte please", bundle,
                       anchor=ANCHOR)
    assert res["intent"]["intentName"] == "prepareBeverage"
    slots = {s["slotName"]: s for s in res["slots"]}
    assert slots["number_of_cups"]["value"] == "ten"
    assert slots["beverage_type"]["value"] == "latte"
    # ranges point into the original text
    assert res["input"][slots["beverage_type"]["range"]["start"]:
                        slots["beverage_type"]["range"]["end"]] == "latte"


def test_ambiguity_weighting_lookup():
    """Two intents sharing an identical key → ambiguous, dropped at fit;
    parse returns None (proba ≤ 0.5 rule)."""
    ds = {
        "language": "en",
        "intents": {
            "intentA": {"utterances": [
                {"data": [{"text": "foo bar baz"}]}]},
            "intentB": {"utterances": [
                {"data": [{"text": "foo bar baz"}]}]},
        },
        "entities": {},
    }
    engine = NluEngine(parser_units=("lookup_intent_parser",)).fit(ds)
    res = engine.parse("foo bar baz")
    assert res["intent"]["intentName"] is None

"""Engine API extras mirroring the reference test strategy: adversarial
inputs (tests/resources/naughty_strings.txt pattern), YAML-dataset e2e,
keyword slot filler, scoped parse, top_n."""

import datetime as dt

import pytest

from snips_nlu_spark.dataset import (dataset_from_yaml,
                                     validate_and_format_dataset)
from snips_nlu_spark.engine import NluEngine
from snips_nlu_spark.fixtures import combined_dataset

ANCHOR = dt.datetime(2024, 3, 14, 10, 30)
LOOKUP_DET = ("lookup_intent_parser", "deterministic_intent_parser")

NAUGHTY = [
    "", " ", "\t\n", "ヽ༼ຈل͜ຈ༽ﾉ ヽ༼ຈل͜ຈ༽ﾉ",
    "undefined NaN null NULL nil",
    "ﬁ ﬂ ﬀ ß ʇxǝʇ uʍop ǝpısdn",
    "<script>alert('xss')</script>",
    "'; DROP TABLE transcripts; --",
    "%%%% %INTENT% %BEVERAGETYPE% %%",
    "\\x00\\x01\\x02",
    "🐱🐶🐭" * 50,
    "ᚠᛇᚻ᛫ᛒᛦᚦ᛫ᚠᚱᚩᚠᚢᚱ᛫ᚠᛁᚱᚪ᛫ᚷᛖᚻᚹᛦᛚᚳᚢᛗ",
    "a" * 2000,
    "make me " + "9" * 100 + " cups of coffee",
]


@pytest.fixture(scope="module")
def engine():
    return NluEngine(parser_units=LOOKUP_DET).fit(combined_dataset())


def test_naughty_strings_do_not_crash_or_match(engine):
    for text in NAUGHTY:
        res = engine.parse(text, anchor=ANCHOR)
        assert res["input"] == text
        # exact parsers must not hallucinate intents on garbage
        if res["intent"]["intentName"] is not None:
            # only the huge-number beverage string may legitimately match
            assert "cups of coffee" in text


def test_yaml_dataset_end_to_end():
    yaml_text = """
type: intent
name: setTemperature
slots:
  - name: room_temperature
    entity: snips/temperature
utterances:
  - set the thermostat to [room_temperature](21 degrees)
  - make it [room_temperature](70 degrees fahrenheit) in here
"""
    ds = validate_and_format_dataset(dataset_from_yaml(yaml_text))
    engine = NluEngine(parser_units=LOOKUP_DET).fit(ds)
    res = engine.parse("set the thermostat to 19 degrees celsius",
                       anchor=ANCHOR)
    assert res["intent"]["intentName"] == "setTemperature"
    slot = res["slots"][0]
    assert slot["value"] == {"kind": "Temperature", "value": 19.0,
                             "unit": "celsius"}


def test_keyword_slot_filler():
    from snips_nlu_spark.slot_filler import KeywordSlotFiller
    ds = validate_and_format_dataset(combined_dataset())
    ksf = KeywordSlotFiller().fit(ds, "setLightColor")
    slots = ksf.get_slots("make everything BLUE please")
    assert slots == [{"range": {"start": 16, "end": 20}, "value": "BLUE",
                      "entity": "color", "slotName": "color"}]


def test_parse_with_intents_scope(engine):
    # "turn on the lights" is a turnLightOn utterance; scoping to other
    # intents must not return it
    res = engine.parse("turn on the lights", anchor=ANCHOR,
                       intents=["prepareBeverage"])
    assert res["intent"]["intentName"] is None
    res2 = engine.parse("turn on the lights", anchor=ANCHOR,
                        intents=["turnLightOn"])
    assert res2["intent"]["intentName"] == "turnLightOn"


def test_parse_top_n(engine):
    results = engine.parse("turn on the lights", anchor=ANCHOR, top_n=3)
    assert len(results) == 3
    assert results[0]["intent"]["intentName"] == "turnLightOn"
    probas = [r["intent"]["probability"] for r in results]
    assert probas == sorted(probas, reverse=True)


def test_get_slots_with_known_intent(engine):
    slots = engine.get_slots("make me two cups of coffee",
                             "prepareBeverage", anchor=ANCHOR)
    names = {s["slotName"] for s in slots}
    assert names == {"number_of_cups", "beverage_type"}


def test_engine_persist_roundtrip(tmp_path, engine):
    path = tmp_path / "model.json"
    engine.persist(path)
    clone = NluEngine.from_path(path)
    a = engine.parse("prepare a cup of expresso", anchor=ANCHOR)
    b = clone.parse("prepare a cup of expresso", anchor=ANCHOR)
    assert a == b

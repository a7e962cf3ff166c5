"""Reference-derived golden expectations, ported as DATA.

Round-2 VERDICT item #4: the kg_* oracle parquets come from this repo's
own engine, so they validate Spark plumbing, not reference semantics.
This file pins the reference's OWN expected parse results — datasets and
expected dicts lifted verbatim from
/root/reference/snips_nlu/tests/test_deterministic_intent_parser.py,
test_lookup_intent_parser.py and test_nlu_engine.py (cited per case) —
and runs them through this repo's parsers. Expectations are data, not
code; any drift from reference semantics in pattern generation, stop-word
handling, placeholder substitution, ambiguity weighting, datetime/number
grammar or synonym resolution fails here independently of the oracle.
"""

from __future__ import annotations

from copy import deepcopy
from pathlib import Path

import pytest

from snips_nlu_spark.dataset import (dataset_from_yaml,
                                     validate_and_format_dataset)
from snips_nlu_spark.engine import EntityBundle, NluEngine
from snips_nlu_spark.entities.builtin import (BuiltinEntityParser,
                                              is_builtin_entity)
from snips_nlu_spark.entities.gazetteer import GazetteerParser
from snips_nlu_spark.parsers.deterministic import DeterministicIntentParser
from snips_nlu_spark.parsers.lookup import LookupIntentParser
from snips_nlu_spark.resources import get_resources
from snips_nlu_spark.result import (empty_result,
                                    intent_classification_result,
                                    parsing_result, unresolved_slot)

# ref: test_deterministic_intent_parser.py:30-64 (same YAML stream, the
# trailing spaces inside the folded utterance collapse under YAML folding)
SLOTS_DATASET_YAML = """
---
type: intent
name: dummy_intent_1
slots:
  - name: dummy_slot_name
    entity: dummy_entity_1
  - name: dummy_slot_name2
    entity: dummy_entity_2
  - name: startTime
    entity: snips/datetime
utterances:
  - >
      This is a [dummy_slot_name](dummy_1) query with another
      [dummy_slot_name2](dummy_2) [startTime](at 10p.m.) or
      [startTime](tomorrow)
  - "This    is  a  [dummy_slot_name](dummy_1) "
  - "[startTime](tomorrow evening) there is a [dummy_slot_name](dummy_1)"

---
type: entity
name: dummy_entity_1
automatically_extensible: no
values:
- [dummy_a, dummy 2a, dummy a, 2 dummy a]
- [dummy_b, dummy b, dummy_bb, dummy_b]
- dummy d

---
type: entity
name: dummy_entity_2
automatically_extensible: no
values:
- [dummy_c, 3p.m., dummy_cc, dummy c]
"""


def _bundle_for(ds: dict) -> EntityBundle:
    gaz = GazetteerParser.build({
        name: ent["utterances"]
        for name, ent in ds["entities"].items()
        if not is_builtin_entity(name)})
    return EntityBundle(gaz, BuiltinEntityParser())


def _fit(yaml_text: str, parser_cls, stop_words: set | None = None,
         **parser_kw):
    ds = validate_and_format_dataset(dataset_from_yaml(yaml_text))
    resources = get_resources("en")
    if stop_words is not None:
        resources = deepcopy(resources)
        resources["stop_words"] = set(stop_words)
    parser = parser_cls(**parser_kw).fit(ds, resources)
    return parser, _bundle_for(ds)


@pytest.fixture(scope="module")
def slots_parser():
    return _fit(SLOTS_DATASET_YAML, DeterministicIntentParser)


# ref: test_deterministic_intent_parser.py:361-437 — exact char ranges
DETERMINISTIC_SLOT_CASES = [
    ("this is a dummy a query with another dummy_c at 10p.m. or at"
     " 12p.m.",
     [unresolved_slot(10, 17, "dummy a", "dummy_entity_1",
                      "dummy_slot_name"),
      unresolved_slot(37, 44, "dummy_c", "dummy_entity_2",
                      "dummy_slot_name2"),
      unresolved_slot(45, 54, "at 10p.m.", "snips/datetime", "startTime"),
      unresolved_slot(58, 67, "at 12p.m.", "snips/datetime", "startTime")]),
    ("this, is,, a, dummy a query with another dummy_c at 10pm or "
     "at 12p.m.",
     [unresolved_slot(14, 21, "dummy a", "dummy_entity_1",
                      "dummy_slot_name"),
      unresolved_slot(41, 48, "dummy_c", "dummy_entity_2",
                      "dummy_slot_name2"),
      unresolved_slot(49, 56, "at 10pm", "snips/datetime", "startTime"),
      unresolved_slot(60, 69, "at 12p.m.", "snips/datetime", "startTime")]),
    ("this is a dummy b",
     [unresolved_slot(10, 17, "dummy b", "dummy_entity_1",
                      "dummy_slot_name")]),
    (" this is a dummy b ",
     [unresolved_slot(11, 18, "dummy b", "dummy_entity_1",
                      "dummy_slot_name")]),
    (" at 8am ’ there is a dummy  a",
     [unresolved_slot(1, 7, "at 8am", "snips/datetime", "startTime"),
      unresolved_slot(21, 29, "dummy  a", "dummy_entity_1",
                      "dummy_slot_name")]),
]


@pytest.mark.parametrize("text,expected",
                         DETERMINISTIC_SLOT_CASES,
                         ids=[c[0][:28] for c in DETERMINISTIC_SLOT_CASES])
def test_deterministic_parses_reference_slots(slots_parser, text, expected):
    parser, bundle = slots_parser
    parsing = parser.parse(text, bundle)
    assert parsing["intent"]["intentName"] == "dummy_intent_1"
    assert parsing["slots"] == expected


FOO_BAR_YAML = """
---
type: intent
name: intent1
utterances:
  - foo bar baz

---
type: intent
name: intent2
utterances:
  - foo bar ban
"""


# ref: test_deterministic_intent_parser.py:67-94 and
# test_lookup_intent_parser.py:67-94 — same fixture, same expectation
@pytest.mark.parametrize("parser_cls",
                         [DeterministicIntentParser, LookupIntentParser])
def test_parses_reference_intent(parser_cls):
    parser, bundle = _fit(FOO_BAR_YAML, parser_cls)
    parsing = parser.parse("foo bar ban", bundle)
    assert parsing["intent"] == intent_classification_result("intent2", 1.0)


# ref: test_deterministic_intent_parser.py:95-118 and
# test_lookup_intent_parser.py:95-118
@pytest.mark.parametrize("parser_cls",
                         [DeterministicIntentParser, LookupIntentParser])
def test_intent_filter_excludes_match(parser_cls):
    parser, bundle = _fit(FOO_BAR_YAML, parser_cls)
    parsing = parser.parse("foo bar ban", bundle, intents=["intent1"])
    assert parsing == empty_result("foo bar ban", 1.0)


# ref: test_deterministic_intent_parser.py:250-272
def test_completely_ambiguous_utterances_ignored():
    yaml_text = """
---
type: intent
name: dummy_intent_1
utterances:
  - Hello world

---
type: intent
name: dummy_intent_2
utterances:
  - Hello world
"""
    parser, bundle = _fit(yaml_text, DeterministicIntentParser)
    assert parser.parse("Hello world", bundle) == \
        empty_result("Hello world", 1.0)


# ref: test_deterministic_intent_parser.py:274-303
def test_very_ambiguous_utterances_ignored():
    yaml_text = """
---
type: intent
name: intent_1
utterances:
  - "[event_type](meeting) tomorrow"

---
type: intent
name: intent_2
utterances:
  - call [time:snips/datetime](today)

---
type: entity
name: event_type
values:
  - call
  - diner
"""
    parser, bundle = _fit(yaml_text, DeterministicIntentParser)
    assert parser.parse("call tomorrow", bundle) == \
        empty_result("call tomorrow", 1.0)


# ref: test_deterministic_intent_parser.py:305-331
def test_slightly_ambiguous_utterances_weighted():
    yaml_text = """
---
type: intent
name: intent_1
utterances:
  - call tomorrow

---
type: intent
name: intent_2
utterances:
  - call [time:snips/datetime](today)
"""
    parser, bundle = _fit(yaml_text, DeterministicIntentParser)
    expected = parsing_result(
        "call tomorrow",
        intent_classification_result("intent_1", 2.0 / 3.0), [])
    assert parser.parse("call tomorrow", bundle) == expected


# ref: test_deterministic_intent_parser.py:438-482
def test_stop_word_entity_values_still_match():
    yaml_text = """
---
type: intent
name: search
utterances:
  - search
  - search [search_object](this)
  - search [search_object](a cat)

---
type: entity
name: search_object
values:
  - [this thing, that]
"""
    parser, bundle = _fit(yaml_text, DeterministicIntentParser,
                          stop_words={"a", "this", "that"})
    res_1 = parser.parse("search this", bundle)
    res_2 = parser.parse("search that", bundle)
    expected_intent = intent_classification_result("search", 1.0)
    assert res_1["intent"] == expected_intent
    assert res_2["intent"] == expected_intent
    assert res_1["slots"] == [
        unresolved_slot(7, 11, "this", "search_object", "search_object")]
    assert res_2["slots"] == [
        unresolved_slot(7, 11, "that", "search_object", "search_object")]


# ref: test_lookup_intent_parser.py:119-188 — exact ambiguity-weighted
# probabilities (1/2, 1, 1/3 normalized) and slot dicts
def test_lookup_top_intents_reference_probabilities():
    yaml_text = """
---
type: intent
name: intent1
utterances:
  - meeting [time:snips/datetime](today)

---
type: intent
name: intent2
utterances:
  - meeting tomorrow

---
type: intent
name: intent3
utterances:
  - "[event_type](call) [time:snips/datetime](at 9pm)"

---
type: entity
name: event_type
values:
  - meeting
  - feedback session
"""
    parser, bundle = _fit(yaml_text, LookupIntentParser)
    results = parser.parse("meeting tomorrow", bundle, top_n=3)

    time_slot = {"entity": "snips/datetime",
                 "range": {"start": 8, "end": 16},
                 "slotName": "time", "value": "tomorrow"}
    event_slot = {"entity": "event_type",
                  "range": {"start": 0, "end": 7},
                  "slotName": "event_type", "value": "meeting"}
    total = 1.0 / 2.0 + 1.0 + 1.0 / 3.0
    assert [r["intent"]["intentName"] for r in results] == \
        ["intent2", "intent1", "intent3"]
    probs = [r["intent"]["probability"] for r in results]
    assert probs == pytest.approx([1.0 / total, (1.0 / 2.0) / total,
                                   (1.0 / 3.0) / total])
    assert results[0]["slots"] == []
    assert results[1]["slots"] == [time_slot]
    assert results[2]["slots"] == [event_slot, time_slot]


# ref: test_lookup_intent_parser.py:210-249
def test_lookup_duplicated_slot_names():
    yaml_text = """
---
type: intent
name: math_operation
slots:
  - name: number
    entity: snips/number
utterances:
  - what is [number](one) plus [number](one)
"""
    parser, bundle = _fit(yaml_text, LookupIntentParser)
    parsing = parser.parse("what is one plus one", bundle)
    assert parsing["intent"] == \
        intent_classification_result("math_operation", 1.0)
    assert parsing["slots"] == [
        {"entity": "snips/number", "range": {"start": 8, "end": 11},
         "slotName": "number", "value": "one"},
        {"entity": "snips/number", "range": {"start": 17, "end": 20},
         "slotName": "number", "value": "one"},
    ]


# ref: test_lookup_intent_parser.py:190-209 (stop words {a, hey} mocked in)
def test_lookup_intent_with_stop_words():
    parser, bundle = _fit(SLOTS_DATASET_YAML, LookupIntentParser,
                          stop_words={"a", "hey"})
    parsing = parser.parse(
        "Hey this is dummy_a query with another dummy_c at 10p.m. "
        "or at 12p.m.", bundle)
    assert parsing["intent"] == \
        intent_classification_result("dummy_intent_1", 1.0)


# ref: test_nlu_engine.py:993-1067 — synonym resolves to its base value
def test_engine_synonym_points_to_base_value():
    yaml_text = """
---
type: intent
name: dummy_intent_1
slots:
  - name: dummy_slot_name
    entity: dummy_entity_1
utterances:
  - "[dummy_slot_name](dummy1)"

---
type: entity
name: dummy_entity_1
automatically_extensible: no
values:
  - [dummy1, dummy1_bis]
"""
    ds = validate_and_format_dataset(dataset_from_yaml(yaml_text))
    engine = NluEngine(parser_units=("lookup_intent_parser",)).fit(ds)
    result = engine.parse("dummy1_bis")
    assert result["intent"]["intentName"] == "dummy_intent_1"
    assert result["slots"] == [{
        "range": {"start": 0, "end": 10},
        "rawValue": "dummy1_bis",
        "value": {"kind": "Custom", "value": "dummy1"},
        "entity": "dummy_entity_1",
        "slotName": "dummy_slot_name",
    }]


# ref: test_lookup_intent_parser.py:250-282 — ambivalent words: "daisy"
# is both a flower word in an utterance and a trained name value
def test_lookup_ambivalent_words():
    yaml_text = """
---
type: intent
name: give_flower
utterances:
  - give a rose to [name](emily)
  - give a daisy to [name](tom)
  - give a tulip to [name](daisy)
"""
    parser, bundle = _fit(yaml_text, LookupIntentParser)
    parsing = parser.parse("give a daisy to emily", bundle)
    assert parsing["intent"] == \
        intent_classification_result("give_flower", 1.0)
    assert parsing["slots"] == [
        {"entity": "name", "range": {"start": 16, "end": 21},
         "slotName": "name", "value": "emily"}]


# ref: test_lookup_intent_parser.py:283-339 — the lookup parser drops
# ambiguous keys at fit, exactly like the deterministic parser
def test_lookup_ambiguous_utterances_ignored():
    yaml_both = """
---
type: intent
name: dummy_intent_1
utterances:
  - Hello world

---
type: intent
name: dummy_intent_2
utterances:
  - Hello world
"""
    parser, bundle = _fit(yaml_both, LookupIntentParser)
    assert parser.parse("Hello world", bundle) == \
        empty_result("Hello world", 1.0)

    yaml_very = """
---
type: intent
name: intent_1
utterances:
  - "[event_type](meeting) tomorrow"

---
type: intent
name: intent_2
utterances:
  - call [time:snips/datetime](today)

---
type: entity
name: event_type
values:
  - call
  - diner
"""
    parser, bundle = _fit(yaml_very, LookupIntentParser)
    assert parser.parse("call tomorrow", bundle) == \
        empty_result("call tomorrow", 1.0)


# ref: test_deterministic_intent_parser.py:484-542 — exact n-best
# probabilities from the 1/(1+n_slots) ambiguity weighting
def test_deterministic_get_intents_reference_probabilities():
    yaml_text = """
---
type: intent
name: greeting1
utterances:
  - Hello John

---
type: intent
name: greeting2
utterances:
  - Hello [name](John)

---
type: intent
name: greeting3
utterances:
  - "[greeting](Hello) [name](John)"
"""
    parser, bundle = _fit(yaml_text, DeterministicIntentParser)
    top = parser.get_intents("Hello John", bundle)
    total = 1.0 + 1.0 / 2.0 + 1.0 / 3.0
    expected = {
        "greeting1": 1.0 / total,
        "greeting2": (1.0 / 2.0) / total,
        "greeting3": (1.0 / 3.0) / total,
        None: 0.0,
    }
    assert top[0] == {"intentName": "greeting1",
                      "probability": pytest.approx(1.0 / total)}
    got = {r["intentName"]: r["probability"] for r in top}
    assert got == pytest.approx(expected)


# ref: test_deterministic_intent_parser.py:543-579 and :581-597
def test_deterministic_get_slots_per_intent():
    yaml_text = """
---
type: intent
name: greeting1
utterances:
  - Hello [name1](John)

---
type: intent
name: greeting2
utterances:
  - Hello [name2](Thomas)

---
type: intent
name: goodbye
utterances:
  - Goodbye [name](Eric)
"""
    parser, bundle = _fit(yaml_text, DeterministicIntentParser)
    slots_greeting1 = parser.get_slots("Hello John", bundle, "greeting1")
    slots_greeting2 = parser.get_slots("Hello Thomas", bundle, "greeting2")
    slots_goodbye = parser.get_slots("Goodbye Eric", bundle, "greeting1")
    assert len(slots_greeting1) == 1
    assert len(slots_greeting2) == 1
    assert slots_goodbye == []
    assert slots_greeting1[0]["value"] == "John"
    assert slots_greeting1[0]["entity"] == "name1"
    assert slots_greeting2[0]["value"] == "Thomas"
    assert slots_greeting2[0]["entity"] == "name2"
    # ref :581-597: None intent → no slots
    assert parser.get_slots("Hello John", bundle, None) == []


# ref: test_deterministic_intent_parser.py:721-742 — the parser must
# not raise on any naughty string (the reference ships the corpus)
def test_deterministic_survives_naughty_strings():
    yaml_text = """
---
type: intent
name: my_intent
utterances:
- this is [slot1:entity1](my first entity)
- this is [slot2:entity2](second_entity)
"""
    parser, bundle = _fit(yaml_text, DeterministicIntentParser)
    naughty = (Path("/root/reference/snips_nlu/tests/resources")
               / "naughty_strings.txt")
    if not naughty.exists():
        pytest.skip("reference naughty_strings.txt unavailable")
    for s in naughty.read_text("utf8").splitlines():
        parser.parse(s, bundle)


# ref: test_lookup_intent_parser.py:556-604 — the lookup parser's exact
# get_intents probabilities (ORDERED list, None intent 0.0 last) and
# per-intent get_slots, mirrored from the deterministic cases
def test_lookup_get_intents_reference_probabilities():
    yaml_text = """
---
type: intent
name: greeting1
utterances:
  - Hello John

---
type: intent
name: greeting2
utterances:
  - Hello [name](John)

---
type: intent
name: greeting3
utterances:
  - "[greeting](Hello) [name](John)"
"""
    parser, bundle = _fit(yaml_text, LookupIntentParser)
    top = parser.get_intents("Hello John", bundle)
    total = 1.0 + 1.0 / 2.0 + 1.0 / 3.0
    expected = [("greeting1", 1.0 / total),
                ("greeting2", (1.0 / 2.0) / total),
                ("greeting3", (1.0 / 3.0) / total),
                (None, 0.0)]
    got = [(r["intentName"], r["probability"]) for r in top]
    assert [g[0] for g in got] == [e[0] for e in expected]
    assert [g[1] for g in got] == pytest.approx([e[1] for e in expected])


# ref: test_lookup_intent_parser.py:606-660
def test_lookup_get_slots_per_intent():
    yaml_text = """
---
type: intent
name: greeting1
utterances:
  - Hello [name1](John)

---
type: intent
name: greeting2
utterances:
  - Hello [name2](Thomas)

---
type: intent
name: goodbye
utterances:
  - Goodbye [name](Eric)
"""
    parser, bundle = _fit(yaml_text, LookupIntentParser)
    s1 = parser.get_slots("Hello John", bundle, "greeting1")
    s2 = parser.get_slots("Hello Thomas", bundle, "greeting2")
    s3 = parser.get_slots("Goodbye Eric", bundle, "greeting1")
    assert [(s["value"], s["entity"]) for s in s1] == [("John", "name1")]
    assert [(s["value"], s["entity"]) for s in s2] == [("Thomas", "name2")]
    assert s3 == []
    assert parser.get_slots("Hello John", bundle, None) == []


# ref: test_deterministic_intent_parser.py:743-765 — fitting must
# survive the naughty-strings corpus used as tag-free utterances
def test_fit_with_naughty_strings_no_tags():
    naughty = (Path("/root/reference/snips_nlu/tests/resources")
               / "naughty_strings.txt")
    if not naughty.exists():
        pytest.skip("reference naughty_strings.txt unavailable")
    lines = [ln for ln in naughty.read_text("utf8").splitlines()
             if ln.strip()][:200]
    ds = {
        "language": "en",
        "intents": {"naughty_intent": {
            "utterances": [{"data": [{"text": ln}]} for ln in lines]}},
        "entities": {},
    }
    ds = validate_and_format_dataset(ds)
    for cls in (DeterministicIntentParser, LookupIntentParser):
        parser = cls().fit(ds, get_resources("en"))
        assert parser.fitted

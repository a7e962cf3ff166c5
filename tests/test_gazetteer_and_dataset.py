"""Gazetteer parser + dataset validation/compile + YAML loader."""

from snips_nlu_spark.dataset import (dataset_from_yaml,
                                     validate_and_format_dataset)
from snips_nlu_spark.dataset.yaml_loader import parse_utterance
from snips_nlu_spark.entities.gazetteer import GazetteerParser


def beverage_like_dataset():
    return {
        "language": "en",
        "intents": {
            "prepareBeverage": {
                "utterances": [
                    {"data": [
                        {"text": "make me "},
                        {"text": "two", "entity": "snips/number",
                         "slot_name": "number_of_cups"},
                        {"text": " cups of "},
                        {"text": "coffee", "entity": "beverage_type",
                         "slot_name": "beverage_type"},
                    ]},
                    {"data": [
                        {"text": "brew an "},
                        {"text": "espresso", "entity": "beverage_type",
                         "slot_name": "beverage_type"},
                        {"text": " please"},
                    ]},
                ]
            }
        },
        "entities": {
            "beverage_type": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "espresso",
                     "synonyms": ["expresso", "espressi"]},
                    {"value": "green tea", "synonyms": []},
                ],
            },
            "snips/number": {},
        },
    }


def test_validate_compiles_synonym_map():
    ds = validate_and_format_dataset(beverage_like_dataset())
    utt = ds["entities"]["beverage_type"]["utterances"]
    assert utt["espresso"] == "espresso"
    assert utt["expresso"] == "espresso"
    assert utt["espressi"] == "espresso"
    assert utt["green tea"] == "green tea"
    # value seen only inside an utterance is auto-added
    assert utt["coffee"] == "coffee"
    # builtin entity kept with seen values
    assert ds["entities"]["snips/number"]["utterances"] == ["two"]
    assert ds["validated"] is True


def test_validation_idempotent():
    ds = validate_and_format_dataset(beverage_like_dataset())
    assert validate_and_format_dataset(ds) is ds


def test_gazetteer_matches_synonyms_case_insensitive():
    ds = validate_and_format_dataset(beverage_like_dataset())
    gaz = GazetteerParser.build(
        {"beverage_type": ds["entities"]["beverage_type"]["utterances"]})
    ms = gaz.parse("An EXPRESSO and a green tea please")
    assert [(m["value"], m["resolved_value"]["value"]) for m in ms] == [
        ("EXPRESSO", "espresso"), ("green tea", "green tea")]
    # spans point into the original text
    assert ms[0]["start"] == 3 and ms[0]["end"] == 11


def test_gazetteer_longest_match_wins():
    gaz = GazetteerParser.build(
        {"drink": {"tea": "tea", "green tea": "green tea"}})
    ms = gaz.parse("a green tea now")
    values = [m["value"] for m in ms]
    assert "green tea" in values  # longest from position of "green"
    # "tea" alone also reported from its own start; scope-level dedup keeps
    # the longest later in the pipeline
    assert ms[0]["value"] == "green tea"


def test_gazetteer_roundtrip_dict():
    gaz = GazetteerParser.build({"e": {"a b": "a b", "c": "a b"}})
    d = gaz.to_dict()
    gaz2 = GazetteerParser.from_dict(d)
    assert [m["resolved_value"]["value"] for m in gaz2.parse("c")] == ["a b"]


def test_parse_utterance_chunks():
    parsed = parse_utterance(
        "turn the [room](kitchen) lights [state:on_off](on)")
    assert parsed["data"] == [
        {"text": "turn the "},
        {"text": "kitchen", "entity": "room", "slot_name": "room"},
        {"text": " lights "},
        {"text": "on", "entity": "on_off", "slot_name": "state"},
    ]


def test_yaml_dataset_loader():
    yaml_text = """
type: intent
name: setColor
slots:
  - name: color
    entity: color
utterances:
  - set the light to [color](blue)
  - make it [color](red) please

---
type: entity
name: color
values:
  - blue
  - value: red
    synonyms: [crimson]
"""
    ds = dataset_from_yaml(yaml_text)
    assert set(ds["intents"]) == {"setColor"}
    assert set(ds["entities"]) == {"color"}
    validated = validate_and_format_dataset(ds)
    utt = validated["entities"]["color"]["utterances"]
    assert utt["crimson"] == "red"

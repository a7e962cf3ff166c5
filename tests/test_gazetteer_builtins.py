"""Gazetteer builtin entities (snips/musicArtist etc.) — the reference
builds a gazetteer parser for these kinds next to the grammar kinds
(builtin_entity_parser.py:52-77); payload shape per its
test_builtin_entity_parser.py:42-65."""

import pytest

ANCHOR = None


def test_parser_level_music_artist():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="en",
                            gazetteer_entities=["snips/musicArtist"])
    out = p.parse("i want to listen to daft punk please",
                  scope=("snips/musicArtist",))
    assert out == [{
        "value": "daft punk", "start": 20, "end": 29,
        "entity_kind": "snips/musicArtist",
        "resolved_value": {"kind": "MusicArtist", "value": "Daft Punk"}}]
    # not in the default scope of a parser built WITHOUT the kind
    bare = BuiltinEntityParser(language="en")
    assert bare.parse("play daft punk") == []


def test_gazetteer_kind_requires_language_support():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    with pytest.raises(ValueError, match="not supported in language"):
        BuiltinEntityParser(language="fr",
                            gazetteer_entities=["snips/region"])


def test_register_extra_values():
    from snips_nlu_spark.entities.builtin import (
        BuiltinEntityParser, register_builtin_gazetteer_values)
    register_builtin_gazetteer_values("snips/musicArtist", "en",
                                      ["Totally Fake Band"])
    p = BuiltinEntityParser(language="en",
                            gazetteer_entities=["snips/musicArtist"])
    out = p.parse("play totally fake band now",
                  scope=("snips/musicArtist",))
    assert out[0]["resolved_value"] == {"kind": "MusicArtist",
                                        "value": "Totally Fake Band"}


def _music_dataset():
    return {
        "language": "en",
        "intents": {
            "playMusic": {
                "utterances": [
                    {"data": [
                        {"text": "play some "},
                        {"text": "daft punk", "entity": "snips/musicArtist",
                         "slot_name": "artist"},
                    ]},
                    {"data": [
                        {"text": "i want to listen to "},
                        {"text": "miles davis",
                         "entity": "snips/musicArtist",
                         "slot_name": "artist"},
                    ]},
                    {"data": [
                        {"text": "put on "},
                        {"text": "radiohead", "entity": "snips/musicArtist",
                         "slot_name": "artist"},
                        {"text": " please"},
                    ]},
                ]
            },
        },
        "entities": {"snips/musicArtist": {}},
    }


def test_engine_cascade_with_gazetteer_builtin():
    from snips_nlu_spark.engine import NluEngine
    eng = NluEngine().fit(_music_dataset())
    r = eng.parse("play some nina simone")
    assert r["intent"] == {"intentName": "playMusic", "probability": 1.0}
    assert r["slots"] == [{
        "range": {"start": 10, "end": 21}, "rawValue": "nina simone",
        "value": {"kind": "MusicArtist", "value": "Nina Simone"},
        "entity": "snips/musicArtist", "slotName": "artist"}]
    # bundle round-trip keeps the gazetteer scope
    reloaded = NluEngine.from_dict(eng.to_dict())
    r2 = reloaded.parse("play some nina simone")
    assert r2 == r
    # triples collapse the payload to the canonical string value
    from snips_nlu_spark.spark.stages import turn_to_triples
    rows = turn_to_triples(reloaded, "c1", 0, "play some nina simone",
                           None)
    assert rows[1][3:5] == ("artist", "Nina Simone")

"""BIO/BILOU codec round-trips — expectations per
/root/reference/snips_nlu/tests/test_crf_utils.py patterns."""

from snips_nlu_spark.tagging import (TaggingScheme, negative_tagging,
                                     positive_tagging, tags_to_slots,
                                     utterance_to_sample)
from snips_nlu_spark.textcore import tokenize


def test_positive_tagging_bio():
    assert positive_tagging(TaggingScheme.BIO, "slot", 3) == [
        "B-slot", "I-slot", "I-slot"]
    assert positive_tagging(TaggingScheme.BIO, "O", 2) == ["O", "O"]


def test_positive_tagging_bilou():
    assert positive_tagging(TaggingScheme.BILOU, "s", 1) == ["U-s"]
    assert positive_tagging(TaggingScheme.BILOU, "s", 3) == [
        "B-s", "I-s", "L-s"]


def test_positive_tagging_io():
    assert positive_tagging(TaggingScheme.IO, "s", 2) == ["I-s", "I-s"]


def test_encode_decode_roundtrip_bio():
    chunks = [
        {"text": "make me "},
        {"text": "two", "entity": "snips/number",
         "slot_name": "number_of_cups"},
        {"text": " cups of "},
        {"text": "strong latte", "entity": "beverage_type",
         "slot_name": "beverage_type"},
    ]
    sample = utterance_to_sample(chunks, TaggingScheme.BIO)
    text = "make me two cups of strong latte"
    assert [t.value for t in sample["tokens"]] == [
        "make", "me", "two", "cups", "of", "strong", "latte"]
    assert sample["tags"] == ["O", "O", "B-number_of_cups", "O", "O",
                              "B-beverage_type", "I-beverage_type"]
    slots = tags_to_slots(
        text, tokenize(text), sample["tags"], TaggingScheme.BIO,
        {"number_of_cups": "snips/number", "beverage_type": "beverage_type"})
    assert slots == [
        {"start": 8, "end": 11, "value": "two", "entity": "snips/number",
         "slot_name": "number_of_cups"},
        {"start": 20, "end": 32, "value": "strong latte",
         "entity": "beverage_type", "slot_name": "beverage_type"},
    ]


def test_decode_adjacent_bio_slots():
    text = "red green"
    tokens = tokenize(text)
    tags = ["B-c1", "B-c2"]
    slots = tags_to_slots(text, tokens, tags, TaggingScheme.BIO,
                          {"c1": "color", "c2": "color"})
    assert [(s["value"], s["slot_name"]) for s in slots] == [
        ("red", "c1"), ("green", "c2")]


def test_decode_io():
    text = "turn on the light"
    tokens = tokenize(text)
    tags = ["O", "O", "O", "I-thing"]
    slots = tags_to_slots(text, tokens, tags, TaggingScheme.IO,
                          {"thing": "device"})
    assert slots[0]["value"] == "light"


def test_negative_tagging():
    assert negative_tagging(3) == ["O", "O", "O"]

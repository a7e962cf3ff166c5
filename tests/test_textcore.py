"""Golden tests for the text core — expectations mirror the reference's
test strategy (tokenizer spans, overlap dedup, placeholder remapping), cf.
/root/reference/snips_nlu/tests/test_preprocessing.py."""

from snips_nlu_spark.textcore import (
    Token, deduplicate_overlapping_mentions, entity_name_placeholder,
    get_all_ngrams, get_shape, get_word_chunk, normalize, ranges_overlap,
    regex_escape, replace_entities_with_placeholders, tokenize,
    tokenize_light, initial_string_from_tokens)


def test_tokenize_spans():
    text = "Make me two cups of coffee!"
    tokens = tokenize(text)
    assert tokens[0] == Token("Make", 0, 4)
    assert tokens[2] == Token("two", 8, 11)
    assert tokens[-1] == Token("!", 26, 27)
    for t in tokens:
        assert text[t.start:t.end] == t.value


def test_tokenize_punctuation_and_apostrophe():
    # separator punctuation ("." "," quotes) is tokenized out — the
    # reference's deterministic goldens require it to vanish from the
    # cleaned text (test_deterministic_intent_parser.py:385-437) — while
    # "'" stays a token (this repo's clock/elision grammar consumes it)
    assert tokenize_light("I'd like tea.") == ["I", "'", "d", "like", "tea"]
    # symbols are real tokens (ref: test_preprocessing.py:50-66)
    assert tokenize_light("$$ % !!") == ["$", "$", "%", "!", "!"]
    assert tokenize_light("this, is,, a, test") == ["this", "is", "a",
                                                    "test"]


def test_tokenize_empty_and_whitespace():
    assert list(tokenize("")) == []
    assert list(tokenize("   ")) == []


def test_normalize_folds_case_and_diacritics():
    assert normalize("Café CRÈME") == "cafe creme"


def test_shape_classes():
    assert get_shape("hello") == "xxx"
    assert get_shape("HELLO") == "XXX"
    assert get_shape("Hello") == "Xxx"
    assert get_shape("hEllo") == "xX"


def test_word_chunks():
    assert get_word_chunk("hello", 3, 0) == "hel"
    assert get_word_chunk("hello", 3, 5, reverse=True) == "llo"
    assert get_word_chunk("hi", 3, 0) is None


def test_ngrams():
    grams = get_all_ngrams(["a", "b", "c"])
    assert {g["ngram"] for g in grams} == {"a", "b", "c", "a b", "b c",
                                           "a b c"}


def test_ranges_overlap():
    assert ranges_overlap((0, 5), (4, 8))
    assert not ranges_overlap((0, 5), (5, 8))


def test_overlap_dedup_keeps_longest():
    mentions = [
        {"value": "new york", "start": 10, "end": 18, "entity_kind": "city"},
        {"value": "york", "start": 14, "end": 18, "entity_kind": "city"},
        {"value": "tea", "start": 0, "end": 3, "entity_kind": "drink"},
    ]
    kept = deduplicate_overlapping_mentions(mentions)
    assert [m["value"] for m in kept] == ["tea", "new york"]


def test_placeholder_substitution_range_mapping():
    text = "set the lights to blue in the kitchen"
    mentions = [
        {"value": "blue", "start": 18, "end": 22, "entity_kind": "color"},
        {"value": "kitchen", "start": 30, "end": 37, "entity_kind": "room"},
    ]
    mapping, processed = replace_entities_with_placeholders(
        text, mentions, entity_name_placeholder)
    assert processed == "set the lights to %COLOR% in the %ROOM%"
    # placeholder-space ranges map back to original spans
    assert mapping[(18, 25)] == {"start": 18, "end": 22}
    assert mapping[(33, 39)] == {"start": 30, "end": 37}


def test_regex_escape():
    assert regex_escape("a.b*c") == r"a\.b\*c"
    assert regex_escape("2+2=4") == r"2\+2=4"


def test_initial_string_from_tokens():
    text = "hello   big world"
    assert initial_string_from_tokens(tokenize(text)) == text

"""Property-based tests (hypothesis) — extends the reference's golden-test
strategy (SURVEY.md §5) with invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from snips_nlu_spark.entities.numbers import (number_to_words,
                                              words_to_number)
from snips_nlu_spark.tagging import (TaggingScheme, tags_to_preslots,
                                     utterance_to_sample)
from snips_nlu_spark.textcore import (deduplicate_overlapping_mentions,
                                      entity_name_placeholder,
                                      normalize,
                                      replace_entities_with_placeholders,
                                      tokenize)

texts = st.text(
    alphabet=string.ascii_letters + string.digits + " .,'!?-éàü%$",
    max_size=120)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_token_spans_always_index_back(text):
    for t in tokenize(text):
        assert text[t.start:t.end] == t.value
        assert t.start < t.end


@given(texts)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(text):
    assert normalize(normalize(text)) == normalize(text)


@given(st.integers(min_value=0, max_value=9999))
@settings(max_examples=300, deadline=None)
def test_number_words_roundtrip(n):
    assert words_to_number(number_to_words(n)) == n


@given(st.lists(st.tuples(st.integers(0, 80), st.integers(1, 10)),
                max_size=8))
@settings(max_examples=200, deadline=None)
def test_overlap_dedup_produces_disjoint_sorted_spans(raw):
    mentions = [{"value": "x" * ln, "start": s, "end": s + ln,
                 "entity_kind": "e"} for s, ln in raw]
    kept = deduplicate_overlapping_mentions(mentions)
    for a, b in zip(kept, kept[1:]):
        assert a["end"] <= b["start"]


@given(st.lists(st.sampled_from(["red", "blue", "kitchen", "lounge"]),
                min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_placeholder_range_mapping_inverts(values):
    # build non-overlapping mentions over a constructed text
    parts, mentions, cursor = [], [], 0
    for i, v in enumerate(values):
        lit = f" part{i} "
        parts.append(lit)
        cursor += len(lit)
        parts.append(v)
        mentions.append({"value": v, "start": cursor,
                         "end": cursor + len(v), "entity_kind": "room"})
        cursor += len(v)
    text = "".join(parts)
    mapping, processed = replace_entities_with_placeholders(
        text, mentions, entity_name_placeholder)
    assert processed.count("%ROOM%") == len(values)
    for (ns, ne), orig in mapping.items():
        assert processed[ns:ne] == "%ROOM%"
        assert text[orig["start"]:orig["end"]] in values


@given(st.lists(
    st.tuples(st.sampled_from(["lorem ipsum", "foo", "bar baz qux"]),
              st.booleans()),
    min_size=1, max_size=5),
    st.sampled_from([TaggingScheme.IO, TaggingScheme.BIO,
                     TaggingScheme.BILOU]))
@settings(max_examples=150, deadline=None)
def test_tagging_encode_decode_recovers_slot_chunks(chunks_spec, scheme):
    chunks = []
    n_slots = 0
    for i, (text, is_slot) in enumerate(chunks_spec):
        chunk = {"text": text + " "}
        if is_slot:
            chunk["entity"] = "e"
            chunk["slot_name"] = f"s{i}"  # unique names avoid BIO merging
            n_slots += 1
        chunks.append(chunk)
    sample = utterance_to_sample(chunks, scheme)
    slots = tags_to_preslots(sample["tokens"], sample["tags"], scheme)
    if scheme != TaggingScheme.IO:
        assert len(slots) == n_slots
    # decoded char ranges must cover exactly the slot chunk tokens
    text = "".join(c["text"] for c in chunks)
    for s in slots:
        assert 0 <= s["start"] < s["end"] <= len(text)


# --- round 4: datetime trigger-gate soundness ------------------------------

_DT_WORDS = ["monday", "friday", "june", "tomorrow", "today", "evening",
             "noon", "next", "every", "christmas", "halloween",
             "beginning", "end", "middle", "of", "the", "at", "in",
             "week", "month", "year", "weeks", "days", "tonight",
             "between", "from", "to", "and", "this"]
_NOISE_WORDS = ["report", "generated", "service", "req99x", "standing",
                "acknowledged", "device", "backend", "xylophone"]
_NUMBERISH = ["3", "8pm", "8", "30", "2024", "three", "twenty", "8:30",
              "10p.m.", "1st"]

_dt_texts = st.lists(
    st.sampled_from(_DT_WORDS + _NOISE_WORDS + _NUMBERISH),
    min_size=0, max_size=10).map(" ".join)


@given(_dt_texts)
@settings(max_examples=300, deadline=None)
def test_datetime_trigger_gate_never_changes_results(text):
    """The gate (builtin._scan_dt) may only SKIP texts that the full
    grammar walk would find nothing in — gated and ungated scans must be
    identical for every composition of trigger words, numbers, clock
    forms and noise."""
    import datetime as dt

    from snips_nlu_spark.entities import builtin as B

    p = test_datetime_trigger_gate_never_changes_results._parser
    anchor = dt.datetime(2024, 3, 14)
    gated = p.parse(text, scope=["snips/datetime"], anchor=anchor)
    tokens, cands = p._prep_memo(text)
    ungated = list(B._scan_datetime(text, tokens, list(cands), anchor,
                                    p.language)) if tokens else []
    # the scoped parse sorts mentions by span; the raw scanner emits
    # pass-1 before pass-2 — compare order-insensitively
    key = lambda m: (m["start"], m["end"])  # noqa: E731
    assert sorted(gated, key=key) == sorted(ungated, key=key), text


def _make_parser():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    return BuiltinEntityParser()


test_datetime_trigger_gate_never_changes_results._parser = _make_parser()

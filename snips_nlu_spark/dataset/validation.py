"""Dataset validation + gazetteer compilation.

Semantics follow /root/reference/snips_nlu/dataset/validation.py:27-78
(top-level), :81-100 (intents), :128-249 (custom-entity compile to a
raw→canonical utterances map, incl. synonyms and string variations),
:252-254 (builtin entities). Driver-side only — training datasets are KBs.
"""

from __future__ import annotations

from collections import Counter

from ..entities.builtin import is_builtin_entity
from ..textcore import tokenize_light
from .variations import get_string_variations

NUMBER_VARIATIONS_THRESHOLD = 1e3   # ref: validation.py:23
VARIATIONS_GENERATION_THRESHOLD = 1e4  # ref: validation.py:24


class DatasetFormatError(ValueError):
    pass


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise DatasetFormatError(msg)


def validate_and_format_dataset(dataset: dict) -> dict:
    """Validate and compile a ``{language, intents, entities}`` dataset.

    Returns a new dict with ``validated=True`` where every custom entity
    carries a compiled ``utterances`` map raw_value → canonical_value.
    Idempotent (ref: validation.py:38-40).
    """
    if dataset.get("validated"):
        return dataset
    _require(isinstance(dataset, dict), "dataset must be a dict")
    for key in ("intents", "entities", "language"):
        _require(key in dataset, f"missing dataset key: {key}")
    _require(dataset["language"] in ("en", "fr", "es", "de", "it", "pt", "ja", "ko"),
             f"unsupported language {dataset['language']!r}")

    intents = {}
    for name in sorted(dataset["intents"]):
        intents[name] = _validate_intent(dataset["intents"][name],
                                         dataset["entities"])

    # collect entity values seen inside utterances (ref: dataset/utils.py
    # extract_utterance_entities)
    utterance_entities: dict[str, set] = {}
    for intent in intents.values():
        for utt in intent["utterances"]:
            for chunk in utt["data"]:
                if chunk.get("entity"):
                    utterance_entities.setdefault(
                        chunk["entity"], set()).add(chunk["text"])

    entities = {}
    for name in sorted(dataset["entities"]):
        entity = dataset["entities"][name]
        seen = utterance_entities.get(name, set())
        if is_builtin_entity(name):
            entities[name] = {"utterances": sorted(seen)}
        else:
            entities[name] = _compile_custom_entity(entity, seen)

    return {
        "language": dataset["language"],
        "intents": intents,
        "entities": entities,
        "validated": True,
    }


def _validate_intent(intent: dict, entities: dict) -> dict:
    _require(isinstance(intent, dict), "intent must be a dict")
    _require("utterances" in intent, "intent missing 'utterances'")
    utterances = []
    for utt in intent["utterances"]:
        _require(isinstance(utt, dict) and "data" in utt,
                 "utterance must be a dict with 'data'")
        chunks = []
        for chunk in utt["data"]:
            _require("text" in chunk, "chunk missing 'text'")
            if "entity" in chunk or "slot_name" in chunk:
                _require("entity" in chunk and "slot_name" in chunk,
                         "slot chunk needs both entity and slot_name")
                if not is_builtin_entity(chunk["entity"]):
                    _require(chunk["entity"] in entities,
                             f"unknown entity {chunk['entity']!r}")
                chunks.append({"text": chunk["text"],
                               "entity": chunk["entity"],
                               "slot_name": chunk["slot_name"]})
            else:
                chunks.append({"text": chunk["text"]})
        utterances.append({"data": chunks})
    return {"utterances": utterances}


def _has_any_capitalization(values: set[str]) -> bool:
    """ref: validation.py:105-110"""
    for v in values:
        if any(t.isupper() or t.istitle() for t in tokenize_light(v)):
            return True
    return False


def _compile_custom_entity(entity: dict, utterance_values: set[str]) -> dict:
    """Compile raw→canonical utterances map with synonyms + non-colliding
    string variations (ref: validation.py:128-249)."""
    strictness = entity.get("matching_strictness",
                            entity.get("parser_threshold", 1.0))
    for key in ("use_synonyms", "automatically_extensible", "data"):
        _require(key in entity, f"custom entity missing {key!r}")
    use_synonyms = bool(entity["use_synonyms"])

    data = []
    for entry in entity["data"]:
        value = entry["value"].strip()
        if not value:
            continue
        synonyms = [s.strip() for s in entry.get("synonyms", []) if s.strip()]
        data.append({"value": value, "synonyms": synonyms})

    capitalize = _has_any_capitalization(utterance_values)

    utterances: dict[str, str] = {}
    for entry in data:
        utterances[entry["value"]] = entry["value"]
        if use_synonyms:
            for s in entry["synonyms"]:
                utterances.setdefault(s, entry["value"])

    # variation expansion with throttles (ref: validation.py:185-205)
    n_values = len(data)
    gen_variations = n_values < VARIATIONS_GENERATION_THRESHOLD
    variation_args = {
        "case": gen_variations, "and_": gen_variations,
        "punctuation": gen_variations,
        "numbers": n_values < NUMBER_VARIATIONS_THRESHOLD,
    }

    all_original = set()
    for entry in data:
        all_original.add(entry["value"])
        if use_synonyms:
            all_original.update(entry["synonyms"])

    variations: dict[str, set[str]] = {}
    for entry in data:
        sources = {entry["value"]}
        if use_synonyms:
            sources.update(entry["synonyms"])
        variations[entry["value"]] = {
            v for src in sources
            for v in get_string_variations(src, **variation_args)
        }
    counts = Counter(v for vs in variations.values() for v in vs)
    for value, vs in variations.items():
        for v in sorted(vs):
            if v and v not in all_original and counts[v] == 1:
                utterances.setdefault(v, value)

    # merge entity values seen in utterances (ref: validation.py:234-247)
    for seen in sorted(utterance_values):
        if not seen or seen in utterances:
            continue
        utterances[seen] = seen
        for v in sorted(get_string_variations(seen, **variation_args)):
            if v and v not in utterances and v not in utterance_values:
                utterances[v] = seen

    return {
        "automatically_extensible": bool(entity["automatically_extensible"]),
        "matching_strictness": float(strictness),
        "capitalize": capitalize,
        "utterances": utterances,
    }

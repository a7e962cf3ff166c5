"""Shared fit-time helpers for the deterministic/lookup parsers."""

from __future__ import annotations

from ..entities.builtin import is_builtin_entity
from ..textcore import normalize, tokenize_light


def extract_intent_entities(dataset: dict) -> dict[str, set[str]]:
    """intent → set of entity names used by its slots
    (ref: dataset/utils.py:21-30)."""
    out: dict[str, set[str]] = {intent: set() for intent in dataset["intents"]}
    for intent_name, intent in dataset["intents"].items():
        for utt in intent["utterances"]:
            for chunk in utt["data"]:
                if chunk.get("entity"):
                    out[intent_name].add(chunk["entity"])
    return out


def get_entity_scopes(dataset: dict) -> list[dict]:
    """Group intents sharing the same (builtin, custom) entity scope
    (ref: lookup_intent_parser.py:464-486)."""
    intent_entities = extract_intent_entities(dataset)
    groups: list[dict] = []
    for intent in sorted(intent_entities):
        entities = intent_entities[intent]
        scope = {
            "builtin": sorted(e for e in entities if is_builtin_entity(e)),
            "custom": sorted(e for e in entities if not is_builtin_entity(e)),
        }
        for g in groups:
            if g["entity_scope"] == scope:
                g["intent_group"].append(intent)
                break
        else:
            groups.append({"intent_group": [intent], "entity_scope": scope})
    return groups


def get_stop_words_whitelist(dataset: dict,
                             stop_words: set[str]) -> dict[str, set[str]]:
    """Per-intent whitelist: stop words that are (normalized) entity values
    of that intent's entities — those must never be stripped
    (ref: dataset/utils.py:58-68)."""
    intent_entities = extract_intent_entities(dataset)
    whitelist: dict[str, set[str]] = {}
    for intent, entities in intent_entities.items():
        values: set[str] = set()
        for entity in entities:
            ent = dataset["entities"].get(entity)
            if ent is None:
                continue
            utterances = ent.get("utterances")
            if isinstance(utterances, dict):
                values.update(normalize(v) for v in utterances)
            elif isinstance(utterances, (list, set)):
                values.update(normalize(v) for v in utterances)
        hits = stop_words & values
        if hits:
            whitelist[intent] = hits
    return whitelist


def preprocess_text(text: str, stop_words: set[str]) -> str:
    """Tokenize, drop stop words, lowercase, space-join — the canonical key
    normalization for lookup keys and candidate strings
    (ref: lookup_intent_parser.py:339-346)."""
    tokens = tokenize_light(text)
    return " ".join(t for t in tokens
                    if normalize(t) not in stop_words).lower()


def get_slot_name_mappings(dataset: dict) -> dict[str, dict[str, str]]:
    """intent → {slot_name: entity} (ref: dataset/utils.py via
    nlu_engine.py:453-467)."""
    out: dict[str, dict[str, str]] = {}
    for intent_name, intent in dataset["intents"].items():
        mapping: dict[str, str] = {}
        for utt in intent["utterances"]:
            for chunk in utt["data"]:
                if chunk.get("slot_name"):
                    mapping[chunk["slot_name"]] = chunk["entity"]
        out[intent_name] = mapping
    return out

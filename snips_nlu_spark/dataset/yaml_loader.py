"""YAML dataset loader.

Accepts the reference's YAML dataset format (multi-document: intent docs +
entity docs, utterances with ``[slot_name:entity](text)`` chunk syntax) —
see /root/reference/snips_nlu/dataset/dataset.py:33-177 and
dataset/intent.py. Driver-side only; output feeds
``validate_and_format_dataset``.
"""

from __future__ import annotations

import re
from pathlib import Path

try:
    import yaml
    _HAS_YAML = True
except ImportError:  # pragma: no cover
    _HAS_YAML = False

_CHUNK_RE = re.compile(r"\[(?P<slot>[^\]:]+)(?::(?P<entity>[^\]]+))?\]"
                       r"\((?P<text>[^)]*)\)")


def parse_utterance(utterance: str) -> dict:
    """``"turn the [room](kitchen) lights on"`` → chunk list."""
    chunks = []
    cursor = 0
    for m in _CHUNK_RE.finditer(utterance):
        if m.start() > cursor:
            chunks.append({"text": utterance[cursor:m.start()]})
        slot = m.group("slot").strip()
        entity = (m.group("entity") or slot).strip()
        chunks.append({"text": m.group("text"), "entity": entity,
                       "slot_name": slot})
        cursor = m.end()
    if cursor < len(utterance):
        chunks.append({"text": utterance[cursor:]})
    return {"data": chunks}


def _load_entity_doc(doc: dict) -> tuple[str, dict]:
    data = []
    for value in doc.get("values", []):
        if isinstance(value, dict):
            data.append({"value": str(value["value"]),
                         "synonyms": [str(s) for s in
                                      value.get("synonyms", [])]})
        elif isinstance(value, (list, tuple)):
            # inline-list form "[canonical, syn1, syn2]" (ref:
            # dataset/entity.py:136-142 — first element is the value,
            # the rest are its synonyms)
            if not value:
                continue
            data.append({"value": str(value[0]),
                         "synonyms": [str(s) for s in value[1:]]})
        else:
            data.append({"value": str(value), "synonyms": []})
    return doc["name"], {
        "use_synonyms": bool(doc.get("use_synonyms", True)),
        "automatically_extensible": bool(
            doc.get("automatically_extensible", True)),
        "matching_strictness": float(doc.get("matching_strictness", 1.0)),
        "data": data,
    }


def _load_intent_doc(doc: dict) -> tuple[str, dict, dict[str, str]]:
    slot_entities = {s["name"]: s.get("entity", s["name"])
                     for s in doc.get("slots", [])}
    utterances = []
    for utt in doc.get("utterances", []):
        parsed = parse_utterance(str(utt))
        for chunk in parsed["data"]:
            if "slot_name" in chunk and chunk["slot_name"] in slot_entities \
                    and chunk["entity"] == chunk["slot_name"]:
                chunk["entity"] = slot_entities[chunk["slot_name"]]
        utterances.append(parsed)
    return doc["name"], {"utterances": utterances}, slot_entities


def dataset_from_yaml(source: str | Path, language: str = "en") -> dict:
    """Load a dataset from a YAML string or file path; returns the raw
    (unvalidated) dataset dict ``{language, intents, entities}``."""
    if not _HAS_YAML:
        raise RuntimeError("PyYAML is not available")
    if isinstance(source, Path) or (isinstance(source, str)
                                    and "\n" not in source
                                    and Path(source).exists()):
        text = Path(source).read_text(encoding="utf8")
    else:
        text = str(source)

    intents: dict = {}
    entities: dict = {}
    implicit_entities: set[str] = set()
    for doc in yaml.safe_load_all(text):
        if doc is None:
            continue
        dtype = doc.get("type", "intent")
        if dtype == "entity":
            name, entity = _load_entity_doc(doc)
            entities[name] = entity
        elif dtype == "intent":
            name, intent, slot_entities = _load_intent_doc(doc)
            intents[name] = intent
            implicit_entities.update(slot_entities.values())
            for utt in intent["utterances"]:
                for chunk in utt["data"]:
                    if chunk.get("entity"):
                        implicit_entities.add(chunk["entity"])
        else:
            raise ValueError(f"unknown YAML doc type: {dtype!r}")

    # auto-declare custom entities referenced by intents but not defined
    from ..entities.builtin import is_builtin_entity
    for entity in sorted(implicit_entities):
        if entity not in entities:
            if is_builtin_entity(entity):
                entities[entity] = {}
            else:
                entities[entity] = {
                    "use_synonyms": True,
                    "automatically_extensible": True,
                    "matching_strictness": 1.0,
                    "data": [],
                }
    return {"language": language, "intents": intents, "entities": entities}

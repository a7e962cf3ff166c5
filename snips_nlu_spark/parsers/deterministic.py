"""Deterministic regex intent parser.

Semantics per /root/reference/snips_nlu/intent_parser/
deterministic_intent_parser.py: fit :133-168 (utterance → anchored
IGNORECASE regex with named slot groups, ambiguous cross-intent patterns
dropped, max_queries/max_pattern_length caps), parse :174-262 (two candidate
strings per intent — stop-word-blanked original and placeholder-substituted
— first matching regex wins per intent, 1/(1+n_slots) ambiguity weighting,
proba ≤ 0.5 → None), slot extraction + range shift :332-365, :474-484.
"""

from __future__ import annotations

import re

from ..entities.builtin import is_builtin_entity
from ..registry import register_intent_parser
from ..result import (empty_result, extraction_result,
                      intent_classification_result, parsing_result,
                      unresolved_slot)
from ..textcore import (Token, deduplicate_overlapping_items,
                        entity_name_placeholder, normalize, ranges_overlap,
                        regex_escape, replace_entities_with_placeholders,
                        tokenize, tokenize_light)
from .common import get_slot_name_mappings, get_stop_words_whitelist

WHITESPACE_PATTERN = r"\s*"  # ref: deterministic_intent_parser.py:35
MAX_QUERIES = 100            # ref: pipeline/configs/intent_parser.py:74-78
MAX_PATTERN_LENGTH = 1000


@register_intent_parser("deterministic_intent_parser")
class DeterministicIntentParser:

    def __init__(self, ignore_stop_words: bool = True,
                 max_queries: int = MAX_QUERIES,
                 max_pattern_length: int = MAX_PATTERN_LENGTH) -> None:
        self.ignore_stop_words = ignore_stop_words
        self.max_queries = max_queries
        self.max_pattern_length = max_pattern_length
        self._stop_words: set[str] = set()
        self._stop_words_whitelist: dict[str, set[str]] = {}
        self.patterns: dict[str, list[str]] = {}
        self._regexes: dict[str, list[re.Pattern]] = {}
        self.group_names_to_slot_names: dict[str, str] = {}
        self.slot_names_to_entities: dict[str, dict[str, str]] = {}
        self.entity_scopes: dict[str, dict[str, list[str]]] = {}
        from functools import lru_cache
        self._preprocess_memo = lru_cache(maxsize=4096)(
            self._preprocess_text_impl)

    @property
    def fitted(self) -> bool:
        return bool(self.patterns)

    # ------------------------------------------------------------------ fit
    def fit(self, dataset: dict, resources: dict, entity_bundle=None,
            random_seed: int = 42) -> "DeterministicIntentParser":
        self._stop_words = set(resources["stop_words"]) \
            if self.ignore_stop_words else set()
        self._stop_words_whitelist = get_stop_words_whitelist(
            dataset, self._stop_words)
        self.slot_names_to_entities = get_slot_name_mappings(dataset)
        self.entity_scopes = {
            intent: {
                "builtin": sorted({e for e in mapping.values()
                                   if is_builtin_entity(e)}),
                "custom": sorted({e for e in mapping.values()
                                  if not is_builtin_entity(e)}),
            }
            for intent, mapping in self.slot_names_to_entities.items()}
        all_slots = sorted({s for mapping in
                            self.slot_names_to_entities.values()
                            for s in mapping})
        self.group_names_to_slot_names = {
            f"group{i}": s for i, s in enumerate(all_slots)}
        slot_to_group = {s: g for g, s in
                         self.group_names_to_slot_names.items()}
        placeholders = {e: entity_name_placeholder(e)
                        for e in dataset["entities"]}

        all_patterns: set[str] = set()
        ambiguous: set[str] = set()
        per_intent: dict[str, list[str]] = {}
        for intent_name in sorted(dataset["intents"]):
            stop_words = self._intent_stop_words(intent_name)
            patterns: list[str] = []
            seen: set[str] = set()
            for utt in dataset["intents"][intent_name]["utterances"]:
                p = self._utterance_to_pattern(utt, stop_words, placeholders,
                                               slot_to_group)
                if p not in seen and len(p) < self.max_pattern_length:
                    seen.add(p)
                    patterns.append(p)
            ambiguous |= {p for p in patterns if p in all_patterns}
            all_patterns |= set(patterns)
            per_intent[intent_name] = patterns

        for intent_name, patterns in per_intent.items():
            kept = [p for p in patterns if p not in ambiguous]
            kept = kept[:self.max_queries]
            self.patterns[intent_name] = kept
        self._compile()
        return self

    def _compile(self) -> None:
        self._regexes = {
            intent: [re.compile(p, re.IGNORECASE) for p in patterns]
            for intent, patterns in self.patterns.items()}

    def _utterance_to_pattern(self, utterance, stop_words, placeholders,
                              slot_to_group) -> str:
        """ref: deterministic_intent_parser.py:381-404 — numbered group
        names for repeated slots (group3, group3_2, ...)."""
        slot_counts: dict[str, int] = {}
        parts: list[str] = []
        for chunk in utterance["data"]:
            if chunk.get("slot_name"):
                slot_name = chunk["slot_name"]
                slot_counts[slot_name] = slot_counts.get(slot_name, 0) + 1
                group = slot_to_group[slot_name]
                if slot_counts[slot_name] > 1:
                    group = f"{group}_{slot_counts[slot_name]}"
                parts.append(
                    f"(?P<{group}>{placeholders[chunk['entity']]})")
            else:
                parts += [regex_escape(t.lower())
                          for t in tokenize_light(chunk["text"])
                          if normalize(t) not in stop_words]
        body = WHITESPACE_PATTERN.join(parts)
        return f"^{WHITESPACE_PATTERN}{body}{WHITESPACE_PATTERN}$"

    def _intent_stop_words(self, intent: str) -> set[str]:
        return self._stop_words - self._stop_words_whitelist.get(intent,
                                                                 set())

    def _preprocess_text(self, string: str, intent: str) -> str:
        # keyed by stop-word whitelist group: intents without distinct
        # whitelists share one preprocessed string
        group = frozenset(self._stop_words_whitelist.get(intent, ()))
        return self._preprocess_memo(string, group)

    def _preprocess_text_impl(self, string: str, group: frozenset) -> str:
        """Blank out stop words, preserving char positions
        (ref: deterministic_intent_parser.py:311-329)."""
        stop_words = self._stop_words - group
        out = []
        cursor = 0
        for t in tokenize(string):
            value = t.value
            if stop_words and normalize(value) in stop_words:
                value = " " * len(value)
            out.append(" " * (t.start - cursor))
            out.append(value)
            cursor = t.end
        out.append(" " * (len(string) - cursor))
        return "".join(out)

    # ---------------------------------------------------------------- parse
    def parse(self, text, entity_bundle, intents=None, top_n=None,
              anchor=None):
        if isinstance(intents, str):
            intents = {intents}
        elif intents is not None:
            intents = set(intents)
        top = self._parse_top_intents(text, entity_bundle,
                                      top_n=top_n or 1, intents=intents,
                                      anchor=anchor)
        if top_n is None:
            if top:
                res = top[0]
                if res["intent"]["probability"] > 0.5:
                    return parsing_result(text, res["intent"], res["slots"])
            return empty_result(text, probability=1.0)
        return top

    def _parse_top_intents(self, text, entity_bundle, top_n, intents=None,
                           anchor=None):
        results = []
        for intent, scope in self.entity_scopes.items():
            if intents is not None and intent not in intents:
                continue
            mentions = []
            if scope["builtin"]:
                mentions += entity_bundle.parse_builtin(text,
                                                        scope["builtin"],
                                                        anchor)
            if scope["custom"]:
                mentions += entity_bundle.parse_custom(text, scope["custom"])
            mapping, processed_text = replace_entities_with_placeholders(
                text, mentions, entity_name_placeholder)
            cleaned = self._preprocess_text(text, intent)
            cleaned_processed = self._preprocess_text(processed_text, intent)
            for regex in self._regexes.get(intent, []):
                res = self._match(text, cleaned, regex, intent, None)
                if res is None and cleaned != cleaned_processed:
                    res = self._match(text, cleaned_processed, regex, intent,
                                      mapping)
                if res is not None:
                    results.append(res)
                    break
        weights = [1.0 / (1.0 + len(r["slots"])) for r in results]
        total = sum(weights)
        for res, w in zip(results, weights):
            res["intent"]["probability"] = w / total
        results.sort(key=lambda r: -r["intent"]["probability"])
        return results[:top_n]

    def _match(self, text, processed_text, regex, intent, mapping):
        found = regex.match(processed_text)
        if found is None:
            return None
        slots = []
        for group_name, _ in sorted(found.groupdict().items()):
            ref_group = group_name.split("_")[0]
            slot_name = self.group_names_to_slot_names[ref_group]
            entity = self.slot_names_to_entities[intent][slot_name]
            rng = (found.start(group_name), found.end(group_name))
            if mapping is not None:
                if rng in mapping:
                    rng = (mapping[rng]["start"], mapping[rng]["end"])
                else:
                    shift = _range_shift(rng, mapping)
                    rng = (rng[0] + shift, rng[1] + shift)
            value = text[rng[0]:rng[1]]
            slots.append(unresolved_slot(rng[0], rng[1], value, entity,
                                         slot_name))
        slots = _dedup_overlapping_slots(slots)
        return extraction_result(
            intent_classification_result(intent, 1.0), slots)

    # ---------------------------------------------------------- n-best API
    def get_intents(self, text, entity_bundle, anchor=None):
        n = len(self.patterns)
        top = [r["intent"] for r in self._parse_top_intents(
            text, entity_bundle, top_n=n, anchor=anchor)]
        matched = {r["intentName"] for r in top}
        for intent in self.patterns:
            if intent not in matched:
                top.append(intent_classification_result(intent, 0.0))
        top.append(intent_classification_result(None, 0.0))
        return top

    def get_slots(self, text, entity_bundle, intent, anchor=None):
        if intent is None:
            return []
        if intent not in self.patterns:
            raise ValueError(f"unknown intent {intent!r}")
        return self.parse(text, entity_bundle, intents=[intent],
                          anchor=anchor)["slots"]

    # ------------------------------------------------------------- persist
    def to_dict(self) -> dict:
        return {
            "unit_name": self.unit_name,
            "ignore_stop_words": self.ignore_stop_words,
            "max_queries": self.max_queries,
            "max_pattern_length": self.max_pattern_length,
            "stop_words": sorted(self._stop_words),
            "stop_words_whitelist": {k: sorted(v) for k, v in
                                     self._stop_words_whitelist.items()},
            "patterns": self.patterns,
            "group_names_to_slot_names": self.group_names_to_slot_names,
            "slot_names_to_entities": self.slot_names_to_entities,
            "entity_scopes": self.entity_scopes,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "DeterministicIntentParser":
        parser = cls(ignore_stop_words=d["ignore_stop_words"],
                     max_queries=d["max_queries"],
                     max_pattern_length=d["max_pattern_length"])
        parser._stop_words = set(d["stop_words"])
        parser._stop_words_whitelist = {
            k: set(v) for k, v in d["stop_words_whitelist"].items()}
        parser.patterns = d["patterns"]
        parser.group_names_to_slot_names = d["group_names_to_slot_names"]
        parser.slot_names_to_entities = d["slot_names_to_entities"]
        parser.entity_scopes = d["entity_scopes"]
        parser._compile()
        return parser


def _range_shift(rng, mapping) -> int:
    """Shift for a matched range not itself a placeholder
    (ref: deterministic_intent_parser.py:474-484)."""
    shift = 0
    prev_end = None
    for (new_start, new_end), orig in mapping.items():
        if new_end <= rng[0]:
            if prev_end is None or new_end > prev_end:
                prev_end = new_end
                shift = orig["end"] - new_end
    return shift


def _dedup_overlapping_slots(slots):
    """Keep slots with more tokens+chars (ref: :501-513)."""
    def overlap(a, b):
        return ranges_overlap((a["range"]["start"], a["range"]["end"]),
                              (b["range"]["start"], b["range"]["end"]))

    def key(slot):
        return -(len(tokenize(slot["value"])) + len(slot["value"]))

    kept = deduplicate_overlapping_items(slots, overlap, key)
    return sorted(kept, key=lambda s: s["range"]["start"])

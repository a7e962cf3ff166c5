"""Lookup intent parser — exact-match dictionary parsing.

Semantics per /root/reference/snips_nlu/intent_parser/lookup_intent_parser.py:
fit :84-112 (key = preprocessed utterance with entity placeholders, value =
(intent_id, [slot_ids]), ambiguous keys dropped), parse :155-251 (candidate
strings from all entity-subset substitutions, fewest-slots preference,
1/(1+n_slots) ambiguity weighting, proba ≤ 0.5 → None result).

Differences from the reference: keys are the preprocessed strings themselves
(the reference hashes them through Rust ``hash_str`` purely to shrink its
JSON model); behavior is identical.

The fitted model is a plain JSON-serializable dict — it is broadcast to
executors and the batch kernel calls :meth:`parse` per row.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from itertools import combinations

from ..entities.builtin import is_builtin_entity
from ..registry import register_intent_parser
from ..result import (empty_result, extraction_result,
                      intent_classification_result, parsing_result,
                      unresolved_slot)
from ..textcore import (deduplicate_overlapping_mentions,
                        entity_name_placeholder, normalize, tokenize)
from .common import (get_entity_scopes, get_slot_name_mappings,
                     get_stop_words_whitelist, preprocess_text)

_LOG = logging.getLogger(__name__)

MAX_ENTITIES_PER_SCOPE = 8  # bounds the 2^n candidate subsets per turn


@register_intent_parser("lookup_intent_parser")
class LookupIntentParser:

    def __init__(self, ignore_stop_words: bool = True) -> None:
        self.ignore_stop_words = ignore_stop_words
        self._stop_words: set[str] = set()
        self._stop_words_whitelist: dict[str, set[str]] = {}
        self._map: dict[str, tuple[int, list[int]]] = {}
        self._intents_names: list[str] = []
        self._slots_names: list[str] = []
        self._entity_scopes: list[dict] = []
        self._key_vocab: set[str] = set()
        self._max_key_slots = 0
        self._intent_stop_cache: dict[str, set[str]] = {}
        from functools import lru_cache
        self._preprocess_memo = lru_cache(maxsize=4096)(
            self._preprocess_impl)
        self._oov_memo = lru_cache(maxsize=8192)(self._oov_tokens)

    def _oov_tokens(self, text: str) -> tuple:
        """Tokens whose lowercased value is outside the map's key
        vocabulary — the only tokens the OOV prune ever needs to span-
        check (per-text, group-independent; the per-group work is then
        proportional to the few OOV tokens, not to all tokens × intents)."""
        vocab = self._key_vocab
        return tuple(t for t in tokenize(text)
                     if t.value.lower() not in vocab)

    @property
    def fitted(self) -> bool:
        return bool(self._intents_names)

    # ------------------------------------------------------------------ fit
    def fit(self, dataset: dict, resources: dict, entity_bundle=None,
            random_seed: int = 42) -> "LookupIntentParser":
        stop_words = set(resources["stop_words"]) \
            if self.ignore_stop_words else set()
        self._stop_words = stop_words
        self._stop_words_whitelist = get_stop_words_whitelist(
            dataset, stop_words)
        self._entity_scopes = get_entity_scopes(dataset)
        placeholders = {e: entity_name_placeholder(e)
                        for e in dataset["entities"]}

        intent_ids: dict[str, int] = {}
        slot_ids: dict[str, int] = {}
        self._map = {}
        ambiguous: set[str] = set()

        for intent_name in sorted(dataset["intents"]):
            intent_id = intent_ids.setdefault(intent_name, len(intent_ids))
            if intent_id == len(self._intents_names):
                self._intents_names.append(intent_name)
            for utt in dataset["intents"][intent_name]["utterances"]:
                parts: list[str] = []
                utt_slots: list[int] = []
                for chunk in utt["data"]:
                    if chunk.get("slot_name"):
                        sid = slot_ids.setdefault(chunk["slot_name"],
                                                  len(slot_ids))
                        if sid == len(self._slots_names):
                            self._slots_names.append(chunk["slot_name"])
                        parts.append(placeholders[chunk["entity"]])
                        utt_slots.append(sid)
                    else:
                        parts.append(chunk["text"])
                key = self._preprocess(" ".join(parts), intent_name)
                val = (intent_id, utt_slots)
                if key in self._map and self._map[key] != val:
                    ambiguous.add(key)
                else:
                    self._map[key] = val
        for key in ambiguous:
            self._map.pop(key, None)

        # per-(group, entity-kind) mention budget: the max number of
        # placeholders of that kind in any single training utterance of
        # the group — used as the overflow fallback when a text carries
        # more mentions than the subset-enumeration bound (see
        # _candidates; keeps the likeliest participants instead of an
        # arbitrary prefix)
        per_intent_max: dict[str, dict[str, int]] = {}
        for intent_name, intent in dataset["intents"].items():
            agg: dict[str, int] = {}
            for utt in intent["utterances"]:
                counts: dict[str, int] = {}
                for chunk in utt["data"]:
                    if chunk.get("slot_name"):
                        counts[chunk["entity"]] = \
                            counts.get(chunk["entity"], 0) + 1
                for e, c in counts.items():
                    agg[e] = max(agg.get(e, 0), c)
            per_intent_max[intent_name] = agg
        for g in self._entity_scopes:
            mp: dict[str, int] = {}
            for intent_name in g["intent_group"]:
                for e, c in per_intent_max.get(intent_name, {}).items():
                    mp[e] = max(mp.get(e, 0), c)
            g["max_per_kind"] = mp
        self._build_prune_index()
        return self

    def _build_prune_index(self) -> None:
        """Derived (not persisted) candidate-pruning indexes over the map:
        the token vocabulary of all keys, and the largest slot count of
        any key. A candidate string containing a token outside the vocab
        can never be a map hit; a subset larger than the slot cap can
        never satisfy the ``len(slot_ids) == len(mentions)`` check."""
        vocab: set[str] = set()
        for key in self._map:
            vocab.update(key.split(" "))
        self._key_vocab = vocab
        self._max_key_slots = max(
            (len(v[1]) for v in self._map.values()), default=0)

    def _intent_stop_words(self, intent: str) -> set[str]:
        cached = self._intent_stop_cache.get(intent)
        if cached is None:
            cached = self._stop_words - \
                self._stop_words_whitelist.get(intent, set())
            self._intent_stop_cache[intent] = cached
        return cached

    def _preprocess(self, text: str, intent: str) -> str:
        # intents share the preprocessed form unless they have distinct
        # stop-word whitelists (rare) — key the memo by the whitelist
        # group, not the intent, so N intents cost one preprocess
        group = frozenset(self._stop_words_whitelist.get(intent, ()))
        return self._preprocess_memo(text, group)

    def _preprocess_impl(self, text: str, group: frozenset) -> str:
        return preprocess_text(text, self._stop_words - group)

    # ---------------------------------------------------------------- parse
    def parse(self, text: str, entity_bundle, intents=None, top_n=None,
              anchor=None):
        """entity_bundle: object exposing ``parse_custom(text, scope)`` and
        ``parse_builtin(text, scope, anchor)`` returning mention dicts."""
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
        results_per_intent: dict[str, list[dict]] = defaultdict(list)
        for candidate, mentions in self._candidates(text, entity_bundle,
                                                    intents, anchor):
            val = self._map.get(candidate)
            if val is None:
                continue
            intent_id, slot_id_list = val
            intent_name = self._intents_names[intent_id]
            if intents is not None and intent_name not in intents:
                continue
            if len(slot_id_list) != len(mentions):
                continue
            slots = [
                unresolved_slot(m["start"], m["end"],
                                text[m["start"]:m["end"]], m["entity_kind"],
                                self._slots_names[sid])
                for sid, m in zip(slot_id_list, mentions)
            ]
            results_per_intent[intent_name].append(extraction_result(
                intent_classification_result(intent_name, 1.0), slots))

        results = []
        for intent_results in results_per_intent.values():
            intent_results.sort(key=lambda r: len(r["slots"]))
            results.append(intent_results[0])

        # ambiguity weighting (ref: lookup_intent_parser.py:181-188)
        weights = [1.0 / (1.0 + len(r["slots"])) for r in results]
        total = sum(weights)
        for res, w in zip(results, weights):
            res["intent"]["probability"] = w / total
        results.sort(key=lambda r: -r["intent"]["probability"])
        return results[:top_n]

    def _candidates(self, text, entity_bundle, intents, anchor):
        """Candidate (preprocessed_text, mentions) pairs over all entity
        subsets × intent groups (ref: lookup_intent_parser.py:192-227)."""
        seen: dict[str, list] = defaultdict(list)
        for group in self._entity_scopes:
            intent_group = [i for i in group["intent_group"]
                            if intents is None or i in intents]
            if not intent_group:
                continue
            scope = group["entity_scope"]
            mentions = []
            if scope["builtin"]:
                mentions += entity_bundle.parse_builtin(
                    text, scope["builtin"], anchor)
            if scope["custom"]:
                mentions += entity_bundle.parse_custom(text, scope["custom"])
            mentions = deduplicate_overlapping_mentions(mentions)
            if len(mentions) > MAX_ENTITIES_PER_SCOPE:
                # DIVERGENCE from the reference (documented in README):
                # it enumerates all 2^n entity subsets; we bound n at
                # MAX_ENTITIES_PER_SCOPE. Overflow fallback: keep, in
                # text order, at most as many mentions of each kind as
                # any training utterance of this group actually uses —
                # the mentions a key can contain — before truncating.
                budget = dict(group.get("max_per_kind") or {})
                if budget:
                    kept = []
                    for m in mentions:
                        if budget.get(m["entity_kind"], 0) > 0:
                            budget[m["entity_kind"]] -= 1
                            kept.append(m)
                    mentions = kept
                if len(mentions) > MAX_ENTITIES_PER_SCOPE:
                    _LOG.warning(
                        "lookup parser: truncating %d mentions to %d; "
                        "exact-match recall may be reduced for this text",
                        len(mentions), MAX_ENTITIES_PER_SCOPE)
                    mentions = mentions[:MAX_ENTITIES_PER_SCOPE]

            # OOV prune: every candidate for this group keeps, verbatim
            # (lowercased), each text token that is outside all mention
            # spans and not a stop word for that intent; if such a token
            # is absent from the map's key vocabulary, no candidate built
            # with that intent's stop-word set can be a map hit — for ANY
            # intent, since the vocab spans the whole map. Skips the 2^n
            # enumeration entirely for texts with unseen words (the
            # common case on open-domain corpora).
            oov = self._oov_memo(text)
            if oov:
                uncovered = [
                    t for t in oov
                    if not any(m["start"] < t.end and t.start < m["end"]
                               for m in mentions)]
                if uncovered:
                    intent_group = [
                        i for i in intent_group
                        if not any(
                            normalize(t.value)
                            not in self._intent_stop_words(i)
                            for t in uncovered)]
                    if not intent_group:
                        continue

            # cleaned original text depends only on the intent — hoisted
            # out of the entity-subset loop
            cleaned_per_intent = {i: self._preprocess(text, i)
                                  for i in intent_group}
            for subset in _entity_combinations(mentions,
                                               self._max_key_slots):
                processed = _substitute_placeholders(text, subset)
                for intent in intent_group:
                    cleaned = cleaned_per_intent[intent]
                    cleaned_processed = self._preprocess(processed, intent) \
                        if subset else cleaned
                    for cand_text, cand_mentions in (
                            (cleaned, []),
                            (cleaned_processed, list(subset))):
                        if cand_mentions not in seen[cand_text]:
                            seen[cand_text].append(cand_mentions)
                            yield cand_text, cand_mentions

    # ---------------------------------------------------------- n-best API
    def get_intents(self, text, entity_bundle, anchor=None):
        """Ranked intent list, length n_intents + 1 (None last)
        (ref: lookup_intent_parser.py:254-271)."""
        n = len(self._intents_names)
        top = [r["intent"] for r in self._parse_top_intents(
            text, entity_bundle, top_n=n, anchor=anchor)]
        matched = {r["intentName"] for r in top}
        for intent in self._intents_names:
            if intent not in matched:
                top.append(intent_classification_result(intent, 0.0))
        top.append(intent_classification_result(None, 0.0))
        return top

    def get_slots(self, text, entity_bundle, intent, anchor=None):
        if intent is None:
            return []
        if intent not in self._intents_names:
            raise ValueError(f"unknown intent {intent!r}")
        result = self.parse(text, entity_bundle, intents=[intent],
                            anchor=anchor)
        return result["slots"]

    # ------------------------------------------------------------- persist
    def to_dict(self) -> dict:
        return {
            "unit_name": self.unit_name,
            "ignore_stop_words": self.ignore_stop_words,
            "stop_words": sorted(self._stop_words),
            "stop_words_whitelist": {k: sorted(v) for k, v in
                                     self._stop_words_whitelist.items()},
            "map": {k: [v[0], list(v[1])] for k, v in self._map.items()},
            "intents_names": self._intents_names,
            "slots_names": self._slots_names,
            "entity_scopes": self._entity_scopes,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "LookupIntentParser":
        parser = cls(ignore_stop_words=d["ignore_stop_words"])
        parser._stop_words = set(d["stop_words"])
        parser._stop_words_whitelist = {
            k: set(v) for k, v in d["stop_words_whitelist"].items()}
        parser._map = {k: (v[0], list(v[1])) for k, v in d["map"].items()}
        parser._intents_names = list(d["intents_names"])
        parser._slots_names = list(d["slots_names"])
        parser._entity_scopes = d["entity_scopes"]
        parser._build_prune_index()
        return parser


def _entity_combinations(mentions, max_size=None):
    """() first, then larger subsets first (ref: :505-509). ``max_size``
    skips subsets larger than any key's slot count — those always fail
    the ``len(slot_ids) == len(mentions)`` match, so pruning them cannot
    change the result set."""
    yield ()
    top = len(mentions) if max_size is None else min(len(mentions),
                                                     max_size)
    for size in range(top, 0, -1):
        yield from combinations(mentions, size)


def _substitute_placeholders(text: str, mentions) -> str:
    if not mentions:
        return text
    ordered = sorted(mentions, key=lambda m: m["start"])
    out = []
    cursor = 0
    for m in ordered:
        out.append(text[cursor:m["start"]])
        out.append(entity_name_placeholder(m["entity_kind"]))
        cursor = m["end"]
    out.append(text[cursor:])
    return "".join(out)

"""Gazetteer (custom) entity parser: dictionary phrase matching over
normalized token streams.

From-scratch replacement for the reference's Rust ``GazetteerEntityParser``
(wrapped at /root/reference/snips_nlu/entity_parser/custom_entity_parser.py:
25-52, built at :80-111). The dictionary maps raw values (incl. synonyms
and fit-time string variations) to canonical values; matching is
token-exact on normalized tokens (``matching_strictness`` < 1.0 fuzzy
matching is not implemented — every shipped fixture uses 1.0).

The compiled trie is built once on the driver from the gazetteer dimension
table and broadcast to executors; ``parse`` runs per Arrow batch. This is
the Spark-equivalent of a broadcast hash join of token n-grams against the
gazetteer dimension.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

from ..textcore import normalize, tokenize

# trie node: dict token -> child node; terminal payloads under _END
_END = "\0"


class GazetteerParser:
    def __init__(self) -> None:
        # entity -> trie over normalized token sequences
        self._tries: dict[str, dict] = {}
        self._max_len: dict[str, int] = {}
        # bounded per-instance memo (the reference keeps a LimitedSizeDict
        # of 1000 entries per parser, entity_parser/entity_parser.py:22-55)
        self._parse_memo = lru_cache(maxsize=2048)(self._parse_impl)

    # -- build (driver side) ------------------------------------------------
    @classmethod
    def build(cls, entity_utterances: dict[str, dict[str, str]]
              ) -> "GazetteerParser":
        """entity_utterances: {entity_name: {raw_value: canonical_value}}
        — the compiled gazetteer produced by dataset validation
        (ref: dataset/validation.py:174-248)."""
        parser = cls()
        for entity, utterances in entity_utterances.items():
            trie: dict = {}
            max_len = 0
            # deterministic insert order; first-inserted canonical wins for
            # an identical raw key (sorted for stability)
            for raw in sorted(utterances):
                resolved = utterances[raw]
                toks = [normalize(t.value) for t in tokenize(raw)]
                if not toks:
                    continue
                node = trie
                for t in toks:
                    node = node.setdefault(t, {})
                node.setdefault(_END, resolved)
                max_len = max(max_len, len(toks))
            parser._tries[entity] = trie
            parser._max_len[entity] = max_len
        return parser

    @property
    def entities(self) -> list[str]:
        return sorted(self._tries)

    # -- parse (executor side, per batch) -----------------------------------
    def parse(self, text: str, scope: Sequence[str] | None = None
              ) -> list[dict]:
        """Longest dictionary match per (entity, start token); returns
        mention dicts sorted by span. Memoized per (text, scope) — treat
        the returned mention dicts as immutable."""
        scope_key = tuple(self.entities) if scope is None \
            else tuple(sorted(scope))
        return list(self._parse_memo(text, scope_key))

    def _parse_impl(self, text: str, scope: tuple[str, ...]) -> tuple:
        tokens = tokenize(text)
        if not tokens:
            return ()
        norm = [normalize(t.value) for t in tokens]
        mentions: list[dict] = []
        n = len(tokens)
        for entity in scope:
            trie = self._tries.get(entity)
            if not trie:
                continue
            for i in range(n):
                node = trie
                best_end = -1
                best_resolved = None
                j = i
                while j < n:
                    node = node.get(norm[j])
                    if node is None:
                        break
                    if _END in node:
                        best_end = j
                        best_resolved = node[_END]
                    j += 1
                if best_end >= 0:
                    start = tokens[i].start
                    end = tokens[best_end].end
                    mentions.append({
                        "value": text[start:end],
                        "start": start,
                        "end": end,
                        "entity_kind": entity,
                        "resolved_value": {"kind": "Custom",
                                           "value": best_resolved},
                    })
        return tuple(sorted(mentions, key=lambda m: (m["start"], m["end"])))

    # -- persistence ---------------------------------------------------------
    def to_dict(self) -> dict:
        """Flatten back to {entity: {raw: resolved}} for the model bundle."""
        out: dict[str, dict[str, str]] = {}

        def walk(node: dict, prefix: list[str], acc: dict) -> None:
            for key, child in node.items():
                if key == _END:
                    acc[" ".join(prefix)] = child
                else:
                    walk(child, prefix + [key], acc)

        for entity, trie in self._tries.items():
            acc: dict[str, str] = {}
            walk(trie, [], acc)
            out[entity] = acc
        return {"entity_utterances": out}

    @classmethod
    def from_dict(cls, d: dict) -> "GazetteerParser":
        return cls.build(d["entity_utterances"])

"""Gazetteer (custom) entity parser: dictionary phrase matching over
normalized token streams.

From-scratch replacement for the reference's Rust ``GazetteerEntityParser``
(wrapped at /root/reference/snips_nlu/entity_parser/custom_entity_parser.py:
25-52, built at :80-111). The dictionary maps raw values (incl. synonyms
and fit-time string variations) to canonical values. Matching is
token-exact on normalized tokens; entities configured with
``matching_strictness`` < 1.0 additionally match ordered token
subsequences of a dictionary value covering at least that fraction of the
value's tokens (the public gazetteer-entity-parser ``parser_threshold``
semantics: minimum fraction of entity-value tokens that must match).

The compiled trie is built once on the driver from the gazetteer dimension
table and broadcast to executors; ``parse`` runs per Arrow batch. This is
the Spark-equivalent of a broadcast hash join of token n-grams against the
gazetteer dimension.

On the scan algorithm: the per-start merged-trie walk is the
longest-match-per-(entity, start) counterpart of an Aho-Corasick
automaton scan. AC reports all matches ENDING at each position in one
pass; this parser needs the longest match per START position, and on
miss-dominated text (most tokens are not gazetteer words) the walk costs
one dict probe per token — the same O(n) as AC with smaller constants
and no failure-link construction. AC wins only when many long dictionary
phrases overlap densely; switch to token-level AC with failure links if
a profile ever shows the walk's inner loop dominating.
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
        # merged trie across all entities: one walk per text position
        # instead of one per entity (terminals: {entity: resolved})
        self._merged: dict = {}
        # fuzzy matching state (only for entities with strictness < 1.0)
        self._strictness: dict[str, float] = {}
        self._values: dict[str, list[tuple[tuple[str, ...], str]]] = {}
        self._token_index: dict[str, dict[str, list[int]]] = {}
        self._gaz_stop_words: dict[str, set[str]] = {}
        # bounded per-instance memos (the reference keeps a LimitedSizeDict
        # of 1000 entries per parser, entity_parser/entity_parser.py:22-55);
        # the scan is scope-independent, so one memo entry serves every
        # scoped probe of the same text. Sizes cover a full 10k-row Arrow
        # batch of unique texts (each text is probed with several scopes
        # and a stemmed variant) — an undersized memo churns and re-scans
        self._scan_memo = lru_cache(maxsize=32768)(self._scan_all)
        self._filter_memo = lru_cache(maxsize=131072)(self._filter_by_scope)

    # -- build (driver side) ------------------------------------------------
    STOPWORDS_FRACTION = 1e-3  # ref: custom_entity_parser.py:108

    @classmethod
    def build(cls, entity_utterances: dict[str, dict[str, str]],
              strictness: dict[str, float] | None = None
              ) -> "GazetteerParser":
        """entity_utterances: {entity_name: {raw_value: canonical_value}}
        — the compiled gazetteer produced by dataset validation
        (ref: dataset/validation.py:174-248). ``strictness`` maps entity →
        matching_strictness (default 1.0 = exact).

        Per entity, the top ``int(STOPWORDS_FRACTION × |vocabulary|)``
        most frequent value tokens are derived as gazetteer stop words
        (ref: custom_entity_parser.py:134-180) — fuzzy matches must
        contain at least one non-stop token and the strictness fraction
        is computed over non-stop tokens. Zero at fixture-scale vocab
        sizes; bites on large real gazetteers."""
        parser = cls()
        strictness = strictness or {}
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
            # merge into the shared trie (longest match per entity is
            # found in the same walk)
            for raw in sorted(utterances):
                toks = [normalize(t.value) for t in tokenize(raw)]
                if not toks:
                    continue
                node = parser._merged
                for t in toks:
                    node = node.setdefault(t, {})
                node.setdefault(_END, {}).setdefault(
                    entity, utterances[raw])
            s = float(strictness.get(entity, 1.0))
            if s < 1.0:
                parser._strictness[entity] = s
                values: list[tuple[tuple[str, ...], str]] = []
                index: dict[str, list[int]] = {}
                for raw in sorted(utterances):
                    toks = tuple(normalize(t.value)
                                 for t in tokenize(raw))
                    if not toks:
                        continue
                    vid = len(values)
                    values.append((toks, utterances[raw]))
                    for tok in set(toks):
                        index.setdefault(tok, []).append(vid)
                parser._values[entity] = values
                parser._token_index[entity] = index
                # derived gazetteer stop words (frequency over raw values)
                freq: dict[str, int] = {}
                for toks, _resolved in values:
                    for tok in toks:
                        freq[tok] = freq.get(tok, 0) + 1
                n_stop = int(cls.STOPWORDS_FRACTION * len(freq))
                top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
                parser._gaz_stop_words[entity] = {
                    tok for tok, _ in top[:n_stop]}
        return parser

    @property
    def entities(self) -> list[str]:
        return sorted(self._tries)

    # -- parse (executor side, per batch) -----------------------------------
    def parse(self, text: str, scope: Sequence[str] | None = None
              ) -> list[dict]:
        """Longest dictionary match per (entity, start token); returns
        mention dicts sorted by span. Both the underlying scan (per text)
        and the scope-filtered view (per text+scope — the cascade probes
        each text with several scopes) are memoized; treat the returned
        dicts as immutable."""
        scan = self._scan_memo(text)
        if not scan:
            # common case on open-domain text: nothing matched, so every
            # scoped view is empty — skip the per-scope memo machinery
            return []
        if scope is None:
            return list(scan)
        return list(self._filter_memo(text, tuple(scope)))

    def _filter_by_scope(self, text: str, scope_key: tuple) -> tuple:
        wanted = set(scope_key)
        return tuple(m for m in self._scan_memo(text)
                     if m["entity_kind"] in wanted)

    def _scan_all(self, text: str) -> tuple:
        """One merged-trie walk per start position finds the longest match
        of EVERY entity simultaneously; fuzzy entities add their
        subsequence matches."""
        tokens = tokenize(text)
        if not tokens:
            return ()
        norm = [normalize(t.value) for t in tokens]
        n = len(tokens)
        mentions: list[dict] = []
        for i in range(n):
            node = self._merged
            per_entity: dict[str, tuple[int, str]] = {}
            j = i
            while j < n:
                node = node.get(norm[j])
                if node is None:
                    break
                terminals = node.get(_END)
                if terminals:
                    for entity, resolved in terminals.items():
                        per_entity[entity] = (j, resolved)
                j += 1
            for entity, (end_idx, resolved) in per_entity.items():
                start = tokens[i].start
                end = tokens[end_idx].end
                mentions.append({
                    "value": text[start:end],
                    "start": start,
                    "end": end,
                    "entity_kind": entity,
                    "resolved_value": {"kind": "Custom",
                                       "value": resolved},
                })
        for entity in self._strictness:
            mentions.extend(self._fuzzy_matches(entity, text, tokens,
                                                norm))
        # drop fuzzy matches duplicating an exact span
        seen: set = set()
        unique = []
        for m in sorted(mentions, key=lambda m: (m["start"], m["end"])):
            key = (m["entity_kind"], m["start"], m["end"])
            if key not in seen:
                seen.add(key)
                unique.append(m)
        # same-entity overlap resolution (the reference's gazetteer
        # parser emits NON-OVERLAPPING matches per entity, keeping the
        # longest): greedy by descending length — suppress any mention
        # overlapping an already-kept longer (or equal, earlier) mention
        # of the SAME entity. Strict containment alone is not enough:
        # two partially-overlapping matches would both survive where the
        # reference emits only the longer one (round-3 ADVICE).
        if len(unique) > 1:
            kept: list = []
            for m in sorted(unique,
                            key=lambda m: (m["start"] - m["end"],
                                           m["start"])):
                if not any(k["entity_kind"] == m["entity_kind"]
                           and k["start"] < m["end"]
                           and m["start"] < k["end"]
                           for k in kept):
                    kept.append(m)
            unique = sorted(kept,
                            key=lambda m: (m["start"], m["end"]))
        return tuple(unique)

    def _fuzzy_matches(self, entity, text, tokens, norm):
        """Ordered-subsequence matches covering ≥ strictness of a value's
        non-stop tokens. Value tokens may be skipped, and — round-4
        skip tolerance, approximating the crate's input-side tolerance —
        up to ``floor((1 - strictness) · n_value_tokens)`` stray text
        tokens may appear INSIDE the span (never at its edges: a match
        still starts and ends on a matched token). Gazetteer stop words
        never start a match and don't count toward the strictness
        fraction."""
        threshold = self._strictness[entity]
        values = self._values[entity]
        index = self._token_index[entity]
        stop = self._gaz_stop_words.get(entity, set())
        out = []
        n = len(tokens)
        for i in range(n):
            if norm[i] in stop:
                continue
            cands = index.get(norm[i])
            if not cands:
                continue
            best = None  # (matched, -v_len, end_idx, resolved)
            for vid in cands:
                v_toks, resolved = values[vid]
                n_scored = sum(1 for vt in v_toks if vt not in stop) \
                    or len(v_toks)
                k = 0
                matched = 0
                scored = 0
                end_idx = i - 1
                t = i
                skips = 0
                max_skips = int((1.0 - threshold) * len(v_toks))
                while t < n and k < len(v_toks):
                    try:
                        k = v_toks.index(norm[t], k)
                    except ValueError:
                        # stray text token inside the span — tolerated
                        # up to the skip budget, only after a first
                        # matched token (a match never starts on a
                        # stray), and never consuming a stop word
                        if matched and skips < max_skips \
                                and norm[t] not in stop:
                            skips += 1
                            t += 1
                            continue
                        break
                    matched += 1
                    if norm[t] not in stop:
                        scored += 1
                    end_idx = t
                    k += 1
                    t += 1
                if scored and scored / n_scored >= threshold:
                    cand = (matched, -len(v_toks), end_idx, resolved)
                    if best is None or cand > best:
                        best = cand
            if best is not None:
                matched, _, end_idx, resolved = best
                start = tokens[i].start
                end = tokens[end_idx].end
                out.append({
                    "value": text[start:end],
                    "start": start,
                    "end": end,
                    "entity_kind": entity,
                    "resolved_value": {"kind": "Custom",
                                       "value": resolved},
                })
        return out

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
        return {"entity_utterances": out,
                "strictness": dict(self._strictness)}

    @classmethod
    def from_dict(cls, d: dict) -> "GazetteerParser":
        return cls.build(d["entity_utterances"],
                         strictness=d.get("strictness"))

"""Entity-value string variations used to expand gazetteers at fit time.

Mirrors the intent of /root/reference/snips_nlu/string_variations.py:160-198
(case :146, and :47-73, punctuation :75-95, numbers :114-144) with a capped,
deterministic variation set. Variation generation is driver-side only (the
gazetteer is a small dimension table), then broadcast.
"""

from __future__ import annotations

import itertools
import re

from ..textcore import tokenize_light
from ..entities.numbers import number_to_words, words_to_number

MAX_ENTITY_VARIATIONS = 10  # ref: string_variations.py:31

_AND_UTTERANCES = ("and", "&")
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


def _case_variations(s: str) -> set[str]:
    return {s.lower(), s.title()}


def _and_variations(s: str) -> set[str]:
    out = set()
    tokens = tokenize_light(s)
    for i, t in enumerate(tokens):
        low = t.lower()
        if low in _AND_UTTERANCES:
            for repl in _AND_UTTERANCES:
                if repl != low:
                    out.add(" ".join(tokens[:i] + [repl] + tokens[i + 1:]))
    return out


def _punctuation_variations(s: str) -> set[str]:
    stripped = " ".join(_PUNCT_RE.sub(" ", s).split())
    return {stripped} if stripped and stripped != s else set()


def _number_variations(s: str) -> set[str]:
    """digit ↔ word forms for standalone integer tokens."""
    out = set()
    tokens = tokenize_light(s)
    for i, t in enumerate(tokens):
        if t.isdigit() and len(t) <= 4:
            words = number_to_words(int(t))
            if words:
                out.add(" ".join(tokens[:i] + [words] + tokens[i + 1:]))
        else:
            n = words_to_number(t.lower())
            if n is not None and float(n).is_integer():
                out.add(" ".join(tokens[:i] + [str(int(n))] + tokens[i + 1:]))
    return out


def get_string_variations(value: str, case: bool = True, and_: bool = True,
                          punctuation: bool = True,
                          numbers: bool = True) -> set[str]:
    """All variations of ``value`` (capped at MAX_ENTITY_VARIATIONS),
    deterministic order-independent set."""
    variations = {value}
    if case:
        variations |= set(itertools.chain.from_iterable(
            _case_variations(v) for v in set(variations)))
    if and_:
        variations |= set(itertools.chain.from_iterable(
            _and_variations(v) for v in set(variations)))
    if punctuation:
        variations |= set(itertools.chain.from_iterable(
            _punctuation_variations(v) for v in set(variations)))
    if numbers:
        variations |= set(itertools.chain.from_iterable(
            _number_variations(v) for v in set(variations)))
    # whitespace-join variants of multi-token values
    variations |= {" ".join(tokenize_light(v)) for v in set(variations)}
    if len(variations) > MAX_ENTITY_VARIATIONS:
        variations = set(sorted(variations)[:MAX_ENTITY_VARIATIONS]) | {value}
    return variations

"""Text core: tokenization, normalization, span utilities.

These pure functions are the shared spec for BOTH the driver-side fit code
and the executor-side Arrow-batch kernels, so fit and inference agree by
construction (the reference delegates this to the Rust ``snips_nlu_utils``
crate — see /root/reference/snips_nlu/preprocessing.py:42-97 — which is
unavailable here, so this module *is* the tokenizer spec).
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache
from typing import Callable, NamedTuple, Sequence


class Token(NamedTuple):
    """A token with its character span in the original string.

    Mirrors the reference Token (value, start, end) at
    /root/reference/snips_nlu/preprocessing.py:42-70.
    """

    value: str
    start: int
    end: int


# Word = run of unicode word chars (incl. digits, underscore removed);
# everything that is neither word nor whitespace is a single-char symbol
# token; decimal numbers ("3.5") and dotted meridiem abbreviations
# ("10p.m.", "a.m.") stay single tokens so the number/clock grammar sees
# them whole — and their spans keep the trailing dot, matching the
# reference's char-level datetime spans (its test expects "at 10p.m."
# to cover the final period, test_deterministic_intent_parser.py:377) —
# even though "." alone is separator punctuation.
# This is the project-wide tokenizer spec.
_TOKEN_RE = re.compile(
    r"(?i:\d{1,2}[ap]\.m\.?|[ap]\.m\.?)(?!\w)|\d+\.\d+|[^\W_]+|[^\w\s]|_",
    re.UNICODE)

_WS_RE = re.compile(r"\s+", re.UNICODE)

# CJK extension to the tokenizer spec: scripts without whitespace can't
# rely on \w runs, so a word run containing CJK characters is further
# split at script-class boundaries — hiragana runs / katakana runs
# (incl. the prolonged-sound mark) / kanji NUMERAL runs (their own
# class so "三百二十五" stays one parseable numeral token) / other han
# PER CHARACTER (kanji compounds can't be segmented without a
# dictionary; per-character tokens let dictionary matchers — the
# gazetteer trie, the datetime grammar's word merge — re-assemble
# words by walking tokens, the standard char-level treatment for
# Japanese sequence labeling) / everything else. The reference reaches per-language
# segmentation through its Rust tokenizer (preprocessing.py:72-89,
# `tokenize(string, language)`); this split is deterministic and
# language-independent, so no language parameter needs plumbing —
# non-CJK text is untouched.
_CJK_PROBE = re.compile(
    r"[\u3005\u3040-\u30ff\u31f0-\u31ff\u3400-\u9fff\uf900-\ufaff"
    r"\u1100-\u11ff\u3130-\u318f\uac00-\ud7af]")
_KANJI_NUMERALS = "〇零一二三四五六七八九十百千万億兆"
_SCRIPT_RUN_RE = re.compile(
    r"[\u3040-\u309f]+"                     # hiragana
    r"|[\u30a0-\u30ff\u31f0-\u31ff]+"      # katakana + prolonged mark
    f"|[{_KANJI_NUMERALS}]+"                 # kanji numerals
    r"|[\u3400-\u9fff\uf900-\ufaff\u3005]"  # other han: one char/token
    r"|[\u1100-\u11ff\u3130-\u318f\uac00-\ud7af]+"  # hangul eojeol runs
    r"|[^\u3005\u3040-\u30ff\u31f0-\u31ff\u3400-\u9fff\uf900-\ufaff"
    r"\u1100-\u11ff\u3130-\u318f\uac00-\ud7af]+")

# Korean attaches case/topic particles directly to the preceding word
# (월요일부터, 서울로, 8시에), so a hangul run is split once at a
# trailing particle, longest match first. Deterministic and applied
# identically at fit and parse time, so keys/tries stay consistent even
# when a split is linguistically wrong — the same crude-but-standard
# trade-off as dictionary stemming. Jamo-level morphology is NOT
# modeled.
_KO_PARTICLES = (
    "입니다", "이에요", "예요", "에서는", "에서", "에는", "부터",
    "까지", "으로", "이나", "하고",
    "은", "는", "이", "가", "을", "를", "에", "로", "와", "과", "의",
    "도", "만",
)
_HANGUL_RE = re.compile(r"[\u1100-\u11ff\u3130-\u318f\uac00-\ud7af]")


# Allomorphic particles select on the preceding syllable's final
# consonant (batchim): 은/이/을/과 and the 이-initial forms attach only
# after a closed syllable, 는/가/를/와/예요 only after an open one, and
# (으)로 alternates with ㄹ-finals patterning open. A trailing match
# that violates the allomorphy is not that particle (사과 "apple" is
# never 사+과 — the comitative after open 사 would be 와), so that
# split is skipped and shorter particles are still tried.
_KO_AFTER_BATCHIM = frozenset(("은", "이", "을", "과", "으로", "이나",
                               "이에요"))
_KO_AFTER_VOWEL = frozenset(("는", "가", "를", "와", "예요"))


def _split_hangul_particle(value: str, start: int) -> list[Token]:
    for p in _KO_PARTICLES:
        if len(value) > len(p) and value.endswith(p):
            cut = len(value) - len(p)
            code = ord(value[cut - 1]) - 0xAC00
            if 0 <= code < 11172:     # composed syllable: check batchim
                final = code % 28     # 0 = open syllable, 8 = ㄹ
                if p in _KO_AFTER_BATCHIM:
                    if final == 0 or (p == "으로" and final == 8):
                        continue
                elif p in _KO_AFTER_VOWEL:
                    if final != 0:
                        continue
                elif p == "로" and final not in (0, 8):
                    continue
            return [Token(value[:cut], start, start + cut),
                    Token(value[cut:], start + cut, start + len(value))]
    return [Token(value, start, start + len(value))]


# separator punctuation the reference tokenizer drops entirely, derived
# from its observable behavior: the deterministic-parser goldens require
# "," "." "’" to vanish from the cleaned/matched text
# (ref: tests/test_deterministic_intent_parser.py:385-437 — queries like
# "this, is,, a, dummy a" and " at 8am ’ there ..." must match patterns
# whose tokens are joined by \s*), while tests/test_preprocessing.py:50-66
# pins "$" "%" "!" as real tokens. Symbols stay tokens; textual
# punctuation is a separator. ":" and "'" are deliberately KEPT: this
# repo's datetime/number grammar is token-based (the reference's Rust
# grammar is character-based, so its tokenizer choice doesn't bind it)
# and consumes them ("8 : 30", "o ' clock", French elision).
_SEPARATOR_PUNCT = frozenset(",.;’‘“”\"()[]{}«»…¡¿")


@lru_cache(maxsize=65536)
def tokenize(text: str) -> tuple[Token, ...]:
    """Tokenize with character ranges (ref: preprocessing.py:72-89).

    Memoized — transcript corpora repeat texts heavily (the reference
    caches per-text parse results for the same reason,
    entity_parser/entity_parser.py:22-55). Treat the result as immutable.
    """
    if text.isascii():
        # fast path: no token can need CJK script splitting. Tokens are
        # built via tuple.__new__ — bypassing the generated NamedTuple
        # __new__ wrapper is ~25% faster at this, the hottest
        # allocation site in the engine
        tn = tuple.__new__
        toks = []
        ap = toks.append
        for m in _TOKEN_RE.finditer(text):
            v = m.group(0)
            if v not in _SEPARATOR_PUNCT:
                ap(tn(Token, (v, m.start(), m.end())))
        return tuple(toks)
    out = []
    for m in _TOKEN_RE.finditer(text):
        value = m.group(0)
        if value in _SEPARATOR_PUNCT:
            continue
        if not value.isascii() and _CJK_PROBE.search(value):
            base = m.start()
            for sm in _SCRIPT_RUN_RE.finditer(value):
                run = sm.group(0)
                if _HANGUL_RE.match(run):
                    out.extend(_split_hangul_particle(run,
                                                      base + sm.start()))
                else:
                    out.append(Token(run, base + sm.start(),
                                     base + sm.end()))
        else:
            out.append(Token(value, m.start(), m.end()))
    return tuple(out)


def tokenize_light(text: str) -> list[str]:
    """Token strings only (ref: preprocessing.py:91-97)."""
    return [t.value for t in tokenize(text)]


@lru_cache(maxsize=131072)
def normalize(text: str) -> str:
    """Lowercase + strip diacritics (NFKD fold), the normalization used for
    stop-word tests and gazetteer keys (ref: Rust ``normalize`` used at
    preprocessing.py:29-36). Memoized; fast path for ASCII. CJK text is
    NFKC-composed instead — stripping combining marks would merge voiced
    kana into their base forms (ビ → ヒ), corrupting gazetteer keys;
    NFKC also folds full-width digits/latin (８ → 8)."""
    lower = text.lower()
    if lower.isascii():
        return lower
    if _CJK_PROBE.search(lower):
        return unicodedata.normalize("NFKC", lower)
    nfkd = unicodedata.normalize("NFKD", lower)
    return "".join(c for c in nfkd if not unicodedata.combining(c))


def normalize_token_text(text: str) -> str:
    """Normalization used for matching keys: collapse whitespace too."""
    return _WS_RE.sub(" ", normalize(text)).strip()


def stem(value: str, stems: dict[str, str]) -> str:
    """Dictionary stemming (ref: preprocessing.py:9-27): per-token lookup."""
    return " ".join(stems.get(t, t) for t in tokenize_light(value))


_REGEX_SPECIAL = set("\\.+*?()|[]{}^$#&-~")


def regex_escape(s: str) -> str:
    """Escape regex metacharacters the way the reference does so compiled
    patterns are byte-compatible with its persisted models
    (ref: common/utils.py:23-43)."""
    return "".join("\\" + c if c in _REGEX_SPECIAL else c for c in s)


@lru_cache(maxsize=65536)
def get_shape(token: str) -> str:
    """Token shape class: xxx / XXX / Xxx / xX
    (ref: Rust get_shape, used at slot_filler/feature_factory.py:323-331).
    Memoized — the shape-ngram factories probe every token several times
    per text and token values repeat heavily across a corpus."""
    if token.islower():
        return "xxx"
    if token.isupper():
        return "XXX"
    if token and token[0].isupper() and token[1:].islower():
        return "Xxx"
    return "xX"


def get_word_chunk(word: str, chunk_size: int, chunk_start: int,
                   reverse: bool = False) -> str | None:
    """Prefix/suffix extraction (ref: slot_filler/features_utils.py:23-30)."""
    if chunk_size < 1:
        return None
    if chunk_size > len(word):
        return None
    if reverse:
        return word[chunk_start - chunk_size:chunk_start]
    return word[chunk_start:chunk_start + chunk_size]


def get_all_ngrams(tokens: Sequence[str]) -> list[dict]:
    """All contiguous n-grams with their token indexes
    (ref: slot_filler/features_utils.py:11-20, Rust compute_all_ngrams)."""
    out = []
    n = len(tokens)
    for size in range(1, n + 1):
        for start in range(0, n - size + 1):
            out.append({
                "ngram": " ".join(tokens[start:start + size]),
                "token_indexes": list(range(start, start + size)),
            })
    return out


def initial_string_from_tokens(tokens: Sequence[Token]) -> str:
    """Reconstruct a string from spaced tokens
    (ref: features_utils.py:33-41)."""
    parts: list[str] = []
    for i, t in enumerate(tokens):
        if i:
            parts.append(" " * (t.start - tokens[i - 1].end))
        parts.append(t.value)
    return "".join(parts)


# ---------------------------------------------------------------------------
# Span utilities
# ---------------------------------------------------------------------------

def ranges_overlap(lhs: tuple[int, int], rhs: tuple[int, int]) -> bool:
    """Half-open [start, end) overlap (ref: common/utils.py:143-152)."""
    return lhs[0] < rhs[1] and lhs[1] > rhs[0]


def deduplicate_overlapping_items(items: list, overlap_fn: Callable,
                                  sort_key_fn: Callable) -> list:
    """Greedy keep-first under sort_key_fn ordering
    (ref: common/utils.py:165-176)."""
    kept: list = []
    for item in sorted(items, key=sort_key_fn):
        if not any(overlap_fn(item, k) for k in kept):
            kept.append(item)
    return kept


def deduplicate_overlapping_mentions(mentions: list[dict]) -> list[dict]:
    """Keep longest (by raw value length) non-overlapping entity mentions,
    returned in span order (ref: common/utils.py:216-231).

    A mention dict carries at least {"start", "end", "value"}.
    """
    kept = deduplicate_overlapping_items(
        mentions,
        lambda a, b: ranges_overlap((a["start"], a["end"]),
                                    (b["start"], b["end"])),
        lambda m: -len(m["value"]),
    )
    return sorted(kept, key=lambda m: m["start"])


def replace_entities_with_placeholders(
        text: str, mentions: list[dict],
        placeholder_fn: Callable[[str], str]) -> tuple[dict, str]:
    """Substitute mention spans with placeholders; return the mapping from
    placeholder-space ranges back to original ranges
    (ref: common/utils.py:179-213).

    Returns (range_mapping, processed_text) where range_mapping maps
    (new_start, new_end) -> {"start": orig_start, "end": orig_end}.
    """
    if not mentions:
        return {}, text
    mentions = deduplicate_overlapping_mentions(mentions)
    range_mapping: dict[tuple[int, int], dict] = {}
    out: list[str] = []
    offset = 0
    cursor = 0
    for m in mentions:
        start, end = m["start"], m["end"]
        out.append(text[cursor:start])
        placeholder = placeholder_fn(m["entity_kind"])
        new_start = start + offset
        offset += len(placeholder) - (end - start)
        new_end = end + offset
        out.append(placeholder)
        range_mapping[(new_start, new_end)] = {"start": start, "end": end}
        cursor = end
    out.append(text[cursor:])
    return range_mapping, "".join(out)


def entity_name_placeholder(entity_label: str) -> str:
    """%ENTITYNAME% placeholder (ref: lookup_intent_parser.py:495-496)."""
    return "%" + "".join(tokenize_light(entity_label)).upper() + "%"

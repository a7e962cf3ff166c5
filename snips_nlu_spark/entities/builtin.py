"""Builtin ("grammar") entity parser: snips/number, snips/ordinal,
snips/percentage, snips/temperature, snips/amountOfMoney, snips/duration,
snips/datetime.

From-scratch, pure-Python replacement for the reference's Rust
``snips_nlu_parsers.BuiltinEntityParser`` (wrapped at
/root/reference/snips_nlu/entity_parser/builtin_entity_parser.py:22-77;
kinds listed at constants.py:66-72). The reference lowercases its input
before parsing (builtin_entity_parser.py:28); we match case-insensitively
on token values instead, so spans refer to the original text.

Datetime resolution is a *pure function of the anchor timestamp* passed by
the caller (the transcript row's ``ts``), never wall-clock — this fixes the
reference's now()-dependence (nlu_engine/nlu_engine.py:403-406) and makes
the whole pipeline deterministic and resumable.

A mention dict: {"value", "start", "end", "entity_kind", "resolved_value"}.
``resolved_value`` follows the reference's typed payloads
(result.py:89-128), e.g. {"kind": "Number", "value": 2.0}.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Callable, Sequence

from ..textcore import Token, tokenize
from .numbers import (_kanji_to_number, _ko_token_value, is_number_word,
                      ordinal_word_to_number, ordinal_words,
                      words_to_number)

BUILTIN_KINDS = (
    "snips/number", "snips/ordinal", "snips/percentage", "snips/temperature",
    "snips/amountOfMoney", "snips/duration", "snips/datetime",
)

# gazetteer-backed builtin entities (ref: builtin_entity_parser.py:52-77
# gazetteer_entity_scope; payload kinds per the snips ontology, e.g.
# {"kind": "MusicArtist", "value": "Daft Punk"})
GAZETTEER_KINDS = {
    "snips/musicArtist": "MusicArtist",
    "snips/musicAlbum": "MusicAlbum",
    "snips/musicTrack": "MusicTrack",
    "snips/city": "City",
    "snips/country": "Country",
    "snips/region": "Region",
}

_EXTRA_GAZETTEER_VALUES: dict = {}


def register_builtin_gazetteer_values(kind: str, language: str,
                                      values) -> None:
    """Extend (or define) the value list of a gazetteer builtin entity —
    the in-process equivalent of the reference's
    ``snips-nlu download-entity`` (cli/download_entity.py)."""
    if kind not in GAZETTEER_KINDS:
        raise ValueError(f"not a gazetteer builtin entity: {kind!r}")
    key = (language, kind)
    _EXTRA_GAZETTEER_VALUES.setdefault(key, [])
    _EXTRA_GAZETTEER_VALUES[key].extend(values)


def _gazetteer_values(language: str, kind: str) -> list[str]:
    from ..resources import BUILTIN_GAZETTEER_VALUES
    base = BUILTIN_GAZETTEER_VALUES.get((language, kind))
    extra = _EXTRA_GAZETTEER_VALUES.get((language, kind), [])
    if base is None and not extra:
        raise ValueError(
            f"Gazetteer entity {kind!r} is not supported in language "
            f"{language!r}")
    return list(base or ()) + list(extra)


def is_builtin_entity(name: str) -> bool:
    """ref: entity_parser/builtin_entity_parser.py:80-83"""
    return name.startswith("snips/")


def is_gazetteer_entity(name: str) -> bool:
    """ref: entity_parser/builtin_entity_parser.py:134-137"""
    return name in GAZETTEER_KINDS


# ---------------------------------------------------------------------------
# number candidates over the token stream
# ---------------------------------------------------------------------------

_DECIMAL_RE = re.compile(r"^\d+(\.\d+)?$")


def _digit_candidates(tokens: Sequence[Token]) -> list[dict]:
    """Digit tokens, merging contiguous ``3 . 5`` into a decimal."""
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if _DECIMAL_RE.match(t.value):
            end_i = i
            value = float(t.value)
            # decimal: "3" "." "5" with contiguous char spans
            if (i + 2 < n and tokens[i + 1].value == "."
                    and tokens[i + 1].start == t.end
                    and _DECIMAL_RE.match(tokens[i + 2].value)
                    and tokens[i + 2].start == tokens[i + 1].end):
                value = float(f"{t.value}.{tokens[i + 2].value}")
                end_i = i + 2
            out.append({"tok_start": i, "tok_end": end_i, "num": value})
            i = end_i + 1
        else:
            i += 1
    return out


# Numeral classifiers/counters and grammar units: a kanji numeral
# fused to one of these is a genuine count (三人, 五個, 二枚, 五万円);
# fused to any OTHER single han char it is part of a content compound
# (千葉県 "Chiba", 百貨店 "department store", 一番 "best") and must not
# become a number mention. Multi-char following tokens are always
# allowed — they are the grammar-merge products (日間, 番目, 月曜日).
_JA_COUNTERS = frozenset(
    "人個回台冊枚本杯匹歳才件名軒階足頭羽点箱皿着曲部組席泊通社話"
    "円度分秒時日月年週")
_HAN_CHAR_RE = re.compile(r"[㐀-鿿豈-﫿々]")

# Korean counters for fused native/sino numeral + counter eojeol
# (세잔 "three cups", 두장 "two tickets", 이십오명 "25 people"):
# closed curated set so content words never false-positive
# (구두 "shoes" is not 9 + 두, 오늘 "today" is not 5 + 늘).
# 번째 is deliberately absent — fused ordinals are _scan_ordinal's.
_KO_COUNTERS = frozenset((
    "개", "명", "잔", "장", "병", "번", "권", "대", "마리", "켤레",
    "살", "시간", "시", "분", "초", "일", "주", "달", "년", "월",
    "원", "그릇", "조각", "봉지", "상자", "컵", "사람",
))


def _ja_compound_blocked(tokens: Sequence[Token], hi: int) -> bool:
    """True when the numeral ending at token ``hi`` is glued to a single
    non-counter han char — a content compound, not a count."""
    if hi + 1 >= len(tokens):
        return False
    nxt = tokens[hi + 1]
    return (nxt.start == tokens[hi].end and len(nxt.value) == 1
            and _HAN_CHAR_RE.match(nxt.value) is not None
            and nxt.value not in _JA_COUNTERS)


def _word_candidates(tokens: Sequence[Token],
                     language: str = "en") -> list[dict]:
    """Maximal runs of number words, trimmed until they parse."""
    glue = {"fr": ("et",), "es": ("y",), "de": (), "it": (), "ja": (),
            "ko": (), "pt": ("e",)}.get(language, ("and", "a", "an"))
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        if is_number_word(tokens[i].value, language):
            j = i
            while j + 1 < n and is_number_word(tokens[j + 1].value,
                                               language):
                j += 1
            # trim glue from the edges until the phrase parses
            lo, hi = i, j
            while lo <= hi:
                phrase = " ".join(t.value.lower()
                                  for t in tokens[lo:hi + 1])
                num = words_to_number(phrase, language)
                if num is not None:
                    if language != "ja" or not _ja_compound_blocked(
                            tokens, hi):
                        out.append({"tok_start": lo, "tok_end": hi,
                                    "num": num})
                    break
                if tokens[hi].value.lower() in glue:
                    hi -= 1
                elif tokens[lo].value.lower() in glue:
                    lo += 1
                else:
                    break
            i = j + 1
        else:
            i += 1
    return out


def _number_candidates(tokens: Sequence[Token],
                       language: str = "en") -> list[dict]:
    cands = _digit_candidates(tokens) + _word_candidates(tokens, language)
    return sorted(cands, key=lambda c: c["tok_start"])


def _mention(text: str, tokens: Sequence[Token], tok_start: int, tok_end: int,
             kind: str, resolved: dict) -> dict:
    start = tokens[tok_start].start
    end = tokens[tok_end].end
    return {"value": text[start:end], "start": start, "end": end,
            "entity_kind": kind, "resolved_value": resolved}


# ---------------------------------------------------------------------------
# per-kind scanners
# ---------------------------------------------------------------------------

def _scan_number(text, tokens, cands, anchor, lang="en"):
    out = [
        _mention(text, tokens, c["tok_start"], c["tok_end"], "snips/number",
                 {"kind": "Number", "value": c["num"]})
        for c in cands
    ]
    if lang == "ko":
        # fused numeral+counter eojeol (세잔, 이십오명): the mention
        # spans the numeral prefix only, mirroring the ja behavior where
        # the numeral script class already separates 三 from 人. Scoped
        # to the number scanner — the shared candidate list (and with it
        # the datetime/duration/money grammars) is unchanged.
        covered = {i for c in cands
                   for i in range(c["tok_start"], c["tok_end"] + 1)}
        for i, t in enumerate(tokens):
            v = t.value
            if i in covered or len(v) < 2 or not ("가" <= v[0] <= "힣"):
                continue
            for slen in (2, 1):
                if len(v) > slen and v[-slen:] in _KO_COUNTERS:
                    num = _ko_token_value(v[:-slen])
                    if num is not None:
                        cut = len(v) - slen
                        out.append({
                            "value": v[:cut], "start": t.start,
                            "end": t.start + cut,
                            "entity_kind": "snips/number",
                            "resolved_value": {"kind": "Number",
                                               "value": num}})
                    break
    return out


_ORDINAL_SUFFIX_RE = {
    "en": re.compile(r"^(\d+)(st|nd|rd|th)$", re.IGNORECASE),
    "fr": re.compile(r"^(\d+)(er|ère|ere|e|ème|eme)$", re.IGNORECASE),
    "es": re.compile(r"^(\d+)(º|ª|o|a)$", re.IGNORECASE),
    # german digit ordinals are "1." and the tokenizer splits the dot —
    # word ordinals only
    "de": re.compile(r"^(\d+)\.$"),
    "it": re.compile(r"^(\d+)(º|°|ª|o|a)$", re.IGNORECASE),
    "pt": re.compile(r"^(\d+)(º|ª|o|a)$", re.IGNORECASE),
    "ja": re.compile(r"$^"),  # ja ordinals are two tokens (3 + 番目)
    "ko": re.compile(r"$^"),  # ko ordinals are two tokens (3 + 번째)
}

# numeral + suffix-token ordinals for the CJK languages
_ORDINAL_SUFFIX_TOKEN = {"ja": "番目", "ko": "번째"}


# ja grammar words that span several per-char han tokens (the CJK
# tokenizer emits han one char per token). Before scanning, adjacent
# single-char tokens are greedily re-merged longest-first against this
# closed lexicon so the table-driven grammar sees whole words
# (明日 / 月曜日 / 午後 / 分間 / 番目 / …). Greedy dictionary matching
# can mis-merge inside unrelated compounds (e.g. 説明日程 contains 明日)
# — a documented heuristic; true segmentation needs a full dictionary.
_JA_GRAMMAR_WORDS = (
    "明後日", "月曜日", "火曜日", "水曜日", "木曜日", "金曜日",
    "土曜日", "日曜日",
    "昨日", "今日", "本日", "明日", "今夜", "正午", "夕方",
    "月曜", "火曜", "水曜", "木曜", "金曜", "土曜", "日曜",
    "来週", "来月", "来年", "午前", "午後", "番目",
    "秒間", "分間", "時間", "日間", "週間", "年間",
    "毎週", "毎月", "毎年", "毎日", "毎朝", "毎晩", "今後", "ヶ月", "か月",
    "月末", "月初", "年末", "年始", "今晩", "今朝",
)
_JA_GRAMMAR_SET = frozenset(_JA_GRAMMAR_WORDS)
_JA_GRAMMAR_MAX = max(len(w) for w in _JA_GRAMMAR_WORDS)


def _ja_grammar_merge(tokens):
    """Merge adjacent single-char tokens into known ja grammar words
    (longest match first); spans stay exact."""
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        merged = None
        for k in range(min(_JA_GRAMMAR_MAX, n - i), 1, -1):
            last = tokens[i + k - 1]
            if last.end - tokens[i].start != sum(
                    len(tokens[i + j].value) for j in range(k)):
                continue  # whitespace/symbol gap — not one word
            joined = "".join(tokens[i + j].value for j in range(k))
            if joined in _JA_GRAMMAR_SET:
                merged = Token(joined, tokens[i].start, last.end)
                i += k
                break
        if merged is None:
            out.append(tokens[i])
            i += 1
        else:
            out.append(merged)
    return tuple(out)


def _tok_int(value: str, lang: str = "ja") -> int | None:
    """Integer value of a digit token or a kanji/hangul numeral token."""
    if value.isdigit():
        return int(value)
    v = _ko_token_value(value) if lang == "ko" else _kanji_to_number(value)
    return int(v) if v is not None and v == int(v) else None


def _scan_ordinal(text, tokens, cands, anchor, lang="en"):
    out = []
    suffix_re = _ORDINAL_SUFFIX_RE[lang]
    words = ordinal_words(lang)
    n = len(tokens)
    if lang in _ORDINAL_SUFFIX_TOKEN:
        # "3番目" / "三番目" / "3번째" / "세 번째" — numeral + suffix token
        suffix = _ORDINAL_SUFFIX_TOKEN[lang]
        for i, t in enumerate(tokens):
            if i + 1 < n and tokens[i + 1].value == suffix:
                v = _tok_int(t.value, lang)
                if v is not None:
                    out.append(_mention(
                        text, tokens, i, i + 1, "snips/ordinal",
                        {"kind": "Ordinal", "value": v}))
            elif (lang == "ko" and len(t.value) > len(suffix)
                    and t.value.endswith(suffix)):
                # fused eojeol ordinal: 세번째 / 이십오번째
                v = _tok_int(t.value[:-len(suffix)], lang)
                if v is not None:
                    out.append(_mention(
                        text, tokens, i, i, "snips/ordinal",
                        {"kind": "Ordinal", "value": v}))
        return out
    for i, t in enumerate(tokens):
        # digit-first gate: every suffix-form ordinal starts with digits
        m = suffix_re.match(t.value) if t.value[:1].isdigit() else None
        if m:
            out.append(_mention(text, tokens, i, i, "snips/ordinal",
                                {"kind": "Ordinal", "value": int(m.group(1))}))
        elif t.value.lower() in words:
            out.append(_mention(
                text, tokens, i, i, "snips/ordinal",
                {"kind": "Ordinal",
                 "value": ordinal_word_to_number(t.value, lang)}))
    return out


_PERCENT_WORDS = {"en": ("%", "percent"), "fr": ("%", "pourcent"),
                  "es": ("%", "porciento"), "de": ("%", "prozent"),
                  "it": ("%", "percento"), "pt": ("%", "porcento"),
                  "ja": ("%", "パーセント"), "ko": ("%", "퍼센트")}


def _scan_percentage(text, tokens, cands, anchor, lang="en"):
    out = []
    n = len(tokens)
    for c in cands:
        nxt = c["tok_end"] + 1
        if nxt < n and tokens[nxt].value.lower() in _PERCENT_WORDS[lang]:
            out.append(_mention(text, tokens, c["tok_start"], nxt,
                                "snips/percentage",
                                {"kind": "Percentage", "value": c["num"]}))
        elif lang in ("fr", "es", "it", "pt") and nxt + 1 < n \
                and tokens[nxt].value.lower() in ("pour", "por", "per") \
                and tokens[nxt + 1].value.lower() in ("cent", "ciento",
                                                      "cento"):
            out.append(_mention(text, tokens, c["tok_start"], nxt + 1,
                                "snips/percentage",
                                {"kind": "Percentage", "value": c["num"]}))
    return out


_TEMP_UNITS = {"celsius": "celsius", "c": "celsius",
               "fahrenheit": "fahrenheit", "f": "fahrenheit"}


_DEGREE_WORDS = {"en": ("degree", "degrees", "°"),
                 "fr": ("degré", "degrés", "degre", "degres", "°"),
                 "es": ("grado", "grados", "°"),
                 "de": ("grad", "°"),
                 "it": ("grado", "gradi", "°"),
                 "pt": ("grau", "graus", "°"),
                 "ja": ("度", "°"), "ko": ("도", "°")}


def _scan_temperature(text, tokens, cands, anchor, lang="en"):
    out = []
    n = len(tokens)
    for c in cands:
        nxt = c["tok_end"] + 1
        if nxt >= n:
            continue
        w = tokens[nxt].value.lower()
        if w in _DEGREE_WORDS[lang]:
            end = nxt
            unit = None
            if nxt + 1 < n and tokens[nxt + 1].value.lower() in _TEMP_UNITS:
                end = nxt + 1
                unit = _TEMP_UNITS[tokens[nxt + 1].value.lower()]
            out.append(_mention(
                text, tokens, c["tok_start"], end, "snips/temperature",
                {"kind": "Temperature", "value": c["num"], "unit": unit}))
    return out


_CURRENCY_SYMBOLS = {"$": "$", "€": "EUR", "£": "GBP"}
_CURRENCY_WORDS = {"dollar": "$", "dollars": "$", "buck": "$", "bucks": "$",
                   "euro": "EUR", "euros": "EUR",
                   "pound": "GBP", "pounds": "GBP",
                   "dólares": "$", "dolares": "$", "dólar": "$",
                   "dolar": "$", "pesos": "MXN", "peso": "MXN",
                   "円": "JPY", "ドル": "$", "ユーロ": "EUR",
                   "원": "KRW", "달러": "$", "유로": "EUR"}


def _scan_money(text, tokens, cands, anchor, lang="en"):
    out = []
    n = len(tokens)
    for c in cands:
        prev, nxt = c["tok_start"] - 1, c["tok_end"] + 1
        if prev >= 0 and tokens[prev].value in _CURRENCY_SYMBOLS:
            out.append(_mention(
                text, tokens, prev, c["tok_end"], "snips/amountOfMoney",
                {"kind": "AmountOfMoney", "value": c["num"],
                 "precision": "Exact",
                 "unit": _CURRENCY_SYMBOLS[tokens[prev].value]}))
        elif nxt < n and tokens[nxt].value.lower() in _CURRENCY_WORDS:
            out.append(_mention(
                text, tokens, c["tok_start"], nxt, "snips/amountOfMoney",
                {"kind": "AmountOfMoney", "value": c["num"],
                 "precision": "Exact",
                 "unit": _CURRENCY_WORDS[tokens[nxt].value.lower()]}))
    return out


_DURATION_UNITS = {
    "en": {
        "second": "seconds", "seconds": "seconds", "sec": "seconds",
        "minute": "minutes", "minutes": "minutes", "min": "minutes",
        "hour": "hours", "hours": "hours",
        "day": "days", "days": "days",
        "week": "weeks", "weeks": "weeks",
        "month": "months", "months": "months",
        "year": "years", "years": "years",
    },
    "fr": {
        "seconde": "seconds", "secondes": "seconds", "sec": "seconds",
        "minute": "minutes", "minutes": "minutes", "min": "minutes",
        "heure": "hours", "heures": "hours",
        "jour": "days", "jours": "days", "journée": "days",
        "semaine": "weeks", "semaines": "weeks",
        "mois": "months",
        "an": "years", "ans": "years", "année": "years", "années": "years",
    },
    "es": {
        "segundo": "seconds", "segundos": "seconds", "seg": "seconds",
        "minuto": "minutes", "minutos": "minutes", "min": "minutes",
        "hora": "hours", "horas": "hours",
        "día": "days", "días": "days", "dia": "days", "dias": "days",
        "semana": "weeks", "semanas": "weeks",
        "mes": "months", "meses": "months",
        "año": "years", "años": "years", "ano": "years", "anos": "years",
    },
    "pt": {
        "segundo": "seconds", "segundos": "seconds", "seg": "seconds",
        "minuto": "minutes", "minutos": "minutes", "min": "minutes",
        "hora": "hours", "horas": "hours",
        "dia": "days", "dias": "days",
        "semana": "weeks", "semanas": "weeks",
        "mês": "months", "mes": "months", "meses": "months",
        "ano": "years", "anos": "years",
    },
    "it": {
        "secondo": "seconds", "secondi": "seconds", "sec": "seconds",
        "minuto": "minutes", "minuti": "minutes", "min": "minutes",
        "ora": "hours", "ore": "hours",
        "giorno": "days", "giorni": "days",
        "settimana": "weeks", "settimane": "weeks",
        "mese": "months", "mesi": "months",
        "anno": "years", "anni": "years",
    },
    "de": {
        "sekunde": "seconds", "sekunden": "seconds", "sek": "seconds",
        "minute": "minutes", "minuten": "minutes", "min": "minutes",
        "stunde": "hours", "stunden": "hours",
        "tag": "days", "tage": "days", "tagen": "days",
        "woche": "weeks", "wochen": "weeks",
        "monat": "months", "monate": "months", "monaten": "months",
        "jahr": "years", "jahre": "years", "jahren": "years",
    },
    # ja durations use 間-suffixed counter tokens (the CJK script-run
    # tokenizer keeps "分間"/"時間" whole); bare "分" is excluded so
    # clock minutes ("8時30分") don't double as durations
    "ja": {
        "秒": "seconds", "秒間": "seconds",
        "分間": "minutes",
        "時間": "hours",
        "日間": "days",
        "週間": "weeks",
        "年間": "years",
    },
    # ko durations use 간-suffixed counters; bare 분 is excluded so
    # clock minutes ("8시 30분") don't double as durations
    "ko": {
        "초": "seconds",
        "분간": "minutes",
        "시간": "hours",
        "일간": "days",
        "주간": "weeks", "주일": "weeks",
        "년간": "years",
    },
}


def _duration_payload(field: str, value: float) -> dict:
    payload = {"kind": "Duration", "years": 0, "quarters": 0, "months": 0,
               "weeks": 0, "days": 0, "hours": 0, "minutes": 0, "seconds": 0,
               "precision": "Exact"}
    payload[field] = int(value) if float(value).is_integer() else value
    return payload


def _scan_duration(text, tokens, cands, anchor, lang="en"):
    out = []
    n = len(tokens)
    units = _DURATION_UNITS[lang]
    for c in cands:
        nxt = c["tok_end"] + 1
        if nxt >= n:
            continue
        if tokens[nxt].value.lower() in units:
            field = units[tokens[nxt].value.lower()]
            out.append(_mention(text, tokens, c["tok_start"], nxt,
                                "snips/duration",
                                _duration_payload(field, c["num"])))
    return out


# --- datetime -------------------------------------------------------------

# per-language datetime word tables (the reference delegates these to its
# per-language Rust grammars; fr surface forms follow the same shapes)
_DT = {
    "en": {
        "weekdays": {"monday": 0, "tuesday": 1, "wednesday": 2,
                     "thursday": 3, "friday": 4, "saturday": 5,
                     "sunday": 6},
        "months": {"january": 1, "february": 2, "march": 3, "april": 4,
                   "may": 5, "june": 6, "july": 7, "august": 8,
                   "september": 9, "october": 10, "november": 11,
                   "december": 12},
        "dayparts": {"morning": 8, "noon": 12, "afternoon": 15,
                     "evening": 19, "night": 21},
        "rel_days": {"yesterday": -1, "today": 0, "tomorrow": 1},
        "tonight": "tonight",
        "at_words": ("at", "in"),
        "the_words": ("the",),
        "day_prefix": ("on", "next", "this"),
        "next_word": "next",
        "periods": ("week", "month", "year"),
        "period_map": {"week": "week", "month": "month", "year": "year"},
        "weekday_suffix": (),
        "range_open": {"from": ("to", "until", "till"),
                       "between": ("and",)},
        # open "until X" intervals (duckling: [reference time, X])
        "until_words": ("until", "till", "by"),
        "until_link": (),
        # open "from X" intervals (lower bound only)
        "from_words": ("from", "starting", "after", "since"),
        "from_link": (),
        # "in [the next] N day(s)/week(s)/..." and "every <weekday|unit>"
        "rel_range_open": ("in", "within"),
        "rel_units": {"day": "day", "days": "day", "week": "week",
                      "weeks": "week", "month": "month",
                      "months": "month", "year": "year", "years": "year"},
        "every_words": ("every", "each"),
        # fixed-date holidays: first token -> {continuation -> (m, d)}
        "holidays": {"christmas": {("eve",): (12, 24), (): (12, 25)},
                     "halloween": {(): (10, 31)},
                     # movable feasts: ("E", offset) = easter + offset
                     "easter": {("monday",): ("E", 1),
                                ("sunday",): ("E", 0), (): ("E", 0)},
                     "good": {("friday",): ("E", -2)},
                     "palm": {("sunday",): ("E", -7)},
                     "ash": {("wednesday",): ("E", -46)},
                     "mardi": {("gras",): ("E", -47)},
                     "pentecost": {(): ("E", 49)},
                     "whitsun": {(): ("E", 49)},
                     "ascension": {("day",): ("E", 39), (): ("E", 39)}},
        "this_words": ("this",),
        "boundary_words": {"beginning": "begin", "start": "begin",
                           "end": "end", "middle": "mid"},
        "of_words": ("of",),
        "last_words": ("last",),
    },
    # ja: no-whitespace script — the CJK script-run tokenizer (textcore)
    # isolates the day words, particles (の/から/まで), digit runs, and
    # the 時/分 clock suffixes this grammar keys on. Ranges are
    # POSTfix-marked (XからYまで) and handled by a ja-specific pass in
    # _scan_datetime; "range_open" stays empty.
    "ja": {
        "weekdays": {"月曜日": 0, "月曜": 0, "火曜日": 1, "火曜": 1,
                     "水曜日": 2, "水曜": 2, "木曜日": 3, "木曜": 3,
                     "金曜日": 4, "金曜": 4, "土曜日": 5, "土曜": 5,
                     "日曜日": 6, "日曜": 6},
        "months": {},  # numeric "5月3日" handled in _parse_month_day
        "dayparts": {"朝": 8, "正午": 12, "昼": 12, "夕方": 19,
                     "晩": 19, "夜": 21},
        "rel_days": {"昨日": -1, "今日": 0, "本日": 0, "明日": 1,
                     "明後日": 2},
        "tonight": "今夜",
        "at_words": ("の",),
        "the_words": (),
        "day_prefix": (),
        "next_word": None,
        "periods": (),
        "period_map": {},
        "period_words": {"来週": "week", "来月": "month", "来年": "year"},
        "weekday_suffix": (),
        "range_open": {},
        "range_post": ("から", "まで"),
        "every_prefix": {"毎週": "week", "毎月": "month",
                         "毎年": "year", "毎日": "day"},
        "every_dayparts": {"毎朝": 8, "毎晩": 21},
        "rel_units_post": {"日": "day", "週間": "week", "ヶ月": "month",
                           "か月": "month", "年": "year"},
        "later_words": ("後",),
        "ahead_words": ("今後",),
        "holidays": {"クリスマス": {(): (12, 25)},
                     "イースター": {(): ("E", 0)},
                     # han runs tokenize per-character (no dictionary):
                     # 復活祭 arrives as 復+活+祭
                     "復": {("活", "祭"): ("E", 0)}},
        "daypart_single": {"今晩": (0, 21), "今朝": (0, 8)},
        "boundary_single": {"月末": ("month", "end"),
                            "月初": ("month", "begin"),
                            "年末": ("year", "end"),
                            "年始": ("year", "begin")},
    },
    # ko: hangul spaces between eojeol + the tokenizer's particle split
    # (textcore._split_hangul_particle) expose the grammar words; ranges
    # are postfix-marked (X부터 Y까지) like ja.
    "ko": {
        "weekdays": {"월요일": 0, "화요일": 1, "수요일": 2, "목요일": 3,
                     "금요일": 4, "토요일": 5, "일요일": 6},
        "months": {},  # numeric "5월 3일" handled in _parse_month_day
        "dayparts": {"아침": 8, "정오": 12, "낮": 12, "저녁": 19,
                     "밤": 21, "새벽": 4},
        "rel_days": {"그저께": -2, "어제": -1, "오늘": 0, "내일": 1,
                     "모레": 2},
        "tonight": "오늘밤",
        "at_words": ("의",),
        "the_words": (),
        "day_prefix": (),
        "next_word": "다음",
        "periods": ("주", "달", "년", "해"),
        "period_map": {"주": "week", "달": "month", "년": "year",
                       "해": "year"},
        "period_words": {"다음주": "week"},
        "weekday_suffix": (),
        "range_open": {},
        "range_post": ("부터", "까지"),
        "every_prefix": {"매주": "week", "매월": "month",
                         "매달": "month", "매년": "year", "매일": "day"},
        "rel_units_post": {"일": "day", "주": "week", "개월": "month",
                           "달": "month", "년": "year"},
        "later_words": ("후", "뒤"),
        "ahead_words": ("앞으로",),
        "holidays": {"크리스마스": {(): (12, 25)},
                     "부활절": {(): ("E", 0)}},
        "boundary_single": {"월말": ("month", "end"),
                            "월초": ("month", "begin"),
                            "연말": ("year", "end"),
                            "연초": ("year", "begin")},
    },
    "pt": {
        "weekdays": {"segunda-feira": 0, "segunda": 0, "terça": 1,
                     "terca": 1, "quarta": 2, "quinta": 3, "sexta": 4,
                     "sábado": 5, "sabado": 5, "domingo": 6},
        "months": {"janeiro": 1, "fevereiro": 2, "março": 3, "marco": 3,
                   "abril": 4, "maio": 5, "junho": 6, "julho": 7,
                   "agosto": 8, "setembro": 9, "outubro": 10,
                   "novembro": 11, "dezembro": 12},
        "dayparts": {"manhã": 8, "manha": 8, "meio-dia": 12, "tarde": 15,
                     "noite": 21, "madrugada": 4},
        "rel_days": {"ontem": -1, "hoje": 0, "amanhã": 1, "amanha": 1},
        "tonight": None,
        "at_words": ("às", "as", "a", "pelas"),
        "the_words": ("o", "a", "as"),
        "day_prefix": ("na", "no", "esta", "este"),
        "next_word": None,
        "periods": (),
        "period_map": {},
        "weekday_suffix": ("que",),
        "range_open": {"de": ("a", "até", "ate"), "entre": ("e",)},
        "until_words": ("até", "ate"),
        "until_link": ("o", "a", "às", "as"),
        "from_words": ("desde", "partir"),
        "from_link": ("de", "do", "da"),
        "from_pre": "a",
        "rel_range_open": ("em", "dentro", "nas", "nos"),
        "rel_units": {"dia": "day", "dias": "day", "semana": "week",
                      "semanas": "week", "mês": "month", "mes": "month",
                      "meses": "month", "ano": "year", "anos": "year"},
        "next_adjs": ("próximo", "proximo", "próxima", "proxima",
                      "próximos", "proximos", "próximas", "proximas"),
        "every_words": ("cada", "todo", "toda"),
        "holidays": {"natal": {(): (12, 25)},
                     "páscoa": {(): ("E", 0)}, "pascoa": {(): ("E", 0)},
                     "sexta": {("feira", "santa"): ("E", -2)},
                     "pentecostes": {(): ("E", 49)},
                     "carnaval": {(): ("E", -47)}},
        "this_words": ("esta", "este"),
        "boundary_words": {"início": "begin", "inicio": "begin",
                           "começo": "begin", "comeco": "begin",
                           "fim": "end", "final": "end",
                           "meados": "mid"},
        "of_words": ("do", "da", "de"),
        "last_words": ("último", "ultimo", "última", "ultima"),
    },
    "it": {
        "weekdays": {"lunedì": 0, "lunedi": 0, "martedì": 1, "martedi": 1,
                     "mercoledì": 2, "mercoledi": 2, "giovedì": 3,
                     "giovedi": 3, "venerdì": 4, "venerdi": 4,
                     "sabato": 5, "domenica": 6},
        "months": {"gennaio": 1, "febbraio": 2, "marzo": 3, "aprile": 4,
                   "maggio": 5, "giugno": 6, "luglio": 7, "agosto": 8,
                   "settembre": 9, "ottobre": 10, "novembre": 11,
                   "dicembre": 12},
        "dayparts": {"mattina": 8, "mezzogiorno": 12, "pomeriggio": 15,
                     "sera": 19, "notte": 21},
        "rel_days": {"ieri": -1, "oggi": 0, "domani": 1},
        "tonight": "stasera",
        "at_words": ("alle", "a", "verso"),
        "the_words": ("le", "l"),
        "day_prefix": ("il", "questo"),
        "next_word": None,
        "periods": (),
        "period_map": {},
        "weekday_suffix": ("prossimo", "prossima"),
        "range_open": {"da": ("a", "al"), "dal": ("al",), "tra": ("e",),
                       "fra": ("e",)},
        "until_words": ("fino",),
        "until_link": ("a", "al", "alle", "all"),
        # "da"/"dal" double as the two-sided range heads — the earlier
        # pass consumes "da X a Y"; a leftover lone "da domani" is the
        # open lower bound
        "from_words": ("da", "dal"),
        "from_link": (),
        "rel_range_open": ("entro", "nelle", "nei", "in"),
        "rel_units": {"giorno": "day", "giorni": "day",
                      "settimana": "week", "settimane": "week",
                      "mese": "month", "mesi": "month",
                      "anno": "year", "anni": "year"},
        "next_adjs": ("prossimo", "prossima", "prossimi", "prossime"),
        "every_words": ("ogni",),
        "holidays": {"natale": {(): (12, 25)},
                     "capodanno": {(): (1, 1)},
                     "pasqua": {(): ("E", 0)},
                     "pasquetta": {(): ("E", 1)},
                     "venerdì": {("santo",): ("E", -2)},
                     "venerdi": {("santo",): ("E", -2)},
                     "pentecoste": {(): ("E", 49)},
                     "ascensione": {(): ("E", 39)}},
        "this_words": ("questa", "questo"),
        "daypart_single": {"stamattina": (0, 8), "stanotte": (0, 21)},
        "boundary_words": {"inizio": "begin", "fine": "end",
                           "metà": "mid", "meta": "mid"},
        "of_words": ("del", "della", "dell", "di"),
        "last_words": ("ultimo", "ultima"),
        "range_articles": ("il", "lo", "la", "le", "l", "i", "gli"),
    },
    "de": {
        "weekdays": {"montag": 0, "dienstag": 1, "mittwoch": 2,
                     "donnerstag": 3, "freitag": 4, "samstag": 5,
                     "sonnabend": 5, "sonntag": 6},
        "months": {"januar": 1, "februar": 2, "märz": 3, "maerz": 3,
                   "april": 4, "mai": 5, "juni": 6, "juli": 7,
                   "august": 8, "september": 9, "oktober": 10,
                   "november": 11, "dezember": 12},
        "dayparts": {"vormittag": 9, "mittag": 12, "nachmittag": 15,
                     "abend": 19, "nacht": 21},
        "rel_days": {"gestern": -1, "heute": 0, "morgen": 1},
        "tonight": None,
        "at_words": ("um", "am", "gegen"),
        "the_words": (),
        "day_prefix": ("am", "nächsten", "naechsten", "diesen"),
        "next_word": None,
        "periods": (),
        "period_map": {},
        "weekday_suffix": (),
        "range_open": {"von": ("bis",), "zwischen": ("und",)},
        "until_words": ("bis",),
        "until_link": ("zum", "zur"),
        "from_words": ("ab", "seit"),
        "from_link": ("dem",),
        "rel_range_open": ("in", "innerhalb", "binnen"),
        "range_articles": ("den", "der", "die", "das"),
        "rel_units": {"tag": "day", "tage": "day", "tagen": "day",
                      "woche": "week", "wochen": "week",
                      "monat": "month", "monate": "month",
                      "monaten": "month", "jahr": "year", "jahre": "year",
                      "jahren": "year"},
        "next_adjs": ("nächste", "naechste", "nächsten", "naechsten",
                      "nächstes", "naechstes"),
        "every_words": ("jeden", "jede", "jedes"),
        "holidays": {"weihnachten": {(): (12, 25)},
                     "heiligabend": {(): (12, 24)},
                     "silvester": {(): (12, 31)},
                     "ostern": {(): ("E", 0)},
                     "ostersonntag": {(): ("E", 0)},
                     "ostermontag": {(): ("E", 1)},
                     "karfreitag": {(): ("E", -2)},
                     "rosenmontag": {(): ("E", -48)},
                     "pfingsten": {(): ("E", 49)},
                     "christi": {("himmelfahrt",): ("E", 39)}},
        # "heute abend" already resolves via the rel_days branch + the
        # daypart tail; this_words only needs the demonstrative forms
        "this_words": ("diesen", "diese", "dieses"),
        "boundary_words": {"anfang": "begin", "ende": "end",
                           "mitte": "mid"},
        "of_words": ("des", "der", "vom", "im"),
        "last_words": ("letzte", "letzter", "letzten"),
        "period_gen": {"monats": "month", "jahres": "year"},
    },
    "es": {
        "weekdays": {"lunes": 0, "martes": 1, "miércoles": 2,
                     "miercoles": 2, "jueves": 3, "viernes": 4,
                     "sábado": 5, "sabado": 5, "domingo": 6},
        "months": {"enero": 1, "febrero": 2, "marzo": 3, "abril": 4,
                   "mayo": 5, "junio": 6, "julio": 7, "agosto": 8,
                   "septiembre": 9, "octubre": 10, "noviembre": 11,
                   "diciembre": 12},
        "dayparts": {"mediodía": 12, "mediodia": 12, "tarde": 15,
                     "noche": 21, "madrugada": 4},
        "rel_days": {"ayer": -1, "hoy": 0, "mañana": 1, "manana": 1},
        "tonight": None,
        "at_words": ("a", "por", "en"),
        "the_words": ("la", "las", "el"),
        "day_prefix": ("el", "este"),
        "next_word": None,
        "periods": (),
        "period_map": {},
        "weekday_suffix": ("próximo", "proximo", "próxima", "proxima"),
        "range_open": {"de": ("a", "al"), "del": ("al",),
                       "entre": ("y",)},
        "until_words": ("hasta",),
        "until_link": ("el", "la", "las"),
        "from_words": ("desde", "partir"),
        "from_link": ("de", "del", "el"),
        "from_pre": "a",
        "rel_range_open": ("en", "dentro"),
        "range_articles": ("la", "las", "los", "el"),
        "rel_units": {"día": "day", "dia": "day", "días": "day",
                      "dias": "day", "semana": "week", "semanas": "week",
                      "mes": "month", "meses": "month",
                      "año": "year", "ano": "year", "años": "year",
                      "anos": "year"},
        "next_adjs": ("próximo", "proximo", "próxima", "proxima",
                      "próximos", "proximos", "próximas", "proximas"),
        "every_words": ("cada",),
        "holidays": {"navidad": {(): (12, 25)},
                     "nochebuena": {(): (12, 24)},
                     "nochevieja": {(): (12, 31)},
                     "pascua": {(): ("E", 0)},
                     "viernes": {("santo",): ("E", -2)},
                     "pentecostés": {(): ("E", 49)},
                     "pentecostes": {(): ("E", 49)},
                     "carnaval": {(): ("E", -47)}},
        "this_words": ("esta", "este"),
        # "fin de semana" (weekend) resolves via the end-of-week rule to
        # that week's sunday — the closest Day-grain approximation
        "boundary_words": {"principios": "begin", "principio": "begin",
                           "comienzos": "begin", "comienzo": "begin",
                           "fin": "end", "finales": "end",
                           "mediados": "mid"},
        "of_words": ("del", "de"),
        "last_words": ("último", "ultimo", "última", "ultima"),
    },
    "fr": {
        "weekdays": {"lundi": 0, "mardi": 1, "mercredi": 2, "jeudi": 3,
                     "vendredi": 4, "samedi": 5, "dimanche": 6},
        "months": {"janvier": 1, "février": 2, "fevrier": 2, "mars": 3,
                   "avril": 4, "mai": 5, "juin": 6, "juillet": 7,
                   "août": 8, "aout": 8, "septembre": 9, "octobre": 10,
                   "novembre": 11, "décembre": 12, "decembre": 12},
        "dayparts": {"matin": 8, "midi": 12, "soir": 19, "nuit": 21},
        "rel_days": {"hier": -1, "demain": 1},
        "tonight": None,
        "at_words": ("à", "a", "vers"),
        "the_words": ("le", "la"),
        "day_prefix": ("le", "ce"),
        "next_word": None,
        "periods": (),
        "period_map": {},
        "weekday_suffix": ("prochain", "prochaine"),
        "range_open": {"de": ("à", "a", "au"), "du": ("au",),
                       "entre": ("et",)},
        # "jusqu'à" tokenizes at the apostrophe: "jusqu" + "'" + "à"
        "until_words": ("jusqu",),
        "until_link": ("'", "à", "au", "a"),
        "from_words": ("dès", "partir", "depuis"),
        "from_link": ("de", "du", "d", "'"),
        "from_pre": "à",
        "rel_range_open": ("dans", "d"),
        "range_articles": ("les", "la", "le", "l"),
        "rel_units": {"jour": "day", "jours": "day", "semaine": "week",
                      "semaines": "week", "mois": "month",
                      "an": "year", "ans": "year", "année": "year",
                      "annee": "year", "années": "year",
                      "annees": "year"},
        "next_adjs": ("prochain", "prochaine", "prochains",
                      "prochaines"),
        "every_words": ("chaque",),
        "holidays": {"noël": {(): (12, 25)}, "noel": {(): (12, 25)},
                     "halloween": {(): (10, 31)},
                     "pâques": {(): ("E", 0)}, "paques": {(): ("E", 0)},
                     "lundi": {("de", "pâques"): ("E", 1),
                               ("de", "paques"): ("E", 1)},
                     "vendredi": {("saint",): ("E", -2)},
                     "mardi": {("gras",): ("E", -47)},
                     "pentecôte": {(): ("E", 49)},
                     "pentecote": {(): ("E", 49)},
                     "ascension": {(): ("E", 39)}},
        "this_words": ("ce", "cette"),
        "boundary_words": {"début": "begin", "debut": "begin",
                           "fin": "end", "milieu": "mid"},
        "of_words": ("du", "de", "d"),
        "last_words": ("dernier", "dernière", "derniere"),
    },
}

_TIME_RE = re.compile(r"^(\d{1,2})(?::(\d{2}))?$")
_CLOCK_AMPM_RE = re.compile(r"^(\d{1,2})(am|pm)$")
# dotted meridiem: "10p.m." / "10a.m." arrive as ONE token (textcore
# tokenizer keeps the abbreviation whole, trailing dot included)
_CLOCK_AMPM_DOT_RE = re.compile(r"^(\d{1,2})([ap])\.m\.?$")
_MERIDIEM_TOKENS = {"am": "am", "pm": "pm", "a.m.": "am", "p.m.": "pm",
                    "a.m": "am", "p.m": "pm"}
_CLOCK_FR_RE = re.compile(r"^(\d{1,2})h([0-5]\d)?$")
_CLOCK_MM_RE = re.compile(r"^([0-5]\d)(am|pm)?$")


def _fmt_instant(d: _dt.datetime, grain: str) -> dict:
    return {"kind": "InstantTime",
            "value": d.strftime("%Y-%m-%d %H:%M:%S"),
            "grain": grain, "precision": "Exact"}


def _fmt_interval_open(start: _dt.datetime) -> dict:
    """Lower-bound-only interval ("from X", "ab morgen", 明日から) —
    the snips ontology's TimeInterval carries an optional side; the
    open end serializes as null."""
    return {"kind": "TimeInterval",
            "from": start.strftime("%Y-%m-%d %H:%M:%S"),
            "to": None}


def _fmt_interval(start: _dt.datetime, end: _dt.datetime) -> dict:
    return {"kind": "TimeInterval",
            "from": start.strftime("%Y-%m-%d %H:%M:%S"),
            "to": end.strftime("%Y-%m-%d %H:%M:%S")}


def _parse_iso_date(tokens, i, n):
    """``2024-06-03`` (the tokenizer splits on '-': five tokens) →
    (datetime, last_idx) or None."""
    if i + 4 >= n:
        return None
    y = tokens[i].value
    # cheap gate first: the scanner probes this at nearly every token
    # position, and almost all of them can't start a date
    if len(y) != 4 or not y.isdigit():
        return None
    d1, mo, d2, dd = (tokens[i + 1].value, tokens[i + 2].value,
                      tokens[i + 3].value, tokens[i + 4].value)
    if not (d1 == "-" and len(mo) == 2 and mo.isdigit()
            and d2 == "-" and len(dd) == 2 and dd.isdigit()):
        return None
    try:
        return _dt.datetime(int(y), int(mo), int(dd)), i + 4
    except ValueError:
        return None


def _parse_month_day(tokens, i, n, base_date, lang="en"):
    """``june 3`` / ``june 3rd`` / ``3 juin`` / ``3 de junio`` →
    (datetime, last_idx) or None; a past date rolls to next year."""
    months = _DT[lang]["months"]
    w = tokens[i].value.lower()
    month = day_num = None
    last = i + 1
    if w in months and i + 1 < n:
        # english order: month day
        month = months[w]
        m = _ORDINAL_SUFFIX_RE[lang].match(tokens[i + 1].value)
        if m:
            day_num = int(m.group(1))
        elif tokens[i + 1].value.isdigit():
            day_num = int(tokens[i + 1].value)
    elif lang in ("ja", "ko"):
        # "5月3日" / "五月三日" / "5월 3일" — numeral 月/월 numeral 日/일
        m_mark, d_mark = ("月", "日") if lang == "ja" else ("월", "일")
        if (i + 3 < n and tokens[i + 1].value == m_mark
                and tokens[i + 3].value == d_mark):
            mv = _tok_int(tokens[i].value, lang)
            dv = _tok_int(tokens[i + 2].value, lang)
            if mv is not None and dv is not None and 1 <= mv <= 12:
                month, day_num = mv, dv
                last = i + 3
    elif lang in ("fr", "es", "it", "pt"):
        # day-first order: "3 juin" / "1er juin" / "3 de junio" /
        # "3 giugno" / "3 de junho"
        j = i + 1
        if lang in ("es", "pt") and j < n \
                and tokens[j].value.lower() == "de":
            j += 1
        if j < n and tokens[j].value.lower() in months:
            m = _ORDINAL_SUFFIX_RE[lang].match(tokens[i].value)
            if m:
                day_num = int(m.group(1))
            elif tokens[i].value.isdigit():
                day_num = int(tokens[i].value)
            month = months[tokens[j].value.lower()]
            last = j
    if month is None or not day_num or not 1 <= day_num <= 31:
        return None
    try:
        day = base_date.replace(month=month, day=day_num)
    except ValueError:
        return None
    if day < base_date:
        day = day.replace(year=day.year + 1)
    return day, last


def _add_units(base_date, unit, n):
    """``base_date`` + n day/week/month/year, clamping the day-of-month
    (jan 31 + 1 month → feb 28/29). Returns None when the result falls
    outside datetime's representable range ("in 99999999 days" is not a
    date — callers drop the match)."""
    try:
        if unit == "day":
            return base_date + _dt.timedelta(days=n)
        if unit == "week":
            return base_date + _dt.timedelta(weeks=n)
        if unit == "month":
            m0 = base_date.month - 1 + n
            year = base_date.year + m0 // 12
            month = m0 % 12 + 1
            day = min(base_date.day, _month_len(year, month))
            return base_date.replace(year=year, month=month, day=day)
        try:
            return base_date.replace(year=base_date.year + n)
        except ValueError:  # feb 29 → feb 28
            return base_date.replace(year=base_date.year + n, day=28)
    except (OverflowError, ValueError):
        return None


def _month_len(year: int, month: int) -> int:
    import calendar
    return calendar.monthrange(year, month)[1]


def _next_period(base_date, unit):
    """Start of the next week/month/year relative to ``base_date`` →
    (datetime, grain)."""
    if unit == "week":
        return (base_date
                + _dt.timedelta(days=7 - base_date.weekday()), "Week")
    if unit == "month":
        month = base_date.month % 12 + 1
        year = base_date.year + (1 if month == 1 else 0)
        return base_date.replace(year=year, month=month, day=1), "Month"
    return (base_date.replace(year=base_date.year + 1, month=1, day=1),
            "Year")


_DT_TRIGGERS: dict[str, frozenset] = {}

# table fields whose words can be a REQUIRED component of a datetime
# match (every grammar rule needs at least one trigger word, one
# digit-initial token, or one number candidate — prepositions/articles/
# prefixes like at_words/the_words/day_prefix only ever attach to one of
# those). Keeping this list in sync with new _scan_datetime branches is
# required for correctness of the trigger gate; the per-language golden
# tests sweep every tabled shape and would catch a missed family.
_TRIGGER_DICT_FIELDS = ("weekdays", "months", "dayparts", "rel_days",
                        "every_dayparts",
                        "every_prefix", "period_words", "holidays",
                        "daypart_single", "boundary_single",
                        "boundary_words")
_TRIGGER_TUPLE_FIELDS = ("every_words", "ahead_words", "next_adjs",
                         "periods")
_TRIGGER_SCALAR_FIELDS = ("tonight", "next_word")


def _dt_triggers(lang: str) -> frozenset:
    trig = _DT_TRIGGERS.get(lang)
    if trig is None:
        tables = _DT[lang]
        words: set[str] = set()
        for f in _TRIGGER_DICT_FIELDS:
            words.update(tables.get(f, ()))
        for f in _TRIGGER_TUPLE_FIELDS:
            words.update(tables.get(f, ()))
        for f in _TRIGGER_SCALAR_FIELDS:
            w = tables.get(f)
            if w:
                words.add(w)
        trig = _DT_TRIGGERS[lang] = frozenset(words)
    return trig


def _period_boundary(base_date, unit, nxt, which):
    """The begin/mid/end day of the current (or next) week/month/year —
    "beginning of next month", "fin du mois", "anfang nächsten monats",
    月末. Weeks start Monday; end = last day of the period; mid = the
    conventional midpoint (thursday / 15th / july 1). Returns None when
    the boundary falls outside datetime's range (extreme anchors)."""
    try:
        return _period_boundary_unguarded(base_date, unit, nxt, which)
    except (OverflowError, ValueError):
        return None


def _period_boundary_unguarded(base_date, unit, nxt, which):
    if unit == "week":
        start = base_date - _dt.timedelta(days=base_date.weekday())
        if nxt:
            start += _dt.timedelta(days=7)
        end = start + _dt.timedelta(days=6)
        mid = start + _dt.timedelta(days=3)
    elif unit == "month":
        start = base_date.replace(day=1)
        if nxt:
            start = (start + _dt.timedelta(days=32)).replace(day=1)
        end = (start + _dt.timedelta(days=32)).replace(day=1) \
            - _dt.timedelta(days=1)
        mid = start.replace(day=15)
    elif unit == "year":
        start = base_date.replace(month=1, day=1)
        if nxt:
            start = start.replace(year=start.year + 1)
        end = start.replace(month=12, day=31)
        mid = start.replace(month=7, day=1)
    else:
        return None
    return {"begin": start, "end": end, "mid": mid}[which]


def _next_holiday(base_date, month, day):
    """Next occurrence of a fixed-date holiday (today counts); None when
    the anchor sits at datetime's edge (year 9999 december)."""
    try:
        this_year = base_date.replace(month=month, day=day)
        if this_year >= base_date:
            return this_year
        return this_year.replace(year=this_year.year + 1)
    except (OverflowError, ValueError):
        return None


def _easter(year):
    """Gregorian Easter Sunday (anonymous computus — public-domain
    algorithm; the reference's Rustling grammar resolves movable feasts
    the same way)."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    ell = (32 + 2 * e + 2 * i - h - k) % 7
    m = (a + 11 * h + 22 * ell) // 451
    month = (h + ell - 7 * m + 114) // 31
    day = (h + ell - 7 * m + 114) % 31 + 1
    return month, day


def _next_movable(base_date, offset_days):
    """Next occurrence (today counts) of easter+offset — good friday is
    offset -2, pentecost +49, mardi gras -47, etc."""
    try:
        for year in (base_date.year, base_date.year + 1):
            m, d = _easter(year)
            day = (base_date.replace(year=year, month=m, day=d)
                   + _dt.timedelta(days=offset_days))
            if day >= base_date:
                return day
    except (OverflowError, ValueError):
        pass
    return None


def _match_holiday(tables, lows, i, n):
    """Longest-continuation holiday match at token i. Returns
    (value, tok_end) where value is a fixed (month, day) pair or a
    movable ("E", offset_from_easter) marker, or None. Probed BEFORE
    the weekday branch: multi-token feasts like "good friday" /
    "vendredi saint" / "viernes santo" embed weekday words that would
    otherwise win and split the mention."""
    conts = tables.get("holidays", {}).get(lows[i])
    if conts is None:
        return None
    for cont, val in sorted(conts.items(), key=lambda kv: -len(kv[0])):
        if all(i + 1 + k < n and lows[i + 1 + k] == c
               for k, c in enumerate(cont)):
            return val, i + len(cont)
    return None


def _clock_fn(lang):
    if lang == "ja":
        return _parse_clock_ja
    if lang == "ko":
        return _parse_clock_ko
    return _parse_clock


def _parse_point(tokens, i, n, base_date, lang="en"):
    """A single range endpoint: rel-day / weekday / month-day / ISO date /
    clock time. Returns (datetime, grain, last_idx, kind) or None."""
    if i >= n:
        return None
    tables = _DT[lang]
    w = tokens[i].value.lower()

    def _with_clock(day, last, kind):
        # a day endpoint may carry its own clock part — "明日の8時半
        # から", "내일 8시부터", "from tomorrow at 8am": absorb an
        # optional linking particle/preposition, then a clock
        j = last + 1
        if j < n and tokens[j].value.lower() in tables.get("at_words",
                                                           ()):
            j += 1
        c = _clock_fn(lang)(tokens, j, n)
        if c is not None:
            hh, mm, clast, _marked = c
            return (day.replace(hour=hh, minute=mm),
                    "Minute" if mm else "Hour", clast, kind)
        return (day, "Day", last, kind)

    if w in tables["rel_days"]:
        return _with_clock(
            base_date + _dt.timedelta(days=tables["rel_days"][w]),
            i, "relday")
    if w in tables["weekdays"]:
        ahead = (tables["weekdays"][w] - base_date.weekday()) % 7
        return _with_clock(base_date + _dt.timedelta(days=ahead or 7),
                           i, "weekday")
    iso = _parse_iso_date(tokens, i, n)
    if iso is not None:
        return iso[0], "Day", iso[1], "iso"
    md = _parse_month_day(tokens, i, n, base_date, lang)
    if md is not None:
        return md[0], "Day", md[1], "monthday"
    c = _clock_fn(lang)(tokens, i, n)
    if c is not None:
        hh, mm, last, _marked = c
        return (base_date.replace(hour=hh, minute=mm),
                "Minute" if mm else "Hour", last, "clock")
    return None


def _scan_datetime(text, tokens, cands, anchor, lang="en"):
    """Bounded datetime grammar: ranges ("from monday to friday",
    "between 8am and 10:30am", "de lundi à vendredi"), day-level anchors
    (rel-day, weekday, month day, ISO date, next week/month/year)
    optionally combined with a following daypart or clock time
    ("next monday at 8pm", "demain à 8h30"), and standalone clock times.

    anchor: datetime the mention resolves against (the row's ts).
    """
    if anchor is None:
        anchor = _dt.datetime(2020, 1, 1, 0, 0, 0)
    tables = _DT[lang]
    out = []
    n = len(tokens)
    base_date = anchor.replace(hour=0, minute=0, second=0, microsecond=0)
    if base_date.year >= 9999:
        # clamp pathological anchors one year inside datetime's range so
        # every bounded forward step (next weekday/period/holiday, +32
        # days) stays representable; unbounded "in N units" arithmetic
        # is separately guarded in _add_units
        base_date = base_date.replace(year=9998)
    used: set[int] = set()
    lows = [t.value.lower() for t in tokens]

    def lower(i):
        return lows[i]

    # pass 0 (ja/ko): postfix-marked intervals — "XからYまで" /
    # "X부터 Y까지"
    range_post = tables.get("range_post")
    if range_post:
        from_marker, to_marker = range_post
        i = 0
        while i < n:
            p1 = _parse_point(tokens, i, n, base_date, lang)
            if p1 is None:
                i += 1
                continue
            dt1, _g1, last1, kind1 = p1
            if last1 + 1 >= n or lower(last1 + 1) != from_marker:
                i += 1
                continue
            p2 = _parse_point(tokens, last1 + 2, n, base_date, lang)
            if p2 is None:
                i += 1
                continue
            dt2, _g2, last2, kind2 = p2
            end_tok = last2
            if last2 + 1 < n and lower(last2 + 1) == to_marker:
                end_tok = last2 + 1
            if kind2 == "clock" and kind1 != "clock":
                # a bare-clock to-side inherits the from-side's day:
                # 明日8時から10時まで ends tomorrow, not today
                dt2 = dt1.replace(hour=dt2.hour, minute=dt2.minute)
            if dt2 <= dt1:
                dt2 += _dt.timedelta(days=7 if kind2 == "weekday" else 1)
            used.update(range(i, end_tok + 1))
            out.append(_mention(text, tokens, i, end_tok,
                                "snips/datetime", _fmt_interval(dt1, dt2)))
            i = end_tok + 1

        # lone postfix まで/까지 left over after the two-sided pass: an
        # open "until X" interval. duckling/Rustling resolve "until/by
        # <point>" as [reference time, point] — ja/ko mark the same
        # thing with the bare to-marker ("明日の8時半まで",
        # "내일 8시 반까지"); a past point rolls forward like a bare
        # clock does.
        i = 0
        while i < n:
            if i in used:
                i += 1
                continue
            p = _parse_point(tokens, i, n, base_date, lang)
            if p is None:
                i += 1
                continue
            dt2, _g, last, kind = p
            if (last + 1 >= n or lower(last + 1) != to_marker
                    or any(k in used for k in range(i, last + 2))):
                i += 1
                continue
            if dt2 <= anchor:
                dt2 += _dt.timedelta(days=7 if kind == "weekday" else 1)
            used.update(range(i, last + 2))
            out.append(_mention(text, tokens, i, last + 1,
                                "snips/datetime",
                                _fmt_interval(anchor, dt2)))
            i = last + 2

        # lone postfix から/부터: the open LOWER bound ("明日から",
        # "내일부터") — duckling's "from X". A from-side reference in
        # the past stays literal ("since yesterday" is meaningful), so
        # only bare clocks roll forward.
        i = 0
        while i < n:
            if i in used:
                i += 1
                continue
            p = _parse_point(tokens, i, n, base_date, lang)
            if p is None:
                i += 1
                continue
            dt1, _g, last, kind = p
            if (last + 1 >= n or lower(last + 1) != from_marker
                    or any(k in used for k in range(i, last + 2))):
                i += 1
                continue
            if kind == "clock" and dt1 <= anchor:
                dt1 += _dt.timedelta(days=1)
            used.update(range(i, last + 2))
            out.append(_mention(text, tokens, i, last + 1,
                                "snips/datetime",
                                _fmt_interval_open(dt1)))
            i = last + 2

    # pass 0: intervals — "from X to|until Y", "between X and Y"
    i = 0
    while i < n:
        w = lower(i)
        seps = tables["range_open"].get(w)
        if seps is None:
            i += 1
            continue
        p1 = _parse_point(tokens, i + 1, n, base_date, lang)
        if p1 is None:
            i += 1
            continue
        dt1, _g1, last1, kind1 = p1
        if last1 + 1 >= n or lower(last1 + 1) not in seps:
            i += 1
            continue
        p2 = _parse_point(tokens, last1 + 2, n, base_date, lang)
        if p2 is None:
            i += 1
            continue
        dt2, _g2, last2, kind2 = p2
        if kind2 == "clock" and kind1 != "clock":
            # a bare-clock to-side inherits the from-side's day:
            # "from tomorrow at 8am to 10am" ends tomorrow, not today
            dt2 = dt1.replace(hour=dt2.hour, minute=dt2.minute)
        if dt2 <= dt1:
            # "monday to friday" = the friday AFTER that monday;
            # "10pm and 2am" crosses midnight
            dt2 += _dt.timedelta(days=7 if kind2 == "weekday" else 1)
        used.update(range(i, last2 + 1))
        out.append(_mention(text, tokens, i, last2, "snips/datetime",
                            _fmt_interval(dt1, dt2)))
        i = last2 + 1

    # pass 0.5: open "until X" intervals ("until tomorrow at 8:30am",
    # "by friday 5pm", "jusqu'à demain 8h30", "bis morgen um 8:30",
    # "hasta el viernes", "fino alle 8:30", "até sexta") — duckling/
    # Rustling resolve these as [reference time, point]. A bare-clock
    # point must be MARKED (pm / h / uhr / a colon) so "increase by 5"
    # never reads as an interval; until-words are not datetime triggers
    # themselves (the point supplies its own trigger), matching the
    # range_open convention.
    until_words = tables.get("until_words", ())
    if until_words:
        until_link = tables.get("until_link", ())
        i = 0
        while i < n:
            if i in used or lower(i) not in until_words:
                i += 1
                continue
            j = i + 1
            while j < n and lower(j) in until_link:
                j += 1
            p = _parse_point(tokens, j, n, base_date, lang)
            if p is None or any(k in used for k in range(i, p[2] + 1)):
                i += 1
                continue
            dt2, _g, last, kind = p
            if kind == "clock":
                # marked (pm/h/uhr) or multi-token (a colon form like
                # "8:30" spans 3 tokens) — a bare digit is neither
                c = _clock_fn(lang)(tokens, j, n)
                if c is None or not (c[3] or c[2] > j):
                    i += 1
                    continue
            if dt2 <= anchor:
                dt2 += _dt.timedelta(days=7 if kind == "weekday" else 1)
            used.update(range(i, last + 1))
            out.append(_mention(text, tokens, i, last,
                                "snips/datetime",
                                _fmt_interval(anchor, dt2)))
            i = last + 1

    # pass 0.6: open "from X" intervals (lower bound only): "from
    # tomorrow", "starting friday", "ab morgen", "desde mañana",
    # "à partir de demain", "da domani" — duckling's one-sided lower
    # bound, serialized with a null "to". Unlike the upper bound, a
    # PAST lower bound is meaningful ("since yesterday"), so only bare
    # clocks roll forward. Two-sided "from X to Y" was consumed above.
    from_words = tables.get("from_words", ())
    if from_words:
        from_link = tables.get("from_link", ())
        pre = tables.get("from_pre")  # fr/es/pt "à|a partir"
        i = 0
        while i < n:
            if i in used or lower(i) not in from_words:
                i += 1
                continue
            start_tok = i
            if pre and i > 0 and lower(i - 1) == pre \
                    and (i - 1) not in used:
                start_tok = i - 1
            j = i + 1
            while j < n and lower(j) in from_link:
                j += 1
            p = _parse_point(tokens, j, n, base_date, lang)
            if p is None or any(k in used
                                for k in range(start_tok, p[2] + 1)):
                i += 1
                continue
            dt1, _g, last, kind = p
            if kind == "clock":
                c = _clock_fn(lang)(tokens, j, n)
                if c is None or not (c[3] or c[2] > j):
                    i += 1
                    continue
                if dt1 <= anchor:
                    dt1 += _dt.timedelta(days=1)
            used.update(range(start_tok, last + 1))
            out.append(_mention(text, tokens, start_tok, last,
                                "snips/datetime",
                                _fmt_interval_open(dt1)))
            i = last + 1

    # pass 1: day-level anchors, optionally followed by a time part
    num_at = {c["tok_start"]: c for c in cands}
    holiday_heads = tables.get("holidays") or ()
    i = 0
    while i < n:
        if i in used:
            i += 1
            continue
        w = lower(i)
        day = None
        grain = "Day"
        # postfix relative point (ja/ko): 3週間後 / 3주 후 → anchor+N
        # units. The 後/후 marker is REQUIRED — a bare "3日"/"3일" is a
        # day-of-month and must fall through to the month-day parser.
        post_point = None
        if i in num_at and tables.get("rel_units_post") \
                and tables.get("later_words"):
            c = num_at[i]
            jj = c["tok_end"] + 1
            post_unit = tables["rel_units_post"].get(lower(jj)) \
                if jj < n else None
            if post_unit is not None and jj + 1 < n \
                    and lower(jj + 1) in tables["later_words"] \
                    and float(c["num"]).is_integer() and c["num"] > 0:
                pp_day = _add_units(base_date, post_unit, int(c["num"]))
                if pp_day is not None:
                    post_point = (
                        pp_day,
                        {"day": "Day", "week": "Week", "month": "Month",
                         "year": "Year"}[post_unit],
                        jj + 1)
        tok_start, tok_end = i, i
        # inline first-level probe: the full matcher allocates and sorts
        # per call, and 99% of tokens are not a holiday head word
        hol = (_match_holiday(tables, lows, i, n)
               if w in holiday_heads else None)
        if hol is not None:
            # holiday probe FIRST: multi-token feasts ("good friday",
            # "vendredi saint", "lundi de pâques") embed weekday words
            # that would otherwise win the chain and split the mention.
            # Fixed dates resolve to the next occurrence (today counts,
            # like the weekday rule); movable feasts via the Easter
            # computus (_next_movable)
            val, tok_end = hol
            day = (_next_movable(base_date, val[1]) if val[0] == "E"
                   else _next_holiday(base_date, val[0], val[1]))
            if day is not None:
                if i > 0 and i - 1 not in used \
                        and lower(i - 1) in tables["day_prefix"]:
                    tok_start = i - 1
                if tok_end + 1 < n \
                        and lower(tok_end + 1) in tables["weekday_suffix"]:
                    tok_end += 1
        elif w in tables["rel_days"]:
            day = base_date + _dt.timedelta(days=tables["rel_days"][w])
        elif w == tables["tonight"]:
            day = base_date.replace(hour=tables["dayparts"].get(
                "night", 21))
            grain = "Hour"
        elif w in tables["weekdays"]:
            ahead = (tables["weekdays"][w] - base_date.weekday()) % 7
            day = base_date + _dt.timedelta(days=ahead or 7)
            # absorb a leading "on"/"next"/"this" (fr: "le"/"ce")
            if i > 0 and i - 1 not in used \
                    and lower(i - 1) in tables["day_prefix"]:
                tok_start = i - 1
            # absorb a trailing "prochain"/"prochaine" (fr)
            if i + 1 < n and lower(i + 1) in tables["weekday_suffix"]:
                tok_end = i + 1
        elif ((ordinal_word_to_number(w, lang) is not None
               or w in tables.get("last_words", ()))
              and i + 1 < n and lower(i + 1) in tables["weekdays"]):
            # nested grain: "first monday of june" / "last friday of
            # next month" / "le premier lundi de juin" / "der erste
            # montag im juni" — the nth (or last) weekday inside a
            # named or relative month. Only fires with a month tail, so
            # bare "last monday" (the past weekday) is untouched.
            nth = ordinal_word_to_number(w, lang)
            wd = tables["weekdays"][lower(i + 1)]
            j = i + 2
            if j < n and lower(j) in tables["weekday_suffix"]:
                j += 1
            if j < n and lower(j) in tables.get("of_words", ()):
                j += 1
            arts = tables.get("range_articles", tables["the_words"])
            if j < n and lower(j) in arts:
                j += 1
            nxt = False
            if j < n and (lower(j) == tables["next_word"]
                          or lower(j) in tables.get("next_adjs", ())):
                nxt = True
                j += 1
            start = None
            tok_j = None
            if j < n and lower(j) in tables["months"]:
                # named month: next occurrence (fully-passed month
                # rolls to next year; "next june" inside june rolls)
                m = tables["months"][lower(j)]
                try:
                    s = base_date.replace(month=m, day=1)
                    m_end = (s + _dt.timedelta(days=32)).replace(day=1) \
                        - _dt.timedelta(days=1)
                    if m_end < base_date or (nxt and s <= base_date):
                        s = s.replace(year=s.year + 1)
                    start, tok_j = s, j
                except (OverflowError, ValueError):
                    start = None
            else:
                lw = lower(j) if j < n else None
                unit = (tables.get("rel_units", {}).get(lw)
                        or tables["period_map"].get(lw)
                        or tables.get("period_gen", {}).get(lw)) \
                    if lw is not None else None
                if unit == "month":
                    k = j
                    if k + 1 < n and (lower(k + 1)
                                      == tables["next_word"]
                                      or lower(k + 1)
                                      in tables.get("next_adjs", ())):
                        nxt = True
                        k += 1
                    try:
                        s = base_date.replace(day=1)
                        if nxt:
                            s = (s + _dt.timedelta(days=32)) \
                                .replace(day=1)
                        start, tok_j = s, k
                    except (OverflowError, ValueError):
                        start = None
            if start is not None:
                if nth is None:  # "last <weekday> of ..."
                    m_end = (start + _dt.timedelta(days=32)) \
                        .replace(day=1) - _dt.timedelta(days=1)
                    day = m_end - _dt.timedelta(
                        days=(m_end.weekday() - wd) % 7)
                    tok_end = tok_j
                else:
                    d2 = start + _dt.timedelta(
                        days=(wd - start.weekday()) % 7
                        + 7 * (nth - 1))
                    if d2.month == start.month \
                            and d2.year == start.year:
                        day = d2
                        tok_end = tok_j
                # absorb a leading article ("the first monday …")
                if day is not None and i > 0 and i - 1 not in used \
                        and lower(i - 1) in arts:
                    tok_start = i - 1
        elif w in tables.get("every_dayparts", {}):
            # fused CJK recurrence+daypart (ja 毎朝/毎晩) → the anchor
            # day's part-of-day (day-level anchoring)
            day = base_date.replace(hour=tables["every_dayparts"][w])
            grain = "Hour"
        elif w in tables.get("every_prefix", {}):
            # CJK recurrences: 毎週[月曜日] / 매주 [월요일] / 毎日 / 매년 —
            # resolved to the next occurrence like the European
            # every-words (the snips payload has no recurrence kind)
            unit = tables["every_prefix"][w]
            tok_end = i
            if unit == "week" and i + 1 < n \
                    and lower(i + 1) in tables["weekdays"]:
                ahead = (tables["weekdays"][lower(i + 1)]
                         - base_date.weekday()) % 7
                day = base_date + _dt.timedelta(days=ahead or 7)
                tok_end = i + 1
            elif unit == "day" and i + 1 < n \
                    and lower(i + 1) in tables["dayparts"]:
                # 매일 아침 / 毎日 朝 — every-day + part-of-day → the
                # anchor day's part-of-day (day-level anchoring)
                day = base_date.replace(
                    hour=tables["dayparts"][lower(i + 1)])
                grain = "Hour"
                tok_end = i + 1
            elif unit == "day":
                day = base_date + _dt.timedelta(days=1)
            else:
                day, grain = _next_period(base_date, unit)
        elif w in tables.get("ahead_words", ()) or (
                i + 1 < n and tables.get("ahead_words")
                and w + lower(i + 1) in tables["ahead_words"]):
            # 今後3週間 / 앞으로 3주 → interval [anchor, anchor+N units]
            # (앞으로 arrives as two tokens — 앞 + particle 으로)
            k = i if w in tables.get("ahead_words", ()) else i + 1
            c = num_at.get(k + 1)
            if c is not None and float(c["num"]).is_integer() \
                    and c["num"] > 0:
                j = c["tok_end"] + 1
                unit = tables.get("rel_units_post", {}).get(lower(j)) \
                    if j < n else None
                end = _add_units(base_date, unit, int(c["num"])) \
                    if unit is not None else None
                if end is not None:
                    used.update(range(i, j + 1))
                    out.append(_mention(
                        text, tokens, i, j, "snips/datetime",
                        _fmt_interval(base_date, end)))
                    i = j + 1
                    continue
        elif post_point is not None:
            day, grain, tok_end = post_point
        elif w in tables["months"] or (
                lang in ("fr", "es", "it", "pt", "ja", "ko")
                and _parse_month_day(tokens, i, n, base_date,
                                     lang) is not None):
            md = _parse_month_day(tokens, i, n, base_date, lang)
            if md is not None:
                day, tok_end = md
        elif w == tables["next_word"] and i + 1 < n \
                and lower(i + 1) in tables["periods"]:
            day, grain = _next_period(base_date,
                                      tables["period_map"][lower(i + 1)])
            tok_end = i + 1
        elif w in tables.get("period_words", {}):
            # single-token periods (ja 来週/来月/来年)
            day, grain = _next_period(base_date,
                                      tables["period_words"][w])
        elif w in tables.get("every_words", ()) and i + 1 < n:
            # recurrence: "every monday" / "every week". The snips
            # payload has no recurrence kind, and the reference's
            # Rustling grammar resolves recurrent expressions to their
            # next occurrence as an InstantTime — mirrored here.
            nxt = lower(i + 1)
            if nxt in tables["weekdays"]:
                ahead = (tables["weekdays"][nxt]
                         - base_date.weekday()) % 7
                day = base_date + _dt.timedelta(days=ahead or 7)
                tok_end = i + 1
            elif nxt in tables.get("rel_units", {}):
                unit = tables["rel_units"][nxt]
                if unit == "day":
                    day = base_date + _dt.timedelta(days=1)
                else:
                    day, grain = _next_period(base_date, unit)
                tok_end = i + 1
            elif nxt in tables.get("dayparts", {}):
                # "every morning" / "chaque soir" / "cada mañana" →
                # the anchor day's part-of-day (day-level anchoring,
                # same convention as "this evening")
                day = base_date.replace(hour=tables["dayparts"][nxt])
                grain = "Hour"
                tok_end = i + 1
        elif w in tables.get("this_words", ()) and i + 1 < n \
                and lower(i + 1) in tables["dayparts"]:
            # standalone part-of-day: "this evening", "ce soir",
            # "esta noche", "diesen abend"
            day = base_date.replace(
                hour=tables["dayparts"][lower(i + 1)])
            grain = "Hour"
            tok_end = i + 1
        elif w in tables.get("daypart_single", {}):
            # fused part-of-day words: it stasera/stamattina, ja 今晩/今朝
            off, hour = tables["daypart_single"][w]
            day = (base_date + _dt.timedelta(days=off)).replace(hour=hour)
            grain = "Hour"
        elif w in tables.get("boundary_single", {}):
            # fused period boundaries: ja 月末/年始, ko 월말/연초 —
            # these name the UPCOMING boundary (年始 said in June means
            # next new year), so a past boundary rolls to the next period
            unit, which = tables["boundary_single"][w]
            day = _period_boundary(base_date, unit, False, which)
            if day is not None and day < base_date:
                day = _period_boundary(base_date, unit, True, which)
        elif w in tables.get("boundary_words", {}):
            # "beginning of next month", "fin du mois", "anfang
            # nächsten monats", "fim do mês" → the boundary day
            which = tables["boundary_words"][w]
            j = i + 1
            if j < n and lower(j) in tables.get("of_words", ()):
                j += 1
            arts = tables.get("range_articles", tables["the_words"])
            if j < n and lower(j) in arts:
                j += 1
            nxt = False
            if j < n and (lower(j) == tables["next_word"]
                          or lower(j) in tables.get("next_adjs", ())):
                nxt = True
                j += 1
            unit = None
            month = None
            if j < n:
                lw = lower(j)
                unit = tables.get("rel_units", {}).get(lw) \
                    or tables["period_map"].get(lw) \
                    or tables.get("period_gen", {}).get(lw)
                if unit is None:
                    month = tables["months"].get(lw)
            if month is not None:
                # "end of june" / "fin juin" — the named month's
                # boundary, next occurrence (a passed month rolls to
                # next year; "end of NEXT june" while inside june rolls
                # too); extreme anchors (year 9999) drop the match
                try:
                    start = base_date.replace(month=month, day=1)
                    m_end = (start + _dt.timedelta(days=32)) \
                        .replace(day=1) - _dt.timedelta(days=1)
                    if m_end < base_date or (nxt
                                             and start <= base_date):
                        start = start.replace(year=start.year + 1)
                        m_end = (start + _dt.timedelta(days=32)) \
                            .replace(day=1) - _dt.timedelta(days=1)
                    day = {"begin": start, "end": m_end,
                           "mid": start.replace(day=15)}[which]
                    tok_end = j
                except (OverflowError, ValueError):
                    day = None
            elif unit is not None and unit != "day":
                k = j
                if k + 1 < n and (lower(k + 1) in tables.get("next_adjs",
                                                             ())
                                  or lower(k + 1) == tables["next_word"]):
                    nxt = True
                    k += 1
                day = _period_boundary(base_date, unit, nxt, which)
                tok_end = k
        elif w in tables.get("rel_range_open", ()):
            # "in the next 3 weeks" → interval [anchor, anchor+3w];
            # "in 3 weeks" → instant point anchor+3w (Rustling shapes).
            # The "next" marker may precede the number (en "the next 3
            # weeks", es "las próximas 3 semanas", de "den nächsten 3
            # wochen") or follow it (fr "les 3 prochaines semaines") —
            # per-language adjective forms in "next_adjs".
            j = i + 1
            arts = tables.get("range_articles", tables["the_words"])
            if j < n and lower(j) in arts:
                j += 1
            adjs = tables.get("next_adjs", ())
            has_next = j < n and (lower(j) == tables["next_word"]
                                  or lower(j) in adjs)
            if has_next:
                j += 1
            c = num_at.get(j)
            nval = None
            if c is not None and float(c["num"]).is_integer() \
                    and c["num"] > 0:
                nval = int(c["num"])
                j = c["tok_end"] + 1
            if j < n and lower(j) in adjs:
                has_next = True
                j += 1
            if nval is None and has_next:
                nval = 1  # "in the next week" / "la prochaine semaine"
            unit = tables.get("rel_units", {}).get(lower(j)) \
                if j < n else None
            if unit is not None and nval is not None:
                if has_next:
                    end = _add_units(base_date, unit, nval)
                    if end is None:  # out-of-range N — not a date
                        i += 1
                        continue
                    used.update(range(i, j + 1))
                    out.append(_mention(
                        text, tokens, i, j, "snips/datetime",
                        _fmt_interval(base_date, end)))
                    i = j + 1
                    continue
                day = _add_units(base_date, unit, nval)
                grain = {"day": "Day", "week": "Week", "month": "Month",
                         "year": "Year"}[unit]
                tok_end = j
        else:
            iso = _parse_iso_date(tokens, i, n)
            if iso is not None:
                day, tok_end = iso
                # absorb a leading "on"
                if i > 0 and i - 1 not in used and lower(i - 1) == "on":
                    tok_start = i - 1

        if day is None:
            i += 1
            continue

        # optional following time part: "tomorrow evening",
        # "tomorrow at 8pm", "next monday at 8:30", "demain à 8h30"
        j = tok_end + 1
        if j < n and lower(j) in tables["at_words"]:
            j += 1
            if j < n and lower(j) in tables["the_words"]:
                j += 1
        if j < n and lower(j) in tables["dayparts"] and grain in ("Day",):
            day = day.replace(hour=tables["dayparts"][lower(j)])
            grain = "Hour"
            tok_end = j
        elif grain == "Day":
            t = _clock_fn(lang)(tokens, j, n)
            if t is not None:
                hh, mm, t_end, _marked = t
                day = day.replace(hour=hh, minute=mm)
                grain = "Minute" if mm else "Hour"
                tok_end = t_end
        used.update(range(tok_start, tok_end + 1))
        out.append(_mention(text, tokens, tok_start, tok_end,
                            "snips/datetime", _fmt_instant(day, grain)))
        i = tok_end + 1

    # pass 2: standalone clock times ("at 8pm", "at 8:30", "9:15 am")
    i = 0
    while i < n:
        if i in used:
            i += 1
            continue
        start_i = i
        if lower(i) in tables["at_words"]:
            j = i + 1
            # "a las 8:30" — article between the preposition and the time
            if j < n and lower(j) in tables["the_words"]:
                j += 1
            t = _clock_fn(lang)(tokens, j, n)
        else:
            t = _clock_fn(lang)(tokens, i, n)
            # unprefixed times only count with an explicit marker
            if t is not None and not t[3]:
                t = None
        if t is not None:
            hh, mm, t_end, _marked = t
            if not any(k in used for k in range(start_i, t_end + 1)):
                day = base_date.replace(hour=hh, minute=mm)
                used.update(range(start_i, t_end + 1))
                out.append(_mention(
                    text, tokens, start_i, t_end, "snips/datetime",
                    _fmt_instant(day, "Minute" if mm else "Hour")))
                i = t_end + 1
                continue
        i += 1
    return out


def _parse_clock(tokens, i, n):
    """Parse ``8pm`` / ``8 pm`` / ``8:30`` / ``8:30pm`` / ``8 o'clock``
    starting at token i (the tokenizer splits ':' into its own token).
    Returns (hour, minute, last_token_index, has_marker) or None, where
    has_marker is True when an explicit am/pm/o'clock marker was seen."""
    if i >= n:
        return None
    v = tokens[i].value.lower()
    # every clock form starts with a digit token ("8pm", "8h30", "8",
    # "8:30") — gate before the regex battery (the scanner probes this
    # at nearly every token position)
    if not v[:1].isdigit():
        return None
    m = _CLOCK_AMPM_RE.match(v)
    if m:
        hh = int(m.group(1)) % 12 + (12 if m.group(2) == "pm" else 0)
        return hh, 0, i, True
    m = _CLOCK_AMPM_DOT_RE.match(v)
    if m:
        hh = int(m.group(1)) % 12 + (12 if m.group(2) == "p" else 0)
        return hh, 0, i, True
    m = _CLOCK_FR_RE.match(v)  # french "8h"/"8h30"
    if m:
        hh = int(m.group(1))
        if hh <= 23:
            return hh, int(m.group(2) or 0), i, True
    m = _TIME_RE.match(v)
    if not m:
        return None
    hh, mm = int(m.group(1)), int(m.group(2) or 0)
    explicit_minutes = m.group(2) is not None
    last = i
    # multi-token "hh : mm[am|pm]"
    if not explicit_minutes and last + 2 < n \
            and tokens[last + 1].value == ":":
        m2 = _CLOCK_MM_RE.match(tokens[last + 2].value.lower())
        if m2:
            mm = int(m2.group(1))
            explicit_minutes = True
            last += 2
            if m2.group(2) is not None:
                if hh > 12:
                    return None
                hh = hh % 12 + (12 if m2.group(2) == "pm" else 0)
                return hh, mm, last, True
    if hh > 23 or mm > 59:
        return None
    j = last + 1
    if j < n and tokens[j].value.lower() in _MERIDIEM_TOKENS and hh <= 12:
        hh = hh % 12 + (12 if _MERIDIEM_TOKENS[tokens[j].value.lower()]
                        == "pm" else 0)
        return hh, mm, j, True
    if j < n and tokens[j].value.lower() == "uhr":  # german "8 uhr"
        return hh, mm, j, True
    if j + 2 < n and tokens[j].value.lower() == "o" \
            and tokens[j + 1].value == "'" \
            and tokens[j + 2].value.lower() == "clock":
        return hh, mm, j + 2, True
    if explicit_minutes:  # explicit hh:mm stands alone (no marker)
        return hh, mm, last, False
    return None


def _parse_clock_ja(tokens, i, n):
    """``8時`` / ``8時半`` / ``8時30分`` / ``午後8時`` / ``八時`` —
    hour numeral + 時 suffix (the CJK tokenizer splits digits from the
    時/分 counters, but merges adjacent han so 時半 arrives as one
    token); 午前/午後 meridiem prefixes. Same return contract as
    _parse_clock; 時 counts as an explicit marker. Falls back to the
    shared parser for "8:30"-style times."""
    if i >= n:
        return None
    meridiem = None
    j = i
    if tokens[j].value in ("午前", "午後"):
        meridiem = tokens[j].value
        j += 1
    hh = _tok_int(tokens[j].value) if j < n else None
    if hh is None or hh > 23 or j + 1 >= n \
            or tokens[j + 1].value not in ("時", "時半"):
        if meridiem is not None:
            return None
        return _parse_clock(tokens, i, n)
    mm = 30 if tokens[j + 1].value == "時半" else 0
    last = j + 1
    if tokens[last].value == "時":
        if last + 2 < n and tokens[last + 2].value == "分":
            mv = _tok_int(tokens[last + 1].value)
            if mv is not None and mv <= 59:
                mm = mv
                last += 2
        elif last + 1 < n and tokens[last + 1].value == "半":
            mm = 30
            last += 1
    if meridiem == "午後" and hh <= 12:
        hh = hh % 12 + 12
    elif meridiem == "午前" and hh <= 12:
        hh = hh % 12
    return hh, mm, last, True


def _parse_clock_ko(tokens, i, n):
    """``8시`` / ``8시 반`` / ``8시 30분`` / ``오후 8시`` / ``여덟시`` —
    hour numeral + 시 suffix token (the particle split peels trailing
    에/에는 so 시 arrives clean); fused native-numeral hours (여덟시)
    are one hangul token ending in 시. 오전/오후 meridiem prefixes.
    Same return contract as _parse_clock; falls back to the shared
    parser for "8:30"-style times."""
    if i >= n:
        return None
    meridiem = None
    j = i
    if tokens[j].value in ("오전", "오후"):
        meridiem = tokens[j].value
        j += 1
    hh = last = None
    if j < n:
        v = tokens[j].value
        nxt = tokens[j + 1].value if j + 1 < n else None
        if nxt == "시":
            hh = _tok_int(v, "ko")
            last = j + 1
        elif len(v) > 1 and v.endswith("시"):
            hh = _tok_int(v[:-1], "ko")
            last = j
    if hh is None or hh > 23:
        if meridiem is not None:
            return None
        return _parse_clock(tokens, i, n)
    mm = 0
    if last + 2 < n and tokens[last + 2].value == "분":
        mv = _tok_int(tokens[last + 1].value, "ko")
        if mv is not None and mv <= 59:
            mm = mv
            last += 2
    elif last + 1 < n and tokens[last + 1].value == "반":
        mm = 30
        last += 1
    elif last + 1 < n and len(tokens[last + 1].value) > 1 \
            and tokens[last + 1].value.endswith("분"):
        mv = _tok_int(tokens[last + 1].value[:-1], "ko")
        if mv is not None and mv <= 59:
            mm = mv
            last += 1
    if meridiem == "오후" and hh <= 12:
        hh = hh % 12 + 12
    elif meridiem == "오전" and hh <= 12:
        hh = hh % 12
    return hh, mm, last, True


_SCANNERS: dict[str, Callable] = {
    "snips/number": _scan_number,
    "snips/ordinal": _scan_ordinal,
    "snips/percentage": _scan_percentage,
    "snips/temperature": _scan_temperature,
    "snips/amountOfMoney": _scan_money,
    "snips/duration": _scan_duration,
    "snips/datetime": _scan_datetime,
}


class BuiltinEntityParser:
    """Stateless scanner over the builtin kinds; one instance per executor
    (cheap — no compiled state beyond module-level tables). Parses are
    memoized per (text, scope, anchor); treat results as immutable.

    ``language`` selects the word tables (all shipped language packs) — the reference reaches
    the same effect by loading the per-language Rust grammar
    (builtin_entity_parser.py:22-77)."""

    def __init__(self, language: str = "en",
                 gazetteer_entities=()) -> None:
        if language not in _DT:
            raise ValueError(f"unsupported language: {language!r}")
        self.language = language
        self.gazetteer_entities = tuple(sorted(gazetteer_entities))
        self._gazetteer = None
        if self.gazetteer_entities:
            from .gazetteer import GazetteerParser
            self._gazetteer = GazetteerParser.build({
                kind: {v: v for v in _gazetteer_values(language, kind)}
                for kind in self.gazetteer_entities})
        from functools import lru_cache
        # anchor-INdependent kinds are scanned once per text for ALL
        # kinds and filtered by scope (one tokenize + one scan, however
        # many scoped probes hit the same text — the parse cascade probes
        # each text with several scopes); datetime is memoized per
        # (text, anchor)
        self._prep_memo = lru_cache(maxsize=32768)(self._prep)
        self._static_memo = lru_cache(maxsize=32768)(self._scan_static)
        self._dt_memo = lru_cache(maxsize=32768)(self._scan_dt)
        self._parse_memo = lru_cache(maxsize=131072)(self._parse_scoped)

    def parse(self, text: str, scope: Sequence[str] | None = None,
              anchor: _dt.datetime | None = None) -> list[dict]:
        if scope is None:
            scope = BUILTIN_KINDS + self.gazetteer_entities
        return list(self._parse_memo(text, tuple(scope), anchor))

    def _parse_scoped(self, text: str, scope_key: tuple,
                      anchor: _dt.datetime | None) -> tuple:
        """Scope-filtered view over the memoized scans — itself memoized
        per (text, scope, anchor): the cascade probes each text with
        several scopes, and the filter/sort was the dominant repeat
        cost."""
        wanted = set(scope_key)
        mentions = [m for m in self._static_memo(text)
                    if m["entity_kind"] in wanted]
        if "snips/datetime" in wanted:
            mentions.extend(self._dt_memo(text, anchor))
        if len(wanted) > 1 or mentions and "snips/datetime" in wanted:
            mentions.sort(key=lambda m: (m["start"], m["end"]))
        return tuple(mentions)

    def _prep(self, text: str) -> tuple:
        """(tokens, number candidates) — computed ONCE per text and
        shared by the static and datetime scans (previously each scan
        re-tokenized and re-ran the number-candidate pass)."""
        tokens = tokenize(text)
        if self.language == "ja":
            tokens = _ja_grammar_merge(tokens)
        if not tokens:
            return (), ()
        return tokens, tuple(_number_candidates(tokens, self.language))

    def _scan_static(self, text: str) -> tuple:
        tokens, cands = self._prep_memo(text)
        if not tokens:
            return ()
        mentions: list[dict] = []
        for kind in BUILTIN_KINDS:
            if kind == "snips/datetime":
                continue
            mentions.extend(_SCANNERS[kind](text, tokens, cands, None,
                                            self.language))
        if self._gazetteer is not None:
            for m in self._gazetteer.parse(
                    text, scope=self.gazetteer_entities):
                resolved = m["resolved_value"]
                if isinstance(resolved, dict):
                    resolved = resolved["value"]
                mentions.append({
                    "value": m["value"], "start": m["start"],
                    "end": m["end"], "entity_kind": m["entity_kind"],
                    "resolved_value": {
                        "kind": GAZETTEER_KINDS[m["entity_kind"]],
                        "value": resolved}})
        return tuple(sorted(mentions,
                            key=lambda m: (m["start"], m["end"])))

    def _scan_dt(self, text: str, anchor: _dt.datetime | None) -> tuple:
        tokens, cands = self._prep_memo(text)
        if not tokens:
            return ()
        # trigger gate: every datetime rule requires a trigger word, a
        # digit-initial token (clock/ISO forms), or a number candidate
        # (word numbers, kanji/hangul numerals) — texts with none of
        # those can't match, and most non-datetime texts skip the whole
        # grammar walk here
        # ja/ko clocks accept FUSED numeral+counter tokens (여덟시,
        # 八時半) that are neither digit-initial nor number candidates —
        # the gate can't see them, so it only applies to the European
        # packs where every clock form is digit-initial
        if not cands and self.language not in ("ja", "ko"):
            trig = _dt_triggers(self.language)
            if not any(t.value[:1].isdigit() or t.value.lower() in trig
                       for t in tokens):
                return ()
        return tuple(_scan_datetime(text, tokens, cands, anchor,
                                    self.language))

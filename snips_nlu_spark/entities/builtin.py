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
from .numbers import (NUMBER_WORDS, ordinal_word_to_number, words_to_number,
                      ORDINAL_WORDS)

BUILTIN_KINDS = (
    "snips/number", "snips/ordinal", "snips/percentage", "snips/temperature",
    "snips/amountOfMoney", "snips/duration", "snips/datetime",
)


def is_builtin_entity(name: str) -> bool:
    """ref: entity_parser/builtin_entity_parser.py:80-83"""
    return name.startswith("snips/")


# ---------------------------------------------------------------------------
# number candidates over the token stream
# ---------------------------------------------------------------------------

_DECIMAL_RE = re.compile(r"^\d+$")


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


def _word_candidates(tokens: Sequence[Token]) -> list[dict]:
    """Maximal runs of number words, trimmed until they parse."""
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        if tokens[i].value.lower() in NUMBER_WORDS:
            j = i
            while j + 1 < n and tokens[j + 1].value.lower() in NUMBER_WORDS:
                j += 1
            # trim glue from the edges until the phrase parses
            lo, hi = i, j
            while lo <= hi:
                phrase = " ".join(t.value.lower()
                                  for t in tokens[lo:hi + 1])
                num = words_to_number(phrase)
                if num is not None:
                    out.append({"tok_start": lo, "tok_end": hi, "num": num})
                    break
                if tokens[hi].value.lower() in ("and", "a", "an"):
                    hi -= 1
                elif tokens[lo].value.lower() in ("and", "a", "an"):
                    lo += 1
                else:
                    break
            i = j + 1
        else:
            i += 1
    return out


def _number_candidates(tokens: Sequence[Token]) -> list[dict]:
    cands = _digit_candidates(tokens) + _word_candidates(tokens)
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

def _scan_number(text, tokens, cands, anchor):
    return [
        _mention(text, tokens, c["tok_start"], c["tok_end"], "snips/number",
                 {"kind": "Number", "value": c["num"]})
        for c in cands
    ]


_ORDINAL_SUFFIX_RE = re.compile(r"^(\d+)(st|nd|rd|th)$", re.IGNORECASE)


def _scan_ordinal(text, tokens, cands, anchor):
    out = []
    for i, t in enumerate(tokens):
        m = _ORDINAL_SUFFIX_RE.match(t.value)
        if m:
            out.append(_mention(text, tokens, i, i, "snips/ordinal",
                                {"kind": "Ordinal", "value": int(m.group(1))}))
        elif t.value.lower() in ORDINAL_WORDS:
            out.append(_mention(
                text, tokens, i, i, "snips/ordinal",
                {"kind": "Ordinal",
                 "value": ordinal_word_to_number(t.value)}))
    return out


def _scan_percentage(text, tokens, cands, anchor):
    out = []
    for c in cands:
        nxt = c["tok_end"] + 1
        if nxt < len(tokens) and tokens[nxt].value.lower() in ("%", "percent"):
            out.append(_mention(text, tokens, c["tok_start"], nxt,
                                "snips/percentage",
                                {"kind": "Percentage", "value": c["num"]}))
    return out


_TEMP_UNITS = {"celsius": "celsius", "c": "celsius",
               "fahrenheit": "fahrenheit", "f": "fahrenheit"}


def _scan_temperature(text, tokens, cands, anchor):
    out = []
    n = len(tokens)
    for c in cands:
        nxt = c["tok_end"] + 1
        if nxt >= n:
            continue
        w = tokens[nxt].value.lower()
        if w in ("degree", "degrees", "°"):
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
                   "pound": "GBP", "pounds": "GBP"}


def _scan_money(text, tokens, cands, anchor):
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
    "second": "seconds", "seconds": "seconds", "sec": "seconds",
    "minute": "minutes", "minutes": "minutes", "min": "minutes",
    "hour": "hours", "hours": "hours",
    "day": "days", "days": "days",
    "week": "weeks", "weeks": "weeks",
    "month": "months", "months": "months",
    "year": "years", "years": "years",
}


def _duration_payload(field: str, value: float) -> dict:
    payload = {"kind": "Duration", "years": 0, "quarters": 0, "months": 0,
               "weeks": 0, "days": 0, "hours": 0, "minutes": 0, "seconds": 0,
               "precision": "Exact"}
    payload[field] = int(value) if float(value).is_integer() else value
    return payload


def _scan_duration(text, tokens, cands, anchor):
    out = []
    n = len(tokens)
    for c in cands:
        nxt = c["tok_end"] + 1
        if nxt < n and tokens[nxt].value.lower() in _DURATION_UNITS:
            field = _DURATION_UNITS[tokens[nxt].value.lower()]
            out.append(_mention(text, tokens, c["tok_start"], nxt,
                                "snips/duration",
                                _duration_payload(field, c["num"])))
    return out


# --- datetime -------------------------------------------------------------

_WEEKDAYS = {"monday": 0, "tuesday": 1, "wednesday": 2, "thursday": 3,
             "friday": 4, "saturday": 5, "sunday": 6}
_MONTHS = {"january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
           "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
           "november": 11, "december": 12}
_DAYPARTS = {"morning": 8, "noon": 12, "afternoon": 15, "evening": 19,
             "night": 21}
_REL_DAYS = {"yesterday": -1, "today": 0, "tomorrow": 1}

_TIME_RE = re.compile(r"^(\d{1,2})(?::(\d{2}))?$")


def _fmt_instant(d: _dt.datetime, grain: str) -> dict:
    return {"kind": "InstantTime",
            "value": d.strftime("%Y-%m-%d %H:%M:%S"),
            "grain": grain, "precision": "Exact"}


def _scan_datetime(text, tokens, cands, anchor):
    """Bounded datetime grammar: [rel-day|weekday|month day|next X]
    optionally combined with a following time-of-day / clock time; also
    standalone clock times ("at 8pm") and dayparts ("tonight").

    anchor: datetime the mention resolves against (the row's ts).
    """
    if anchor is None:
        anchor = _dt.datetime(2020, 1, 1, 0, 0, 0)
    out = []
    n = len(tokens)
    base_date = anchor.replace(hour=0, minute=0, second=0, microsecond=0)
    used: set[int] = set()

    def lower(i):
        return tokens[i].value.lower()

    # pass 1: day-level anchors, optionally followed by a time part
    i = 0
    while i < n:
        w = lower(i)
        day = None
        grain = "Day"
        tok_start, tok_end = i, i
        if w in _REL_DAYS:
            day = base_date + _dt.timedelta(days=_REL_DAYS[w])
        elif w == "tonight":
            day = base_date.replace(hour=_DAYPARTS["night"])
            grain = "Hour"
        elif w in _WEEKDAYS:
            ahead = (_WEEKDAYS[w] - base_date.weekday()) % 7
            day = base_date + _dt.timedelta(days=ahead or 7)
            # absorb a leading "on"/"next"/"this"
            if i > 0 and lower(i - 1) in ("on", "next", "this"):
                tok_start = i - 1
        elif w in _MONTHS:
            # "june 3", "june 3rd"
            if i + 1 < n:
                m = _ORDINAL_SUFFIX_RE.match(tokens[i + 1].value)
                dnum = None
                if m:
                    dnum = int(m.group(1))
                elif tokens[i + 1].value.isdigit():
                    dnum = int(tokens[i + 1].value)
                if dnum and 1 <= dnum <= 31:
                    try:
                        day = base_date.replace(month=_MONTHS[w], day=dnum)
                    except ValueError:
                        day = None
                    if day is not None:
                        if day < base_date:
                            day = day.replace(year=day.year + 1)
                        tok_end = i + 1
        elif w == "next" and i + 1 < n and lower(i + 1) in ("week", "month",
                                                            "year"):
            unit = lower(i + 1)
            if unit == "week":
                day = base_date + _dt.timedelta(days=7 - base_date.weekday())
                grain = "Week"
            elif unit == "month":
                month = base_date.month % 12 + 1
                year = base_date.year + (1 if month == 1 else 0)
                day = base_date.replace(year=year, month=month, day=1)
                grain = "Month"
            else:
                day = base_date.replace(year=base_date.year + 1, month=1,
                                        day=1)
                grain = "Year"
            tok_end = i + 1

        if day is None:
            i += 1
            continue

        # optional following time part: "tomorrow evening",
        # "tomorrow at 8pm", "monday morning"
        j = tok_end + 1
        if j < n and lower(j) in ("at", "in"):
            j += 1
            if j < n and lower(j) == "the":
                j += 1
        if j < n and lower(j) in _DAYPARTS and grain in ("Day",):
            day = day.replace(hour=_DAYPARTS[lower(j)])
            grain = "Hour"
            tok_end = j
        else:
            t = _parse_clock(tokens, tok_end + 1, n)
            if t is not None and grain == "Day":
                hh, mm, t_end = t
                day = day.replace(hour=hh, minute=mm)
                grain = "Minute" if mm else "Hour"
                tok_end = t_end
        used.update(range(tok_start, tok_end + 1))
        out.append(_mention(text, tokens, tok_start, tok_end,
                            "snips/datetime", _fmt_instant(day, grain)))
        i = tok_end + 1

    # pass 2: standalone clock times ("at 8pm", "at 8:30")
    i = 0
    while i < n:
        if i in used:
            i += 1
            continue
        start_i = i
        if lower(i) == "at":
            t = _parse_clock(tokens, i + 1, n)
        else:
            t = _parse_clock(tokens, i, n) if _looks_clock(tokens, i, n) \
                else None
        if t is not None:
            hh, mm, t_end = t
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


def _looks_clock(tokens, i, n):
    """Unprefixed times only count with an explicit am/pm/o'clock marker."""
    m = _TIME_RE.match(tokens[i].value)
    if not m:
        return False
    j = i + 1
    if j < n and tokens[j].value.lower() in ("am", "pm"):
        return True
    if j + 1 < n and tokens[j].value.lower() == "o" \
            and tokens[j + 1].value == "'":
        return True
    if j < n and tokens[j].value.lower() in ("oclock",):
        return True
    return False


def _parse_clock(tokens, i, n):
    """Parse ``8pm`` / ``8 pm`` / ``8:30`` / ``8 o'clock`` starting at token
    i; returns (hour, minute, last_token_index) or None."""
    if i >= n:
        return None
    v = tokens[i].value.lower()
    m = re.match(r"^(\d{1,2})(am|pm)$", v)
    if m:
        hh = int(m.group(1)) % 12 + (12 if m.group(2) == "pm" else 0)
        return hh, 0, i
    m = _TIME_RE.match(v)
    if not m:
        return None
    hh, mm = int(m.group(1)), int(m.group(2) or 0)
    if hh > 23 or mm > 59:
        return None
    j = i + 1
    if j < n and tokens[j].value.lower() in ("am", "pm"):
        hh = hh % 12 + (12 if tokens[j].value.lower() == "pm" else 0)
        return hh, mm, j
    if j + 2 < n and tokens[j].value.lower() == "o" \
            and tokens[j + 1].value == "'" \
            and tokens[j + 2].value.lower() == "clock":
        return hh, mm, j + 2
    if m.group(2) is not None:  # explicit hh:mm stands alone
        return hh, mm, i
    return None


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
    memoized per (text, scope, anchor); treat results as immutable."""

    def __init__(self) -> None:
        from functools import lru_cache
        self._parse_memo = lru_cache(maxsize=8192)(self._parse_impl)

    def parse(self, text: str, scope: Sequence[str] | None = None,
              anchor: _dt.datetime | None = None) -> list[dict]:
        scope_key = BUILTIN_KINDS if scope is None else tuple(sorted(scope))
        return list(self._parse_memo(text, scope_key, anchor))

    def _parse_impl(self, text: str, scope: tuple[str, ...],
                    anchor: _dt.datetime | None) -> tuple:
        tokens = tokenize(text)
        if not tokens:
            return ()
        cands = _number_candidates(tokens)
        mentions: list[dict] = []
        for kind in scope:
            scanner = _SCANNERS.get(kind)
            if scanner is not None:
                mentions.extend(scanner(text, tokens, cands, anchor))
        return tuple(sorted(mentions, key=lambda m: (m["start"], m["end"])))

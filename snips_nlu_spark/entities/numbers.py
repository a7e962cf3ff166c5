"""English number words ↔ values.

From-scratch replacement for the number grammar of the reference's Rust
``snips_nlu_parsers`` (snips/number kind, /root/reference/snips_nlu/
constants.py:66-72). Pure functions; used by the builtin entity scanner and
by gazetteer string variations.
"""

from __future__ import annotations

_UNITS = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "sixty": 60,
    "seventy": 70, "eighty": 80, "ninety": 90,
}
_SCALES = {"hundred": 100, "thousand": 1000, "million": 10 ** 6,
           "billion": 10 ** 9}

# words that may appear inside a number phrase but carry no value by
# themselves ("a hundred", "one hundred and five")
_GLUE = {"and"}
_A_WORDS = {"a", "an"}

NUMBER_WORDS = (set(_UNITS) | set(_TENS) | set(_SCALES) | _GLUE | _A_WORDS)

_ORDINAL_UNITS = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12, "thirteenth": 13, "fourteenth": 14,
    "fifteenth": 15, "sixteenth": 16, "seventeenth": 17, "eighteenth": 18,
    "nineteenth": 19, "twentieth": 20, "thirtieth": 30, "fortieth": 40,
    "fiftieth": 50, "sixtieth": 60, "seventieth": 70, "eightieth": 80,
    "ninetieth": 90, "hundredth": 100, "thousandth": 1000,
}

ORDINAL_WORDS = set(_ORDINAL_UNITS)


def words_to_number(phrase: str) -> float | None:
    """Parse an English number phrase ("twenty two", "a hundred and five",
    "twenty-one") to its value; None when the phrase is not a number."""
    words = phrase.replace("-", " ").lower().split()
    if not words:
        return None
    total = 0
    current = 0
    seen_value = False
    # a bare unit/teen may only be followed by a scale word ("two hundred"
    # is valid, "two two" is not); prevents repeated-word runs from
    # summing into spurious numbers
    pending_unit = False
    for i, w in enumerate(words):
        if w in _UNITS:
            if pending_unit:
                return None
            if current % 10 != 0 and _UNITS[w] >= 10:
                return None
            # after tens, only 1-9 may attach ("twenty twelve" invalid)
            if current % 100 >= 20 and _UNITS[w] >= 10:
                return None
            current += _UNITS[w]
            seen_value = True
            pending_unit = True
        elif w in _TENS:
            if pending_unit:
                return None
            if current % 100 != 0 and current % 100 < 20:
                return None
            current += _TENS[w]
            seen_value = True
        elif w in _SCALES:
            if current == 0:
                current = 1
            current *= _SCALES[w]
            if _SCALES[w] >= 1000:
                total += current
                current = 0
            seen_value = True
            pending_unit = False
        elif w in _A_WORDS:
            # only valid immediately before a scale: "a hundred"
            if i + 1 >= len(words) or words[i + 1] not in _SCALES:
                return None
            if current != 0:
                return None
        elif w in _GLUE:
            if not seen_value or i + 1 == len(words):
                return None
        else:
            return None
    if not seen_value:
        return None
    return float(total + current)


def ordinal_word_to_number(word: str) -> int | None:
    """"third" → 3; single-word ordinals only."""
    return _ORDINAL_UNITS.get(word.lower())


_UNIT_NAMES = {v: k for k, v in _UNITS.items()}
_TEN_NAMES = {v: k for k, v in _TENS.items()}


def number_to_words(n: int) -> str | None:
    """Integer → English words for 0..9999 (used by gazetteer variations)."""
    if n < 0 or n > 9999:
        return None
    if n < 20:
        return _UNIT_NAMES[n]
    if n < 100:
        tens, unit = divmod(n, 10)
        word = _TEN_NAMES[tens * 10]
        return word if unit == 0 else f"{word} {_UNIT_NAMES[unit]}"
    if n < 1000:
        hundreds, rest = divmod(n, 100)
        word = f"{_UNIT_NAMES[hundreds]} hundred"
        return word if rest == 0 else f"{word} {number_to_words(rest)}"
    thousands, rest = divmod(n, 1000)
    word = f"{number_to_words(thousands)} thousand"
    return word if rest == 0 else f"{word} {number_to_words(rest)}"

"""Number words ↔ values (en, fr, es, de, it, pt, ja, ko).

From-scratch replacement for the number grammar of the reference's Rust
``snips_nlu_parsers`` (snips/number kind, /root/reference/snips_nlu/
constants.py:66-72; the reference ships per-language grammars the same
way). Pure functions; used by the builtin entity scanner and by gazetteer
string variations. French covers the common composed forms (0-16, dix-sept
..dix-neuf, tens with et-un/units/teens incl. soixante-dix forms,
quatre-vingt(s) forms, cent/mille/million); exotic spellings (septante,
huitante, nonante) are accepted as direct tens. Spanish covers units incl.
the fused dieci*/veinti* forms, tens with y-units, the hundreds words, and
mil/millón. German fuses compounds into single words, so its grammar is a
recursive token decomposition (einundzwanzig, zweihundertdreiundvierzig,
zweitausendzwanzig) — membership is a parse probe (``is_number_word``).
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


# --- French tables ----------------------------------------------------------

_FR_UNITS = {
    "zéro": 0, "zero": 0, "un": 1, "une": 1, "deux": 2, "trois": 3,
    "quatre": 4, "cinq": 5, "six": 6, "sept": 7, "huit": 8, "neuf": 9,
    "dix": 10, "onze": 11, "douze": 12, "treize": 13, "quatorze": 14,
    "quinze": 15, "seize": 16,
}
_FR_TENS = {
    "vingt": 20, "trente": 30, "quarante": 40, "cinquante": 50,
    "soixante": 60,
    # Belgian/Swiss direct tens
    "septante": 70, "huitante": 80, "octante": 80, "nonante": 90,
}
_FR_SCALES = {"cent": 100, "cents": 100, "mille": 1000,
              "million": 10 ** 6, "millions": 10 ** 6}
_FR_GLUE = {"et"}

FR_NUMBER_WORDS = (set(_FR_UNITS) | set(_FR_TENS) | set(_FR_SCALES)
                   | _FR_GLUE | {"vingts"})

_FR_ORDINALS = {
    "premier": 1, "première": 1, "premiere": 1, "deuxième": 2,
    "deuxieme": 2, "second": 2, "seconde": 2, "troisième": 3,
    "troisieme": 3, "quatrième": 4, "quatrieme": 4, "cinquième": 5,
    "cinquieme": 5, "sixième": 6, "sixieme": 6, "septième": 7,
    "septieme": 7, "huitième": 8, "huitieme": 8, "neuvième": 9,
    "neuvieme": 9, "dixième": 10, "dixieme": 10,
}

FR_ORDINAL_WORDS = set(_FR_ORDINALS)


def _words_to_number_fr(words: list[str]) -> float | None:
    """French composed numbers: 'vingt et un'=21, 'soixante quinze'=75,
    'quatre vingt dix sept'=97, 'deux cents'=200, 'trois mille'=3000."""
    total = 0
    current = 0      # the 0-999 block being built
    block_done = False  # units already attached → block complete
    seen_value = False
    i, n = 0, len(words)
    while i < n:
        w = words[i]
        if w == "quatre" and i + 1 < n and words[i + 1] in ("vingt",
                                                            "vingts"):
            if block_done or current % 100 != 0:
                return None
            current += 80
            seen_value = True
            i += 2
            # quatre-vingt-dix forms: a following unit/teen adds (81-99)
            if i < n and words[i] in _FR_UNITS:
                current += _FR_UNITS[words[i]]
                block_done = True
                # quatre vingt dix sept = 97 (dix + sept)
                if words[i] == "dix" and i + 1 < n \
                        and words[i + 1] in _FR_UNITS \
                        and 1 <= _FR_UNITS[words[i + 1]] <= 9:
                    current += _FR_UNITS[words[i + 1]]
                    i += 1
                i += 1
            continue
        if w in _FR_TENS:
            if block_done or current % 100 != 0:
                return None
            current += _FR_TENS[w]
            seen_value = True
            i += 1
            if i < n and words[i] == "et" and i + 1 < n \
                    and words[i + 1] in ("un", "une", "onze"):
                current += _FR_UNITS[words[i + 1]]
                block_done = True
                i += 2
            elif i < n and words[i] in _FR_UNITS \
                    and 1 <= _FR_UNITS[words[i]] <= (16 if w == "soixante"
                                                     else 9):
                # soixante quinze = 75; soixante dix sept = 77; teens only
                # compose with soixante (no 'vingt douze')
                current += _FR_UNITS[words[i]]
                block_done = True
                if words[i] == "dix" and i + 1 < n \
                        and words[i + 1] in _FR_UNITS \
                        and 1 <= _FR_UNITS[words[i + 1]] <= 9:
                    current += _FR_UNITS[words[i + 1]]
                    i += 1
                i += 1
            continue
        if w in _FR_UNITS:
            if block_done or (current and current % 100 != 0):
                return None
            current += _FR_UNITS[w]
            seen_value = True
            block_done = True
            # dix-sept/huit/neuf
            if w == "dix" and i + 1 < n and words[i + 1] in _FR_UNITS \
                    and 1 <= _FR_UNITS[words[i + 1]] <= 9:
                current += _FR_UNITS[words[i + 1]]
                i += 1
            i += 1
            continue
        if w in _FR_SCALES:
            scale = _FR_SCALES[w]
            if current == 0:
                current = 1
            current *= scale
            if scale >= 1000:
                total += current
                current = 0
            seen_value = True
            block_done = False
            i += 1
            continue
        return None
    if not seen_value:
        return None
    return float(total + current)


# --- Spanish tables ---------------------------------------------------------

_ES_UNITS = {
    "cero": 0, "un": 1, "una": 1, "uno": 1, "dos": 2, "tres": 3,
    "cuatro": 4, "cinco": 5, "seis": 6, "siete": 7, "ocho": 8,
    "nueve": 9, "diez": 10, "once": 11, "doce": 12, "trece": 13,
    "catorce": 14, "quince": 15,
    "dieciséis": 16, "dieciseis": 16, "diecisiete": 17, "dieciocho": 18,
    "diecinueve": 19,
    "veintiuno": 21, "veintiún": 21, "veintiun": 21, "veintidós": 22,
    "veintidos": 22, "veintitrés": 23, "veintitres": 23,
    "veinticuatro": 24, "veinticinco": 25, "veintiséis": 26,
    "veintiseis": 26, "veintisiete": 27, "veintiocho": 28,
    "veintinueve": 29,
}
_ES_TENS = {"veinte": 20, "treinta": 30, "cuarenta": 40, "cincuenta": 50,
            "sesenta": 60, "setenta": 70, "ochenta": 80, "noventa": 90}
_ES_HUNDREDS = {
    "cien": 100, "ciento": 100, "doscientos": 200, "trescientos": 300,
    "cuatrocientos": 400, "quinientos": 500, "seiscientos": 600,
    "setecientos": 700, "ochocientos": 800, "novecientos": 900,
}
_ES_SCALES = {"mil": 1000, "millón": 10 ** 6, "millon": 10 ** 6,
              "millones": 10 ** 6}
_ES_GLUE = {"y"}

ES_NUMBER_WORDS = (set(_ES_UNITS) | set(_ES_TENS) | set(_ES_HUNDREDS)
                   | set(_ES_SCALES) | _ES_GLUE)

_ES_ORDINALS = {
    "primero": 1, "primera": 1, "primer": 1, "segundo": 2, "segunda": 2,
    "tercero": 3, "tercera": 3, "tercer": 3, "cuarto": 4, "cuarta": 4,
    "quinto": 5, "quinta": 5, "sexto": 6, "sexta": 6, "séptimo": 7,
    "septimo": 7, "séptima": 7, "septima": 7, "octavo": 8, "octava": 8,
    "noveno": 9, "novena": 9, "décimo": 10, "decimo": 10, "décima": 10,
    "decima": 10,
}

ES_ORDINAL_WORDS = set(_ES_ORDINALS)


def _words_to_number_es(words: list[str]) -> float | None:
    """Spanish composed numbers: 'treinta y dos'=32, 'ciento cinco'=105,
    'dos mil veinte'=2020."""
    total = 0
    current = 0
    block_done = False
    seen_value = False
    i, n = 0, len(words)
    while i < n:
        w = words[i]
        if w in _ES_HUNDREDS:
            if block_done or current != 0:
                return None
            current += _ES_HUNDREDS[w]
            seen_value = True
            i += 1
            continue
        if w in _ES_TENS:
            if block_done or current % 100 != 0:
                return None
            current += _ES_TENS[w]
            seen_value = True
            i += 1
            if i + 1 < n and words[i] == "y" \
                    and words[i + 1] in _ES_UNITS \
                    and 1 <= _ES_UNITS[words[i + 1]] <= 9:
                current += _ES_UNITS[words[i + 1]]
                block_done = True
                i += 2
            continue
        if w in _ES_UNITS:
            if block_done or (current and current % 100 != 0):
                return None
            current += _ES_UNITS[w]
            seen_value = True
            block_done = True
            i += 1
            continue
        if w in _ES_SCALES:
            scale = _ES_SCALES[w]
            if current == 0:
                current = 1
            current *= scale
            total += current
            current = 0
            seen_value = True
            block_done = False
            i += 1
            continue
        return None
    if not seen_value:
        return None
    return float(total + current)


# --- German tables ----------------------------------------------------------
# German composes numbers into SINGLE fused words (einundzwanzig,
# zweihundertdreiundvierzig), so the de grammar is a recursive
# decomposition of one token rather than a multi-word fold.

_DE_UNITS = {
    "null": 0, "ein": 1, "eins": 1, "eine": 1, "einen": 1, "zwei": 2,
    "drei": 3, "vier": 4, "fünf": 5, "fuenf": 5, "sechs": 6, "sieben": 7,
    "acht": 8, "neun": 9, "zehn": 10, "elf": 11, "zwölf": 12,
    "zwoelf": 12, "dreizehn": 13, "vierzehn": 14, "fünfzehn": 15,
    "fuenfzehn": 15, "sechzehn": 16, "siebzehn": 17, "achtzehn": 18,
    "neunzehn": 19,
}
_DE_TENS = {"zwanzig": 20, "dreißig": 30, "dreissig": 30, "vierzig": 40,
            "fünfzig": 50, "fuenfzig": 50, "sechzig": 60, "siebzig": 70,
            "achtzig": 80, "neunzig": 90}

_DE_ORDINALS = {
    "erste": 1, "erster": 1, "erstes": 1, "ersten": 1, "zweite": 2,
    "zweiter": 2, "zweites": 2, "zweiten": 2, "dritte": 3, "dritter": 3,
    "drittes": 3, "dritten": 3, "vierte": 4, "vierten": 4, "fünfte": 5,
    "fuenfte": 5, "fünften": 5, "sechste": 6, "siebte": 7, "achte": 8,
    "neunte": 9, "zehnte": 10, "zehnten": 10,
}

DE_ORDINAL_WORDS = set(_DE_ORDINALS)


def _de_below_100(s: str) -> int | None:
    if s in _DE_UNITS:
        return _DE_UNITS[s]
    if s in _DE_TENS:
        return _DE_TENS[s]
    # <unit>und<tens>: einundzwanzig = 21
    if "und" in s:
        unit, _, tens = s.partition("und")
        if unit in _DE_UNITS and 1 <= _DE_UNITS[unit] <= 9 \
                and tens in _DE_TENS:
            return _DE_UNITS[unit] + _DE_TENS[tens]
    return None


def _de_below_1000(s: str) -> int | None:
    v = _de_below_100(s)
    if v is not None:
        return v
    if "hundert" in s:
        prefix, _, rest = s.partition("hundert")
        h = 1 if prefix == "" else _DE_UNITS.get(prefix)
        if h is None or not 1 <= h <= 9:
            return None
        if rest == "":
            return h * 100
        # optional "und" glue: hundertundfünf
        if rest.startswith("und"):
            rest = rest[3:]
        r = _de_below_100(rest)
        return h * 100 + r if r is not None else None
    return None


def _de_token_value(s: str) -> int | None:
    """Recursive decomposition of one fused German number word."""
    v = _de_below_1000(s)
    if v is not None:
        return v
    if "tausend" in s:
        prefix, _, rest = s.partition("tausend")
        th = 1 if prefix == "" else _de_below_1000(prefix)
        if th is None:
            return None
        if rest == "":
            return th * 1000
        if rest.startswith("und"):
            rest = rest[3:]
        r = _de_below_1000(rest)
        return th * 1000 + r if r is not None else None
    return None


def _words_to_number_de(words: list[str]) -> float | None:
    """One fused word, or '<X> million(en)' / '<X> tausend' pairs."""
    if len(words) == 1:
        v = _de_token_value(words[0])
        return float(v) if v is not None else None
    if len(words) == 2 and words[1] in ("million", "millionen"):
        v = _de_token_value(words[0])
        return float(v * 10 ** 6) if v is not None else None
    if len(words) == 2 and words[1] == "tausend":
        v = _de_below_1000(words[0])
        return float(v * 1000) if v is not None else None
    return None


# --- Portuguese tables --------------------------------------------------------

_PT_UNITS = {
    "zero": 0, "um": 1, "uma": 1, "dois": 2, "duas": 2, "três": 3,
    "tres": 3, "quatro": 4, "cinco": 5, "seis": 6, "sete": 7, "oito": 8,
    "nove": 9, "dez": 10, "onze": 11, "doze": 12, "treze": 13,
    "catorze": 14, "quatorze": 14, "quinze": 15, "dezesseis": 16,
    "dezasseis": 16, "dezessete": 17, "dezassete": 17, "dezoito": 18,
    "dezenove": 19, "dezanove": 19,
}
_PT_TENS = {"vinte": 20, "trinta": 30, "quarenta": 40, "cinquenta": 50,
            "sessenta": 60, "setenta": 70, "oitenta": 80, "noventa": 90}
_PT_HUNDREDS = {
    "cem": 100, "cento": 100, "duzentos": 200, "trezentos": 300,
    "quatrocentos": 400, "quinhentos": 500, "seiscentos": 600,
    "setecentos": 700, "oitocentos": 800, "novecentos": 900,
}
_PT_SCALES = {"mil": 1000, "milhão": 10 ** 6, "milhao": 10 ** 6,
              "milhões": 10 ** 6, "milhoes": 10 ** 6}
_PT_GLUE = {"e"}

PT_NUMBER_WORDS = (set(_PT_UNITS) | set(_PT_TENS) | set(_PT_HUNDREDS)
                   | set(_PT_SCALES) | _PT_GLUE)

_PT_ORDINALS = {
    "primeiro": 1, "primeira": 1, "segundo": 2, "segunda": 2,
    "terceiro": 3, "terceira": 3, "quarto": 4, "quarta": 4, "quinto": 5,
    "quinta": 5, "sexto": 6, "sexta": 6, "sétimo": 7, "setimo": 7,
    "oitavo": 8, "oitava": 8, "nono": 9, "nona": 9, "décimo": 10,
    "decimo": 10,
}

PT_ORDINAL_WORDS = set(_PT_ORDINALS)


def _words_to_number_pt(words: list[str]) -> float | None:
    """Portuguese composed numbers with the 'e' connective at every
    level: 'trinta e dois'=32, 'cento e cinco'=105, 'dois mil e vinte'=
    2020."""
    total = 0
    current = 0
    block_done = False
    seen_value = False
    expect_after_e = False
    i, n = 0, len(words)
    while i < n:
        w = words[i]
        if w == "e":
            if not seen_value or i + 1 == n:
                return None
            expect_after_e = True
            i += 1
            continue
        if w in _PT_HUNDREDS:
            if block_done or current != 0:
                return None
            current += _PT_HUNDREDS[w]
            seen_value = True
            expect_after_e = False
            i += 1
            continue
        if w in _PT_TENS:
            if block_done or current % 100 != 0:
                return None
            current += _PT_TENS[w]
            seen_value = True
            expect_after_e = False
            i += 1
            continue
        if w in _PT_UNITS:
            if block_done or (current and current % 100 != 0
                              and current % 10 == 0 and not expect_after_e):
                return None
            if block_done:
                return None
            current += _PT_UNITS[w]
            seen_value = True
            block_done = True
            expect_after_e = False
            i += 1
            continue
        if w in _PT_SCALES:
            scale = _PT_SCALES[w]
            if current == 0:
                current = 1
            current *= scale
            total += current
            current = 0
            seen_value = True
            block_done = False
            expect_after_e = False
            i += 1
            continue
        return None
    if not seen_value:
        return None
    return float(total + current)


# --- Italian tables ---------------------------------------------------------
# Italian also fuses compounds (ventidue, duecentotrentaquattro, duemila)
# with vowel elision before uno/otto (ventuno, ventotto, centottanta), so
# like German it parses by recursive token decomposition.

_IT_UNITS = {
    "zero": 0, "uno": 1, "un": 1, "una": 1, "due": 2, "tre": 3,
    "tré": 3, "quattro": 4, "cinque": 5, "sei": 6, "sette": 7,
    "otto": 8, "nove": 9, "dieci": 10, "undici": 11, "dodici": 12,
    "tredici": 13, "quattordici": 14, "quindici": 15, "sedici": 16,
    "diciassette": 17, "diciotto": 18, "diciannove": 19,
}
_IT_TENS = {"venti": 20, "trenta": 30, "quaranta": 40, "cinquanta": 50,
            "sessanta": 60, "settanta": 70, "ottanta": 80, "novanta": 90}

_IT_ORDINALS = {
    "primo": 1, "prima": 1, "secondo": 2, "seconda": 2, "terzo": 3,
    "terza": 3, "quarto": 4, "quarta": 4, "quinto": 5, "quinta": 5,
    "sesto": 6, "sesta": 6, "settimo": 7, "settima": 7, "ottavo": 8,
    "ottava": 8, "nono": 9, "nona": 9, "decimo": 10, "decima": 10,
}

IT_ORDINAL_WORDS = set(_IT_ORDINALS)

_IT_ATTACHABLE = {u: v for u, v in _IT_UNITS.items()
                  if 1 <= v <= 9 and u not in ("un", "una")}


def _it_below_100(s: str) -> int | None:
    if s in _IT_UNITS:
        return _IT_UNITS[s]
    if s in _IT_TENS:
        return _IT_TENS[s]
    for tens_word, tens_val in _IT_TENS.items():
        if s.startswith(tens_word):
            rest = s[len(tens_word):]
            if rest in _IT_ATTACHABLE and rest not in ("uno", "otto"):
                return tens_val + _IT_ATTACHABLE[rest]
        # vowel elision: vent+uno / vent+otto, trent+uno, …
        elided = tens_word[:-1]
        if s.startswith(elided):
            rest = s[len(elided):]
            if rest in ("uno", "otto"):
                return tens_val + _IT_UNITS[rest]
    return None


def _it_below_1000(s: str) -> int | None:
    v = _it_below_100(s)
    if v is not None:
        return v
    for h in range(1, 10):
        prefix = "" if h == 1 else             {2: "due", 3: "tre", 4: "quattro", 5: "cinque", 6: "sei",
             7: "sette", 8: "otto", 9: "nove"}[h]
        for stem_word in (prefix + "cento", prefix + "cent"):
            if not s.startswith(stem_word):
                continue
            rest = s[len(stem_word):]
            if stem_word.endswith("cento"):
                if rest == "":
                    return h * 100
                r = _it_below_100(rest)
                if r is not None:
                    return h * 100 + r
            elif rest.startswith("o"):  # elision: centottanta
                r = _it_below_100(rest)
                if r is not None:
                    return h * 100 + r
    return None


def _it_token_value(s: str) -> int | None:
    v = _it_below_1000(s)
    if v is not None:
        return v
    if s == "mille":
        return 1000
    if s.startswith("mille"):
        r = _it_below_1000(s[5:])
        return 1000 + r if r is not None else None
    if "mila" in s:
        prefix, _, rest = s.partition("mila")
        th = _it_below_1000(prefix)
        if th is None:
            return None
        if rest == "":
            return th * 1000
        r = _it_below_1000(rest)
        return th * 1000 + r if r is not None else None
    return None


def _words_to_number_it(words: list[str]) -> float | None:
    if len(words) == 1:
        v = _it_token_value(words[0])
        return float(v) if v is not None else None
    if len(words) == 2 and words[1] in ("milione", "milioni"):
        v = _it_token_value(words[0])
        return float(v * 10 ** 6) if v is not None else None
    return None


# --- japanese ---------------------------------------------------------
# Kanji numerals tokenize as one run (textcore CJK script classes give
# them their own class), so the whole numeral is a single token parsed
# character-wise: positional form (二〇二四 = 2024) when only digit
# kanji appear, scale form otherwise (三百二十五 = 325, 二万五千 =
# 25000). Mixed digit+kanji forms (3万) span two tokens and are out of
# scope (documented divergence — the reference defers to its Rust
# grammar).

_JA_DIGITS = {"〇": 0, "零": 0, "一": 1, "二": 2, "三": 3, "四": 4,
              "五": 5, "六": 6, "七": 7, "八": 8, "九": 9}
_JA_SMALL_SCALES = {"十": 10, "百": 100, "千": 1000}
_JA_BIG_SCALES = {"万": 10 ** 4, "億": 10 ** 8, "兆": 10 ** 12}
JA_NUMERAL_CHARS = (set(_JA_DIGITS) | set(_JA_SMALL_SCALES)
                    | set(_JA_BIG_SCALES))


def _kanji_to_number(s: str) -> float | None:
    if not s or any(ch not in JA_NUMERAL_CHARS for ch in s):
        return None
    if all(ch in _JA_DIGITS for ch in s):
        val = 0
        for ch in s:
            val = val * 10 + _JA_DIGITS[ch]
        return float(val)
    total = 0
    section = 0   # value below the next big scale (万/億/兆)
    num = 0       # pending digit for the next small scale
    prev_small = None
    for ch in s:
        if ch in _JA_DIGITS:
            if num:
                return None          # two digit kanji in scale form
            num = _JA_DIGITS[ch]
        elif ch in _JA_SMALL_SCALES:
            scale = _JA_SMALL_SCALES[ch]
            if prev_small is not None and scale >= prev_small:
                return None          # scales must descend (十百 invalid)
            prev_small = scale
            section += (num or 1) * scale
            num = 0
        else:
            sec = section + num
            total += (sec or 1) * _JA_BIG_SCALES[ch]
            section = num = 0
            prev_small = None
    return float(total + section + num)


def _words_to_number_ja(words: list[str]) -> float | None:
    if len(words) != 1:
        return None
    return _kanji_to_number(words[0])


# --- korean -----------------------------------------------------------
# Sino-Korean numerals fuse into one hangul token (이십오 = 25) and
# parse character-wise with the same scale algorithm as kanji; native
# Korean counters (하나/둘/… and their determiner forms 한/두/세/네)
# are an enumerable word set. Single-syllable sino digits double as
# ordinary words (이 "this", 일 "day") — the same homograph ambiguity
# en accepts for "may"/"a".

_KO_DIGITS = {"영": 0, "공": 0, "일": 1, "이": 2, "삼": 3, "사": 4,
              "오": 5, "육": 6, "칠": 7, "팔": 8, "구": 9}
_KO_SMALL_SCALES = {"십": 10, "백": 100, "천": 1000}
_KO_BIG_SCALES = {"만": 10 ** 4, "억": 10 ** 8, "조": 10 ** 12}
KO_NATIVE_NUMBERS = {
    "하나": 1, "둘": 2, "셋": 3, "넷": 4, "다섯": 5, "여섯": 6,
    "일곱": 7, "여덟": 8, "아홉": 9, "열": 10, "스물": 20,
    "한": 1, "두": 2, "세": 3, "네": 4, "스무": 20,
}


def _hangul_to_number(s: str) -> float | None:
    if not s or any(ch not in _KO_DIGITS and ch not in _KO_SMALL_SCALES
                    and ch not in _KO_BIG_SCALES for ch in s):
        return None
    if all(ch in _KO_DIGITS for ch in s):
        val = 0
        for ch in s:
            val = val * 10 + _KO_DIGITS[ch]
        return float(val)
    total = 0
    section = 0
    num = 0
    prev_small = None
    for ch in s:
        if ch in _KO_DIGITS:
            if num:
                return None
            num = _KO_DIGITS[ch]
        elif ch in _KO_SMALL_SCALES:
            scale = _KO_SMALL_SCALES[ch]
            if prev_small is not None and scale >= prev_small:
                return None
            prev_small = scale
            section += (num or 1) * scale
            num = 0
        else:
            sec = section + num
            total += (sec or 1) * _KO_BIG_SCALES[ch]
            section = num = 0
            prev_small = None
    return float(total + section + num)


def _ko_token_value(token: str) -> float | None:
    if token in KO_NATIVE_NUMBERS:
        return float(KO_NATIVE_NUMBERS[token])
    return _hangul_to_number(token)


def _words_to_number_ko(words: list[str]) -> float | None:
    if len(words) != 1:
        return None
    return _ko_token_value(words[0])


def is_number_word(token: str, language: str = "en") -> bool:
    """Can ``token`` start/continue a number phrase? German fused
    compounds can't be enumerated, so membership is a parse probe."""
    token = token.lower()
    if language == "de":
        return (token in ("million", "millionen", "tausend")
                or _de_token_value(token) is not None)
    if language == "it":
        return (token in ("milione", "milioni")
                or _it_token_value(token) is not None)
    if language == "ja":
        return _kanji_to_number(token) is not None
    if language == "ko":
        return _ko_token_value(token) is not None
    return token in number_words(language)


def number_words(language: str = "en") -> set[str]:
    """Words that may start/continue a number phrase in ``language``
    (enumerable languages only — use ``is_number_word`` for de)."""
    if language == "fr":
        return FR_NUMBER_WORDS
    if language == "es":
        return ES_NUMBER_WORDS
    if language == "pt":
        return PT_NUMBER_WORDS
    return NUMBER_WORDS


def ordinal_words(language: str = "en") -> set[str]:
    if language == "fr":
        return FR_ORDINAL_WORDS
    if language == "es":
        return ES_ORDINAL_WORDS
    if language == "de":
        return DE_ORDINAL_WORDS
    if language == "it":
        return IT_ORDINAL_WORDS
    if language == "pt":
        return PT_ORDINAL_WORDS
    return ORDINAL_WORDS


def words_to_number(phrase: str, language: str = "en") -> float | None:
    """Parse a number phrase ("twenty two", "a hundred and five",
    "vingt et un", "treinta y dos") to its value; None when the phrase is
    not a number."""
    words = phrase.replace("-", " ").lower().split()
    if not words:
        return None
    if language == "fr":
        return _words_to_number_fr(words)
    if language == "es":
        return _words_to_number_es(words)
    if language == "de":
        return _words_to_number_de(words)
    if language == "it":
        return _words_to_number_it(words)
    if language == "pt":
        return _words_to_number_pt(words)
    if language == "ja":
        return _words_to_number_ja(words)
    if language == "ko":
        return _words_to_number_ko(words)
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


def ordinal_word_to_number(word: str, language: str = "en") -> int | None:
    """"third" / "troisième" / "tercero" → 3; single-word ordinals only."""
    if language == "fr":
        return _FR_ORDINALS.get(word.lower())
    if language == "es":
        return _ES_ORDINALS.get(word.lower())
    if language == "de":
        return _DE_ORDINALS.get(word.lower())
    if language == "it":
        return _IT_ORDINALS.get(word.lower())
    if language == "pt":
        return _PT_ORDINALS.get(word.lower())
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

"""Property tests for the fr/es number grammars: an INDEPENDENT
phrase composer (standard orthography rules, written fresh here) must
round-trip through words_to_number for every value — a differential that
doesn't share code with the parser."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from snips_nlu_spark.entities.numbers import words_to_number


def _compose_fr(n: int) -> str:
    units = ["zéro", "un", "deux", "trois", "quatre", "cinq", "six",
             "sept", "huit", "neuf", "dix", "onze", "douze", "treize",
             "quatorze", "quinze", "seize"]

    def below_20(k):
        if k < 17:
            return units[k]
        return "dix " + units[k - 10]  # dix sept / dix huit / dix neuf

    def below_100(k):
        if k < 20:
            return below_20(k)
        tens, unit = divmod(k, 10)
        if tens in (7, 9):  # soixante-dix / quatre-vingt-dix families
            base = "soixante" if tens == 7 else "quatre vingt"
            rest = below_20(10 + unit)
            if tens == 7 and unit == 1:
                return "soixante et onze"
            return f"{base} {rest}"
        if tens == 8:
            return "quatre vingts" if unit == 0 else \
                f"quatre vingt {units[unit]}"
        word = {2: "vingt", 3: "trente", 4: "quarante", 5: "cinquante",
                6: "soixante"}[tens]
        if unit == 0:
            return word
        if unit == 1:
            return f"{word} et un"
        return f"{word} {units[unit]}"

    def below_1000(k):
        h, rest = divmod(k, 100)
        parts = []
        if h == 1:
            parts.append("cent")
        elif h > 1:
            parts.append(f"{units[h]} cent" + ("s" if rest == 0 else ""))
        if rest:
            parts.append(below_100(rest))
        return " ".join(parts) if parts else units[0]

    if n < 1000:
        return below_1000(n)
    th, rest = divmod(n, 1000)
    th_part = "mille" if th == 1 else f"{below_1000(th)} mille"
    return th_part if rest == 0 else f"{th_part} {below_1000(rest)}"


def _compose_es(n: int) -> str:
    units = ["cero", "uno", "dos", "tres", "cuatro", "cinco", "seis",
             "siete", "ocho", "nueve", "diez", "once", "doce", "trece",
             "catorce", "quince", "dieciséis", "diecisiete", "dieciocho",
             "diecinueve", "veinte", "veintiuno", "veintidós",
             "veintitrés", "veinticuatro", "veinticinco", "veintiséis",
             "veintisiete", "veintiocho", "veintinueve"]

    def below_100(k):
        if k < 30:
            return units[k]
        tens, unit = divmod(k, 10)
        word = {3: "treinta", 4: "cuarenta", 5: "cincuenta",
                6: "sesenta", 7: "setenta", 8: "ochenta",
                9: "noventa"}[tens]
        return word if unit == 0 else f"{word} y {units[unit]}"

    def below_1000(k):
        h, rest = divmod(k, 100)
        if h == 0:
            return below_100(k)
        hw = {1: "cien" if rest == 0 else "ciento", 2: "doscientos",
              3: "trescientos", 4: "cuatrocientos", 5: "quinientos",
              6: "seiscientos", 7: "setecientos", 8: "ochocientos",
              9: "novecientos"}[h]
        return hw if rest == 0 else f"{hw} {below_100(rest)}"

    if n < 1000:
        return below_1000(n)
    th, rest = divmod(n, 1000)
    th_part = "mil" if th == 1 else f"{below_1000(th)} mil"
    return th_part if rest == 0 else f"{th_part} {below_1000(rest)}"


def _compose_de(n: int) -> str:
    units = ["null", "eins", "zwei", "drei", "vier", "fünf", "sechs",
             "sieben", "acht", "neun", "zehn", "elf", "zwölf",
             "dreizehn", "vierzehn", "fünfzehn", "sechzehn", "siebzehn",
             "achtzehn", "neunzehn"]
    # "ein" inside compounds, "eins" standalone
    unit_in = ["", "ein", "zwei", "drei", "vier", "fünf", "sechs",
               "sieben", "acht", "neun"]
    tens = {2: "zwanzig", 3: "dreißig", 4: "vierzig", 5: "fünfzig",
            6: "sechzig", 7: "siebzig", 8: "achtzig", 9: "neunzig"}

    def below_100(k):
        if k < 20:
            return units[k]
        t, u = divmod(k, 10)
        return tens[t] if u == 0 else f"{unit_in[u]}und{tens[t]}"

    def below_1000(k):
        h, rest = divmod(k, 100)
        if h == 0:
            return below_100(k)
        word = ("hundert" if h == 1 else f"{unit_in[h]}hundert")
        return word if rest == 0 else word + below_100(rest)

    if n < 1000:
        return below_1000(n)
    th, rest = divmod(n, 1000)
    word = "tausend" if th == 1 else below_1000(th) + "tausend"
    return word if rest == 0 else word + below_1000(rest)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=999_999))
def test_fr_number_roundtrip(n):
    assert words_to_number(_compose_fr(n), "fr") == float(n)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=999_999))
def test_de_number_roundtrip(n):
    assert words_to_number(_compose_de(n), "de") == float(n)


def _compose_it(n: int) -> str:
    units = ["zero", "uno", "due", "tre", "quattro", "cinque", "sei",
             "sette", "otto", "nove", "dieci", "undici", "dodici",
             "tredici", "quattordici", "quindici", "sedici",
             "diciassette", "diciotto", "diciannove"]
    tens = {2: "venti", 3: "trenta", 4: "quaranta", 5: "cinquanta",
            6: "sessanta", 7: "settanta", 8: "ottanta", 9: "novanta"}

    def below_100(k):
        if k < 20:
            return units[k]
        t, u = divmod(k, 10)
        word = tens[t]
        if u == 0:
            return word
        if u in (1, 8):  # vowel elision: ventuno, ventotto
            return word[:-1] + units[u]
        return word + units[u]

    def below_1000(k):
        h, rest = divmod(k, 100)
        if h == 0:
            return below_100(k)
        word = "cento" if h == 1 else units[h] + "cento"
        if rest == 0:
            return word
        tail = below_100(rest)
        if tail.startswith("o"):  # elision: centottanta
            return word[:-1] + tail
        return word + tail

    if n < 1000:
        return below_1000(n)
    th, rest = divmod(n, 1000)
    word = "mille" if th == 1 else below_1000(th) + "mila"
    return word if rest == 0 else word + below_1000(rest)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=999_999))
def test_it_number_roundtrip(n):
    assert words_to_number(_compose_it(n), "it") == float(n)


def _compose_pt(n: int) -> str:
    units = ["zero", "um", "dois", "três", "quatro", "cinco", "seis",
             "sete", "oito", "nove", "dez", "onze", "doze", "treze",
             "catorze", "quinze", "dezesseis", "dezessete", "dezoito",
             "dezenove"]
    tens = {2: "vinte", 3: "trinta", 4: "quarenta", 5: "cinquenta",
            6: "sessenta", 7: "setenta", 8: "oitenta", 9: "noventa"}
    hundreds = {1: "cento", 2: "duzentos", 3: "trezentos",
                4: "quatrocentos", 5: "quinhentos", 6: "seiscentos",
                7: "setecentos", 8: "oitocentos", 9: "novecentos"}

    def below_100(k):
        if k < 20:
            return units[k]
        t, u = divmod(k, 10)
        return tens[t] if u == 0 else f"{tens[t]} e {units[u]}"

    def below_1000(k):
        h, rest = divmod(k, 100)
        if h == 0:
            return below_100(k)
        if h == 1 and rest == 0:
            return "cem"
        word = hundreds[h]
        return word if rest == 0 else f"{word} e {below_100(rest)}"

    if n < 1000:
        return below_1000(n)
    th, rest = divmod(n, 1000)
    word = "mil" if th == 1 else f"{below_1000(th)} mil"
    return word if rest == 0 else f"{word} e {below_1000(rest)}"


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=999_999))
def test_pt_number_roundtrip(n):
    assert words_to_number(_compose_pt(n), "pt") == float(n)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=999_999))
def test_es_number_roundtrip(n):
    assert words_to_number(_compose_es(n), "es") == float(n)


@settings(max_examples=100, deadline=None)
@given(st.datetimes(min_value=datetime.datetime(2000, 1, 1),
                    max_value=datetime.datetime(2040, 12, 31)))
def test_relative_day_anchoring_invariants(anchor):
    """'tomorrow'/'demain'/'mañana' is always anchor's date + 1 day at
    midnight, for every anchor; weekdays are strictly in the NEXT 7 days;
    range endpoints always satisfy from < to."""
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    expected = (anchor.replace(hour=0, minute=0, second=0, microsecond=0)
                + datetime.timedelta(days=1)).strftime(
        "%Y-%m-%d %H:%M:%S")
    for lang, word in (("en", "tomorrow"), ("fr", "demain"),
                       ("es", "mañana")):
        out = BuiltinEntityParser(language=lang).parse(
            word, scope=("snips/datetime",), anchor=anchor)
        assert out[0]["resolved_value"]["value"] == expected, (lang, word)

    p = BuiltinEntityParser(language="en")
    (m,) = p.parse("on monday", scope=("snips/datetime",), anchor=anchor)
    resolved = datetime.datetime.strptime(
        m["resolved_value"]["value"], "%Y-%m-%d %H:%M:%S")
    assert resolved.weekday() == 0
    assert datetime.timedelta(days=0) < resolved - anchor.replace(
        hour=0, minute=0, second=0, microsecond=0) \
        <= datetime.timedelta(days=7)

    (rng,) = p.parse("from monday to friday", scope=("snips/datetime",),
                     anchor=anchor)
    assert rng["resolved_value"]["from"] < rng["resolved_value"]["to"]

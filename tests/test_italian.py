"""Italian end-to-end (round-2 language expansion #4) — fused compounds
with vowel elision; hand-computed expectations."""

import datetime

import pytest

ANCHOR = datetime.datetime(2024, 5, 2)  # giovedì


from snips_nlu_spark.fixtures import it_dataset as _it_dataset  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    from snips_nlu_spark.engine import NluEngine
    return NluEngine().fit(_it_dataset())


def test_it_number_words():
    from snips_nlu_spark.entities.numbers import words_to_number
    assert words_to_number("ventidue", "it") == 22.0
    assert words_to_number("ventuno", "it") == 21.0  # elision
    assert words_to_number("centottanta", "it") == 180.0  # elision
    assert words_to_number("duecentotrentaquattro", "it") == 234.0
    assert words_to_number("duemilaventi", "it") == 2020.0
    assert words_to_number("ventiuno", "it") is None  # must elide


def test_it_builtin_grammar():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="it")

    def one(text, kind):
        out = p.parse(text, scope=(kind,), anchor=ANCHOR)
        assert len(out) == 1, (text, out)
        return out[0]

    m = one("fammi ventidue copie", "snips/number")
    assert m["resolved_value"] == {"kind": "Number", "value": 22.0}

    m = one("aspetta dieci minuti", "snips/duration")
    assert m["resolved_value"]["minutes"] == 10

    m = one("al venticinque per cento", "snips/percentage")
    assert m["resolved_value"] == {"kind": "Percentage", "value": 25.0}

    m = one("la terza volta", "snips/ordinal")
    assert m["resolved_value"] == {"kind": "Ordinal", "value": 3}

    m = one("ci vediamo domani alle 8:30", "snips/datetime")
    assert m["value"] == "domani alle 8:30"
    assert m["resolved_value"]["value"] == "2024-05-03 08:30:00"

    m = one("il 3 giugno", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-06-03 00:00:00"

    m = one("da lunedì a venerdì", "snips/datetime")
    assert m["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-06 00:00:00",
        "to": "2024-05-10 00:00:00"}


def test_it_cascade(engine):
    r = engine.parse("fammi due tazze di caffè", anchor=ANCHOR)
    assert r["intent"] == {"intentName": "preparareBevanda",
                           "probability": 1.0}
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["numero_tazze"] == {"kind": "Number", "value": 2.0}
    assert vals["bevanda"] == {"kind": "Custom", "value": "caffè"}

    # synonym → canonical via probabilistic path
    r = engine.parse("prepara subito due tazze di cacao", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "preparareBevanda"
    vals = {s["slotName"]: s["value"]["value"] for s in r["slots"]}
    assert vals.get("bevanda") == "cioccolata calda"

    # anchored datetime + non-extensible drop
    r = engine.parse("prenotami un volo per roma domani", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "prenotareVolo"
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["destinazione"] == {"kind": "Custom", "value": "roma"}
    assert vals["data_partenza"]["value"] == "2024-05-03 00:00:00"

    r = engine.parse("prenotami un volo per atlantide domani",
                     anchor=ANCHOR)
    assert r["intent"]["intentName"] == "prenotareVolo"
    assert "destinazione" not in {s["slotName"] for s in r["slots"]}


def test_it_bundle_roundtrip(engine):
    from snips_nlu_spark.engine import NluEngine
    reloaded = NluEngine.from_dict(engine.to_dict())
    assert reloaded._bundle.builtin.language == "it"
    r = reloaded.parse("fammi due tazze di caffè", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "preparareBevanda"


def test_it_datetime_recurrence_and_relative_range():
    # recurrences resolve to the next occurrence; "next N units" is an
    # interval, bare "in N units" an instant (round-3 grammar additions,
    # same shapes as the en constructions)
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="it")
    anchor = datetime.datetime(2024, 5, 2)  # a Thursday
    ms = p.parse("x ogni lunedì y", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["value"] == "ogni lunedì"
    assert ms[0]["resolved_value"]["value"] == "2024-05-06 00:00:00"
    ms = p.parse("nelle prossime 3 settimane", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-02 00:00:00",
        "to": "2024-05-23 00:00:00"}
    ms = p.parse("entro 3 settimane", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"]["value"] == "2024-05-23 00:00:00"

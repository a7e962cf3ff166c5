"""Portuguese end-to-end (round-2 language expansion #5) — hand-computed
expectations (covers both pt_pt/pt_br spellings in the number tables)."""

import datetime

import pytest

ANCHOR = datetime.datetime(2024, 5, 2)  # quinta-feira


from snips_nlu_spark.fixtures import pt_dataset as _pt_dataset  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    from snips_nlu_spark.engine import NluEngine
    return NluEngine().fit(_pt_dataset())


def test_pt_number_words():
    from snips_nlu_spark.entities.numbers import words_to_number
    assert words_to_number("trinta e dois", "pt") == 32.0
    assert words_to_number("vinte e um", "pt") == 21.0
    assert words_to_number("cento e cinco", "pt") == 105.0
    assert words_to_number("mil novecentos e oitenta e quatro",
                           "pt") == 1984.0
    assert words_to_number("dezesseis", "pt") == 16.0  # pt_br
    assert words_to_number("dezasseis", "pt") == 16.0  # pt_pt
    assert words_to_number("dois dois", "pt") is None


def test_pt_builtin_grammar():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="pt")

    def one(text, kind):
        out = p.parse(text, scope=(kind,), anchor=ANCHOR)
        assert len(out) == 1, (text, out)
        return out[0]

    m = one("espera dez minutos", "snips/duration")
    assert m["resolved_value"]["minutes"] == 10

    m = one("a vinte e cinco por cento", "snips/percentage")
    assert m["resolved_value"] == {"kind": "Percentage", "value": 25.0}

    m = one("a terceira vez", "snips/ordinal")
    assert m["resolved_value"] == {"kind": "Ordinal", "value": 3}

    m = one("vemo-nos amanhã às 8:30", "snips/datetime")
    assert m["value"] == "amanhã às 8:30"
    assert m["resolved_value"]["value"] == "2024-05-03 08:30:00"

    m = one("o 3 de junho", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-06-03 00:00:00"

    m = one("de segunda a sexta", "snips/datetime")
    assert m["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-06 00:00:00",
        "to": "2024-05-10 00:00:00"}


def test_pt_cascade(engine):
    r = engine.parse("faz duas xícaras de café", anchor=ANCHOR)
    assert r["intent"] == {"intentName": "prepararBebida",
                           "probability": 1.0}
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["numero_xicaras"] == {"kind": "Number", "value": 2.0}
    assert vals["bebida"] == {"kind": "Custom", "value": "café"}

    # synonym → canonical via probabilistic path
    r = engine.parse("prepara agora duas xícaras de cacau", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "prepararBebida"
    vals = {s["slotName"]: s["value"]["value"] for s in r["slots"]}
    assert vals.get("bebida") == "chocolate quente"

    # anchored datetime + non-extensible drop
    r = engine.parse("reserva um voo para lisboa amanhã", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "reservarVoo"
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["destino"] == {"kind": "Custom", "value": "lisboa"}
    assert vals["data_partida"]["value"] == "2024-05-03 00:00:00"

    r = engine.parse("reserva um voo para atlantida amanhã", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "reservarVoo"
    assert "destino" not in {s["slotName"] for s in r["slots"]}


def test_pt_bundle_roundtrip(engine):
    from snips_nlu_spark.engine import NluEngine
    reloaded = NluEngine.from_dict(engine.to_dict())
    assert reloaded._bundle.builtin.language == "pt"
    r = reloaded.parse("faz duas xícaras de café", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "prepararBebida"


def test_pt_datetime_recurrence_and_relative_range():
    # recurrences resolve to the next occurrence; "next N units" is an
    # interval, bare "in N units" an instant (round-3 grammar additions,
    # same shapes as the en constructions)
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="pt")
    anchor = datetime.datetime(2024, 5, 2)  # a Thursday
    ms = p.parse("x cada segunda y", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["value"] == "cada segunda"
    assert ms[0]["resolved_value"]["value"] == "2024-05-06 00:00:00"
    ms = p.parse("nas próximas 3 semanas", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-02 00:00:00",
        "to": "2024-05-23 00:00:00"}
    ms = p.parse("em 3 semanas", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"]["value"] == "2024-05-23 00:00:00"

"""Spanish end-to-end (round-2 language expansion #2) — hand-computed
expectations, same policy as test_golden_parses.py / test_french.py."""

import datetime

import pytest

ANCHOR = datetime.datetime(2024, 5, 2)  # jueves


@pytest.fixture(scope="module")
def engine():
    from snips_nlu_spark.engine import NluEngine
    from snips_nlu_spark.fixtures import es_dataset
    return NluEngine().fit(es_dataset())


def test_es_number_words():
    from snips_nlu_spark.entities.numbers import words_to_number
    assert words_to_number("treinta y dos", "es") == 32.0
    assert words_to_number("veintiuno", "es") == 21.0
    assert words_to_number("quinientos cuarenta y tres", "es") == 543.0
    assert words_to_number("mil novecientos ochenta y cuatro",
                           "es") == 1984.0
    assert words_to_number("treinta dos", "es") is None


def test_es_builtin_grammar():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="es")

    def one(text, kind):
        out = p.parse(text, scope=(kind,), anchor=ANCHOR)
        assert len(out) == 1, (text, out)
        return out[0]

    m = one("espera diez minutos", "snips/duration")
    assert m["resolved_value"]["minutes"] == 10

    m = one("al veinticinco por ciento", "snips/percentage")
    assert m["resolved_value"] == {"kind": "Percentage", "value": 25.0}

    m = one("la tercera vez", "snips/ordinal")
    assert m["resolved_value"] == {"kind": "Ordinal", "value": 3}

    m = one("nos vemos mañana a las 8:30", "snips/datetime")
    assert m["value"] == "mañana a las 8:30"
    assert m["resolved_value"]["value"] == "2024-05-03 08:30:00"

    m = one("el 3 de junio", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-06-03 00:00:00"

    m = one("de lunes a viernes", "snips/datetime")
    assert m["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-06 00:00:00",
        "to": "2024-05-10 00:00:00"}


def test_es_cascade(engine):
    r = engine.parse("hazme dos tazas de café", anchor=ANCHOR)
    assert r["intent"] == {"intentName": "prepararBebida",
                           "probability": 1.0}
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["numero_de_tazas"] == {"kind": "Number", "value": 2.0}
    assert vals["bebida"] == {"kind": "Custom", "value": "café"}

    # synonym → canonical (cacao → chocolate caliente), unseen phrasing
    r = engine.parse("prepara ahora dos tazas de cacao", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "prepararBebida"
    vals = {s["slotName"]: s["value"]["value"] for s in r["slots"]}
    assert vals.get("bebida") == "chocolate caliente"

    # datetime anchored (mañana = 2024-05-03) + non-extensible drop
    r = engine.parse("resérvame un vuelo a madrid mañana", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "reservarVuelo"
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["destino"] == {"kind": "Custom", "value": "madrid"}
    assert vals["fecha_salida"]["value"] == "2024-05-03 00:00:00"

    r = engine.parse("resérvame un vuelo a gotham mañana", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "reservarVuelo"
    assert "destino" not in {s["slotName"] for s in r["slots"]}


def test_es_bundle_roundtrip(engine):
    from snips_nlu_spark.engine import NluEngine
    reloaded = NluEngine.from_dict(engine.to_dict())
    assert reloaded._bundle.builtin.language == "es"
    r = reloaded.parse("hazme dos tazas de café", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "prepararBebida"


def test_es_datetime_recurrence_and_relative_range():
    # recurrences resolve to the next occurrence; "next N units" is an
    # interval, bare "in N units" an instant (round-3 grammar additions,
    # same shapes as the en constructions)
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="es")
    anchor = datetime.datetime(2024, 5, 2)  # a Thursday
    ms = p.parse("x cada lunes y", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["value"] == "cada lunes"
    assert ms[0]["resolved_value"]["value"] == "2024-05-06 00:00:00"
    ms = p.parse("en las próximas 3 semanas", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-02 00:00:00",
        "to": "2024-05-23 00:00:00"}
    ms = p.parse("en 3 semanas", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"]["value"] == "2024-05-23 00:00:00"

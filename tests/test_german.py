"""German end-to-end (round-2 language expansion #3) — fused-compound
number grammar + full cascade; hand-computed expectations."""

import datetime

import pytest

ANCHOR = datetime.datetime(2024, 5, 2)  # Donnerstag


from snips_nlu_spark.fixtures import de_dataset as _de_dataset  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    from snips_nlu_spark.engine import NluEngine
    return NluEngine().fit(_de_dataset())


def test_de_number_words():
    from snips_nlu_spark.entities.numbers import words_to_number
    assert words_to_number("einundzwanzig", "de") == 21.0
    assert words_to_number("zweihundertdreiundvierzig", "de") == 243.0
    assert words_to_number("zweitausendzwanzig", "de") == 2020.0
    assert words_to_number("zwei millionen", "de") == 2_000_000.0
    assert words_to_number("undzwanzig", "de") is None


def test_de_builtin_grammar():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="de")

    def one(text, kind):
        out = p.parse(text, scope=(kind,), anchor=ANCHOR)
        assert len(out) == 1, (text, out)
        return out[0]

    m = one("mach mir dreiundzwanzig kopien", "snips/number")
    assert m["resolved_value"] == {"kind": "Number", "value": 23.0}

    m = one("warte zehn minuten", "snips/duration")
    assert m["resolved_value"]["minutes"] == 10

    m = one("zu fünfzig prozent fertig", "snips/percentage")
    assert m["resolved_value"] == {"kind": "Percentage", "value": 50.0}

    m = one("stelle auf 20 grad", "snips/temperature")
    assert m["resolved_value"]["value"] == 20.0

    m = one("das dritte mal", "snips/ordinal")
    assert m["resolved_value"] == {"kind": "Ordinal", "value": 3}

    # datetime: morgen um 8:30 combined; am montag; von/bis range
    m = one("wir sehen uns morgen um 8:30", "snips/datetime")
    assert m["value"] == "morgen um 8:30"
    assert m["resolved_value"]["value"] == "2024-05-03 08:30:00"

    m = one("am montag um 8 uhr", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-05-06 08:00:00"

    m = one("von montag bis freitag", "snips/datetime")
    assert m["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-06 00:00:00",
        "to": "2024-05-10 00:00:00"}


def test_de_cascade(engine):
    r = engine.parse("mach mir zwei tassen kaffee", anchor=ANCHOR)
    assert r["intent"] == {"intentName": "getraenkKochen",
                           "probability": 1.0}
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["anzahl_tassen"] == {"kind": "Number", "value": 2.0}
    assert vals["getraenk"] == {"kind": "Custom", "value": "kaffee"}

    # synonym → canonical, probabilistic path
    r = engine.parse("koche jetzt schnell kakao", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "getraenkKochen"
    vals = {s["slotName"]: s["value"]["value"] for s in r["slots"]}
    assert vals.get("getraenk") == "heiße schokolade"

    # anchored datetime + non-extensible drop
    r = engine.parse("buche mir einen flug nach berlin morgen",
                     anchor=ANCHOR)
    assert r["intent"]["intentName"] == "flugBuchen"
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["ziel"] == {"kind": "Custom", "value": "berlin"}
    assert vals["abflugdatum"]["value"] == "2024-05-03 00:00:00"

    r = engine.parse("buche mir einen flug nach atlantis morgen",
                     anchor=ANCHOR)
    assert r["intent"]["intentName"] == "flugBuchen"
    assert "ziel" not in {s["slotName"] for s in r["slots"]}


def test_de_bundle_roundtrip(engine):
    from snips_nlu_spark.engine import NluEngine
    reloaded = NluEngine.from_dict(engine.to_dict())
    assert reloaded._bundle.builtin.language == "de"
    r = reloaded.parse("mach mir zwei tassen kaffee", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "getraenkKochen"


def test_de_datetime_recurrence_and_relative_range():
    # recurrences resolve to the next occurrence; "next N units" is an
    # interval, bare "in N units" an instant (round-3 grammar additions,
    # same shapes as the en constructions)
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="de")
    anchor = datetime.datetime(2024, 5, 2)  # a Thursday
    ms = p.parse("x jeden montag y", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["value"] == "jeden montag"
    assert ms[0]["resolved_value"]["value"] == "2024-05-06 00:00:00"
    ms = p.parse("in den nächsten 3 wochen", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-02 00:00:00",
        "to": "2024-05-23 00:00:00"}
    ms = p.parse("in 3 wochen", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"]["value"] == "2024-05-23 00:00:00"

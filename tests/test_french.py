"""French end-to-end: fr resources, fr number/datetime grammar, and the
full cascade (lookup + probabilistic + CRF + resolution) on the fr
fixture. Expectations are hand-computed (same policy as
test_golden_parses.py)."""

import datetime

import pytest

ANCHOR = datetime.datetime(2024, 5, 2)  # jeudi


@pytest.fixture(scope="module")
def engine():
    from snips_nlu_spark.engine import NluEngine
    from snips_nlu_spark.fixtures import fr_dataset
    return NluEngine().fit(fr_dataset())


def test_fr_number_words():
    from snips_nlu_spark.entities.numbers import words_to_number
    assert words_to_number("deux", "fr") == 2.0
    assert words_to_number("vingt et un", "fr") == 21.0
    assert words_to_number("soixante quinze", "fr") == 75.0
    assert words_to_number("quatre vingt dix sept", "fr") == 97.0
    assert words_to_number("mille neuf cent quatre vingt quatre",
                           "fr") == 1984.0
    assert words_to_number("vingt douze", "fr") is None
    # en tables unaffected
    assert words_to_number("twenty two") == 22.0
    assert words_to_number("deux") is None


def test_fr_builtin_grammar():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="fr")

    def one(text, kind):
        out = p.parse(text, scope=(kind,), anchor=ANCHOR)
        assert len(out) == 1, (text, out)
        return out[0]

    m = one("attends dix minutes", "snips/duration")
    assert m["resolved_value"]["minutes"] == 10

    m = one("c'est fini à vingt cinq pour cent", "snips/percentage")
    assert m["resolved_value"] == {"kind": "Percentage", "value": 25.0}

    m = one("règle à 20 degrés", "snips/temperature")
    assert m["resolved_value"]["value"] == 20.0

    m = one("ça coûte 5 euros", "snips/amountOfMoney")
    assert m["resolved_value"]["unit"] == "EUR"

    m = one("la troisième fois", "snips/ordinal")
    assert m["resolved_value"] == {"kind": "Ordinal", "value": 3}

    # datetime: demain à 8h30 (combined), lundi prochain, 3 juin
    m = one("on se voit demain à 8h30", "snips/datetime")
    assert m["value"] == "demain à 8h30"
    assert m["resolved_value"]["value"] == "2024-05-03 08:30:00"
    assert m["resolved_value"]["grain"] == "Minute"

    m = one("lundi prochain", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-05-06 00:00:00"

    m = one("le 3 juin", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-06-03 00:00:00"

    m = one("de lundi à vendredi", "snips/datetime")
    assert m["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-06 00:00:00",
        "to": "2024-05-10 00:00:00"}


def test_fr_cascade_lookup_path(engine):
    r = engine.parse("fais moi deux tasses de café", anchor=ANCHOR)
    assert r["intent"] == {"intentName": "preparerBoisson",
                           "probability": 1.0}
    slots = {s["slotName"]: s for s in r["slots"]}
    assert slots["nombre_de_tasses"]["value"] == {"kind": "Number",
                                                  "value": 2.0}
    assert slots["boisson"]["value"] == {"kind": "Custom", "value": "café"}

    # synonym canonicalization: petit noir → café
    r = engine.parse("fais moi deux tasses de petit noir", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "preparerBoisson"
    assert {s["slotName"]: s["value"]["value"] for s in r["slots"]}[
        "boisson"] == "café"


def test_fr_cascade_probabilistic_and_resolution(engine):
    # unseen phrasing → probabilistic path; extensible boisson kept
    r = engine.parse("prépare vite trois tasses de cacao", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "preparerBoisson"
    vals = {s["slotName"]: s["value"]["value"] for s in r["slots"]}
    assert vals.get("boisson") == "chocolat chaud"  # synonym → canonical

    # datetime anchored: demain = 2024-05-03
    r = engine.parse("réserve moi un vol pour paris demain", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "reserverVol"
    vals = {s["slotName"]: s["value"] for s in r["slots"]}
    assert vals["destination"] == {"kind": "Custom", "value": "paris"}
    assert vals["date_depart"]["value"] == "2024-05-03 00:00:00"

    # non-extensible ville: unknown city slot must be dropped
    r = engine.parse("réserve moi un vol pour atlantis demain",
                     anchor=ANCHOR)
    assert r["intent"]["intentName"] == "reserverVol"
    assert "destination" not in {s["slotName"] for s in r["slots"]}


def test_fr_bundle_roundtrip(engine):
    from snips_nlu_spark.engine import NluEngine
    reloaded = NluEngine.from_dict(engine.to_dict())
    assert reloaded._bundle.builtin.language == "fr"
    r = reloaded.parse("fais moi deux tasses de café", anchor=ANCHOR)
    assert r["intent"]["intentName"] == "preparerBoisson"


def test_unsupported_language_fails_loudly():
    from snips_nlu_spark.resources import get_resources
    with pytest.raises(ValueError, match="unsupported language"):
        get_resources("xx")


def test_fr_datetime_recurrence_and_relative_range():
    # recurrences resolve to the next occurrence; "next N units" is an
    # interval, bare "in N units" an instant (round-3 grammar additions,
    # same shapes as the en constructions)
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="fr")
    anchor = datetime.datetime(2024, 5, 2)  # a Thursday
    ms = p.parse("x chaque lundi y", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["value"] == "chaque lundi"
    assert ms[0]["resolved_value"]["value"] == "2024-05-06 00:00:00"
    ms = p.parse("dans les 3 prochaines semaines", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-02 00:00:00",
        "to": "2024-05-23 00:00:00"}
    ms = p.parse("dans 3 semaines", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"]["value"] == "2024-05-23 00:00:00"

"""Builtin entity scanners: numbers, ordinals, percentages, temperature,
money, duration, datetime (resolved against an anchor ts, never now())."""

import datetime as dt

from snips_nlu_spark.entities.builtin import BuiltinEntityParser
from snips_nlu_spark.entities.numbers import (number_to_words,
                                              words_to_number)

P = BuiltinEntityParser()
ANCHOR = dt.datetime(2024, 3, 14, 10, 30, 0)  # a Thursday


def kinds(text, scope=None, anchor=ANCHOR):
    return [(m["entity_kind"], m["value"]) for m in
            P.parse(text, scope=scope, anchor=anchor)]


def test_words_to_number():
    assert words_to_number("two") == 2
    assert words_to_number("twenty two") == 22
    assert words_to_number("twenty-two") == 22
    assert words_to_number("a hundred and five") == 105
    assert words_to_number("three thousand two hundred") == 3200
    assert words_to_number("cat") is None
    assert words_to_number("and") is None


def test_number_to_words_roundtrip():
    for n in (0, 7, 15, 21, 40, 105, 999, 1024):
        assert words_to_number(number_to_words(n)) == n


def test_scan_numbers():
    ms = P.parse("make me 3 cups and twenty two more", anchor=ANCHOR,
                 scope=["snips/number"])
    assert [(m["value"], m["resolved_value"]["value"]) for m in ms] == [
        ("3", 3.0), ("twenty two", 22.0)]


def test_scan_decimal():
    ms = P.parse("add 3.5 spoons", scope=["snips/number"])
    assert ms[0]["value"] == "3.5"
    assert ms[0]["resolved_value"]["value"] == 3.5


def test_scan_ordinal():
    ms = P.parse("the 3rd door on the second floor",
                 scope=["snips/ordinal"])
    assert [(m["value"], m["resolved_value"]["value"]) for m in ms] == [
        ("3rd", 3), ("second", 2)]


def test_scan_percentage():
    ms = P.parse("increase by 20 percent", scope=["snips/percentage"])
    assert ms[0]["value"] == "20 percent"
    assert ms[0]["resolved_value"] == {"kind": "Percentage", "value": 20.0}


def test_scan_temperature():
    ms = P.parse("set it to 21 degrees celsius", scope=["snips/temperature"])
    assert ms[0]["resolved_value"] == {
        "kind": "Temperature", "value": 21.0, "unit": "celsius"}
    assert ms[0]["value"] == "21 degrees celsius"


def test_scan_money():
    ms = P.parse("it costs $5 or ten euros", scope=["snips/amountOfMoney"])
    assert [(m["value"], m["resolved_value"]["unit"]) for m in ms] == [
        ("$5", "$"), ("ten euros", "EUR")]


def test_scan_duration():
    ms = P.parse("remind me in ten minutes", scope=["snips/duration"])
    assert ms[0]["resolved_value"]["minutes"] == 10
    assert ms[0]["value"] == "ten minutes"


def test_datetime_tomorrow():
    ms = P.parse("book it for tomorrow", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "tomorrow"
    assert ms[0]["resolved_value"]["value"] == "2024-03-15 00:00:00"
    assert ms[0]["resolved_value"]["grain"] == "Day"


def test_datetime_tomorrow_evening():
    ms = P.parse("see you tomorrow evening", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "tomorrow evening"
    assert ms[0]["resolved_value"]["value"] == "2024-03-15 19:00:00"
    assert ms[0]["resolved_value"]["grain"] == "Hour"


def test_datetime_weekday():
    ms = P.parse("fly on monday", scope=["snips/datetime"], anchor=ANCHOR)
    assert ms[0]["value"] == "on monday"
    assert ms[0]["resolved_value"]["value"] == "2024-03-18 00:00:00"


def test_datetime_clock():
    ms = P.parse("wake me at 8pm", scope=["snips/datetime"], anchor=ANCHOR)
    assert ms[0]["value"] == "at 8pm"
    assert ms[0]["resolved_value"]["value"] == "2024-03-14 20:00:00"


def test_datetime_month_day():
    ms = P.parse("leaving june 3rd", scope=["snips/datetime"], anchor=ANCHOR)
    assert ms[0]["resolved_value"]["value"] == "2024-06-03 00:00:00"


def test_datetime_is_pure_function_of_anchor():
    a1 = dt.datetime(2024, 1, 1)
    a2 = dt.datetime(2025, 1, 1)
    m1 = P.parse("tomorrow", scope=["snips/datetime"], anchor=a1)
    m2 = P.parse("tomorrow", scope=["snips/datetime"], anchor=a2)
    assert m1[0]["resolved_value"]["value"] == "2024-01-02 00:00:00"
    assert m2[0]["resolved_value"]["value"] == "2025-01-02 00:00:00"


def test_no_spurious_matches_on_plain_text():
    assert P.parse("hello there general", anchor=ANCHOR) == []

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


def test_datetime_recurrence_resolves_to_next_occurrence():
    # "every monday" — no recurrence kind in the snips payload; the
    # reference's Rustling grammar resolves recurrents to their next
    # occurrence (ANCHOR 2024-03-14 is a Thursday → next monday 03-18)
    ms = P.parse("see you every monday", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "every monday"
    assert ms[0]["resolved_value"]["value"] == "2024-03-18 00:00:00"
    ms = P.parse("standup every day", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "every day"
    assert ms[0]["resolved_value"]["value"] == "2024-03-15 00:00:00"


def test_datetime_relative_range_interval():
    ms = P.parse("finish it in the next 3 weeks", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "in the next 3 weeks"
    assert ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-03-14 00:00:00",
        "to": "2024-04-04 00:00:00"}
    # number words compose too
    ms = P.parse("within the next two months", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-03-14 00:00:00",
        "to": "2024-05-14 00:00:00"}


def test_datetime_in_n_units_is_instant():
    ms = P.parse("call me in 3 weeks", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "in 3 weeks"
    assert ms[0]["resolved_value"]["value"] == "2024-04-04 00:00:00"
    assert ms[0]["resolved_value"]["grain"] == "Week"


def test_datetime_dotted_meridiem():
    # dotted abbreviations stay one token, span includes the final dot
    # (ref: test_deterministic_intent_parser.py:377-380 pins the
    # "at 10p.m." span over the trailing period)
    ms = P.parse("meet at 10p.m. ok", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "at 10p.m."
    assert ms[0]["resolved_value"]["value"] == "2024-03-14 22:00:00"
    ms = P.parse("lunch at 12 p.m.", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["resolved_value"]["value"] == "2024-03-14 12:00:00"


def test_datetime_holidays():
    # ANCHOR is 2024-03-14 → christmas resolves within the year
    ms = P.parse("remind me next christmas", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "next christmas"
    assert ms[0]["resolved_value"]["value"] == "2024-12-25 00:00:00"
    assert ms[0]["resolved_value"]["grain"] == "Day"
    ms = P.parse("dinner on christmas eve", scope=["snips/datetime"],
                 anchor=ANCHOR)
    # "on" absorbs into the mention like the weekday rule ("fly on
    # monday" → "on monday")
    assert ms[0]["value"] == "on christmas eve"
    assert ms[0]["resolved_value"]["value"] == "2024-12-24 00:00:00"
    # a holiday already past this year rolls to the next occurrence
    ms = P.parse("halloween", scope=["snips/datetime"],
                 anchor=dt.datetime(2024, 11, 20))
    assert ms[0]["resolved_value"]["value"] == "2025-10-31 00:00:00"


def test_datetime_this_daypart():
    ms = P.parse("let's meet this evening", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "this evening"
    assert ms[0]["resolved_value"]["value"] == "2024-03-14 19:00:00"
    assert ms[0]["resolved_value"]["grain"] == "Hour"
    ms = P.parse("this morning", scope=["snips/datetime"], anchor=ANCHOR)
    assert ms[0]["resolved_value"]["value"] == "2024-03-14 08:00:00"


def test_datetime_month_boundaries():
    # ANCHOR 2024-03-14 (march): begin/mid/end of month + next variants
    ms = P.parse("pay rent at the beginning of next month",
                 scope=["snips/datetime"], anchor=ANCHOR)
    assert ms[0]["value"] == "beginning of next month"
    assert ms[0]["resolved_value"]["value"] == "2024-04-01 00:00:00"
    assert ms[0]["resolved_value"]["grain"] == "Day"
    ms = P.parse("report due end of the month", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "end of the month"
    assert ms[0]["resolved_value"]["value"] == "2024-03-31 00:00:00"
    ms = P.parse("middle of next year", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["resolved_value"]["value"] == "2025-07-01 00:00:00"
    # week boundary: ANCHOR week starts monday 03-11 → ends sunday 03-17
    ms = P.parse("end of the week", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["resolved_value"]["value"] == "2024-03-17 00:00:00"


def test_datetime_holidays_dayparts_boundaries_all_languages():
    """Round-4 grammar breadth: holidays, standalone part-of-day, and
    period boundaries in every shipped language (anchor 2024-06-15, a
    saturday — week 06-10..06-16, month ends 06-30)."""
    anchor = dt.datetime(2024, 6, 15)
    cases = [
        ("fr", "rappelle moi à noël", "2024-12-25 00:00:00"),
        ("fr", "fin du mois prochain", "2024-07-31 00:00:00"),
        ("fr", "ce soir", "2024-06-15 19:00:00"),
        ("es", "navidad", "2024-12-25 00:00:00"),
        ("es", "a principios del próximo mes", "2024-07-01 00:00:00"),
        ("es", "esta noche", "2024-06-15 21:00:00"),
        ("de", "weihnachten", "2024-12-25 00:00:00"),
        ("de", "anfang nächsten monats", "2024-07-01 00:00:00"),
        ("de", "silvester", "2024-12-31 00:00:00"),
        ("it", "natale", "2024-12-25 00:00:00"),
        ("it", "fine del mese", "2024-06-30 00:00:00"),
        ("it", "stamattina", "2024-06-15 08:00:00"),
        ("pt", "natal", "2024-12-25 00:00:00"),
        ("pt", "fim do mês", "2024-06-30 00:00:00"),
        ("pt", "esta noite", "2024-06-15 21:00:00"),
        ("ja", "クリスマス", "2024-12-25 00:00:00"),
        ("ja", "月末", "2024-06-30 00:00:00"),
        ("ja", "今晩", "2024-06-15 21:00:00"),
        # 年始 in june = the UPCOMING new year period
        ("ja", "年始", "2025-01-01 00:00:00"),
        ("ko", "크리스마스", "2024-12-25 00:00:00"),
        ("ko", "월말", "2024-06-30 00:00:00"),
        ("ko", "연초", "2025-01-01 00:00:00"),
    ]
    parsers = {}
    for lang, text, want in cases:
        p = parsers.get(lang)
        if p is None:
            p = parsers[lang] = BuiltinEntityParser(language=lang)
        ms = [m for m in p.parse(text, anchor=anchor)
              if m["entity_kind"] == "snips/datetime"]
        assert ms, (lang, text)
        assert ms[0]["resolved_value"]["value"] == want, (lang, text, ms)


def test_datetime_month_name_boundaries():
    # named-month boundaries; a passed month rolls to next year
    ms = P.parse("report due end of june", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "end of june"
    assert ms[0]["resolved_value"]["value"] == "2024-06-30 00:00:00"
    ms = P.parse("beginning of february", scope=["snips/datetime"],
                 anchor=ANCHOR)  # feb 2024 already passed on 03-14
    assert ms[0]["resolved_value"]["value"] == "2025-02-01 00:00:00"


def test_datetime_boundary_composes_with_clock_tail():
    # the day+clock tail applies to boundary anchors like any Day-grain
    # anchor: ANCHOR week 03-11..03-17 → next week ends sunday 03-24
    ms = P.parse("end of next week at 5pm", scope=["snips/datetime"],
                 anchor=ANCHOR)
    assert ms[0]["value"] == "end of next week at 5pm"
    assert ms[0]["resolved_value"]["value"] == "2024-03-24 17:00:00"
    assert ms[0]["resolved_value"]["grain"] == "Hour"


def test_datetime_movable_feasts_all_languages():
    """Round-5: Easter-class computed holidays (anonymous Gregorian
    computus) in all 8 packs; multi-token feasts embedding weekday words
    ("good friday", "vendredi saint") must win over the weekday branch.
    Anchor 2024-03-14: Easter 2024-03-31 (upcoming), pre-Easter feasts
    already passed roll to 2025 (Easter 2025-04-20)."""
    import datetime as dt

    anchor = dt.datetime(2024, 3, 14)
    cases = [
        ("en", "easter", "2024-03-31 00:00:00"),
        ("en", "next easter", "2024-03-31 00:00:00"),
        ("en", "easter monday", "2024-04-01 00:00:00"),
        ("en", "good friday", "2024-03-29 00:00:00"),
        ("en", "palm sunday", "2024-03-24 00:00:00"),
        ("en", "pentecost", "2024-05-19 00:00:00"),
        ("en", "ascension day", "2024-05-09 00:00:00"),
        ("en", "ash wednesday", "2025-03-05 00:00:00"),  # passed -> 2025
        ("en", "mardi gras", "2025-03-04 00:00:00"),
        ("fr", "pâques", "2024-03-31 00:00:00"),
        ("fr", "vendredi saint", "2024-03-29 00:00:00"),
        ("fr", "lundi de pâques", "2024-04-01 00:00:00"),
        ("fr", "pentecôte", "2024-05-19 00:00:00"),
        ("es", "pascua", "2024-03-31 00:00:00"),
        ("es", "viernes santo", "2024-03-29 00:00:00"),
        ("es", "carnaval", "2025-03-04 00:00:00"),
        ("de", "ostern", "2024-03-31 00:00:00"),
        ("de", "karfreitag", "2024-03-29 00:00:00"),
        ("de", "ostermontag", "2024-04-01 00:00:00"),
        ("de", "pfingsten", "2024-05-19 00:00:00"),
        ("de", "christi himmelfahrt", "2024-05-09 00:00:00"),
        ("de", "rosenmontag", "2025-03-03 00:00:00"),
        ("it", "pasqua", "2024-03-31 00:00:00"),
        ("it", "pasquetta", "2024-04-01 00:00:00"),
        ("it", "venerdì santo", "2024-03-29 00:00:00"),
        ("pt", "páscoa", "2024-03-31 00:00:00"),
        ("pt", "sexta feira santa", "2024-03-29 00:00:00"),
        ("pt", "pentecostes", "2024-05-19 00:00:00"),
        ("ja", "イースター", "2024-03-31 00:00:00"),
        ("ja", "復活祭", "2024-03-31 00:00:00"),
        ("ko", "부활절", "2024-03-31 00:00:00"),
    ]
    parsers = {}
    for lang, text, want in cases:
        p = parsers.get(lang)
        if p is None:
            p = parsers[lang] = BuiltinEntityParser(language=lang)
        ms = [m for m in p.parse(text, anchor=anchor)
              if m["entity_kind"] == "snips/datetime"]
        assert ms, (lang, text)
        assert ms[0]["resolved_value"]["value"] == want, (lang, text, ms)
    # bare weekday words still resolve as weekdays, not feasts
    fr = parsers["fr"].parse("vendredi", anchor=anchor)
    assert fr[0]["resolved_value"]["value"] == "2024-03-15 00:00:00"


def test_datetime_boundary_clock_combo_all_languages():
    """Round-5: boundary anchors compose with a clock tail in every
    pack, CJK fused clocks included (anchor 2024-05-02: month end
    2024-05-31; "next month" end 2024-06-30)."""
    import datetime as dt

    anchor = dt.datetime(2024, 5, 2)
    cases = [
        ("de", "ende nächsten monats um 17 uhr", "2024-06-30 17:00:00"),
        ("es", "a finales del próximo mes a las 8:30",
         "2024-06-30 08:30:00"),
        ("fr", "fin du mois à 8h30", "2024-05-31 08:30:00"),
        ("it", "a fine del mese alle 8:30", "2024-05-31 08:30:00"),
        ("pt", "no fim do mês às 8:30", "2024-05-31 08:30:00"),
        ("ja", "月末8時30分", "2024-05-31 08:30:00"),
        ("ko", "월말 8시 30분", "2024-05-31 08:30:00"),
    ]
    for lang, text, want in cases:
        p = BuiltinEntityParser(language=lang)
        ms = [m for m in p.parse(text, anchor=anchor)
              if m["entity_kind"] == "snips/datetime"]
        assert ms, (lang, text)
        assert ms[0]["resolved_value"]["value"] == want, (lang, text, ms)


def test_datetime_every_daypart_all_languages():
    """Round-5: recurrence + part-of-day ("every morning", ja fused
    毎朝/毎晩, ko 매일 아침) resolves to the anchor day's part-of-day
    (day-level anchoring, same convention as "this evening"); span
    covers the recurrence word."""
    import datetime as dt

    anchor = dt.datetime(2024, 5, 2, 10, 30)
    cases = [
        ("en", "every morning", "2024-05-02 08:00:00"),
        ("en", "each evening", "2024-05-02 19:00:00"),
        ("fr", "chaque matin", "2024-05-02 08:00:00"),
        ("es", "cada tarde", "2024-05-02 15:00:00"),
        ("de", "jeden abend", "2024-05-02 19:00:00"),
        ("it", "ogni sera", "2024-05-02 19:00:00"),
        ("pt", "cada manhã", "2024-05-02 08:00:00"),
        ("ja", "毎朝", "2024-05-02 08:00:00"),
        ("ja", "毎晩", "2024-05-02 21:00:00"),
        ("ko", "매일 아침", "2024-05-02 08:00:00"),
    ]
    for lang, text, want in cases:
        p = BuiltinEntityParser(language=lang)
        ms = [m for m in p.parse(text, anchor=anchor)
              if m["entity_kind"] == "snips/datetime"]
        assert ms, (lang, text)
        assert ms[0]["resolved_value"]["value"] == want, (lang, text, ms)
        assert ms[0]["resolved_value"]["grain"] == "Hour", (lang, text)
        assert ms[0]["start"] == 0 and ms[0]["value"] == text, (lang, text)
    # "every monday at 9am" still composes recurrence + clock
    en = BuiltinEntityParser(language="en")
    ms = en.parse("every monday at 9am", anchor=anchor)
    assert ms[0]["resolved_value"]["value"] == "2024-05-06 09:00:00"


def test_datetime_nth_weekday_of_month_all_languages():
    """Round-5: nested grain — the nth (or last) weekday of a named or
    relative month in the 6 Latin packs (anchor 2024-05-02, a Thursday:
    first monday of june = 2024-06-03; last friday of next month =
    2024-06-28; second tuesday of the current month = 2024-05-14;
    passed months roll to next year)."""
    import datetime as dt

    anchor = dt.datetime(2024, 5, 2)
    cases = [
        ("en", "the first monday of june", "2024-06-03 00:00:00"),
        ("en", "last friday of next month", "2024-06-28 00:00:00"),
        ("en", "second tuesday of the month", "2024-05-14 00:00:00"),
        ("en", "first monday of january", "2025-01-06 00:00:00"),
        ("fr", "le premier lundi de juin", "2024-06-03 00:00:00"),
        ("fr", "dernier vendredi du mois prochain",
         "2024-06-28 00:00:00"),
        ("es", "el primer lunes de junio", "2024-06-03 00:00:00"),
        ("es", "último viernes del próximo mes", "2024-06-28 00:00:00"),
        ("de", "der erste montag im juni", "2024-06-03 00:00:00"),
        ("de", "letzter freitag des nächsten monats",
         "2024-06-28 00:00:00"),
        ("it", "il primo lunedì di giugno", "2024-06-03 00:00:00"),
        ("it", "ultimo venerdì del prossimo mese",
         "2024-06-28 00:00:00"),
        ("pt", "primeira segunda de junho", "2024-06-03 00:00:00"),
        ("pt", "último sexta do próximo mês", "2024-06-28 00:00:00"),
    ]
    for lang, text, want in cases:
        p = BuiltinEntityParser(language=lang)
        ms = [m for m in p.parse(text, anchor=anchor)
              if m["entity_kind"] == "snips/datetime"]
        assert ms, (lang, text)
        assert ms[0]["resolved_value"]["value"] == want, (lang, text, ms)
        assert ms[0]["resolved_value"]["grain"] == "Day", (lang, text)
    # a month with no 5th monday yields NO nested match — the bare
    # weekday fallback still parses
    en = BuiltinEntityParser(language="en")
    ms = en.parse("fifth monday of june", anchor=anchor)
    vals = [m["value"] for m in ms
            if m["entity_kind"] == "snips/datetime"]
    assert vals == ["monday"]
    # bare "last monday" (no month tail) is untouched by the new branch
    ms2 = en.parse("last monday", anchor=anchor)
    assert [m["value"] for m in ms2
            if m["entity_kind"] == "snips/datetime"] == ["monday"]


def test_datetime_range_endpoint_with_clock():
    """Round-5: range endpoints carry their own day+clock ("明日8時から
    10時まで", "내일 8시부터 10시까지", "from tomorrow at 8am to
    10am") as ONE interval mention — the bare-clock to-side inherits
    the from-side's day; weekday/clock-only ranges keep their old
    semantics (incl. the cross-midnight roll)."""
    import datetime as dt

    anchor = dt.datetime(2024, 5, 2, 10, 0)
    cases = [
        ("ja", "明日8時から10時まで",
         "2024-05-03 08:00:00", "2024-05-03 10:00:00"),
        ("ja", "明日の8時半から10時まで",
         "2024-05-03 08:30:00", "2024-05-03 10:00:00"),
        ("ko", "내일 8시부터 10시까지",
         "2024-05-03 08:00:00", "2024-05-03 10:00:00"),
        ("en", "from tomorrow at 8am to 10am",
         "2024-05-03 08:00:00", "2024-05-03 10:00:00"),
        # unchanged pre-existing semantics
        ("ja", "月曜日から金曜日まで",
         "2024-05-06 00:00:00", "2024-05-10 00:00:00"),
        ("en", "from 10pm to 2am",
         "2024-05-02 22:00:00", "2024-05-03 02:00:00"),
    ]
    for lang, text, f, t in cases:
        p = BuiltinEntityParser(language=lang)
        ms = [m for m in p.parse(text, anchor=anchor)
              if m["entity_kind"] == "snips/datetime"]
        assert len(ms) == 1, (lang, text, ms)  # ONE mention, no overlap
        rv = ms[0]["resolved_value"]
        assert rv["kind"] == "TimeInterval", (lang, text, rv)
        assert (rv["from"], rv["to"]) == (f, t), (lang, text, rv)


def test_datetime_until_open_interval():
    """Round-5d: "until/by X" (prefix) and lone postfix まで/까지
    resolve as an OPEN interval [anchor, X] — the duckling/Rustling
    convention for one-sided upper bounds. A bare-clock point must be
    marked (pm/h/uhr) or multi-token ("8:30"), so "increase by 5"
    never reads as an interval; a past clock rolls to the next day."""
    import datetime as dt

    anchor = dt.datetime(2024, 5, 2, 10, 0)  # Thursday 10:00
    cases = [
        ("en", "until tomorrow at 8:30am", "2024-05-03 08:30:00"),
        ("en", "by friday 5pm", "2024-05-03 17:00:00"),
        ("en", "by 8am", "2024-05-03 08:00:00"),  # past clock rolls
        ("ja", "明日の8時半まで", "2024-05-03 08:30:00"),
        ("ko", "내일 8시 반까지", "2024-05-03 08:30:00"),
        ("fr", "jusqu'à demain 8h30", "2024-05-03 08:30:00"),
        ("de", "bis morgen um 8:30", "2024-05-03 08:30:00"),
        ("es", "hasta el viernes", "2024-05-03 00:00:00"),
        ("it", "fino a domani", "2024-05-03 00:00:00"),
        ("pt", "até às 8:30", "2024-05-03 08:30:00"),
    ]
    for lang, text, t in cases:
        p = BuiltinEntityParser(language=lang)
        ms = [m for m in p.parse(text, anchor=anchor)
              if m["entity_kind"] == "snips/datetime"]
        assert len(ms) == 1, (lang, text, ms)
        rv = ms[0]["resolved_value"]
        assert rv["kind"] == "TimeInterval", (lang, text, rv)
        assert rv["from"] == "2024-05-02 10:00:00", (lang, text, rv)
        assert rv["to"] == t, (lang, text, rv)


def test_datetime_until_guards():
    """Bare unmarked digits never form an until-interval, and two-sided
    ranges keep winning over the one-sided pass."""
    import datetime as dt

    anchor = dt.datetime(2024, 5, 2, 10, 0)
    p = BuiltinEntityParser(language="en")
    assert [m for m in p.parse("increase by 5", anchor=anchor)
            if m["entity_kind"] == "snips/datetime"] == []
    ms = [m for m in p.parse("from monday until friday", anchor=anchor)
          if m["entity_kind"] == "snips/datetime"]
    assert len(ms) == 1
    rv = ms[0]["resolved_value"]
    assert (rv["from"], rv["to"]) == ("2024-05-06 00:00:00",
                                      "2024-05-10 00:00:00")
    pj = BuiltinEntityParser(language="ja")
    ms = [m for m in pj.parse("明日8時から10時まで", anchor=anchor)
          if m["entity_kind"] == "snips/datetime"]
    assert len(ms) == 1
    rv = ms[0]["resolved_value"]
    assert (rv["from"], rv["to"]) == ("2024-05-03 08:00:00",
                                      "2024-05-03 10:00:00")


def test_datetime_from_open_interval():
    """Round-5d: open LOWER bound — "from/starting/since/after X",
    "à partir de", "ab/seit", "desde", "da", lone postfix から/부터 —
    resolve as TimeInterval [X, null]. A past day reference stays
    literal ("since yesterday" is meaningful); only bare clocks roll
    forward."""
    import datetime as dt

    anchor = dt.datetime(2024, 5, 2, 10, 0)  # Thursday 10:00
    cases = [
        ("en", "from tomorrow", "2024-05-03 00:00:00"),
        ("en", "since yesterday", "2024-05-01 00:00:00"),
        ("en", "after 5pm", "2024-05-02 17:00:00"),
        ("en", "after 8am", "2024-05-03 08:00:00"),  # clock rolls
        ("ja", "明日から", "2024-05-03 00:00:00"),
        ("ko", "내일부터", "2024-05-03 00:00:00"),
        ("fr", "à partir de demain", "2024-05-03 00:00:00"),
        ("de", "ab morgen", "2024-05-03 00:00:00"),
        ("es", "a partir de mañana", "2024-05-03 00:00:00"),
        ("it", "da domani", "2024-05-03 00:00:00"),
        ("pt", "a partir de amanhã", "2024-05-03 00:00:00"),
    ]
    for lang, text, f in cases:
        p = BuiltinEntityParser(language=lang)
        ms = [m for m in p.parse(text, anchor=anchor)
              if m["entity_kind"] == "snips/datetime"]
        assert len(ms) == 1, (lang, text, ms)
        rv = ms[0]["resolved_value"]
        assert rv["kind"] == "TimeInterval", (lang, text, rv)
        assert rv["from"] == f and rv["to"] is None, (lang, text, rv)
    # the mention span covers the full marker phrase
    pfr = BuiltinEntityParser(language="fr")
    m = [x for x in pfr.parse("à partir de demain", anchor=anchor)
         if x["entity_kind"] == "snips/datetime"][0]
    assert m["value"] == "à partir de demain"

"""Japanese end-to-end — the one structurally new language: no
whitespace, so the tokenizer's CJK script-run spec (textcore) and the
builtin grammar's per-char han merge (builtin._ja_grammar_merge) carry
the segmentation. Hand-computed expectations throughout."""

import datetime
import json

import pytest

ANCHOR = datetime.datetime(2024, 5, 2)  # thursday


from snips_nlu_spark.fixtures import ja_dataset as _ja_dataset  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    from snips_nlu_spark.engine import NluEngine
    return NluEngine().fit(_ja_dataset())


def test_ja_tokenizer_script_classes():
    from snips_nlu_spark.textcore import tokenize
    cases = {
        # katakana run / hiragana runs / numeral / han per char
        "コーヒーを二杯作って":
            ["コーヒー", "を", "二", "杯", "作", "って"],
        # numeral RUN stays whole; other kanji split per char
        "三百二十五円ください": ["三百二十五", "円", "ください"],
        # digits break han runs; latin untouched
        "8時30分": ["8", "時", "30", "分"],
        "hello世界 mixed": ["hello", "世", "界", "mixed"],
    }
    for text, expected in cases.items():
        toks = tokenize(text)
        assert [t.value for t in toks] == expected, text
        for t in toks:  # spans must map back exactly
            assert text[t.start:t.end] == t.value


def test_ja_normalize_preserves_voiced_kana():
    from snips_nlu_spark.textcore import normalize
    assert normalize("ビール") == "ビール"    # not ヒール
    assert normalize("８") == "8"             # full-width folds
    assert normalize("café") == "cafe"        # latin path unchanged


def test_ja_number_words():
    from snips_nlu_spark.entities.numbers import words_to_number
    assert words_to_number("三百二十五", "ja") == 325.0
    assert words_to_number("二万五千", "ja") == 25000.0
    assert words_to_number("十五", "ja") == 15.0
    assert words_to_number("二〇二四", "ja") == 2024.0  # positional
    assert words_to_number("百", "ja") == 100.0
    assert words_to_number("十百", "ja") is None  # ascending scales
    assert words_to_number("二 三", "ja") is None


def test_ja_builtin_grammar():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="ja")

    def one(text, kind):
        out = p.parse(text, scope=(kind,), anchor=ANCHOR)
        assert len(out) == 1, (text, out)
        return out[0]

    m = one("明日の8時に起こして", "snips/datetime")
    assert m["value"] == "明日の8時"
    assert m["resolved_value"]["value"] == "2024-05-03 08:00:00"

    m = one("月曜日から金曜日まで", "snips/datetime")
    assert m["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-06 00:00:00",
        "to": "2024-05-10 00:00:00"}

    m = one("5月3日の午後8時半", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-05-03 20:30:00"

    m = one("八時半に", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-05-02 08:30:00"

    m = one("来週の天気", "snips/datetime")
    assert m["value"] == "来週"
    assert m["resolved_value"]["grain"] == "Week"

    m = one("三百二十五円ください", "snips/amountOfMoney")
    assert m["resolved_value"]["value"] == 325.0
    assert m["resolved_value"]["unit"] == "JPY"

    m = one("30度です", "snips/temperature")
    assert m["resolved_value"]["value"] == 30.0

    m = one("50パーセント", "snips/percentage")
    assert m["resolved_value"]["value"] == 50.0

    m = one("3番目", "snips/ordinal")
    assert m["resolved_value"]["value"] == 3

    m = one("5分間待って", "snips/duration")
    assert m["value"] == "5分間"
    assert m["resolved_value"]["minutes"] == 5

    m = one("2時間かかる", "snips/duration")
    assert m["resolved_value"]["hours"] == 2


def test_ja_engine_end_to_end(engine):
    def parsed(text):
        r = engine.parse(text, anchor=ANCHOR)
        return (r["intent"]["intentName"],
                [(s["slotName"], s["rawValue"]) for s in r["slots"]])

    assert parsed("コーヒーを三杯作って") == (
        "nomimonoJunbi", [("nomimono", "コーヒー"), ("kazu", "三")])
    assert parsed("京都までの切符がほしい") == (
        "hikoukiYoyaku", [("ikisaki", "京都")])
    intent, slots = parsed("大阪行きの飛行機を明日予約して")
    assert intent == "hikoukiYoyaku"
    assert ("ikisaki", "大阪") in slots and ("hizuke", "明日") in slots

    # synonym resolves to its canonical value
    r = engine.parse("緑茶をください", anchor=ANCHOR)
    assert r["slots"][0]["value"]["value"] == "お茶"

    # number slot resolves through the kanji grammar
    r = engine.parse("紅茶を五杯作って", anchor=ANCHOR)
    kazu = [s for s in r["slots"] if s["slotName"] == "kazu"]
    assert kazu and kazu[0]["value"]["value"] == 5.0

    # gibberish is None
    assert engine.parse("今日はいい天気ですね",
                        anchor=ANCHOR)["intent"]["intentName"] is None


def test_ja_engine_bundle_roundtrip(engine):
    from snips_nlu_spark.engine import NluEngine
    clone = NluEngine.from_dict(json.loads(json.dumps(engine.to_dict())))
    for text in ["コーヒーを三杯作って", "大阪行きの飛行機を明日予約して",
                 "意味のない文字列"]:
        assert clone.parse(text, anchor=ANCHOR) == \
            engine.parse(text, anchor=ANCHOR)


def test_ja_datetime_recurrence_and_relative():
    import datetime
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="ja")
    anchor = datetime.datetime(2024, 5, 2)  # thursday
    ms = p.parse("毎週月曜日に会いましょう", scope=("snips/datetime",),
                 anchor=anchor)
    assert ms and ms[0]["value"] == "毎週月曜日"
    assert ms[0]["resolved_value"]["value"] == "2024-05-06 00:00:00"
    ms = p.parse("3週間後に電話して", scope=("snips/datetime",),
                 anchor=anchor)
    assert ms and ms[0]["value"] == "3週間後"
    assert ms[0]["resolved_value"]["value"] == "2024-05-23 00:00:00"
    ms = p.parse("今後3週間", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-02 00:00:00",
        "to": "2024-05-23 00:00:00"}
    # month-day parses are untouched by the postfix probe
    ms = p.parse("5月3日に行く", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["value"] == "5月3日"

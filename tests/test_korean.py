"""Korean end-to-end — hangul eojeol tokenization plus the
deterministic trailing-particle split (textcore._split_hangul_particle)
that exposes grammar words fused with 부터/까지/에/로. Hand-computed
expectations."""

import datetime
import json

import pytest

ANCHOR = datetime.datetime(2024, 5, 2)  # thursday


from snips_nlu_spark.fixtures import ko_dataset as _ko_dataset  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    from snips_nlu_spark.engine import NluEngine
    return NluEngine().fit(_ko_dataset())


def test_ko_tokenizer_particle_split():
    from snips_nlu_spark.textcore import tokenize
    cases = {
        # fused particles split off with exact spans
        "월요일부터 금요일까지": ["월요일", "부터", "금요일", "까지"],
        "서울로 가는 기차표": ["서울", "로", "가", "는", "기차표"],
        # digit/hangul boundary splits; particle peels off the suffix
        "내일 8시에 깨워줘": ["내일", "8", "시", "에", "깨워줘"],
        # no trailing particle → eojeol run stays whole
        "커피 한 잔 만들어줘": ["커피", "한", "잔", "만들어줘"],
    }
    for text, expected in cases.items():
        toks = tokenize(text)
        assert [t.value for t in toks] == expected, text
        for t in toks:
            assert text[t.start:t.end] == t.value


def test_ko_number_words():
    from snips_nlu_spark.entities.numbers import words_to_number
    assert words_to_number("이십오", "ko") == 25.0       # sino
    assert words_to_number("삼백이십오", "ko") == 325.0
    assert words_to_number("이만오천", "ko") == 25000.0
    assert words_to_number("다섯", "ko") == 5.0          # native
    assert words_to_number("한", "ko") == 1.0            # determiner form
    assert words_to_number("십백", "ko") is None         # ascending scales
    assert words_to_number("커피", "ko") is None


def test_ko_builtin_grammar():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="ko")

    def one(text, kind):
        out = p.parse(text, scope=(kind,), anchor=ANCHOR)
        assert len(out) == 1, (text, out)
        return out[0]

    m = one("내일 8시에 깨워줘", "snips/datetime")
    assert m["value"] == "내일 8시"
    assert m["resolved_value"]["value"] == "2024-05-03 08:00:00"

    m = one("월요일부터 금요일까지", "snips/datetime")
    assert m["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-06 00:00:00",
        "to": "2024-05-10 00:00:00"}

    m = one("5월 3일 오후 8시 반", "snips/datetime")
    assert m["resolved_value"]["value"] == "2024-05-03 20:30:00"

    m = one("여덟시 반에", "snips/datetime")   # fused native-numeral hour
    assert m["resolved_value"]["value"] == "2024-05-02 08:30:00"

    m = one("다음 주 날씨", "snips/datetime")
    assert m["resolved_value"]["grain"] == "Week"
    m = one("다음주 날씨", "snips/datetime")   # fused spelling
    assert m["resolved_value"]["grain"] == "Week"

    m = one("5000원 주세요", "snips/amountOfMoney")
    assert m["resolved_value"]["value"] == 5000.0
    assert m["resolved_value"]["unit"] == "KRW"

    m = one("30도입니다", "snips/temperature")  # copula peeled off
    assert m["value"] == "30도"
    assert m["resolved_value"]["value"] == 30.0

    m = one("50퍼센트", "snips/percentage")
    assert m["resolved_value"]["value"] == 50.0

    m = one("세 번째", "snips/ordinal")
    assert m["resolved_value"]["value"] == 3

    m = one("5분간 기다려", "snips/duration")
    assert m["value"] == "5분간"
    assert m["resolved_value"]["minutes"] == 5


def test_ko_engine_end_to_end(engine):
    def parsed(text):
        r = engine.parse(text, anchor=ANCHOR)
        return (r["intent"]["intentName"],
                [(s["slotName"], s["rawValue"]) for s in r["slots"]])

    assert parsed("커피 세 잔 만들어줘") == (
        "eumnyoJunbi", [("eumnyo", "커피"), ("su", "세")])
    assert parsed("대구까지 가는 표를 원해") == (
        "bihaenggiYeyak", [("mokjeokji", "대구")])

    # particle variant (으로 vs 로) misses the exact-match key but the
    # CRF still extracts both slots
    intent, slots = parsed("부산으로 가는 비행기를 내일 예약해줘")
    assert intent == "bihaenggiYeyak"
    assert ("mokjeokji", "부산") in slots and ("naljja", "내일") in slots

    r = engine.parse("아메리카노 한 잔 주세요", anchor=ANCHOR)
    assert r["slots"][0]["value"]["value"] == "커피"   # synonym resolves

    assert engine.parse("오늘 날씨 어때요",
                        anchor=ANCHOR)["intent"]["intentName"] is None


def test_ko_engine_bundle_roundtrip(engine):
    from snips_nlu_spark.engine import NluEngine
    clone = NluEngine.from_dict(json.loads(json.dumps(engine.to_dict())))
    for text in ["커피 세 잔 만들어줘", "부산으로 가는 비행기를 내일 예약해줘",
                 "의미없는 문자열"]:
        assert clone.parse(text, anchor=ANCHOR) == \
            engine.parse(text, anchor=ANCHOR)


def test_ko_datetime_recurrence_and_relative():
    import datetime
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    p = BuiltinEntityParser(language="ko")
    anchor = datetime.datetime(2024, 5, 2)  # thursday
    ms = p.parse("매주 월요일에 만나요", scope=("snips/datetime",),
                 anchor=anchor)
    assert ms and ms[0]["value"] == "매주 월요일"
    assert ms[0]["resolved_value"]["value"] == "2024-05-06 00:00:00"
    ms = p.parse("3주 후에 전화해", scope=("snips/datetime",),
                 anchor=anchor)
    assert ms and ms[0]["value"] == "3주 후"
    assert ms[0]["resolved_value"]["value"] == "2024-05-23 00:00:00"
    ms = p.parse("앞으로 3주", scope=("snips/datetime",), anchor=anchor)
    assert ms and ms[0]["resolved_value"] == {
        "kind": "TimeInterval", "from": "2024-05-02 00:00:00",
        "to": "2024-05-23 00:00:00"}
    ms = p.parse("5월 3일에 가요", scope=("snips/datetime",),
                 anchor=anchor)
    assert ms and ms[0]["value"] == "5월 3일"

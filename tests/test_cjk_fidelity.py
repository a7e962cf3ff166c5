"""CJK numeral fidelity (round 5) — hand-computed fixtures for the
three gaps the round-4 verdict names:

1. ja kanji-numeral false positives: the numeral script class splits
   千 out of 千葉県 (Chiba), 百 out of 百貨店 (department store) and
   一 out of 一番 (best), and each standalone numeral token then became
   a snips/number mention. A numeral token contiguously followed by a
   single non-counter han char is now gated off; genuine
   numeral+counter compounds (三人, 五個, 2冊) keep parsing.
2. ko particle-split false positives: 사과 (apple) split to 사|과
   because the trailing-particle split ignored 와/과 allomorphy — 과
   attaches only after a closed syllable (batchim), and 사 is open.
   The split is now batchim-aware for the allomorphic particle pairs
   은/는, 이/가, 을/를, 과/와, (으)로, 이나, 이에요/예요.
3. ko fused native-numeral + counter eojeol (세잔 "three cups",
   두장 "two tickets", 한켤레 "one pair") produced nothing; they now
   yield a snips/number mention spanning the numeral prefix, and
   fused ordinals (세번째 "third") yield snips/ordinal.

The reference reaches these behaviors through its Rust grammar
(snips_nlu/entity_parser/builtin_entity_parser.py delegates to
snips-nlu-parsers, source not vendored), so expectations here are
hand-computed Korean/Japanese morphology, same as the other CJK tests.
"""

import pytest

from snips_nlu_spark.textcore import tokenize


@pytest.fixture(scope="module")
def ja():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    return BuiltinEntityParser(language="ja")


@pytest.fixture(scope="module")
def ko():
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    return BuiltinEntityParser(language="ko")


# ---------------------------------------------------------------- ja gate

def test_ja_numeral_in_compound_not_a_number(ja):
    # 千葉県 (Chiba prefecture), 百貨店 (department store), 一番 (best):
    # the numeral char is part of a content compound, not a count
    for text in ("千葉県に行く", "百貨店で買い物", "一番いいホテル"):
        assert ja.parse(text, scope=("snips/number",)) == [], text


def test_ja_numeral_with_counter_still_parses(ja):
    cases = {
        "三人の予約をお願いします": (3.0, "三"),
        "りんごを五個ください": (5.0, "五"),
        "本を2冊買う": (2.0, "2"),
        "切符を二枚": (2.0, "二"),
    }
    for text, (value, span_text) in cases.items():
        out = ja.parse(text, scope=("snips/number",))
        assert len(out) == 1, (text, out)
        assert out[0]["resolved_value"]["value"] == value
        assert out[0]["value"] == span_text
        assert text[out[0]["start"]:out[0]["end"]] == span_text


def test_ja_standalone_and_fused_numerals_unaffected(ja):
    out = ja.parse("三百二十五", scope=("snips/number",))
    assert len(out) == 1 and out[0]["resolved_value"]["value"] == 325.0
    # trailing numeral (nothing follows) still parses
    out = ja.parse("答えは五", scope=("snips/number",))
    assert len(out) == 1 and out[0]["resolved_value"]["value"] == 5.0


def test_ja_grammar_scanners_unaffected(ja):
    import datetime
    anchor = datetime.datetime(2024, 5, 2)
    out = ja.parse("三日間の旅行", scope=("snips/duration",), anchor=anchor)
    assert len(out) == 1 and out[0]["resolved_value"]["days"] == 3
    out = ja.parse("三番目の曲", scope=("snips/ordinal",))
    assert len(out) == 1 and out[0]["resolved_value"]["value"] == 3


# ------------------------------------------------------- ko allomorphy

def test_ko_particle_split_is_batchim_aware():
    # 사과 (apple): 사 is open (no batchim) so the particle after it
    # would be 와, never 과 — the run must stay whole
    assert [t.value for t in tokenize("사과 주세요")] == ["사과", "주세요"]
    # 삼과 사 ("three and four"): 삼 is closed (ㅁ) so 과 is the
    # correct comitative — the split stands
    assert [t.value for t in tokenize("삼과 사")] == ["삼", "과", "사"]
    # 바나나와: open syllable + 와 splits
    assert [t.value for t in tokenize("바나나와 우유")] == \
        ["바나나", "와", "우유"]
    # subject particles: 책이 (closed + 이) splits, 의사가 (open + 가)
    # splits, 의사이 is not a valid split target for 이 (가 expected)
    assert [t.value for t in tokenize("책이 있다")] == ["책", "이", "있다"]
    assert [t.value for t in tokenize("의사가 왔다")] == ["의사", "가", "왔다"]
    # 어머니 ends open: 니 + 은 would be invalid; run stays whole
    assert [t.value for t in tokenize("어머니 선물")] == ["어머니", "선물"]
    # (으)로: 으로 after batchim (집으로), 로 after vowel (학교로) or
    # ㄹ-final (서울로)
    assert [t.value for t in tokenize("집으로 가자")] == ["집", "으로", "가자"]
    assert [t.value for t in tokenize("학교로 가자")] == ["학교", "로", "가자"]
    assert [t.value for t in tokenize("서울로 가자")] == ["서울", "로", "가자"]


def test_ko_existing_splits_preserved():
    # the pinned round-2 cases (all allomorphy-valid) keep splitting
    cases = {
        "월요일부터 금요일까지": ["월요일", "부터", "금요일", "까지"],
        "서울로 가는 기차표": ["서울", "로", "가", "는", "기차표"],
        "커피 한 잔 만들어줘": ["커피", "한", "잔", "만들어줘"],
    }
    for text, expected in cases.items():
        assert [t.value for t in tokenize(text)] == expected, text


def test_ko_false_positive_numbers_gone(ko):
    assert ko.parse("사과 다섯개 주세요", scope=("snips/number",)) == [
        {"value": "다섯", "start": 3, "end": 5,
         "entity_kind": "snips/number",
         "resolved_value": {"kind": "Number", "value": 5.0}}]


# ------------------------------------------------- ko fused counters

def test_ko_fused_numeral_counter(ko):
    cases = {
        "커피 세잔 주세요": (3.0, "세"),
        "표 두장 예약": (2.0, "두"),
        "구두 한켤레": (1.0, "한"),
        # sino numeral + counter ("오분만" is avoided here: the split
        # particle 만 "only" is also the 10⁴ scale word — a standalone
        # homograph accepted like en "may", predating this round)
        "오분 기다려": (5.0, "오"),
    }
    for text, (value, span_text) in cases.items():
        out = ko.parse(text, scope=("snips/number",))
        assert len(out) == 1, (text, out)
        assert out[0]["resolved_value"]["value"] == value
        assert out[0]["value"] == span_text
        assert text[out[0]["start"]:out[0]["end"]] == span_text

    # multi-syllable sino numeral through the particle split: the
    # subject particle 이 peels off 이십오명이, the remainder fuses to
    # 25 + counter. The split-off 이 itself still reads as sino 2 —
    # the standalone single-syllable homograph this grammar accepts
    # throughout (like en "may"), predating this round.
    out = ko.parse("이십오명이 왔다", scope=("snips/number",))
    assert [m["value"] for m in out] == ["이십오", "이"]
    assert out[0]["resolved_value"]["value"] == 25.0
    assert (out[0]["start"], out[0]["end"]) == (0, 3)


def test_ko_fused_counter_requires_known_counter(ko):
    # 구두 (shoes): 구 is sino 9 but 두 is not a counter → no mention;
    # 오늘 (today): 오 is sino 5, 늘 not a counter → no mention
    assert ko.parse("구두 샀어", scope=("snips/number",)) == []
    assert ko.parse("오늘 날씨", scope=("snips/number",)) == []


def test_ko_fused_ordinal(ko):
    out = ko.parse("세번째 곡", scope=("snips/ordinal",))
    assert len(out) == 1
    assert out[0]["resolved_value"] == {"kind": "Ordinal", "value": 3}
    assert out[0]["value"] == "세번째"
    # the spaced form keeps working
    out = ko.parse("세 번째 곡", scope=("snips/ordinal",))
    assert len(out) == 1 and out[0]["resolved_value"]["value"] == 3


def test_ko_datetime_still_green(ko):
    # the fused-counter candidates are scoped to the number scanner;
    # clock/date scanning is unchanged
    import datetime
    anchor = datetime.datetime(2024, 5, 2)
    out = ko.parse("여덟시 반에", scope=("snips/datetime",), anchor=anchor)
    assert len(out) == 1
    assert out[0]["resolved_value"]["value"] == "2024-05-02 08:30:00"
    out = ko.parse("5월 3일", scope=("snips/datetime",), anchor=anchor)
    assert len(out) == 1
    assert out[0]["resolved_value"]["value"] == "2024-05-03 00:00:00"

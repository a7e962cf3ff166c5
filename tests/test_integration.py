"""Integration quality gate — mirrors the reference's
tests/integration_test.py:15-52 (weather dataset; intent F1 >= 0.95,
slot F1 >= 0.85) with a freshly-authored weather-style dataset and a
deterministic train/test split (reference uses 5-fold CV; a single
70/30 split keeps suite runtime bounded)."""

import datetime as dt
import itertools

import pytest

from snips_nlu_spark.engine import NluEngine

ANCHOR = dt.datetime(2024, 3, 14, 10, 30)

LOCATIONS = ["paris", "berlin", "chicago", "sydney", "oslo", "madrid",
             "toronto", "lisbon", "vienna", "dublin"]
CONDITIONS = [("rain", ["rainy", "showers"]), ("snow", ["snowy"]),
              ("wind", ["windy", "gusts"]), ("fog", ["foggy", "mist"]),
              ("storm", ["stormy", "thunderstorm"])]
DATETIMES = ["tomorrow", "today", "on monday", "on friday",
             "tomorrow evening", "at 8pm"]

FORECAST_TEMPLATES = [
    ("what is the weather in ", "LOC", ""),
    ("give me the forecast for ", "LOC", " please"),
    ("weather report for ", "LOC", ""),
    ("how does the sky look in ", "LOC", ""),
    ("tell me the weather in ", "LOC", " DT"),
]
CONDITION_TEMPLATES = [
    ("will there be ", "COND", " in LOC"),
    ("is ", "COND", " expected in LOC"),
    ("any chance of ", "COND", " in LOC DT"),
    ("should i expect ", "COND", " DT"),
]
TEMPERATURE_TEMPLATES = [
    ("how cold is it in ", "LOC", ""),
    ("how warm will it be in ", "LOC", " DT"),
    ("what temperature is it in ", "LOC", ""),
    ("is it freezing in ", "LOC", ""),
]


def _mk_utterance(template, loc, cond, dt_value):
    prefix, slot_kind, suffix = template
    chunks = [{"text": prefix}]
    if slot_kind == "LOC":
        chunks.append({"text": loc, "entity": "weather_location",
                       "slot_name": "weather_location"})
    else:
        chunks.append({"text": cond, "entity": "weather_condition",
                       "slot_name": "weather_condition"})
    rest = suffix
    if "LOC" in rest:
        pre, post = rest.split("LOC", 1)
        if pre:
            chunks.append({"text": pre})
        chunks.append({"text": loc, "entity": "weather_location",
                       "slot_name": "weather_location"})
        rest = post
    if "DT" in rest:
        pre, post = rest.split("DT", 1)
        if pre:
            chunks.append({"text": pre})
        chunks.append({"text": dt_value, "entity": "snips/datetime",
                       "slot_name": "forecast_datetime"})
        rest = post
    if rest:
        chunks.append({"text": rest})
    return {"data": chunks}


def build_weather_corpus():
    """~60 utterances per intent, deterministic round-robin."""
    corpus = {}
    loc_it = itertools.cycle(LOCATIONS)
    cond_it = itertools.cycle([c for c, _ in CONDITIONS])
    dt_it = itertools.cycle(DATETIMES)
    for intent, templates in (
            ("SearchWeatherForecast", FORECAST_TEMPLATES),
            ("GetWeatherForecastCondition", CONDITION_TEMPLATES),
            ("GetWeatherTemperature", TEMPERATURE_TEMPLATES)):
        utts = []
        for i in range(60):
            utts.append(_mk_utterance(templates[i % len(templates)],
                                      next(loc_it), next(cond_it),
                                      next(dt_it)))
        corpus[intent] = utts
    return corpus


def weather_dataset(utterances_per_intent):
    return {
        "language": "en",
        "intents": {intent: {"utterances": utts}
                    for intent, utts in utterances_per_intent.items()},
        "entities": {
            "weather_location": {
                "use_synonyms": False, "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [{"value": v, "synonyms": []} for v in LOCATIONS],
            },
            "weather_condition": {
                "use_synonyms": True, "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [{"value": v, "synonyms": syn}
                         for v, syn in CONDITIONS],
            },
            "snips/datetime": {},
        },
    }


@pytest.mark.slow
def test_weather_train_test_quality_gate():
    corpus = build_weather_corpus()
    train = {i: [u for k, u in enumerate(us) if k % 10 < 7]
             for i, us in corpus.items()}
    test = {i: [u for k, u in enumerate(us) if k % 10 >= 7]
            for i, us in corpus.items()}

    engine = NluEngine().fit(weather_dataset(train))

    intent_tp = total = 0
    slot_tp = slot_pred = slot_true = 0
    for intent, utts in test.items():
        for utt in utts:
            text = "".join(c["text"] for c in utt["data"])
            res = engine.parse(text, anchor=ANCHOR)
            total += 1
            intent_tp += res["intent"]["intentName"] == intent
            want = set()
            cursor = 0
            for c in utt["data"]:
                if c.get("slot_name"):
                    want.add((c["slot_name"], cursor,
                              cursor + len(c["text"])))
                cursor += len(c["text"])
            got = {(s["slotName"], s["range"]["start"],
                    s["range"]["end"]) for s in res["slots"]}
            slot_true += len(want)
            slot_pred += len(got)
            slot_tp += len(got & want)

    intent_acc = intent_tp / total
    p = slot_tp / slot_pred if slot_pred else 0
    r = slot_tp / slot_true if slot_true else 0
    f1 = 2 * p * r / (p + r) if p + r else 0
    print(f"weather gate: intent_acc={intent_acc:.3f} slot_f1={f1:.3f} "
          f"(p={p:.3f} r={r:.3f}, n={total})")
    # reference gates: intent F1 >= 0.95, slot F1 >= 0.85
    assert intent_acc >= 0.95
    assert f1 >= 0.85

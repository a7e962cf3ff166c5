"""Distributed (pyspark.ml) classifier fit: parity with the driver-local
numpy classifier at top-1."""

import pytest

pytestmark = pytest.mark.spark


def test_distributed_classifier_top1_parity(spark):
    from snips_nlu_spark.dataset import validate_and_format_dataset
    from snips_nlu_spark.fixtures import combined_dataset, FILLER_TEXTS
    from snips_nlu_spark.ml.distributed import (fit_distributed_classifier,
                                                predict_intents)
    from snips_nlu_spark.resources import get_resources
    from snips_nlu_spark.engine import NluEngine

    ds = validate_and_format_dataset(combined_dataset())
    model, mapping = fit_distributed_classifier(
        spark, ds, get_resources("en"))

    eval_texts = [
        "make me two cups of coffee",
        "brew three cups of green tea please",
        "turn on the lights",
        "turn off the lights",
        "set the light in the kitchen to blue",
        "book me a flight to paris tomorrow",
        "cancel my flight to rome",
        "i need a plane ticket to london",
    ] + list(FILLER_TEXTS[:6])

    # local (numpy) reference predictions through the full engine's
    # classifier
    engine = NluEngine(parser_units=("probabilistic_intent_parser",)) \
        .fit(ds)
    clf = engine.intent_parsers[0].intent_classifier
    local = []
    for t in eval_texts:
        ranked = clf.get_intents(t, engine._bundle)
        top = ranked[0]["intentName"]
        local.append(top if top is not None else "__none__")

    dist = predict_intents(model, mapping, spark, eval_texts)
    agreement = sum(a == b for a, b in zip(local, dist)) / len(eval_texts)
    assert agreement >= 0.8, list(zip(eval_texts, local, dist))

"""Distributed intent-classifier training with pyspark.ml.

The reference's training sets are KBs, so the default fit is driver-local
(engine.py). This module is the at-scale path (SURVEY.md §2.5 "If trained
at scale"): when the labeled utterance corpus is itself huge (weak
supervision over 10^9 turns), the same featurization shape — word tokens
minus function words + entity-kind feature tokens → TF-IDF → logistic
regression — runs as a pyspark.ml Pipeline: CountVectorizer + IDF + LR are
all JVM-distributed, the fitted model stays a DataFrame transformer.

Scores differ numerically from the numpy OvR classifier (Spark LR is
multinomial softmax); top-1 agreement is the parity contract
(tests/test_distributed_fit.py).
"""

from __future__ import annotations


def training_frame(spark, dataset: dict, resources: dict,
                   random_seed: int = 42):
    """Augmented (text, label, intent) DataFrame — augmentation is cheap
    metadata expansion; at real scale this would be the weak-label table
    read straight from storage."""
    import numpy as np
    from .augmentation import build_training_data, utterance_text
    from .featurizer import entity_feature_name

    rs = np.random.RandomState(random_seed)
    utterances, classes, mapping = build_training_data(
        dataset, resources, 20, 5, rs)
    rows = []
    for utt, cls in zip(utterances, classes):
        feats = [utterance_text(utt)]
        feats += sorted(entity_feature_name(c["entity"])
                        for c in utt["data"] if c.get("entity"))
        rows.append((" ".join(feats), int(cls)))
    df = spark.createDataFrame(rows, ["text", "label"])
    return df, [m if m is not None else "__none__" for m in mapping]


def fit_distributed_classifier(spark, dataset: dict, resources: dict,
                               random_seed: int = 42):
    """Returns (PipelineModel, intent_mapping)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import (CountVectorizer, IDF, RegexTokenizer,
                                    StopWordsRemover)
    from .tfidf import _FEATURE_STOP_WORDS

    df, mapping = training_frame(spark, dataset, resources, random_seed)
    pipeline = Pipeline(stages=[
        RegexTokenizer(inputCol="text", outputCol="tokens",
                       pattern="[^a-zA-Z0-9%]+"),
        StopWordsRemover(inputCol="tokens", outputCol="filtered",
                         stopWords=sorted(_FEATURE_STOP_WORDS)),
        CountVectorizer(inputCol="filtered", outputCol="tf"),
        IDF(inputCol="tf", outputCol="features"),
        LogisticRegression(maxIter=100, regParam=1e-4,
                           standardization=False),
    ])
    model = pipeline.fit(df)
    return model, mapping


def predict_intents(model, mapping, spark, texts: list[str]):
    """Top-1 intent per text ('__none__' for the noise class)."""
    from pyspark.sql import functions as F  # noqa: N812
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    pred = model.transform(df).select("text", "prediction")
    out = {r["text"]: mapping[int(r["prediction"])]
           for r in pred.collect()}
    return [out[t] for t in texts]

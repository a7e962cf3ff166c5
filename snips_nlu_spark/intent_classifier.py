"""Log-reg intent classifier.

Semantics per /root/reference/snips_nlu/intent_classifier/
log_reg_classifier.py: fit :61-117 (augment → featurize → chi² → logreg,
balanced class weights, alpha = 1/(4·(N + 5·avg)) from
log_reg_classifier_utils.py:34-42), get_intents :154-194 (descending
per-class sigmoid scores incl. the None class; scores don't sum to 1).
"""

from __future__ import annotations

import numpy as np

from .ml.augmentation import build_training_data
from .ml.featurizer import Featurizer
from .ml.logreg import LogisticRegression, balanced_class_weights

MIN_UTTERANCES = 20   # ref: config_en.py:116-122
NOISE_FACTOR = 5


class LogRegIntentClassifier:
    def __init__(self) -> None:
        self.featurizer: Featurizer | None = None
        self.classifier: LogisticRegression | None = None
        self.intent_list: list[str | None] = []

    def fit(self, dataset: dict, resources: dict, entity_bundle,
            random_state: np.random.RandomState
            ) -> "LogRegIntentClassifier":
        utterances, classes, intent_mapping = build_training_data(
            dataset, resources, MIN_UTTERANCES, NOISE_FACTOR, random_state)
        self.intent_list = intent_mapping

        nb_utts = [len(i["utterances"])
                   for i in dataset["intents"].values()]
        alpha = 1.0 / (4.0 * (sum(nb_utts) + 5 * float(np.mean(nb_utts))))

        self.featurizer = Featurizer()
        x = self.featurizer.fit_transform(utterances, classes, dataset,
                                          entity_bundle)
        self.classifier = LogisticRegression(alpha=alpha, n_iter=400)
        self.classifier.fit(x, classes,
                            class_weight=balanced_class_weights(classes))
        return self

    def get_intents(self, text: str, entity_bundle,
                    anchor=None) -> list[dict]:
        """Full ranked list, None intent included."""
        return self.get_intents_batch([text], entity_bundle, [anchor])[0]

    def get_intents_batch(self, texts: list[str], entity_bundle,
                          anchors=None) -> list[list[dict]]:
        """Vectorized ranking: one feature matrix + one matmul for the
        whole batch (the Arrow-batch fast path); the single-text
        ``get_intents`` delegates here, so both paths share one code
        path by construction."""
        x = self.featurizer.transform_texts(texts, entity_bundle, anchors)
        proba = self.classifier.predict_proba(x)
        return self._ranked_from_proba_batch(proba)

    def _ranked_from_proba_batch(self, proba) -> list[list[dict]]:
        """Whole-batch ranking: one rounded matrix + one stable argsort
        instead of a per-row Python sort. Row i is identical to
        ``_ranked_from_proba(proba[i])``: same rounding (half-even), same
        column construction order, and stable descending order replicates
        Python's stable sort tie-breaking."""
        import numpy as np
        names = [self.intent_list[int(c)]
                 for c in self.classifier.classes_]
        seen = set(names)
        extra = [i for i in self.intent_list if i not in seen]
        # dedup guard mirrors _ranked_from_proba: None may already be in
        # extra via intent_list — appending again would emit a duplicate
        # None row (round-3 ADVICE)
        if None not in seen and None not in extra:
            extra.append(None)
        all_names = names + extra
        p = np.round(np.asarray(proba, dtype=float), 12)
        if extra:
            p = np.concatenate(
                [p, np.zeros((p.shape[0], len(extra)))], axis=1)
        order = np.argsort(-p, axis=1, kind="stable")
        return [
            [{"intentName": all_names[j], "probability": float(p[b, j])}
             for j in order[b]]
            for b in range(p.shape[0])]

    def _ranked_from_proba(self, proba_row) -> list[dict]:
        results = []
        for cls_idx, p in zip(self.classifier.classes_, proba_row):
            intent = self.intent_list[int(cls_idx)]
            # round to 12 dp: matrix-matrix (batch) and vector-matrix
            # (single) BLAS paths differ in the last ulp; rounding makes
            # batch and single rankings byte-identical
            results.append({"intentName": intent,
                            "probability": round(float(p), 12)})
        # classes absent from training (shouldn't happen) get 0
        seen = {r["intentName"] for r in results}
        for intent in self.intent_list:
            if intent not in seen:
                results.append({"intentName": intent, "probability": 0.0})
        if None not in seen and None not in {r["intentName"]
                                             for r in results}:
            results.append({"intentName": None, "probability": 0.0})
        results.sort(key=lambda r: -r["probability"])
        return results

    def to_dict(self) -> dict:
        return {"featurizer": self.featurizer.to_dict(),
                "classifier": self.classifier.to_dict(),
                "intent_list": self.intent_list}

    @classmethod
    def from_dict(cls, d: dict) -> "LogRegIntentClassifier":
        c = cls()
        c.featurizer = Featurizer.from_dict(d["featurizer"])
        c.classifier = LogisticRegression.from_dict(d["classifier"])
        c.intent_list = list(d["intent_list"])
        return c

"""Probabilistic intent parser: logreg intent classification, then the
classified intent's CRF slot filler.

Semantics per /root/reference/snips_nlu/intent_parser/
probabilistic_intent_parser.py:106-153 (classify → per-intent slot
filler), :164-184 (get_slots = direct CRF invocation). All slot-filler
weights are part of the model bundle (broadcast together); the intent's
filler is selected per row.
"""

from __future__ import annotations

import numpy as np

from ..intent_classifier import LogRegIntentClassifier
from ..result import (empty_result, extraction_result,
                      intent_classification_result, parsing_result,
                      unresolved_slot)
from ..registry import register_intent_parser
from ..slot_filler import CRFSlotFiller


@register_intent_parser("probabilistic_intent_parser")
class ProbabilisticIntentParser:

    def __init__(self) -> None:
        self.intent_classifier: LogRegIntentClassifier | None = None
        self.slot_fillers: dict[str, CRFSlotFiller] = {}

    @property
    def fitted(self) -> bool:
        return self.intent_classifier is not None

    def fit(self, dataset: dict, resources: dict, entity_bundle,
            random_seed: int = 42) -> "ProbabilisticIntentParser":
        random_state = np.random.RandomState(random_seed)
        self.intent_classifier = LogRegIntentClassifier().fit(
            dataset, resources, entity_bundle, random_state)
        self.slot_fillers = {}
        for intent in sorted(dataset["intents"]):
            self.slot_fillers[intent] = CRFSlotFiller().fit(
                dataset, intent, entity_bundle, random_state)
        return self

    # ---------------------------------------------------------------- parse
    def parse(self, text, entity_bundle, intents=None, top_n=None,
              anchor=None):
        if isinstance(intents, str):
            intents = {intents}
        elif intents is not None:
            intents = set(intents)

        ranked = [r for r in self.intent_classifier.get_intents(
            text, entity_bundle, anchor=anchor)
            if intents is None or r["intentName"] is None
            or r["intentName"] in intents]

        if top_n is None:
            best = ranked[0]
            if best["intentName"] is None:
                return empty_result(text, best["probability"])
            slots = self.get_slots(text, entity_bundle, best["intentName"],
                                   anchor=anchor)
            return parsing_result(text, best, slots)

        results = []
        for res in ranked[:top_n]:
            slots = []
            if res["intentName"] is not None:
                slots = self.get_slots(text, entity_bundle,
                                       res["intentName"], anchor=anchor)
            results.append(extraction_result(res, slots))
        return results

    def parse_batch(self, texts: list[str], entity_bundle,
                    anchors=None) -> list[dict]:
        """Vectorized unscoped parse of many texts: one classifier matmul,
        then one batched CRF decode per predicted intent. Row i is
        identical to ``parse(texts[i], ...)`` (same ranking and decode
        code paths; predict_batch is float-identical to
        predict_single)."""
        ranked_all = self.intent_classifier.get_intents_batch(
            texts, entity_bundle, anchors)
        anchors = anchors or [None] * len(texts)
        out: list = [None] * len(texts)
        by_intent: dict[str, list[int]] = {}
        for i, (text, ranked) in enumerate(zip(texts, ranked_all)):
            best = ranked[0]
            if best["intentName"] is None:
                out[i] = empty_result(text, best["probability"])
            else:
                by_intent.setdefault(best["intentName"], []).append(i)
        for intent, idxs in by_intent.items():
            filler = self.slot_fillers[intent]
            if hasattr(filler, "get_slots_batch"):
                slots_per_row = filler.get_slots_batch(
                    [texts[i] for i in idxs], entity_bundle,
                    [anchors[i] for i in idxs])
            else:
                slots_per_row = [
                    filler.get_slots(texts[i], entity_bundle,
                                     anchor=anchors[i]) for i in idxs]
            for i, raw_slots in zip(idxs, slots_per_row):
                slots = [unresolved_slot(
                    s["range"]["start"], s["range"]["end"], s["value"],
                    s["entity"], s["slotName"]) for s in raw_slots]
                out[i] = parsing_result(texts[i], ranked_all[i][0], slots)
        return out

    def get_intents(self, text, entity_bundle, anchor=None):
        return self.intent_classifier.get_intents(text, entity_bundle,
                                                  anchor=anchor)

    def get_intents_batch(self, texts, entity_bundle, anchors=None):
        """One classifier matmul for the whole batch (row i identical to
        ``get_intents(texts[i])`` — shared ranking code path)."""
        return self.intent_classifier.get_intents_batch(
            texts, entity_bundle, anchors)

    def get_slots(self, text, entity_bundle, intent, anchor=None):
        if intent is None:
            return []
        if intent not in self.slot_fillers:
            raise ValueError(f"unknown intent {intent!r}")
        slots = self.slot_fillers[intent].get_slots(text, entity_bundle,
                                                    anchor=anchor)
        return [unresolved_slot(s["range"]["start"], s["range"]["end"],
                                s["value"], s["entity"], s["slotName"])
                for s in slots]

    # ------------------------------------------------------------- persist
    def to_dict(self) -> dict:
        return {
            "unit_name": self.unit_name,
            "intent_classifier": self.intent_classifier.to_dict(),
            "slot_fillers": {k: v.to_dict()
                             for k, v in self.slot_fillers.items()},
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ProbabilisticIntentParser":
        p = cls()
        p.intent_classifier = LogRegIntentClassifier.from_dict(
            d["intent_classifier"])
        from ..registry import slot_filler_class
        p.slot_fillers = {
            k: slot_filler_class(
                v.get("unit_name", "crf_slot_filler")).from_dict(v)
            for k, v in d["slot_fillers"].items()}
        return p

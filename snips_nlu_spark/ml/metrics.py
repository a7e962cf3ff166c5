"""Cross-validation / train-test metrics.

Mirrors the semantics of the reference's metrics CLI
(/root/reference/snips_nlu/cli/metrics.py, which delegates to the
nlu_metrics package): stratified k-fold over each intent's utterances,
per-intent intent-classification precision/recall/F1, exact-match slot
precision/recall/F1, and a confusion matrix. Deterministic: folds are
assigned round-robin after a seeded shuffle.
"""

from __future__ import annotations

import copy
from collections import defaultdict

import numpy as np

NONE_LABEL = "null"  # nlu_metrics uses "null" for the None intent


def _utterance_text(utt: dict) -> str:
    return "".join(chunk["text"] for chunk in utt["data"])


def _expected_slots(utt: dict) -> set[tuple[str, str]]:
    return {(c["slot_name"], c["text"]) for c in utt["data"]
            if c.get("slot_name")}


def _fold_assignments(dataset: dict, nb_folds: int,
                      rng: np.random.RandomState) -> dict[str, list[int]]:
    folds: dict[str, list[int]] = {}
    for intent in sorted(dataset["intents"]):
        n = len(dataset["intents"][intent]["utterances"])
        order = rng.permutation(n)
        assign = [0] * n
        for pos, utt_idx in enumerate(order):
            assign[int(utt_idx)] = pos % nb_folds
        folds[intent] = assign
    return folds


def _prf(tp: int, fp: int, fn: int) -> dict:
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"precision": precision, "recall": recall, "f1": f1}


def compute_cross_val_metrics(dataset: dict, nb_folds: int = 5,
                              random_seed: int = 42,
                              engine_factory=None) -> dict:
    """k-fold cross-validation of the full engine on ``dataset``.

    Returns {"metrics": {intent: {"intent": prf, "slots": prf,
    "exact_parsings": int, "utterances": int}}, "average_metrics": ...,
    "confusion_matrix": {expected: {predicted: count}}}.
    """
    if engine_factory is None:
        from ..engine import NluEngine
        engine_factory = NluEngine

    rng = np.random.RandomState(random_seed)
    folds = _fold_assignments(dataset, nb_folds, rng)

    intent_tp: dict = defaultdict(int)
    intent_fp: dict = defaultdict(int)
    intent_fn: dict = defaultdict(int)
    slot_counts: dict = defaultdict(lambda: [0, 0, 0])  # tp, fp, fn
    exact: dict = defaultdict(int)
    totals: dict = defaultdict(int)
    confusion: dict = defaultdict(lambda: defaultdict(int))

    for fold in range(nb_folds):
        train = copy.deepcopy(dataset)
        test_items = []
        for intent in sorted(dataset["intents"]):
            utts = dataset["intents"][intent]["utterances"]
            keep, test = [], []
            for idx, utt in enumerate(utts):
                (test if folds[intent][idx] == fold else keep).append(utt)
            train["intents"][intent] = {"utterances": keep}
            test_items.extend((intent, utt) for utt in test)
        if not test_items:
            continue
        if any(not i["utterances"] for i in train["intents"].values()):
            # a fold that empties an intent cannot be trained fairly
            continue
        train.pop("validated", None)
        engine = engine_factory().fit(train)

        for expected_intent, utt in test_items:
            text = _utterance_text(utt)
            result = engine.parse(text)
            predicted = result["intent"]["intentName"] or NONE_LABEL
            totals[expected_intent] += 1
            confusion[expected_intent][predicted] += 1
            if predicted == expected_intent:
                intent_tp[expected_intent] += 1
            else:
                intent_fn[expected_intent] += 1
                intent_fp[predicted] += 1

            expected_slots = _expected_slots(utt)
            got_slots = {(s["slotName"], s["rawValue"])
                         for s in result["slots"]} \
                if predicted == expected_intent else set()
            counts = slot_counts[expected_intent]
            counts[0] += len(expected_slots & got_slots)
            counts[1] += len(got_slots - expected_slots)
            counts[2] += len(expected_slots - got_slots)
            if predicted == expected_intent \
                    and got_slots == expected_slots:
                exact[expected_intent] += 1

    metrics = {}
    for intent in sorted(dataset["intents"]):
        tp, fp, fn = slot_counts[intent]
        metrics[intent] = {
            "intent": _prf(intent_tp[intent], intent_fp[intent],
                           intent_fn[intent]),
            "slots": _prf(tp, fp, fn),
            "exact_parsings": exact[intent],
            "utterances": totals[intent],
        }
    n_intents = len(metrics) or 1
    average = {
        "intent_f1": sum(m["intent"]["f1"] for m in metrics.values())
        / n_intents,
        "slot_f1": sum(m["slots"]["f1"] for m in metrics.values())
        / n_intents,
        "intent_accuracy": (sum(intent_tp.values())
                            / max(1, sum(totals.values()))),
    }
    return {"metrics": metrics, "average_metrics": average,
            "confusion_matrix": {k: dict(v) for k, v in confusion.items()}}


def compute_train_test_metrics(train_dataset: dict, test_dataset: dict,
                               engine_factory=None) -> dict:
    """Train on ``train_dataset``, evaluate on ``test_dataset``'s
    utterances (same output shape as cross-val with one fold)."""
    if engine_factory is None:
        from ..engine import NluEngine
        engine_factory = NluEngine
    merged = copy.deepcopy(train_dataset)
    engine = engine_factory().fit(merged)

    intent_tp: dict = defaultdict(int)
    intent_fp: dict = defaultdict(int)
    intent_fn: dict = defaultdict(int)
    slot_counts: dict = defaultdict(lambda: [0, 0, 0])
    exact: dict = defaultdict(int)
    totals: dict = defaultdict(int)
    confusion: dict = defaultdict(lambda: defaultdict(int))

    for intent in sorted(test_dataset["intents"]):
        for utt in test_dataset["intents"][intent]["utterances"]:
            text = _utterance_text(utt)
            result = engine.parse(text)
            predicted = result["intent"]["intentName"] or NONE_LABEL
            totals[intent] += 1
            confusion[intent][predicted] += 1
            if predicted == intent:
                intent_tp[intent] += 1
            else:
                intent_fn[intent] += 1
                intent_fp[predicted] += 1
            expected_slots = _expected_slots(utt)
            got_slots = {(s["slotName"], s["rawValue"])
                         for s in result["slots"]} \
                if predicted == intent else set()
            counts = slot_counts[intent]
            counts[0] += len(expected_slots & got_slots)
            counts[1] += len(got_slots - expected_slots)
            counts[2] += len(expected_slots - got_slots)
            if predicted == intent and got_slots == expected_slots:
                exact[intent] += 1

    metrics = {}
    for intent in sorted(test_dataset["intents"]):
        tp, fp, fn = slot_counts[intent]
        metrics[intent] = {
            "intent": _prf(intent_tp[intent], intent_fp[intent],
                           intent_fn[intent]),
            "slots": _prf(tp, fp, fn),
            "exact_parsings": exact[intent],
            "utterances": totals[intent],
        }
    n_intents = len(metrics) or 1
    average = {
        "intent_f1": sum(m["intent"]["f1"] for m in metrics.values())
        / n_intents,
        "slot_f1": sum(m["slots"]["f1"] for m in metrics.values())
        / n_intents,
        "intent_accuracy": (sum(intent_tp.values())
                            / max(1, sum(totals.values()))),
    }
    return {"metrics": metrics, "average_metrics": average,
            "confusion_matrix": {k: dict(v) for k, v in confusion.items()}}

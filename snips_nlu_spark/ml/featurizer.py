"""Intent-classification featurizer: entity-enriched TF-IDF + chi²
pruning.

Semantics per /root/reference/snips_nlu/intent_classifier/featurizer.py:
utterances are enriched with ``entityfeature<kind>`` /
``builtinentityfeature<kind>`` tokens for detected mentions, builtin slot
values are removed from the text (:379-406), TF-IDF is fitted over the
enriched strings, and ngrams with chi² p-value >= 0.4 are dropped
(:105-136; threshold default_configs/config_en.py:126). Cooccurrence
features are off for en (added_cooccurrence_feature_ratio = 0.0,
config_en.py:127) and not implemented.
"""

from __future__ import annotations

import numpy as np

from ..entities.builtin import is_builtin_entity
from ..textcore import tokenize_light
from .chi2 import chi2
from .tfidf import TfidfVectorizer

PVALUE_THRESHOLD = 0.4


def entity_feature_name(entity: str) -> str:
    """ref: featurizer.py:795-802 — alnum-only so the feature survives the
    vectorizer's tokenizer as ONE token (the reference's join of
    tokenize_light leaves '/' and '_' that would fragment here)."""
    base = "".join(c for c in entity.lower() if c.isalnum())
    if is_builtin_entity(entity):
        return f"builtinentityfeature{base[5:]}"  # drop 'snips'
    return f"entityfeature{base}"


class Featurizer:
    def __init__(self, pvalue_threshold: float = PVALUE_THRESHOLD,
                 added_cooccurrence_feature_ratio: float = 0.0) -> None:
        self.pvalue_threshold = pvalue_threshold
        # en default ratio is 0.0 (config_en.py:127) — cooccurrence
        # features are opt-in
        self.added_cooccurrence_feature_ratio = \
            added_cooccurrence_feature_ratio
        self.vectorizer = TfidfVectorizer()
        self.cooccurrence = None
        self.builtin_scope: list[str] = []
        self.custom_scope: list[str] = []

    # ---------------------------------------------------------------- enrich
    def enrich_utterance(self, utterance: dict, entity_bundle,
                         anchor=None) -> str:
        """Training-side enrichment: slot chunks already carry their entity
        kind; builtin slot values are removed (ref: featurizer.py:379-406).
        """
        parts = [chunk["text"] for chunk in utterance["data"]
                 if not (chunk.get("entity")
                         and is_builtin_entity(chunk["entity"]))]
        features = " ".join(p.strip() for p in parts if p.strip())
        builtin_feats = sorted(
            entity_feature_name(c["entity"])
            for c in utterance["data"]
            if c.get("entity") and is_builtin_entity(c["entity"]))
        custom_feats = sorted(
            entity_feature_name(c["entity"])
            for c in utterance["data"]
            if c.get("entity") and not is_builtin_entity(c["entity"]))
        if builtin_feats:
            features += " " + " ".join(builtin_feats)
        if custom_feats:
            features += " " + " ".join(custom_feats)
        return features

    def enrich_text(self, text: str, entity_bundle, anchor=None) -> str:
        """Inference-side enrichment: run the entity parsers over the raw
        text, append mention features, remove builtin mention substrings."""
        builtin = entity_bundle.parse_builtin(text, self.builtin_scope,
                                              anchor) \
            if self.builtin_scope else []
        custom = entity_bundle.parse_custom(text, self.custom_scope) \
            if self.custom_scope else []
        out_text = text
        if builtin:
            # remove builtin mention substrings (right to left)
            for m in sorted(builtin, key=lambda m: -m["start"]):
                out_text = out_text[:m["start"]] + out_text[m["end"]:]
        features = " ".join(out_text.split())
        b_feats = sorted(entity_feature_name(m["entity_kind"])
                         for m in builtin)
        c_feats = sorted(entity_feature_name(m["entity_kind"])
                         for m in custom)
        if b_feats:
            features += " " + " ".join(b_feats)
        if c_feats:
            features += " " + " ".join(c_feats)
        return features

    # ------------------------------------------------------------------ fit
    def fit_transform(self, utterances: list[dict], classes: np.ndarray,
                      dataset: dict, entity_bundle) -> np.ndarray:
        self.builtin_scope = sorted(e for e in dataset["entities"]
                                    if is_builtin_entity(e))
        self.custom_scope = sorted(e for e in dataset["entities"]
                                   if not is_builtin_entity(e))
        docs = [self.enrich_utterance(u, entity_bundle) for u in utterances]
        x = self.vectorizer.fit_transform(docs)
        if x.shape[1] == 0:
            raise ValueError("empty vocabulary — dataset has no utterances")
        _, pvals = chi2(x, classes)
        keep = {i for i, p in enumerate(pvals) if p < self.pvalue_threshold}
        if not keep:
            keep = {i for i, p in enumerate(pvals) if p == pvals.min()}
        kept_ngrams = [ng for ng, i in self.vectorizer.vocabulary.items()
                       if i in keep]
        self.vectorizer.limit_vocabulary(kept_ngrams)
        x_out = self.vectorizer.transform(docs)
        if self.added_cooccurrence_feature_ratio > 0:
            from .cooccurrence import CooccurrenceVectorizer
            top_k = int(self.added_cooccurrence_feature_ratio
                        * len(self.vectorizer.vocabulary))
            self.cooccurrence = CooccurrenceVectorizer()
            x_cooc = self.cooccurrence.fit_select(docs, classes, top_k)
            x_out = np.hstack([x_out, x_cooc])
        return x_out

    def transform_texts(self, texts: list[str], entity_bundle,
                        anchors=None) -> np.ndarray:
        if anchors is None:
            anchors = [None] * len(texts)
        docs = [self.enrich_text(t, entity_bundle, a)
                for t, a in zip(texts, anchors)]
        x = self.vectorizer.transform(docs)
        if self.cooccurrence is not None and self.cooccurrence.word_pairs:
            x = np.hstack([x, self.cooccurrence.transform(docs)])
        return x

    # ------------------------------------------------------------------- io
    def to_dict(self) -> dict:
        return {"pvalue_threshold": self.pvalue_threshold,
                "added_cooccurrence_feature_ratio":
                    self.added_cooccurrence_feature_ratio,
                "vectorizer": self.vectorizer.to_dict(),
                "cooccurrence": None if self.cooccurrence is None
                else self.cooccurrence.to_dict(),
                "builtin_scope": self.builtin_scope,
                "custom_scope": self.custom_scope}

    @classmethod
    def from_dict(cls, d: dict) -> "Featurizer":
        f = cls(pvalue_threshold=d["pvalue_threshold"],
                added_cooccurrence_feature_ratio=d.get(
                    "added_cooccurrence_feature_ratio", 0.0))
        f.vectorizer = TfidfVectorizer.from_dict(d["vectorizer"])
        if d.get("cooccurrence"):
            from .cooccurrence import CooccurrenceVectorizer
            f.cooccurrence = CooccurrenceVectorizer.from_dict(
                d["cooccurrence"])
        f.builtin_scope = list(d["builtin_scope"])
        f.custom_scope = list(d["custom_scope"])
        return f

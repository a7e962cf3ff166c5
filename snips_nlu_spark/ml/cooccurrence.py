"""Co-occurrence vectorizer: ordered word-pair binary features.

Semantics per /root/reference/snips_nlu/intent_classifier/featurizer.py:
552-792: for each utterance, every ordered token pair (wi, wj) with i < j
inside ``window_size`` (None = whole utterance) becomes a binary feature
``"wi wj"``; stop words are filtered out (filter_stop_words=True default);
after fitting, only the top-k pairs by chi² are kept, where
k = added_cooccurrence_feature_ratio × n_tfidf_features
(featurizer.py:105-136). The en default ratio is 0.0
(default_configs/config_en.py:127), so this unit is opt-in.
"""

from __future__ import annotations

import numpy as np

from ..resources import EN_STOP_WORDS
from ..textcore import tokenize_light
from .chi2 import chi2


class CooccurrenceVectorizer:
    def __init__(self, window_size: int | None = None,
                 filter_stop_words: bool = True,
                 keep_order: bool = True) -> None:
        self.window_size = window_size
        self.filter_stop_words = filter_stop_words
        self.keep_order = keep_order
        self.word_pairs: dict[str, int] = {}

    def _pairs(self, text: str) -> set[str]:
        tokens = [t.lower() for t in tokenize_light(text)]
        if self.filter_stop_words:
            tokens = [t for t in tokens if t not in EN_STOP_WORDS]
        out: set[str] = set()
        n = len(tokens)
        for i in range(n):
            jmax = n if self.window_size is None \
                else min(n, i + 1 + self.window_size)
            for j in range(i + 1, jmax):
                a, b = tokens[i], tokens[j]
                if not self.keep_order and a > b:
                    a, b = b, a
                out.add(f"{a} {b}")
        return out

    def fit(self, texts: list[str]) -> "CooccurrenceVectorizer":
        vocab: dict[str, int] = {}
        for text in texts:
            for pair in sorted(self._pairs(text)):
                vocab.setdefault(pair, len(vocab))
        self.word_pairs = {p: i for i, p in enumerate(sorted(vocab))}
        return self

    def transform(self, texts: list[str]) -> np.ndarray:
        x = np.zeros((len(texts), len(self.word_pairs)))
        for i, text in enumerate(texts):
            for pair in self._pairs(text):
                j = self.word_pairs.get(pair)
                if j is not None:
                    x[i, j] = 1.0
        return x

    def limit_pairs(self, kept: list[str]) -> "CooccurrenceVectorizer":
        self.word_pairs = {p: i for i, p in
                           enumerate(sorted(set(kept)
                                            & set(self.word_pairs)))}
        return self

    def fit_select(self, texts: list[str], classes: np.ndarray,
                   top_k: int) -> np.ndarray:
        """Fit, then keep only the top_k pairs by chi² significance
        (ref: featurizer.py:138-176)."""
        self.fit(texts)
        if not self.word_pairs or top_k <= 0:
            self.word_pairs = {}
            return np.zeros((len(texts), 0))
        x = self.transform(texts)
        _, pvals = chi2(x, classes)
        order = np.argsort(pvals, kind="stable")[:top_k]
        keep_idx = set(int(i) for i in order)
        kept = [p for p, i in self.word_pairs.items() if i in keep_idx]
        self.limit_pairs(kept)
        return self.transform(texts)

    def to_dict(self) -> dict:
        return {"window_size": self.window_size,
                "filter_stop_words": self.filter_stop_words,
                "keep_order": self.keep_order,
                "word_pairs": self.word_pairs}

    @classmethod
    def from_dict(cls, d: dict) -> "CooccurrenceVectorizer":
        v = cls(window_size=d["window_size"],
                filter_stop_words=d["filter_stop_words"],
                keep_order=d["keep_order"])
        v.word_pairs = dict(d["word_pairs"])
        return v

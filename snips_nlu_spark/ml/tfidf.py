"""TF-IDF vectorizer (numpy, dense).

Behavioral equivalent of the reference's sklearn ``TfidfVectorizer`` use
(/root/reference/snips_nlu/intent_classifier/featurizer.py:240-500):
unigram counts over a custom tokenizer, smooth idf ln((1+n)/(1+df))+1,
L2-normalized rows, and ``limit_vocabulary`` for post-chi² pruning.
Training matrices here are a few hundred rows × a few hundred features —
dense numpy is the right tool; inference is a per-batch dict lookup + dot.
"""

from __future__ import annotations

import math

import numpy as np

from ..resources import EN_STOP_WORDS
from ..textcore import tokenize_light

# Function words are filtered from classifier features. Deviation from the
# reference (its sklearn vectorizer keeps them): with template-augmented
# training data, stop words are heavily intent-correlated artifacts and
# dominate otherwise-OOV inputs after L2 normalization, flipping None-class
# texts to random intents. Words that carry intent semantics ("on", "off",
# "up", "down") are excluded from the filter.
_FEATURE_STOP_WORDS = frozenset(EN_STOP_WORDS) - {"on", "off", "up", "down",
                                                  "no", "not"}


def tfidf_tokenize(text: str) -> list[str]:
    return [t.lower() for t in tokenize_light(text)
            if t.lower() not in _FEATURE_STOP_WORDS]


class TfidfVectorizer:
    def __init__(self) -> None:
        self.vocabulary: dict[str, int] = {}
        self.idf: np.ndarray | None = None

    def fit_transform(self, documents: list[str]) -> np.ndarray:
        n = len(documents)
        df: dict[str, int] = {}
        tokenized = [tfidf_tokenize(d) for d in documents]
        for toks in tokenized:
            for t in set(toks):
                df[t] = df.get(t, 0) + 1
        self.vocabulary = {t: i for i, t in enumerate(sorted(df))}
        self.idf = np.array(
            [math.log((1 + n) / (1 + df[t])) + 1.0
             for t in sorted(df)], dtype=np.float64)
        return self._transform_tokenized(tokenized)

    def transform(self, documents: list[str]) -> np.ndarray:
        return self._transform_tokenized(
            [tfidf_tokenize(d) for d in documents])

    def _transform_tokenized(self, tokenized: list[list[str]]) -> np.ndarray:
        x = np.zeros((len(tokenized), len(self.vocabulary)))
        for i, toks in enumerate(tokenized):
            for t in toks:
                j = self.vocabulary.get(t)
                if j is not None:
                    x[i, j] += 1.0
        x *= self.idf
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return x / norms

    def limit_vocabulary(self, kept_ngrams: list[str]) -> "TfidfVectorizer":
        """Restrict to a subset of the fitted vocabulary
        (ref: featurizer.py:445-471)."""
        kept = sorted(set(kept_ngrams) & set(self.vocabulary))
        old_idx = [self.vocabulary[t] for t in kept]
        self.idf = self.idf[old_idx]
        self.vocabulary = {t: i for i, t in enumerate(kept)}
        return self

    def to_dict(self) -> dict:
        return {"vocabulary": self.vocabulary,
                "idf": [] if self.idf is None else self.idf.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "TfidfVectorizer":
        v = cls()
        v.vocabulary = dict(d["vocabulary"])
        v.idf = np.array(d["idf"], dtype=np.float64)
        return v

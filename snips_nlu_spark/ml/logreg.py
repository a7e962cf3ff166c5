"""One-vs-rest L2 logistic regression (numpy, full-batch gradient descent,
deterministic).

Equivalent role to the reference's ``SGDClassifier(loss="log",
penalty="l2")`` (/root/reference/snips_nlu/intent_classifier/
log_reg_classifier.py:31-117): balanced class weights, alpha from
``1/(4·(N + 5·avg))`` (log_reg_classifier_utils.py:34-42), and
``predict_proba`` = per-class sigmoid of the decision function — the
OvR probabilities are NOT normalized across classes, matching
log_reg_classifier.py:182-194.
"""

from __future__ import annotations

import numpy as np


def balanced_class_weights(y: np.ndarray) -> dict[int, float]:
    classes, counts = np.unique(y, return_counts=True)
    n = len(y)
    k = len(classes)
    return {int(c): n / (k * cnt) for c, cnt in zip(classes, counts)}


class LogisticRegression:
    """OvR logistic regression trained with full-batch GD + L2."""

    def __init__(self, alpha: float = 1e-4, n_iter: int = 400,
                 learning_rate: float = 1.0) -> None:
        self.alpha = alpha
        self.n_iter = n_iter
        self.learning_rate = learning_rate
        self.classes_: np.ndarray | None = None
        self.coef_: np.ndarray | None = None       # k × f
        self.intercept_: np.ndarray | None = None  # k

    def fit(self, x: np.ndarray, y: np.ndarray,
            class_weight: dict[int, float] | None = None
            ) -> "LogisticRegression":
        self.classes_ = np.unique(y)
        k, f = len(self.classes_), x.shape[1]
        n = x.shape[0]
        if class_weight is None:
            class_weight = balanced_class_weights(y)
        sample_w = np.array([class_weight[int(c)] for c in y])
        w_sum = sample_w.sum()

        self.coef_ = np.zeros((k, f))
        self.intercept_ = np.zeros(k)
        targets = np.zeros((n, k))
        for i, c in enumerate(self.classes_):
            targets[y == c, i] = 1.0

        lr = self.learning_rate
        for _ in range(self.n_iter):
            z = x @ self.coef_.T + self.intercept_   # n × k
            p = 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))
            err = (p - targets) * sample_w[:, None]  # n × k
            grad_w = err.T @ x / w_sum + self.alpha * self.coef_
            grad_b = err.sum(axis=0) / w_sum
            self.coef_ -= lr * grad_w
            self.intercept_ -= lr * grad_b
        return self

    def decision_function(self, x: np.ndarray) -> np.ndarray:
        return x @ self.coef_.T + self.intercept_

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        """Per-class sigmoid (OvR), deliberately unnormalized
        (ref: log_reg_classifier.py:182-194)."""
        z = self.decision_function(x)
        return 1.0 / (1.0 + np.exp(-np.clip(z, -35, 35)))

    def to_dict(self) -> dict:
        return {"alpha": self.alpha, "n_iter": self.n_iter,
                "learning_rate": self.learning_rate,
                "classes": self.classes_.tolist(),
                "coef": self.coef_.tolist(),
                "intercept": self.intercept_.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "LogisticRegression":
        m = cls(alpha=d["alpha"], n_iter=d["n_iter"],
                learning_rate=d["learning_rate"])
        m.classes_ = np.array(d["classes"])
        m.coef_ = np.array(d["coef"])
        m.intercept_ = np.array(d["intercept"])
        return m

"""Chi² feature selection (numpy; scipy is unavailable here).

Equivalent of sklearn.feature_selection.chi2 as used at
/root/reference/snips_nlu/intent_classifier/featurizer.py:105-136:
observed = per-class feature sums, expected = outer(class_freq,
feature_sum), p-value = survival function of the chi² distribution with
n_classes-1 dof. The sf is computed via the regularized upper incomplete
gamma function (series + continued fraction, Numerical-Recipes style).
"""

from __future__ import annotations

import math

import numpy as np


def _gammainc_upper_reg(a: float, x: float) -> float:
    """Q(a, x) = Γ(a, x)/Γ(a), regularized upper incomplete gamma."""
    if x < 0 or a <= 0:
        return 1.0
    if x == 0:
        return 1.0
    if x < a + 1.0:
        # lower series, Q = 1 - P
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        p = total * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return max(0.0, 1.0 - p)
    # continued fraction for Q
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_sf(x: float, dof: int) -> float:
    """P(Chi2_dof >= x)."""
    if x <= 0:
        return 1.0
    return _gammainc_upper_reg(dof / 2.0, x / 2.0)


def chi2(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Returns (chi2 statistics, p-values) per feature; x non-negative."""
    classes = np.unique(y)
    n_samples = x.shape[0]
    y_onehot = np.zeros((n_samples, len(classes)))
    for i, c in enumerate(classes):
        y_onehot[y == c, i] = 1.0

    observed = y_onehot.T @ x                      # k × f
    feature_count = x.sum(axis=0)                  # f
    class_prob = y_onehot.mean(axis=0)             # k
    expected = np.outer(class_prob, feature_count)  # k × f

    with np.errstate(divide="ignore", invalid="ignore"):
        terms = (observed - expected) ** 2 / expected
    terms[expected == 0] = 0.0
    stats = terms.sum(axis=0)
    dof = len(classes) - 1
    pvals = np.array([chi2_sf(s, dof) for s in stats])
    return stats, pvals

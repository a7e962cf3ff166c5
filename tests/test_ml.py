"""Unit tests for the numpy ML kernels (TF-IDF, chi², logreg, CRF,
augmentation)."""

import numpy as np

from snips_nlu_spark.ml.augmentation import (augment_utterances,
                                             build_training_data)
from snips_nlu_spark.ml.chi2 import chi2, chi2_sf
from snips_nlu_spark.ml.crf import LinearChainCRF
from snips_nlu_spark.ml.logreg import LogisticRegression
from snips_nlu_spark.ml.tfidf import TfidfVectorizer
from snips_nlu_spark.fixtures import beverage_dataset
from snips_nlu_spark.dataset import validate_and_format_dataset
from snips_nlu_spark.resources import get_resources


def test_tfidf_rows_are_l2_normalized():
    v = TfidfVectorizer()
    x = v.fit_transform(["make coffee now", "turn light off",
                         "make tea now"])
    norms = np.linalg.norm(x, axis=1)
    assert np.allclose(norms, 1.0)


def test_tfidf_limit_vocabulary_keeps_transform_consistent():
    v = TfidfVectorizer()
    v.fit_transform(["aa bb cc", "bb cc dd", "cc dd ee"])
    v.limit_vocabulary(["bb", "cc"])
    x = v.transform(["bb zz"])
    assert x.shape[1] == 2
    assert x[0, v.vocabulary["bb"]] > 0
    assert x[0, v.vocabulary["cc"]] == 0


def test_tfidf_roundtrip():
    v = TfidfVectorizer()
    v.fit_transform(["make coffee", "turn light"])
    v2 = TfidfVectorizer.from_dict(v.to_dict())
    a = v.transform(["make light"])
    b = v2.transform(["make light"])
    assert np.allclose(a, b)


def test_chi2_sf_known_quantiles():
    assert abs(chi2_sf(3.841, 1) - 0.05) < 1e-3
    assert abs(chi2_sf(5.991, 2) - 0.05) < 1e-3
    assert abs(chi2_sf(0.0, 3) - 1.0) < 1e-12


def test_chi2_discriminative_feature_has_low_pvalue():
    # feature 0 only in class 0; feature 1 uniform
    x = np.array([[1.0, 1.0]] * 20 + [[0.0, 1.0]] * 20)
    y = np.array([0] * 20 + [1] * 20)
    _, p = chi2(x, y)
    assert p[0] < 0.01
    assert p[1] > 0.9


def test_logreg_balanced_weights_and_determinism():
    rng = np.random.RandomState(0)
    x = np.vstack([rng.randn(80, 3) + 1.5, rng.randn(20, 3) - 1.5])
    y = np.array([0] * 80 + [1] * 20)
    m1 = LogisticRegression(n_iter=150).fit(x, y)
    m2 = LogisticRegression(n_iter=150).fit(x, y)
    assert np.array_equal(m1.coef_, m2.coef_)
    proba = m1.predict_proba(x)
    acc = ((proba[:, 1] > proba[:, 0]) == (y == 1)).mean()
    assert acc > 0.9


def test_crf_learns_positional_pattern():
    seqs, tags = [], []
    for w in ("coffee", "tea", "latte", "mocha", "juice"):
        seqs.append([{"w": "make", "w[+1]": w},
                     {"w": w, "w[-1]": "make"}])
        tags.append(["O", "B-drink"])
        seqs.append([{"w": "hello", "w[+1]": w},
                     {"w": w, "w[-1]": "hello"}])
        tags.append(["O", "O"])
    crf = LinearChainCRF(n_iter=80).fit(seqs, tags)
    # unseen drink after "make" → context features carry it
    pred = crf.predict_single([{"w": "make", "w[+1]": "cocoa"},
                               {"w": "cocoa", "w[-1]": "make"}])
    assert pred == ["O", "B-drink"]
    pred2 = crf.predict_single([{"w": "hello", "w[+1]": "cocoa"},
                                {"w": "cocoa", "w[-1]": "hello"}])
    assert pred2 == ["O", "O"]


def test_crf_roundtrip_and_seq_proba():
    seqs = [[{"w": "a"}, {"w": "b"}]] * 3
    tags = [["O", "B-x"]] * 3
    crf = LinearChainCRF(n_iter=40).fit(seqs, tags)
    clone = LinearChainCRF.from_dict(crf.to_dict())
    assert clone.predict_single(seqs[0]) == crf.predict_single(seqs[0])
    lp = crf.sequence_log_proba(seqs[0], ["O", "B-x"])
    assert lp <= 0.0
    assert np.exp(lp) > 0.5


def test_augmentation_min_utterances_and_determinism():
    ds = validate_and_format_dataset(beverage_dataset())
    rs1 = np.random.RandomState(42)
    rs2 = np.random.RandomState(42)
    a = augment_utterances(ds, "prepareBeverage", 20, rs1)
    b = augment_utterances(ds, "prepareBeverage", 20, rs2)
    assert len(a) == 20
    assert a == b
    # slot chunks keep entity/slot_name annotations
    assert any(c.get("slot_name") == "beverage_type"
               for u in a for c in u["data"])


def test_build_training_data_has_noise_class():
    ds = validate_and_format_dataset(beverage_dataset())
    utts, classes, mapping = build_training_data(
        ds, get_resources("en"), 20, 5, np.random.RandomState(42))
    assert mapping[-1] is None          # noise class last
    assert (classes == len(mapping) - 1).sum() > 0
    assert len(utts) == len(classes)

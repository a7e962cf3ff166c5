"""CRF feature factories — mirrors the expectation shapes of the
reference's tests/test_crf_features.py (ngram w/ stemming + gazetteer
rare_word substitution, prefix/suffix/length, word_cluster, shape ngrams,
entity_match filters, custom registration)."""

import numpy as np
import pytest

from snips_nlu_spark.slot_filler import (EN_DEFAULT_FEATURES, FeatureSet,
                                         register_feature_factory)
from snips_nlu_spark.textcore import tokenize


def _compute(config, text, resources=None, entity_scopes=None, bundle=None,
             anchor=None):
    fs = FeatureSet(entity_scopes or {"custom": [], "builtin": [],
                                      "extensible": {}},
                    bundle, features_config=[config],
                    resources=resources or {"stems": {}, "gazetteers": {},
                                            "word_clusters": {}})
    return fs.compute(text, list(tokenize(text)), anchor=anchor)


def test_ngram_factory_plain():
    cfg = {"factory_name": "ngram", "offsets": [0],
           "args": {"n": 2, "use_stemming": False,
                    "common_words_gazetteer_name": None}}
    feats = _compute(cfg, "hello Beautiful world")
    assert feats[0]["ngram_2"] == "hello beautiful"
    assert feats[1]["ngram_2"] == "beautiful world"
    assert "ngram_2" not in feats[2]  # no bigram starting at the last token


def test_ngram_factory_with_stemming():
    cfg = {"factory_name": "ngram", "offsets": [0],
           "args": {"n": 1, "use_stemming": True,
                    "common_words_gazetteer_name": None}}
    res = {"stems": {"lights": "light"}, "gazetteers": {},
           "word_clusters": {}}
    feats = _compute(cfg, "the lights", resources=res)
    assert feats[1]["ngram_1"] == "light"


def test_ngram_factory_with_gazetteer_rare_word():
    cfg = {"factory_name": "ngram", "offsets": [0],
           "args": {"n": 2, "use_stemming": False,
                    "common_words_gazetteer_name": "my_gazetteer"}}
    res = {"stems": {},
           "gazetteers": {"my_gazetteer": {"hello", "beautiful", "world"}},
           "word_clusters": {}}
    feats = _compute(cfg, "hello beautiful foobar world", resources=res)
    assert feats[1]["ngram_2"] == "beautiful rare_word"
    assert feats[2]["ngram_2"] == "rare_word world"


def test_ngram_offsets():
    cfg = {"factory_name": "ngram", "offsets": [-1, 0, 1],
           "args": {"n": 1, "use_stemming": False,
                    "common_words_gazetteer_name": None}}
    feats = _compute(cfg, "a b c")
    # feature at token i with offset o reads the series at i+o
    assert feats[1]["ngram_1[-1]"] == "a"
    assert feats[1]["ngram_1"] == "b"
    assert feats[1]["ngram_1[+1]"] == "c"
    assert "ngram_1[-1]" not in feats[0]


def test_prefix_suffix_length_factories():
    feats = _compute({"factory_name": "prefix", "offsets": [0],
                      "args": {"prefix_size": 2}}, "Hello worlds")
    assert feats[0]["prefix_2"] == "he"
    feats = _compute({"factory_name": "suffix", "offsets": [0],
                      "args": {"suffix_size": 3}}, "Hello worlds")
    assert feats[1]["suffix_3"] == "lds"
    feats = _compute({"factory_name": "length", "offsets": [0],
                      "args": {}}, "Hello worlds")
    assert feats[0]["length"] == "5"
    assert feats[1]["length"] == "6"
    # chunk larger than the word → absent, not truncated
    feats = _compute({"factory_name": "prefix", "offsets": [0],
                      "args": {"prefix_size": 9}}, "tiny")
    assert "prefix_9" not in feats[0]


def test_word_cluster_factory():
    cfg = {"factory_name": "word_cluster", "offsets": [0],
           "args": {"cluster_name": "brown_clusters",
                    "use_stemming": False}}
    res = {"stems": {}, "gazetteers": {},
           "word_clusters": {"brown_clusters": {"bird": "1011"}}}
    feats = _compute(cfg, "hello bird", resources=res)
    assert "word_cluster_brown_clusters" not in feats[0]
    assert feats[1]["word_cluster_brown_clusters"] == "1011"


def test_shape_ngram_factory():
    cfg = {"factory_name": "shape_ngram", "offsets": [0], "args": {"n": 2}}
    feats = _compute(cfg, "Hello BEAUTIFUL world xX9")
    assert feats[0]["shape_ngram_2"] == "Xxx XXX"
    assert feats[2]["shape_ngram_2"] == "xxx xX"


def test_entity_match_factory_extensibility_filter():
    class FakeBundle:
        def parse_custom(self, text, scope):
            if "dummy_a" in scope and "tea" in text:
                i = text.index("tea")
                return [{"entity_kind": "dummy_a", "start": i,
                         "end": i + 3, "value": "tea",
                         "resolved_value": "tea"}]
            return []

    scopes = {"custom": ["dummy_a", "dummy_b"], "builtin": [],
              "extensible": {"dummy_a": False, "dummy_b": True}}
    cfg = {"factory_name": "entity_match", "offsets": [0],
           "args": {"tagging_scheme_code": 2,
                    "entity_filter": {"automatically_extensible": False}}}
    fs = FeatureSet(scopes, FakeBundle(), features_config=[cfg],
                    resources={"stems": {}, "gazetteers": {},
                               "word_clusters": {}})
    feats = fs.compute("make some tea", list(tokenize("make some tea")))
    # only the non-extensible entity matches this config; single-token
    # match under BILOU → U- prefix
    assert feats[2]["entity_match_dummy_a"] == "U-1"
    assert not any("dummy_b" in k for f in feats for k in f)


def test_entity_match_drop_out_train_only():
    class FakeBundle:
        def parse_custom(self, text, scope):
            return [{"entity_kind": "dummy_b", "start": 0, "end": 4,
                     "value": "make", "resolved_value": "make"}]

    scopes = {"custom": ["dummy_b"], "builtin": [],
              "extensible": {"dummy_b": True}}
    cfg = {"factory_name": "entity_match", "offsets": [0], "drop_out": 1.0,
           "args": {"tagging_scheme_code": 2,
                    "entity_filter": {"automatically_extensible": True}}}
    fs = FeatureSet(scopes, FakeBundle(), features_config=[cfg],
                    resources={"stems": {}, "gazetteers": {},
                               "word_clusters": {}})
    toks = list(tokenize("make tea"))
    # inference (no random_state): never dropped; single-token span → U-
    assert fs.compute("make tea", toks)[0]["entity_match_dummy_b"] == "U-1"
    # training with drop_out=1.0: always dropped
    rng = np.random.RandomState(0)
    assert "entity_match_dummy_b" not in \
        fs.compute("make tea", toks, random_state=rng)[0]


def test_custom_factory_registration():
    @register_feature_factory("is_vowel_start")
    def _factory(args, fs, ctx):
        yield "is_vowel_start", [
            "1" if v and v[0].lower() in "aeiou" else None
            for v in ctx["values"]]

    cfg = {"factory_name": "is_vowel_start", "offsets": [0], "args": {}}
    feats = _compute(cfg, "apple banana")
    assert feats[0]["is_vowel_start"] == "1"
    assert "is_vowel_start" not in feats[1]


def test_en_default_config_shape():
    """The default feature set carries the full en-default factory list
    (config_en.py:14-100): gazetteer-stemmed ngrams, word_cluster, split
    entity_match with drop-out on the extensible group."""
    names = [c["factory_name"] for c in EN_DEFAULT_FEATURES]
    assert names.count("ngram") == 2
    assert names.count("entity_match") == 2
    assert "word_cluster" in names
    ngram1 = next(c for c in EN_DEFAULT_FEATURES
                  if c["factory_name"] == "ngram" and c["args"]["n"] == 1)
    assert ngram1["args"]["common_words_gazetteer_name"] == \
        "top_10000_words_stemmed"
    assert ngram1["args"]["use_stemming"] is True
    dropped = [c for c in EN_DEFAULT_FEATURES if c.get("drop_out")]
    assert len(dropped) == 1 and dropped[0]["drop_out"] == 0.5
    assert dropped[0]["args"]["entity_filter"] == \
        {"automatically_extensible": True}


def test_resources_ship_gazetteer_and_clusters():
    from snips_nlu_spark.resources import get_resources
    res = get_resources("en")
    gaz = res["gazetteers"]["top_10000_words_stemmed"]
    assert {"the", "make", "coffee", "tomorrow"} <= gaz
    clusters = res["word_clusters"]["brown_clusters"]
    assert clusters["coffee"] == clusters["tea"]  # same semantic cluster
    assert clusters["coffee"] != clusters["kitchen"]
    assert set(clusters["coffee"]) <= {"0", "1"}  # binary-path ids

"""Fuzzy gazetteer matching (matching_strictness < 1.0) and the
cooccurrence vectorizer (opt-in, §2.5)."""

import numpy as np

from snips_nlu_spark.entities.gazetteer import GazetteerParser
from snips_nlu_spark.ml.cooccurrence import CooccurrenceVectorizer


def test_fuzzy_gazetteer_partial_match():
    gaz = GazetteerParser.build(
        {"artist": {"the rolling stones": "The Rolling Stones",
                    "daft punk": "Daft Punk"}},
        strictness={"artist": 0.5})
    # 2 of 3 tokens → ratio 0.66 ≥ 0.5
    ms = gaz.parse("play rolling stones now", scope=["artist"])
    assert ms and ms[0]["resolved_value"]["value"] == "The Rolling Stones"
    assert ms[0]["value"] == "rolling stones"
    # 1 of 2 tokens → 0.5 ≥ 0.5
    ms2 = gaz.parse("some daft tune", scope=["artist"])
    assert ms2 and ms2[0]["resolved_value"]["value"] == "Daft Punk"


def test_fuzzy_gazetteer_below_threshold_no_match():
    gaz = GazetteerParser.build(
        {"artist": {"the rolling stones": "The Rolling Stones"}},
        strictness={"artist": 0.7})
    # 1 of 3 tokens = 0.33 < 0.7
    assert gaz.parse("stones everywhere", scope=["artist"]) == []


def test_strict_entity_unaffected_by_fuzzy_machinery():
    gaz = GazetteerParser.build(
        {"drink": {"green tea": "green tea"}},
        strictness={"drink": 1.0})
    assert gaz.parse("a tea please", scope=["drink"]) == []
    assert gaz.parse("a green tea please", scope=["drink"])[0][
        "value"] == "green tea"


def test_fuzzy_roundtrip_through_dict():
    gaz = GazetteerParser.build(
        {"artist": {"daft punk": "Daft Punk"}},
        strictness={"artist": 0.5})
    clone = GazetteerParser.from_dict(gaz.to_dict())
    assert clone.parse("daft stuff", scope=["artist"]) == \
        gaz.parse("daft stuff", scope=["artist"])


def test_cooccurrence_pairs_and_selection():
    v = CooccurrenceVectorizer(window_size=None)
    texts = ["turn light on", "turn light off", "play some music",
             "play loud music"]
    classes = np.array([0, 0, 1, 1])
    x = v.fit_select(texts, classes, top_k=4)
    assert x.shape == (4, 4)
    assert len(v.word_pairs) == 4
    # transform is binary and consistent
    x2 = v.transform(["turn light on"])
    assert set(np.unique(x2)) <= {0.0, 1.0}


def test_featurizer_with_cooccurrence_ratio():
    from snips_nlu_spark.dataset import validate_and_format_dataset
    from snips_nlu_spark.engine import EntityBundle
    from snips_nlu_spark.entities.builtin import BuiltinEntityParser
    from snips_nlu_spark.fixtures import lights_dataset
    from snips_nlu_spark.ml.featurizer import Featurizer

    ds = validate_and_format_dataset(lights_dataset())
    gaz = GazetteerParser.build(
        {n: e["utterances"] for n, e in ds["entities"].items()})
    bundle = EntityBundle(gaz, BuiltinEntityParser())

    utterances = [u for i in ds["intents"].values()
                  for u in i["utterances"]]
    classes = np.array([k for k, i in enumerate(ds["intents"].values())
                        for _ in i["utterances"]])
    f = Featurizer(added_cooccurrence_feature_ratio=0.5)
    x = f.fit_transform(utterances, classes, ds, bundle)
    n_tfidf = len(f.vectorizer.vocabulary)
    assert x.shape[1] == n_tfidf + len(f.cooccurrence.word_pairs)
    assert len(f.cooccurrence.word_pairs) <= int(0.5 * n_tfidf)
    # inference path concatenates the same blocks
    xt = f.transform_texts(["switch on the light"], bundle)
    assert xt.shape[1] == x.shape[1]
    # roundtrip
    clone = Featurizer.from_dict(f.to_dict())
    assert np.allclose(
        clone.transform_texts(["switch on the light"], bundle), xt)


def test_fuzzy_ranking_prefers_more_matched_tokens():
    # documented gazetteer-entity-parser ranking: among candidate values
    # matching from the same start token, the one with the most matched
    # tokens wins
    gaz = GazetteerParser.build(
        {"artist": {"the rolling stones": "The Rolling Stones",
                    "rolling": "Rolling Solo"}},
        strictness={"artist": 0.5})
    ms = gaz.parse("play rolling stones", scope=["artist"])
    assert ms[0]["resolved_value"]["value"] == "The Rolling Stones"


def test_fuzzy_ranking_tie_prefers_tighter_value():
    # tie on matched tokens → the value with fewer tokens (the tighter
    # match) wins: 2/2 of "daft punk" beats 2/4 of the longer value
    gaz = GazetteerParser.build(
        {"artist": {"daft punk": "Daft Punk",
                    "daft punk tribute band": "Tribute"}},
        strictness={"artist": 0.5})
    ms = gaz.parse("play daft punk xyz", scope=["artist"])
    assert ms[0]["resolved_value"]["value"] == "Daft Punk"
    assert ms[0]["value"] == "daft punk"


def test_fuzzy_canonical_readme_example():
    # the crate's canonical example: "les rolling stones" resolves with
    # ratio 2/3 when "the" is missing from the query
    gaz = GazetteerParser.build(
        {"artist": {"the rolling stones": "The Rolling Stones",
                    "blink 182": "Blink-182"}},
        strictness={"artist": 0.6})
    ms = gaz.parse("i want to listen to rolling stones", scope=["artist"])
    assert len(ms) == 1
    assert ms[0]["resolved_value"]["value"] == "The Rolling Stones"
    assert ms[0]["value"] == "rolling stones"


def test_fuzzy_skip_tolerance_inside_span():
    """Round-4 (builder ROADMAP #3): bounded stray text tokens INSIDE a
    match span. strictness 0.5 on a 2-token value tolerates
    floor(0.5 * 2) = 1 stray token — "rolling mighty stones" matches the
    full span (matched=2) where the old contiguous matcher stopped at
    "rolling" (matched=1). Hand-computed reference-semantics expectation:
    the span covers matched tokens end-to-end, strays included."""
    gaz = GazetteerParser.build(
        {"artist": {"rolling stones": "The Rolling Stones"}},
        strictness={"artist": 0.5})
    ms = gaz.parse("play rolling mighty stones now", scope=["artist"])
    assert len(ms) == 1
    assert ms[0]["value"] == "rolling mighty stones"
    assert ms[0]["resolved_value"]["value"] == "The Rolling Stones"


def test_fuzzy_skip_tolerance_budget_bounded():
    # two strays exceed the 1-skip budget of a 2-token value at 0.5 —
    # no bridged span; each matched token stands alone (both ≥ 0.5 on
    # their own, non-overlapping, so both survive)
    gaz = GazetteerParser.build(
        {"artist": {"rolling stones": "The Rolling Stones"}},
        strictness={"artist": 0.5})
    ms = gaz.parse("play rolling very mighty stones", scope=["artist"])
    assert [m["value"] for m in ms] == ["rolling", "stones"]


def test_fuzzy_skip_never_at_edges():
    # a stray can't start a match and the span never ends on one
    gaz = GazetteerParser.build(
        {"artist": {"rolling stones": "The Rolling Stones"}},
        strictness={"artist": 0.5})
    ms = gaz.parse("mighty rolling stones loud", scope=["artist"])
    assert len(ms) == 1
    assert ms[0]["value"] == "rolling stones"


def test_fuzzy_skip_tolerance_strictness_one_disables():
    gaz = GazetteerParser.build(
        {"artist": {"rolling stones": "The Rolling Stones"}},
        strictness={"artist": 0.9})
    # budget floor(0.1 * 2) = 0 — stray token splits the match
    ms = gaz.parse("play rolling mighty stones", scope=["artist"])
    assert all(m["value"] != "rolling mighty stones" for m in ms)

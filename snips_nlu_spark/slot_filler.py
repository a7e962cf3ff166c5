"""CRF slot filler: feature factories + train/decode.

Feature factories follow /root/reference/snips_nlu/slot_filler/
feature_factory.py:119-619 with the en default set and offsets
(default_configs/config_en.py:14-100). Unavailable resources are degraded
explicitly: no common-words gazetteer (ngrams stay literal words), no
brown clusters (word_cluster factory omitted), no stemming (en featurizer
default is already unstemmed).

One CRF per intent (ref: probabilistic_intent_parser.py:82-95); training
data is the augmented utterance set (min 200/intent,
config_en.py:108-112); decode = Viterbi → ``tags_to_slots``
(crf_slot_filler.py:166-191).
"""

from __future__ import annotations

import numpy as np

from .entities.builtin import is_builtin_entity
from .ml.augmentation import augment_utterances
from .ml.crf import LinearChainCRF
from .tagging import (TaggingScheme, negative_tagging, positive_tagging,
                      tags_to_slots, utterance_to_sample)
from .textcore import Token, get_shape, normalize, tokenize

CRF_MIN_UTTERANCES = 200  # ref: config_en.py:108-112


# ---------------------------------------------------------------------------
# feature factories — each returns dict entries {name: value} per token
# ---------------------------------------------------------------------------

def _offset_name(name: str, offset: int) -> str:
    if offset == 0:
        return name
    return f"{name}[{offset:+d}]"


class FeatureSet:
    """Computes per-token feature dicts for a token sequence, applying each
    base feature at its configured offsets (ref: feature.py:51-61)."""

    def __init__(self, entity_scopes: dict, entity_bundle,
                 tagging_scheme=TaggingScheme.BILOU) -> None:
        self.entity_scopes = entity_scopes  # {"custom": [...], "builtin": [...]}
        self.bundle = entity_bundle
        self.scheme = tagging_scheme

    def compute(self, text: str, tokens: list[Token],
                drop_out: dict[str, float] | None = None,
                random_state: np.random.RandomState | None = None,
                anchor=None) -> list[dict]:
        n = len(tokens)
        values = [t.value for t in tokens]
        lowers = [v.lower() for v in values]

        base: dict[str, list] = {}
        # ngram n=1 (lowercased word), offsets [-2..2]
        base["ngram_1"] = lowers
        # ngram n=2, offsets [-2, 1]
        base["ngram_2"] = [
            " ".join(lowers[i:i + 2]) if i + 1 < n else None
            for i in range(n)]
        base["is_digit"] = ["1" if v.isdigit() else None for v in values]
        base["is_first"] = ["1" if i == 0 else None for i in range(n)]
        base["is_last"] = ["1" if i == n - 1 else None for i in range(n)]
        base["shape_ngram_1"] = [get_shape(v) for v in values]
        base["shape_ngram_2"] = [
            " ".join(get_shape(v) for v in values[i:i + 2])
            if i + 1 < n else None for i in range(n)]
        base["shape_ngram_3"] = [
            " ".join(get_shape(v) for v in values[i:i + 3])
            if i + 2 < n else None for i in range(n)]

        # entity_match_<entity> with BILOU prefixes (factory ref:
        # feature_factory.py:344-452); builtin_entity_match_<kind> with BIO
        for entity in self.entity_scopes.get("custom", []):
            feats = [None] * n
            if not (drop_out and random_state is not None
                    and random_state.rand() < drop_out.get(entity, 0.0)):
                mentions = self.bundle.parse_custom(text, [entity])
                _tag_mentions(mentions, tokens, feats, TaggingScheme.BILOU)
            base[f"entity_match_{entity}"] = feats
        for kind in self.entity_scopes.get("builtin", []):
            feats = [None] * n
            mentions = self.bundle.parse_builtin(text, [kind], anchor)
            _tag_mentions(mentions, tokens, feats, TaggingScheme.BIO)
            base[f"builtin_entity_match_{kind[6:]}"] = feats

        offsets_map = {
            "ngram_1": (-2, -1, 0, 1, 2),
            "ngram_2": (-2, 1),
            "is_digit": (-1, 0, 1),
            "is_first": (-2, -1, 0),
            "is_last": (0, 1, 2),
            "shape_ngram_1": (0,),
            "shape_ngram_2": (-1, 0),
            "shape_ngram_3": (-1,),
        }
        out: list[dict] = [dict() for _ in range(n)]
        for name, series in base.items():
            offs = offsets_map.get(name, (-2, -1, 0))
            for i in range(n):
                for off in offs:
                    j = i - off
                    if 0 <= j < n and series[i] is not None:
                        out[j][_offset_name(name, off)] = series[i]
        return out


def _tag_mentions(mentions, tokens, feats, scheme) -> None:
    """Mark tokens covered by mentions with scheme-prefixed '1' values
    (e.g. B-1/I-1/L-1/U-1), mirroring the reference's positive tagging of
    matched spans."""
    for m in mentions:
        covered = [i for i, t in enumerate(tokens)
                   if t.start >= m["start"] and t.end <= m["end"]]
        if not covered:
            continue
        tags = positive_tagging(scheme, "1", len(covered))
        for idx, tag in zip(covered, tags):
            feats[idx] = tag


# ---------------------------------------------------------------------------

class CRFSlotFiller:
    """ref: slot_filler/crf_slot_filler.py — one per intent."""

    def __init__(self, tagging_scheme=TaggingScheme.BIO) -> None:
        self.scheme = TaggingScheme(tagging_scheme)
        self.crf = LinearChainCRF()
        self.slot_name_mapping: dict[str, str] = {}
        self.entity_scopes: dict = {"custom": [], "builtin": []}

    def fit(self, dataset: dict, intent: str, entity_bundle,
            random_state: np.random.RandomState) -> "CRFSlotFiller":
        mapping = {}
        for utt in dataset["intents"][intent]["utterances"]:
            for chunk in utt["data"]:
                if chunk.get("slot_name"):
                    mapping[chunk["slot_name"]] = chunk["entity"]
        self.slot_name_mapping = mapping
        self.entity_scopes = {
            "custom": sorted({e for e in mapping.values()
                              if not is_builtin_entity(e)}),
            "builtin": sorted({e for e in mapping.values()
                               if is_builtin_entity(e)}),
        }
        feature_set = FeatureSet(self.entity_scopes, entity_bundle)
        # train-time drop-out on extensible entity match features
        # (ref: config_en.py drop_out 0.5; crf_slot_filler.py:205-208)
        drop_out = {
            e: 0.5 for e in self.entity_scopes["custom"]
            if dataset["entities"][e]["automatically_extensible"]}

        augmented = augment_utterances(dataset, intent, CRF_MIN_UTTERANCES,
                                       random_state)
        # capitalization augmentation, ratio 0.2 (ref: config_en.py:110)
        from .ml.augmentation import capitalize_utterances
        from .resources import EN_STOP_WORDS
        augmented = capitalize_utterances(
            augmented, dataset["entities"], 0.2, set(EN_STOP_WORDS),
            random_state)
        sequences, tag_sequences = [], []
        for utt in augmented:
            sample = utterance_to_sample(utt["data"], self.scheme)
            if not sample["tokens"]:
                continue
            text = "".join(c["text"] for c in utt["data"])
            feats = feature_set.compute(
                text, list(sample["tokens"]), drop_out=drop_out,
                random_state=random_state)
            sequences.append(feats)
            tag_sequences.append(sample["tags"])
        self.crf.fit(sequences, tag_sequences)
        return self

    def get_slots(self, text: str, entity_bundle, anchor=None) -> list[dict]:
        tokens = list(tokenize(text))
        if not tokens:
            return []
        feature_set = FeatureSet(self.entity_scopes, entity_bundle)
        feats = feature_set.compute(text, tokens, anchor=anchor)
        tags = self.crf.predict_single(feats)
        slots = tags_to_slots(text, tokens, tags, self.scheme,
                              self.slot_name_mapping)
        return [
            {"range": {"start": s["start"], "end": s["end"]},
             "value": s["value"], "entity": s["entity"],
             "slotName": s["slot_name"]}
            for s in slots
        ]

    def to_dict(self) -> dict:
        return {"tagging_scheme": int(self.scheme),
                "crf": self.crf.to_dict(),
                "slot_name_mapping": self.slot_name_mapping,
                "entity_scopes": self.entity_scopes}

    @classmethod
    def from_dict(cls, d: dict) -> "CRFSlotFiller":
        sf = cls(tagging_scheme=TaggingScheme(d["tagging_scheme"]))
        sf.crf = LinearChainCRF.from_dict(d["crf"])
        sf.slot_name_mapping = dict(d["slot_name_mapping"])
        sf.entity_scopes = d["entity_scopes"]
        return sf


class KeywordSlotFiller:
    """Exact token→(entity, slot) lookup — the reference's registered
    alternative unit (slot_filler/keyword_slot_filler.py:11-51); cheap
    debugging baseline."""

    def __init__(self) -> None:
        self.slots_keywords: dict[str, tuple[str, str]] = {}

    def fit(self, dataset: dict, intent: str) -> "KeywordSlotFiller":
        for utt in dataset["intents"][intent]["utterances"]:
            for chunk in utt["data"]:
                if chunk.get("slot_name"):
                    self.slots_keywords[normalize(chunk["text"].strip())] = (
                        chunk["entity"], chunk["slot_name"])
        return self

    def get_slots(self, text: str, *_args, **_kw) -> list[dict]:
        slots = []
        for token in tokenize(text):
            key = normalize(token.value)
            if key in self.slots_keywords:
                entity, slot_name = self.slots_keywords[key]
                slots.append({
                    "range": {"start": token.start, "end": token.end},
                    "value": token.value, "entity": entity,
                    "slotName": slot_name})
        return slots

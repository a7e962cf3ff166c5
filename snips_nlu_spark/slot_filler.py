"""CRF slot filler: feature factories + train/decode.

Feature factories mirror /root/reference/snips_nlu/slot_filler/
feature_factory.py:119-619 and are config-driven like the reference's
``feature_factory_configs`` (default_configs/config_en.py:14-100): the
full en default set — gazetteer-backed stemmed ngrams (rare_word
substitution), is_digit/is_first/is_last, shape ngrams, entity_match
(split by extensibility, drop-out on the extensible group),
builtin_entity_match, word_cluster — plus the registered-but-not-default
prefix / suffix / length factories. New factories can be registered with
``register_feature_factory`` (the open-registry hook, mirroring
``CRFFeatureFactory.register``, feature_factory.py:60-75).

One CRF per intent (ref: probabilistic_intent_parser.py:82-95); training
data is the augmented utterance set (min 200/intent,
config_en.py:108-112); decode = Viterbi → ``tags_to_slots``
(crf_slot_filler.py:166-191).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .entities.builtin import is_builtin_entity
from .registry import register_slot_filler
from .ml.augmentation import augment_utterances
from .ml.crf import LinearChainCRF
from .resources import get_resources
from .tagging import (TaggingScheme, negative_tagging, positive_tagging,
                      tags_to_slots, utterance_to_sample)
from .textcore import (Token, get_shape, get_word_chunk, normalize,
                       tokenize)

CRF_MIN_UTTERANCES = 200  # ref: config_en.py:108-112


@lru_cache(maxsize=8)
def _cached_resources(language: str) -> dict:
    return get_resources(language)


# ---------------------------------------------------------------------------
# feature factory registry — config-driven, open for extension
# ---------------------------------------------------------------------------

FEATURE_FACTORIES: dict = {}


def register_feature_factory(name: str):
    """Register a CRF feature factory under ``name`` so it can be used in
    ``feature_factory_configs`` (ref: CRFFeatureFactory.register,
    feature_factory.py:60-75). The factory is a callable
    ``(args, feature_set, ctx) -> iterable[(base_name, series)]`` where
    ``series[i]`` is the feature value at token i (None = absent)."""
    def deco(fn):
        FEATURE_FACTORIES[name] = fn
        return fn
    return deco


# en default feature set (ref: default_configs/config_en.py:14-100)
EN_DEFAULT_FEATURES: list[dict] = [
    {"factory_name": "ngram", "offsets": [-2, -1, 0, 1, 2],
     "args": {"n": 1, "use_stemming": True,
              "common_words_gazetteer_name": "top_10000_words_stemmed"}},
    {"factory_name": "ngram", "offsets": [-2, 1],
     "args": {"n": 2, "use_stemming": True,
              "common_words_gazetteer_name": "top_10000_words_stemmed"}},
    {"factory_name": "is_digit", "offsets": [-1, 0, 1], "args": {}},
    {"factory_name": "is_first", "offsets": [-2, -1, 0], "args": {}},
    {"factory_name": "is_last", "offsets": [0, 1, 2], "args": {}},
    {"factory_name": "shape_ngram", "offsets": [0], "args": {"n": 1}},
    {"factory_name": "shape_ngram", "offsets": [-1, 0], "args": {"n": 2}},
    {"factory_name": "shape_ngram", "offsets": [-1], "args": {"n": 3}},
    {"factory_name": "entity_match", "offsets": [-2, -1, 0],
     "args": {"tagging_scheme_code": int(TaggingScheme.BILOU),
              "use_stemming": True,
              "entity_filter": {"automatically_extensible": False}}},
    {"factory_name": "entity_match", "offsets": [-2, -1, 0],
     "drop_out": 0.5,
     "args": {"tagging_scheme_code": int(TaggingScheme.BILOU),
              "use_stemming": True,
              "entity_filter": {"automatically_extensible": True}}},
    {"factory_name": "builtin_entity_match", "offsets": [-2, -1, 0],
     "args": {"tagging_scheme_code": int(TaggingScheme.BIO)}},
    {"factory_name": "word_cluster", "offsets": [-2, -1, 0, 1],
     "args": {"cluster_name": "brown_clusters", "use_stemming": False}},
]


def _norm_words(args: dict, fs: "FeatureSet", ctx: dict) -> list[str]:
    """Normalized (and optionally stemmed) token values — computed once
    per (ctx, use_stemming) and shared across factories (the en default
    config reads them from three factories per text). Treat as
    read-only."""
    use_stemming = args.get("use_stemming", False)
    key = ("_norm_words", use_stemming)
    cached = ctx.get(key)
    if cached is None:
        stems = fs.resources.get("stems", {})
        cached = []
        for v in ctx["values"]:
            w = normalize(v)
            if use_stemming:
                w = stems.get(w, w)
            cached.append(w)
        ctx[key] = cached
    return cached


@register_feature_factory("ngram")
def _ngram_factory(args, fs, ctx):
    """ref: feature_factory.py:194-280 — n-gram of normalized/stemmed
    words; out-of-gazetteer words are replaced by the alias 'rare_word'
    when a common-words gazetteer is configured."""
    n = args["n"]
    words = _norm_words(args, fs, ctx)
    gaz_name = args.get("common_words_gazetteer_name")
    if gaz_name is not None:
        gaz = fs.resources.get("gazetteers", {}).get(gaz_name, frozenset())
        words = [w if w in gaz else "rare_word" for w in words]
    n_tok = len(words)
    series = [" ".join(words[i:i + n]) if i + n <= n_tok else None
              for i in range(n_tok)]
    yield f"ngram_{n}", series


@register_feature_factory("is_digit")
def _is_digit_factory(args, fs, ctx):
    yield "is_digit", ["1" if v.isdigit() else None for v in ctx["values"]]


@register_feature_factory("is_first")
def _is_first_factory(args, fs, ctx):
    n = len(ctx["values"])
    yield "is_first", ["1" if i == 0 else None for i in range(n)]


@register_feature_factory("is_last")
def _is_last_factory(args, fs, ctx):
    n = len(ctx["values"])
    yield "is_last", ["1" if i == n - 1 else None for i in range(n)]


@register_feature_factory("prefix")
def _prefix_factory(args, fs, ctx):
    """ref: feature_factory.py:143-160"""
    size = args["prefix_size"]
    yield f"prefix_{size}", [
        get_word_chunk(normalize(v), size, 0) for v in ctx["values"]]


@register_feature_factory("suffix")
def _suffix_factory(args, fs, ctx):
    """ref: feature_factory.py:163-180"""
    size = args["suffix_size"]
    yield f"suffix_{size}", [
        get_word_chunk(normalize(v), size, len(normalize(v)), reverse=True)
        for v in ctx["values"]]


@register_feature_factory("length")
def _length_factory(args, fs, ctx):
    """ref: feature_factory.py:183-189"""
    yield "length", [str(len(v)) for v in ctx["values"]]


@register_feature_factory("shape_ngram")
def _shape_ngram_factory(args, fs, ctx):
    """ref: feature_factory.py:283-331"""
    n = args["n"]
    shapes = ctx.get("_shapes")
    if shapes is None:
        shapes = ctx["_shapes"] = [get_shape(v) for v in ctx["values"]]
    n_tok = len(shapes)
    if n == 1:
        series = list(shapes)
    else:
        series = [" ".join(shapes[i:i + n]) if i + n <= n_tok else None
                  for i in range(n_tok)]
    yield f"shape_ngram_{n}", series


@register_feature_factory("word_cluster")
def _word_cluster_factory(args, fs, ctx):
    """ref: feature_factory.py:335-376 — the cluster id the normalized
    (optionally stemmed) token belongs to, None when unknown."""
    cluster_name = args["cluster_name"]
    cluster = fs.resources.get("word_clusters", {}).get(cluster_name, {})
    words = _norm_words(args, fs, ctx)
    yield f"word_cluster_{cluster_name}", [cluster.get(w) for w in words]


def _stemmed_token_stream(fs, ctx):
    """Tokens normalized+stemmed and re-laid-out with single-space
    separators — token COUNT is invariant, so tags map back by index
    (ref: CustomEntityMatchFactory._transform, feature_factory.py:
    440-456)."""
    stems = fs.resources.get("stems", {})
    toks = []
    pos = 0
    for v in ctx["values"]:
        w = normalize(v)
        w = stems.get(w, w)
        toks.append(Token(w, pos, pos + len(w)))
        pos += len(w) + 1
    return " ".join(t.value for t in toks), toks


@register_feature_factory("entity_match")
def _entity_match_factory(args, fs, ctx):
    """ref: feature_factory.py:379-509 — one feature per custom entity in
    scope, scheme-prefixed over matched spans; ``entity_filter``
    restricts to (non-)automatically-extensible entities;
    ``use_stemming`` matches against the stemmed token stream (the
    gazetteer carries stemmed value variants, engine.fit)."""
    scheme = TaggingScheme(args.get("tagging_scheme_code",
                                    int(TaggingScheme.BILOU)))
    filt = args.get("entity_filter") or {}
    ext_map = fs.entity_scopes.get("extensible", {})
    n = len(ctx["values"])
    if args.get("use_stemming"):
        if "stemmed" not in ctx:
            ctx["stemmed"] = _stemmed_token_stream(fs, ctx)
        match_text, match_tokens = ctx["stemmed"]
    else:
        match_text, match_tokens = ctx["text"], ctx["tokens"]
    wanted = [
        entity for entity in fs.entity_scopes.get("custom", [])
        if "automatically_extensible" not in filt
        or ext_map.get(entity, False) == filt["automatically_extensible"]]
    # ONE full-scope bundle call shared by both entity_match configs
    # (ext + non-ext) via the ctx cache: scope only filters the memoized
    # per-text scan, so grouping the full scan by kind once and
    # filtering locally is identical to per-config scoped calls
    cache_key = ("_custom_by_kind", bool(args.get("use_stemming")))
    by_kind = ctx.get(cache_key)
    if by_kind is None:
        by_kind = {}
        for m in fs.bundle.parse_custom(match_text,
                                        fs.entity_scopes.get("custom",
                                                             [])):
            by_kind.setdefault(m["entity_kind"], []).append(m)
        ctx[cache_key] = by_kind
    # entities with no mentions would yield an all-None series — a no-op
    # for both the dict path and the id path, so skip them (most entities
    # don't appear in most texts; the loop over their Nones dominated
    # compute_ids in the cold-path profile)
    for entity in wanted:
        mentions = by_kind.get(entity)
        if not mentions:
            continue
        feats = [None] * n
        _tag_mentions(mentions, match_tokens, feats, scheme)
        yield f"entity_match_{entity}", feats


@register_feature_factory("builtin_entity_match")
def _builtin_entity_match_factory(args, fs, ctx):
    """ref: feature_factory.py:512-619"""
    scheme = TaggingScheme(args.get("tagging_scheme_code",
                                    int(TaggingScheme.BIO)))
    n = len(ctx["values"])
    kinds = fs.entity_scopes.get("builtin", [])
    by_kind: dict[str, list] = {}
    for m in fs.bundle.parse_builtin(ctx["text"], kinds, ctx["anchor"]):
        by_kind.setdefault(m["entity_kind"], []).append(m)
    # kinds with no mentions: all-None series, a no-op either path — skip
    for kind in kinds:
        mentions = by_kind.get(kind)
        if not mentions:
            continue
        feats = [None] * n
        _tag_mentions(mentions, ctx["tokens"], feats, scheme)
        yield f"builtin_entity_match_{kind[6:]}", feats


def _offset_name(name: str, offset: int) -> str:
    if offset == 0:
        return name
    return f"{name}[{offset:+d}]"


class FeatureSet:
    """Computes per-token feature dicts for a token sequence, running each
    configured factory and applying its offsets (ref: feature.py:51-61 —
    the feature at position i reads the base series at i+offset)."""

    def __init__(self, entity_scopes: dict, entity_bundle,
                 features_config: list[dict] | None = None,
                 resources: dict | None = None) -> None:
        # {"custom": [...], "builtin": [...], "extensible": {name: bool}}
        self.entity_scopes = entity_scopes
        self.bundle = entity_bundle
        self.features_config = features_config or EN_DEFAULT_FEATURES
        self.resources = resources if resources is not None \
            else _cached_resources("en")

    def compute(self, text: str, tokens: list[Token],
                random_state: np.random.RandomState | None = None,
                anchor=None) -> list[dict]:
        """``random_state`` is only passed at train time; it gates the
        per-config feature drop-out (ref: crf_slot_filler.py:205-208)."""
        n = len(tokens)
        ctx = {"text": text, "tokens": tokens,
               "values": [t.value for t in tokens], "anchor": anchor}
        out: list[dict] = [dict() for _ in range(n)]
        for cfg in self.features_config:
            factory = FEATURE_FACTORIES[cfg["factory_name"]]
            drop = cfg.get("drop_out", 0.0)
            offs = tuple(cfg.get("offsets", (0,)))
            for name, series in factory(cfg.get("args", {}), self, ctx):
                if drop and random_state is not None \
                        and random_state.rand() < drop:
                    continue
                # offset names are per-(feature, offset), not per-token —
                # format them once outside the token loop
                off_names = [(off, _offset_name(name, off))
                             for off in offs]
                for i in range(n):
                    value = series[i]
                    if value is None:
                        continue
                    for off, off_name in off_names:
                        j = i - off
                        if 0 <= j < n:
                            out[j][off_name] = value
        return out

    def compute_ids(self, text: str, tokens: list[Token], id_memo: dict,
                    feature_index: dict, anchor=None) -> list[list[int]]:
        """Inference fast path: per-token CRF feature IDs, skipping the
        per-token string-dict of ``compute`` and the downstream
        per-feature f-string/index lookups (builder ROADMAP #1). Same
        feature content as ``compute`` with no drop-out (inference never
        drops). ``id_memo`` is nested {base name: {value: tuple of
        (offset, id) pairs}} — every offset of the owning config
        resolved at once, None ids dropped at memo-build time — and must
        belong to the CRF owning ``feature_index``. The name level is
        probed ONCE per series (outside the token loop) and the value
        level with a plain-string key — no per-probe tuple allocation or
        tuple hashing (measured ~336 probes/text; the tuple-keyed form
        spent 4% of the whole parse in dict.get alone). Offsets whose
        feature string is absent from the model cost nothing on memo
        hits.

        Uniqueness invariant (mirrors ``compute``'s dict semantics):
        factories yield distinct base names within one call, config
        entries yield disjoint name sets (so a base name determines its
        config's offsets), and each (series index, offset) targets one
        token — so a token never receives an id twice and emission
        scores accumulate identically."""
        n = len(tokens)
        ctx = {"text": text, "tokens": tokens,
               "values": [t.value for t in tokens], "anchor": anchor}
        out: list[list[int]] = [[] for _ in range(n)]
        get_index = feature_index.get
        for cfg in self.features_config:
            factory = FEATURE_FACTORIES[cfg["factory_name"]]
            offs = tuple(cfg.get("offsets", (0,)))
            for name, series in factory(cfg.get("args", {}), self, ctx):
                vmemo = id_memo.get(name)
                if vmemo is None:
                    vmemo = id_memo[name] = {}
                get_pairs = vmemo.get
                for i, value in enumerate(series):
                    if value is None:
                        continue
                    pairs = get_pairs(value)
                    if pairs is None:
                        pairs = tuple(
                            (off, fid) for off in offs
                            if (fid := get_index(
                                f"{_offset_name(name, off)}={value}"))
                            is not None)
                        vmemo[value] = pairs
                    for off, fid in pairs:
                        j = i - off
                        if 0 <= j < n:
                            out[j].append(fid)
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

@register_slot_filler("crf_slot_filler")
class CRFSlotFiller:
    """ref: slot_filler/crf_slot_filler.py — one per intent."""

    def __init__(self, tagging_scheme=TaggingScheme.BIO,
                 features_config: list[dict] | None = None,
                 language: str = "en") -> None:
        self.scheme = TaggingScheme(tagging_scheme)
        self.features_config = features_config or EN_DEFAULT_FEATURES
        self.language = language
        self.crf = LinearChainCRF()
        self.slot_name_mapping: dict[str, str] = {}
        self.entity_scopes: dict = {"custom": [], "builtin": [],
                                    "extensible": {}}
        self._feature_set: FeatureSet | None = None

    def _get_feature_set(self, entity_bundle) -> FeatureSet:
        if self._feature_set is None \
                or self._feature_set.bundle is not entity_bundle:
            self._feature_set = FeatureSet(
                self.entity_scopes, entity_bundle, self.features_config,
                _cached_resources(self.language))
        return self._feature_set

    def fit(self, dataset: dict, intent: str, entity_bundle,
            random_state: np.random.RandomState) -> "CRFSlotFiller":
        self.language = dataset.get("language", "en")
        mapping = {}
        for utt in dataset["intents"][intent]["utterances"]:
            for chunk in utt["data"]:
                if chunk.get("slot_name"):
                    mapping[chunk["slot_name"]] = chunk["entity"]
        self.slot_name_mapping = mapping
        customs = sorted({e for e in mapping.values()
                          if not is_builtin_entity(e)})
        self.entity_scopes = {
            "custom": customs,
            "builtin": sorted({e for e in mapping.values()
                               if is_builtin_entity(e)}),
            "extensible": {
                e: bool(dataset["entities"][e]["automatically_extensible"])
                for e in customs},
        }
        feature_set = self._get_feature_set(entity_bundle)

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
                text, list(sample["tokens"]), random_state=random_state)
            sequences.append(feats)
            tag_sequences.append(sample["tags"])
        self.crf.fit(sequences, tag_sequences)
        return self

    def get_slots(self, text: str, entity_bundle, anchor=None) -> list[dict]:
        tokens = list(tokenize(text))
        if not tokens:
            return []
        feature_set = self._get_feature_set(entity_bundle)
        feats = feature_set.compute(text, tokens, anchor=anchor)
        tags = self.crf.predict_single(feats)
        return self._tags_to_slot_dicts(text, tokens, tags)

    def get_slots_batch(self, texts: list[str], entity_bundle,
                        anchors=None) -> list[list[dict]]:
        """Row i identical to ``get_slots(texts[i])``; the Viterbi decode
        runs batched (crf.predict_batch)."""
        anchors = anchors or [None] * len(texts)
        feature_set = self._get_feature_set(entity_bundle)
        tokens_list = [list(tokenize(t)) for t in texts]
        id_memo = self.crf._id_memo
        # nested {name: {value: pairs}}; bound the TOTAL entry count
        # (name count is small and fixed, values grow with corpus)
        if sum(map(len, id_memo.values())) > 300_000:
            id_memo.clear()
        index = self.crf.feature_index
        seqs = [
            feature_set.compute_ids(text, toks, id_memo, index, anchor=a)
            if toks else []
            for text, toks, a in zip(texts, tokens_list, anchors)]
        tags_list = self.crf.predict_batch_ids(seqs)
        return [
            self._tags_to_slot_dicts(text, toks, tags) if toks else []
            for text, toks, tags in zip(texts, tokens_list, tags_list)]

    def _tags_to_slot_dicts(self, text, tokens, tags) -> list[dict]:
        slots = tags_to_slots(text, tokens, tags, self.scheme,
                              self.slot_name_mapping)
        return [
            {"range": {"start": s["start"], "end": s["end"]},
             "value": s["value"], "entity": s["entity"],
             "slotName": s["slot_name"]}
            for s in slots
        ]

    def to_dict(self) -> dict:
        return {"unit_name": self.unit_name,
                "tagging_scheme": int(self.scheme),
                "features_config": self.features_config,
                "language": self.language,
                "crf": self.crf.to_dict(),
                "slot_name_mapping": self.slot_name_mapping,
                "entity_scopes": self.entity_scopes}

    @classmethod
    def from_dict(cls, d: dict) -> "CRFSlotFiller":
        sf = cls(tagging_scheme=TaggingScheme(d["tagging_scheme"]),
                 features_config=d.get("features_config"),
                 language=d.get("language", "en"))
        sf.slot_name_mapping = dict(d["slot_name_mapping"])
        sf.crf = LinearChainCRF.from_dict(d["crf"])
        sf.entity_scopes = d["entity_scopes"]
        return sf


@register_slot_filler("keyword_slot_filler")
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

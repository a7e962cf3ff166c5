"""NLU engine: parser cascade + slot resolution.

Semantics per /root/reference/snips_nlu/nlu_engine/nlu_engine.py:
fit :96-129 (parsers fit in config order), parse :135-198 (first non-empty
parser result wins; None probability remembered), get_intents :200-227
(per-intent max-proba merge), slot resolution :398-450 (range-exact mention
join, full-length re-parse fallback, extensibility drop rule).

The fitted engine serializes to one JSON-able dict (``to_dict``) — the
model bundle that Spark broadcasts to executors; the batch kernel rebuilds
the engine once per executor via ``from_dict`` and calls ``parse`` per row.
The en default parser order is lookup → probabilistic
(ref: default_configs/config_en.py:3-145).
"""

from __future__ import annotations

import datetime as _dt
import json
from pathlib import Path

from .dataset import validate_and_format_dataset
from .entities.builtin import (BuiltinEntityParser,
                               is_builtin_entity, is_gazetteer_entity)
from .entities.gazetteer import GazetteerParser
from .parsers.common import get_slot_name_mappings
from .resources import get_resources
from .result import (builtin_slot, custom_slot, empty_result,
                     intent_classification_result, parsing_result)

# en default cascade: lookup → probabilistic
# (ref: default_configs/config_en.py:3-8)
DEFAULT_PARSERS = ("lookup_intent_parser", "probabilistic_intent_parser")


class EntityBundle:
    """Uniform mention-parsing facade handed to the intent parsers."""

    def __init__(self, gazetteer: GazetteerParser,
                 builtin: BuiltinEntityParser) -> None:
        self.gazetteer = gazetteer
        self.builtin = builtin

    def parse_custom(self, text: str, scope) -> list[dict]:
        return self.gazetteer.parse(text, scope=scope)

    def parse_builtin(self, text: str, scope,
                      anchor: _dt.datetime | None) -> list[dict]:
        return self.builtin.parse(text, scope=scope, anchor=anchor)


def _make_parser(unit_name: str):
    """Open registry dispatch (mirrors ProcessingUnit.by_name, ref:
    pipeline/processing_unit.py:28-72) — custom parsers registered with
    ``registry.register_intent_parser`` slot into the cascade without
    editing this module."""
    from .registry import intent_parser_class
    return intent_parser_class(unit_name)()


def _parser_from_dict(d: dict):
    from .registry import intent_parser_class
    return intent_parser_class(d["unit_name"]).from_dict(d)


class NluEngine:
    def __init__(self, parser_units: tuple[str, ...] = DEFAULT_PARSERS,
                 random_seed: int = 42) -> None:
        self.parser_units = tuple(parser_units)
        self.random_seed = random_seed
        self.intent_parsers: list = []
        self.dataset_metadata: dict | None = None
        self._bundle: EntityBundle | None = None

    @property
    def fitted(self) -> bool:
        return self.dataset_metadata is not None

    # ------------------------------------------------------------------ fit
    def fit(self, dataset: dict) -> "NluEngine":
        dataset = validate_and_format_dataset(dataset)
        resources = get_resources(dataset["language"])

        custom_entities = {name: entity
                           for name, entity in dataset["entities"].items()
                           if not is_builtin_entity(name)}
        # WITH_AND_WITHOUT_STEMS: stemmed variants merged in without
        # overriding raw keys, conflicts resolved deterministically by
        # sorting on the resolved value (ref custom_entity_parser.py:
        # 114-131 _stem_entity_utterances/_merge_entity_utterances — the
        # en config stems the CRF entity_match lookups)
        from .textcore import stem as _stem
        stems = resources["stems"]
        entity_utterances: dict[str, dict[str, str]] = {}
        for name, e in custom_entities.items():
            utts = dict(e["utterances"])
            for raw, resolved in sorted(e["utterances"].items(),
                                        key=lambda kv: kv[1]):
                stemmed = _stem(raw, stems)
                if stemmed not in utts:
                    utts[stemmed] = resolved
            entity_utterances[name] = utts
        gazetteer = GazetteerParser.build(
            entity_utterances,
            strictness={name: e.get("matching_strictness", 1.0)
                        for name, e in custom_entities.items()})
        gazetteer_scope = sorted(e for e in dataset["entities"]
                                 if is_gazetteer_entity(e))
        self._bundle = EntityBundle(
            gazetteer, BuiltinEntityParser(
                language=dataset["language"],
                gazetteer_entities=gazetteer_scope))

        self.intent_parsers = []
        for unit in self.parser_units:
            parser = _make_parser(unit)
            parser.fit(dataset, resources, self._bundle,
                       random_seed=self.random_seed)
            self.intent_parsers.append(parser)

        self.dataset_metadata = {
            "language_code": dataset["language"],
            "entities": {
                name: {"automatically_extensible":
                       entity["automatically_extensible"]}
                for name, entity in dataset["entities"].items()
                if not is_builtin_entity(name)},
            "slot_name_mappings": get_slot_name_mappings(dataset),
            "gazetteer_entity_scope": gazetteer_scope,
        }
        return self

    # ---------------------------------------------------------------- parse
    def parse(self, text: str, anchor: _dt.datetime | None = None,
              intents=None, top_n=None):
        """Cascade parse + slot resolution (ref: nlu_engine.py:135-198)."""
        if top_n is not None:
            results = []
            for res in self.get_intents(text, anchor=anchor)[:top_n]:
                intent_name = res["intentName"]
                slots = self.get_slots(text, intent_name, anchor=anchor) \
                    if intent_name else []
                results.append({"intent": res, "slots": slots})
            return results

        # each parser's empty-result probability OVERWRITES the previous
        # one (last parser wins), matching the reference's parse loop
        # (nlu_engine.py:135-198) — so unmatched texts report the
        # probabilistic classifier's None score, not lookup's 1.0
        none_proba = 0.0
        for parser in self.intent_parsers:
            res = parser.parse(text, self._bundle, intents=intents,
                               anchor=anchor)
            if res["intent"]["intentName"] is not None:
                resolved = self._resolve_slots(text, res["slots"], anchor)
                return parsing_result(text, res["intent"], resolved)
            none_proba = res["intent"]["probability"]
        return empty_result(text, none_proba)

    def parse_batch(self, texts: list[str], anchors=None) -> list[dict]:
        """Unscoped batch parse: row i is identical to
        ``parse(texts[i], anchor=anchors[i])``. Parsers that expose
        ``parse_batch`` (the probabilistic stage: one classifier matmul
        per batch) get the whole miss-set at once; others run per row."""
        anchors = anchors or [None] * len(texts)
        results: list = [None] * len(texts)
        none_proba = [0.0] * len(texts)
        pending = list(range(len(texts)))
        for parser in self.intent_parsers:
            if not pending:
                break
            if hasattr(parser, "parse_batch"):
                sub = parser.parse_batch(
                    [texts[i] for i in pending], self._bundle,
                    [anchors[i] for i in pending])
            else:
                sub = [parser.parse(texts[i], self._bundle,
                                    anchor=anchors[i]) for i in pending]
            still = []
            for i, res in zip(pending, sub):
                if res["intent"]["intentName"] is not None:
                    resolved = self._resolve_slots(texts[i], res["slots"],
                                                   anchors[i])
                    results[i] = parsing_result(texts[i], res["intent"],
                                                resolved)
                else:
                    # last parser wins (mirror of parse())
                    none_proba[i] = res["intent"]["probability"]
                    still.append(i)
            pending = still
        for i in pending:
            results[i] = empty_result(texts[i], none_proba[i])
        return results

    def get_intents(self, text: str, anchor=None) -> list[dict]:
        """Merge per-parser ranked lists by max proba
        (ref: nlu_engine.py:200-227)."""
        best: dict = {}
        for parser in self.intent_parsers:
            for res in parser.get_intents(text, self._bundle, anchor=anchor):
                name = res["intentName"]
                if name not in best or res["probability"] > \
                        best[name]["probability"]:
                    best[name] = res
        return sorted(best.values(), key=lambda r: -r["probability"])

    def get_intents_batch(self, texts: list[str],
                          anchors=None) -> list[list[dict]]:
        """Batch n-best: row i identical to ``get_intents(texts[i])``.
        Parsers exposing ``get_intents_batch`` (the probabilistic stage:
        one classifier matmul) get the whole batch at once."""
        anchors = anchors or [None] * len(texts)
        merged: list[dict] = [{} for _ in texts]
        for parser in self.intent_parsers:
            if hasattr(parser, "get_intents_batch"):
                per_row = parser.get_intents_batch(texts, self._bundle,
                                                   anchors)
            else:
                per_row = [parser.get_intents(t, self._bundle, anchor=a)
                           for t, a in zip(texts, anchors)]
            for best, ranked in zip(merged, per_row):
                for res in ranked:
                    name = res["intentName"]
                    if name not in best or res["probability"] > \
                            best[name]["probability"]:
                        best[name] = res
        return [sorted(b.values(), key=lambda r: -r["probability"])
                for b in merged]

    def get_slots(self, text: str, intent: str | None, anchor=None):
        if intent is None:
            return []
        for parser in self.intent_parsers:
            try:
                slots = parser.get_slots(text, self._bundle, intent,
                                         anchor=anchor)
            except ValueError:
                continue
            if slots:
                return self._resolve_slots(text, slots, anchor)
        return []

    # ---------------------------------------------------------- resolution
    def _resolve_slots(self, text, slots, anchor):
        """ref: nlu_engine.py:398-450"""
        builtin_scope = sorted({s["entity"] for s in slots
                                if is_builtin_entity(s["entity"])})
        custom_scope = sorted({s["entity"] for s in slots
                               if not is_builtin_entity(s["entity"])})
        builtin_mentions = self._bundle.parse_builtin(
            text, builtin_scope, anchor) if builtin_scope else []
        custom_mentions = self._bundle.parse_custom(
            text, custom_scope) if custom_scope else []

        resolved = []
        for slot in slots:
            entity = slot["entity"]
            is_builtin = is_builtin_entity(entity)
            mentions = builtin_mentions if is_builtin else custom_mentions
            builder = builtin_slot if is_builtin else custom_slot
            extensible = (False if is_builtin else
                          self.dataset_metadata["entities"][entity][
                              "automatically_extensible"])

            out = None
            for m in mentions:
                if m["entity_kind"] == entity \
                        and m["start"] == slot["range"]["start"] \
                        and m["end"] == slot["range"]["end"]:
                    out = builder(slot, m["resolved_value"])
                    break
            if out is None:
                # re-parse the raw value alone; customs must cover it fully
                raw = slot["value"]
                if is_builtin:
                    matches = self._bundle.parse_builtin(raw, [entity],
                                                         anchor)
                else:
                    matches = self._bundle.parse_custom(raw, [entity])
                if matches and (is_builtin or
                                len(matches[0]["value"]) == len(raw)):
                    out = builder(slot, matches[0]["resolved_value"])
            if out is None and extensible:
                out = custom_slot(slot)
            if out is not None:
                resolved.append(out)
        return resolved

    # ------------------------------------------------------------- persist
    def to_dict(self) -> dict:
        return {
            "unit_name": "nlu_engine",
            "parser_units": list(self.parser_units),
            "random_seed": self.random_seed,
            "dataset_metadata": self.dataset_metadata,
            "gazetteer": self._bundle.gazetteer.to_dict(),
            "intent_parsers": [p.to_dict() for p in self.intent_parsers],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "NluEngine":
        engine = cls(parser_units=tuple(d["parser_units"]),
                     random_seed=d["random_seed"])
        engine.dataset_metadata = d["dataset_metadata"]
        meta = d.get("dataset_metadata") or {}
        engine._bundle = EntityBundle(
            GazetteerParser.from_dict(d["gazetteer"]),
            BuiltinEntityParser(
                language=meta.get("language_code", "en"),
                gazetteer_entities=meta.get("gazetteer_entity_scope", ())))
        engine.intent_parsers = [_parser_from_dict(p)
                                 for p in d["intent_parsers"]]
        return engine

    def persist(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), sort_keys=True),
                              encoding="utf8")

    @classmethod
    def from_path(cls, path: str | Path) -> "NluEngine":
        return cls.from_dict(json.loads(Path(path).read_text("utf8")))

"""Open processing-unit registry.

Mirrors the reference's ``Registrable`` /
``ProcessingUnit.register('name')`` mechanism
(/root/reference/snips_nlu/pipeline/processing_unit.py:28-72 and
common/registrable.py) so users can plug custom intent parsers into the
cascade without editing the engine — register the class, then list its
unit name in ``NluEngine(parser_units=(...))``.

Contract for a registered intent parser:
  - ``fit(dataset, resources, entity_bundle=None, random_seed=42)``
  - ``parse(text, entity_bundle, intents=None, top_n=None, anchor=None)``
  - ``get_intents(text, entity_bundle, anchor=None)``
  - ``get_slots(text, entity_bundle, intent, anchor=None)``
  - ``to_dict()`` including ``{"unit_name": <registered name>}`` and a
    matching ``from_dict`` classmethod
Optional fast paths: ``parse_batch`` / ``get_intents_batch`` (the engine
uses them when present — see engine.parse_batch/get_intents_batch).
"""

from __future__ import annotations

INTENT_PARSERS: dict[str, type] = {}


def register_intent_parser(name: str):
    """Class decorator: register an intent-parser unit under ``name``."""
    def deco(cls):
        cls.unit_name = name
        INTENT_PARSERS[name] = cls
        return cls
    return deco


def intent_parser_class(name: str) -> type:
    # importing the package registers the built-in units
    from . import parsers  # noqa: F401
    if name not in INTENT_PARSERS:
        raise ValueError(
            f"unknown intent parser unit {name!r}; registered units: "
            f"{sorted(INTENT_PARSERS)} (register custom units with "
            f"snips_nlu_spark.registry.register_intent_parser)")
    return INTENT_PARSERS[name]


SLOT_FILLERS: dict[str, type] = {}


def register_slot_filler(name: str):
    """Class decorator: register a slot-filler unit under ``name``
    (mirrors ``@SlotFiller.register``, ref slot_filler/slot_filler.py)."""
    def deco(cls):
        cls.unit_name = name
        SLOT_FILLERS[name] = cls
        return cls
    return deco


def slot_filler_class(name: str) -> type:
    from . import slot_filler  # noqa: F401  (registers built-ins)
    if name not in SLOT_FILLERS:
        raise ValueError(
            f"unknown slot filler unit {name!r}; registered units: "
            f"{sorted(SLOT_FILLERS)}")
    return SLOT_FILLERS[name]

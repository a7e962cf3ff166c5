"""Probabilistic intent parser: TF-IDF + logreg intent classifier, then the
classified intent's CRF slot filler (ref: /root/reference/snips_nlu/
intent_parser/probabilistic_intent_parser.py:106-153).

Full implementation lands with the ML stack (M3 in SURVEY.md §7); this
module keeps the engine's unit registry importable meanwhile.
"""

from __future__ import annotations


class ProbabilisticIntentParser:
    unit_name = "probabilistic_intent_parser"

    def __init__(self) -> None:
        raise NotImplementedError(
            "probabilistic parser arrives with the numpy ML stack (M3)")

    @classmethod
    def from_dict(cls, d: dict) -> "ProbabilisticIntentParser":
        raise NotImplementedError

"""Parse-result constructors.

Dict shapes follow /root/reference/snips_nlu/result.py exactly:
parsing_result :180-221, intent_classification_result :9-21,
unresolved_slot :24-48, custom_slot :51-86, builtin_slot :89-128,
empty_result :279-301.
"""

from __future__ import annotations


def intent_classification_result(intent_name: str | None,
                                 probability: float) -> dict:
    return {"intentName": intent_name, "probability": probability}


def unresolved_slot(start: int, end: int, value: str, entity: str,
                    slot_name: str) -> dict:
    return {
        "range": {"start": start, "end": end},
        "value": value,
        "entity": entity,
        "slotName": slot_name,
    }


def custom_slot(internal_slot: dict, resolved_value=None) -> dict:
    """ref: result.py:51-86 — resolved_value defaults to the raw value."""
    if resolved_value is None:
        resolved_value = internal_slot["value"]
    if isinstance(resolved_value, dict):
        resolved_value = resolved_value.get("value", internal_slot["value"])
    return {
        "range": dict(internal_slot["range"]),
        "rawValue": internal_slot["value"],
        "value": {"kind": "Custom", "value": resolved_value},
        "entity": internal_slot["entity"],
        "slotName": internal_slot["slotName"],
    }


def builtin_slot(internal_slot: dict, resolved_value: dict) -> dict:
    """ref: result.py:89-128 — value is the typed grammar payload."""
    return {
        "range": dict(internal_slot["range"]),
        "rawValue": internal_slot["value"],
        "value": resolved_value,
        "entity": internal_slot["entity"],
        "slotName": internal_slot["slotName"],
    }


def extraction_result(intent: dict, slots: list[dict]) -> dict:
    return {"intent": intent, "slots": slots}


def parsing_result(input_text: str, intent: dict, slots: list[dict]) -> dict:
    return {"input": input_text, "intent": intent, "slots": slots}


def empty_result(input_text: str, probability: float) -> dict:
    """None-intent result (ref: result.py:279-301)."""
    return parsing_result(
        input_text, intent_classification_result(None, probability), [])

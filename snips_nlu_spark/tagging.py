"""IO/BIO/BILOU sequence-tagging codec.

Encodes training utterances (chunk lists) into per-token tag sequences and
decodes tag sequences back into slots with exact character ranges.
Semantics match /root/reference/snips_nlu/slot_filler/crf_utils.py
(schemes :22-31, encode :187-200, decode :112-153); default scheme is BIO
(ref: pipeline/configs/slot_filler.py:35-38).
"""

from __future__ import annotations

from enum import IntEnum
from typing import Sequence

from .textcore import Token, tokenize

BEGINNING_PREFIX = "B-"
INSIDE_PREFIX = "I-"
LAST_PREFIX = "L-"
UNIT_PREFIX = "U-"
OUTSIDE = "O"


class TaggingScheme(IntEnum):
    IO = 0
    BIO = 1
    BILOU = 2


def tag_to_slot_name(tag: str) -> str:
    return tag[2:]


def _start_of_slot(scheme: TaggingScheme, tags: Sequence[str], i: int) -> bool:
    if tags[i] == OUTSIDE:
        return False
    if i == 0:
        return True
    if scheme == TaggingScheme.IO:
        return tags[i - 1] == OUTSIDE
    if scheme == TaggingScheme.BIO:
        return tags[i].startswith(BEGINNING_PREFIX) or tags[i - 1] == OUTSIDE
    # BILOU
    return (tags[i].startswith(BEGINNING_PREFIX)
            or tags[i].startswith(UNIT_PREFIX)
            or tags[i - 1].startswith(UNIT_PREFIX)
            or tags[i - 1].startswith(LAST_PREFIX)
            or tags[i - 1] == OUTSIDE)


def _end_of_slot(scheme: TaggingScheme, tags: Sequence[str], i: int) -> bool:
    if tags[i] == OUTSIDE:
        return False
    if i + 1 == len(tags):
        return True
    if scheme == TaggingScheme.IO:
        return tags[i + 1] == OUTSIDE
    if scheme == TaggingScheme.BIO:
        return not tags[i + 1].startswith(INSIDE_PREFIX)
    # BILOU
    return (tags[i + 1] == OUTSIDE
            or tags[i].startswith(LAST_PREFIX)
            or tags[i].startswith(UNIT_PREFIX)
            or tags[i + 1].startswith(BEGINNING_PREFIX)
            or tags[i + 1].startswith(UNIT_PREFIX))


def tags_to_preslots(tokens: Sequence[Token], tags: Sequence[str],
                     scheme: TaggingScheme) -> list[dict]:
    """Decode tags → [{"start","end","slot_name"}] with char ranges
    (ref: crf_utils.py:112-141)."""
    slots = []
    slot_start = 0
    for i, tag in enumerate(tags):
        if _start_of_slot(scheme, tags, i):
            slot_start = i
        if _end_of_slot(scheme, tags, i):
            slots.append({
                "start": tokens[slot_start].start,
                "end": tokens[i].end,
                "slot_name": tag_to_slot_name(tag),
            })
            slot_start = i
    return slots


def tags_to_slots(text: str, tokens: Sequence[Token], tags: Sequence[str],
                  scheme: TaggingScheme,
                  slots_to_entities: dict[str, str]) -> list[dict]:
    """Decode to unresolved slots (ref: crf_utils.py:144-153)."""
    return [
        {
            "start": s["start"],
            "end": s["end"],
            "value": text[s["start"]:s["end"]],
            "entity": slots_to_entities[s["slot_name"]],
            "slot_name": s["slot_name"],
        }
        for s in tags_to_preslots(tokens, tags, scheme)
    ]


def positive_tagging(scheme: TaggingScheme, slot_name: str,
                     slot_size: int) -> list[str]:
    """Tags for a slot chunk of slot_size tokens (ref: crf_utils.py:156-180)."""
    if slot_name == OUTSIDE:
        return [OUTSIDE] * slot_size
    if slot_size == 0:
        return []
    if scheme == TaggingScheme.IO:
        return [INSIDE_PREFIX + slot_name] * slot_size
    if scheme == TaggingScheme.BIO:
        return ([BEGINNING_PREFIX + slot_name]
                + [INSIDE_PREFIX + slot_name] * (slot_size - 1))
    if slot_size == 1:
        return [UNIT_PREFIX + slot_name]
    return ([BEGINNING_PREFIX + slot_name]
            + [INSIDE_PREFIX + slot_name] * (slot_size - 2)
            + [LAST_PREFIX + slot_name])


def negative_tagging(size: int) -> list[str]:
    return [OUTSIDE] * size


def utterance_to_sample(chunks: list[dict],
                        scheme: TaggingScheme) -> dict:
    """Encode a training utterance (list of {text[,entity,slot_name]} chunks)
    into {"tokens": [Token], "tags": [str]} (ref: crf_utils.py:187-200)."""
    tokens: list[Token] = []
    tags: list[str] = []
    offset = 0
    for chunk in chunks:
        chunk_tokens = tokenize(chunk["text"])
        tokens += [Token(t.value, offset + t.start, offset + t.end)
                   for t in chunk_tokens]
        offset += len(chunk["text"])
        if chunk.get("slot_name"):
            tags += positive_tagging(scheme, chunk["slot_name"],
                                     len(chunk_tokens))
        else:
            tags += negative_tagging(len(chunk_tokens))
    return {"tokens": tokens, "tags": tags}

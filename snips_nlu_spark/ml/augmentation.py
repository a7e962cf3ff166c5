"""Training-data augmentation for the probabilistic units.

Semantics per /root/reference/snips_nlu/data_augmentation.py:99-124
(cycle shuffled utterance templates, substitute entity values round-robin
from shuffled pools, pad to min_utterances) and
intent_classifier/log_reg_classifier_utils.py:63-171 (noise/None-class
utterances of ~utterance length drawn from the noise corpus).
Deterministic via a seeded ``numpy.random.RandomState``
(ref: common/utils.py:49-68).
"""

from __future__ import annotations

from itertools import cycle

import numpy as np

from ..entities.builtin import is_builtin_entity
from ..textcore import tokenize_light

# builtin entity example values used during augmentation (the reference
# pulls these from the Rust parsers' example lists,
# data_augmentation.py:67-82)
BUILTIN_EXAMPLES: dict[str, list[str]] = {
    "snips/number": ["two", "three", "one", "ten", "five", "7", "42"],
    "snips/ordinal": ["first", "second", "3rd", "fourth"],
    "snips/datetime": ["tomorrow", "today", "on monday", "at 8pm",
                       "tomorrow evening", "on friday"],
    "snips/duration": ["ten minutes", "two hours", "three days"],
    "snips/temperature": ["20 degrees", "70 degrees fahrenheit"],
    "snips/percentage": ["20 percent", "50 %"],
    "snips/amountOfMoney": ["$5", "ten euros"],
}


def _intent_entities(dataset: dict, intent_name: str) -> list[str]:
    entities = set()
    for utt in dataset["intents"][intent_name]["utterances"]:
        for chunk in utt["data"]:
            if chunk.get("entity"):
                entities.add(chunk["entity"])
    return sorted(entities)


def augment_utterances(dataset: dict, intent_name: str, min_utterances: int,
                       random_state: np.random.RandomState,
                       add_builtin_entities_examples: bool = True
                       ) -> list[dict]:
    """Returns chunk-list utterances (>= min_utterances) for the intent."""
    utterances = dataset["intents"][intent_name]["utterances"]
    order = random_state.permutation(len(utterances))
    contexts = cycle([utterances[i] for i in order])

    entity_iters = {}
    for entity_name in _intent_entities(dataset, intent_name):
        entity = dataset["entities"][entity_name]
        if is_builtin_entity(entity_name):
            values = list(entity.get("utterances", []))
            if add_builtin_entities_examples:
                values = BUILTIN_EXAMPLES.get(entity_name, []) + \
                    [v for v in random_state.permutation(sorted(values))]
            else:
                values = [v for v in
                          random_state.permutation(sorted(values))]
        else:
            values = [v for v in random_state.permutation(
                sorted(entity["utterances"]))]
        if values:
            entity_iters[entity_name] = cycle(values)

    n_to_generate = max(len(utterances), min_utterances)
    out = []
    for _ in range(n_to_generate):
        template = next(contexts)
        chunks = []
        for chunk in template["data"]:
            text = chunk["text"]
            if chunk.get("entity") and chunk["entity"] in entity_iters:
                text = next(entity_iters[chunk["entity"]])
            new_chunk = {"text": text.strip() + " "}
            if chunk.get("entity"):
                new_chunk["entity"] = chunk["entity"]
                new_chunk["slot_name"] = chunk["slot_name"]
            chunks.append(new_chunk)
        out.append({"data": chunks})
    return out


def utterance_text(utterance: dict) -> str:
    return "".join(c["text"] for c in utterance["data"])


def capitalize(text: str, stop_words: set[str]) -> str:
    """Title-case non-stopword tokens (ref: data_augmentation.py:17-23)."""
    return " ".join(
        t.title() if t.lower() not in stop_words else t.lower()
        for t in tokenize_light(text))


def capitalize_utterances(utterances: list[dict], entities: dict,
                          ratio: float, stop_words: set[str],
                          random_state: np.random.RandomState
                          ) -> list[dict]:
    """Lowercase all chunks, then re-capitalize custom-entity chunks whose
    entity has the ``capitalize`` flag with probability ``ratio``
    (ref: data_augmentation.py:26-45)."""
    out = []
    for utt in utterances:
        chunks = []
        for chunk in utt["data"]:
            new_chunk = dict(chunk)
            new_chunk["text"] = chunk["text"].lower()
            entity = chunk.get("entity")
            if (entity and not is_builtin_entity(entity)
                    and entities.get(entity, {}).get("capitalize")
                    and random_state.rand() <= ratio):
                new_chunk["text"] = capitalize(chunk["text"], stop_words)
            chunks.append(new_chunk)
        out.append({"data": chunks})
    return out


def generate_noise_utterances(augmented_utterances: list[dict],
                              noise: list[str], num_intents: int,
                              noise_factor: float,
                              random_state: np.random.RandomState
                              ) -> list[dict]:
    """None-class texts: cycled noise words joined into utterance-length
    chunks (ref: log_reg_classifier_utils.py:46-90)."""
    if not augmented_utterances or not num_intents:
        return []
    avg_num = len(augmented_utterances) / float(num_intents)
    noise_size = min(int(noise_factor * avg_num), len(noise))
    lengths = [len(tokenize_light(utterance_text(u)))
               for u in augmented_utterances]
    mean_len, std_len = float(np.mean(lengths)), float(np.std(lengths))
    it = cycle(noise)
    out = []
    for _ in range(noise_size):
        n_words = max(1, int(random_state.normal(mean_len, std_len)))
        text = " ".join(next(it) for _ in range(n_words))
        out.append({"data": [{"text": text}]})
    return out


def build_training_data(dataset: dict, resources: dict,
                        min_utterances: int, noise_factor: float,
                        random_state: np.random.RandomState
                        ) -> tuple[list[dict], np.ndarray, list[str | None]]:
    """(utterances, classes, intent_mapping) with the None class last when
    noise was generated (ref: log_reg_classifier_utils.py:114-172)."""
    intents = sorted(dataset["intents"])
    utterances: list[dict] = []
    classes: list[int] = []
    for idx, intent_name in enumerate(intents):
        augmented = augment_utterances(
            dataset, intent_name,
            max(min_utterances,
                len(dataset["intents"][intent_name]["utterances"])),
            random_state)
        utterances += augmented
        classes += [idx] * len(augmented)

    noise_utts = generate_noise_utterances(
        utterances, list(resources["noise"]), len(intents), noise_factor,
        random_state)
    intent_mapping: list[str | None] = list(intents)
    if noise_utts:
        utterances += noise_utts
        classes += [len(intents)] * len(noise_utts)
        intent_mapping.append(None)
    return utterances, np.array(classes), intent_mapping

"""Language resources: stop words, noise corpus, stems.

The reference ships these in per-language resource packages loaded at
/root/reference/snips_nlu/resources.py:50-82. Those packages are not
available here, so this module defines the project's own small, fully
deterministic English resource set — it is the spec for BOTH the local
oracle and the Spark kernels, so fit/inference parity holds by
construction.
"""

from __future__ import annotations

# A compact English stop-word list (function words only; deliberately small
# so that slot values are never stop-word-only).
EN_STOP_WORDS = frozenset("""
a an the this that these those my your his her its our their
i you he she it we they me him us them
am is are was were be been being
do does did doing have has had having
and or but if then else so nor
to of in on at by for with from as into onto about
there here when where which who whom whose what why how
no not only own same than too very can will just should now
""".split())

# Noise vocabulary used to synthesize the None-intent class during
# classifier training (ref: log_reg_classifier_utils.py:63-90 samples from a
# language noise corpus). Deterministic list, cycled — never randomly drawn.
EN_NOISE = """
alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima
mike november oscar papa quebec romeo sierra tango uniform victor whiskey
xray yankee zulu apple banana cherry date elderberry fig grape honeydew
kiwi lemon mango nectarine orange papaya quince raspberry strawberry
tangerine ugli vanilla walnut ximenia yam zucchini anchor bridge castle
dragon engine falcon garden harbor island jungle kettle ladder meadow
needle orchard pebble quarry river saddle temple umbrella valley window
""".split()

# Minimal dictionary stems (en default featurizer has use_stemming=False,
# ref: default_configs/config_en.py:130 — kept for API completeness).
EN_STEMS: dict[str, str] = {
    "cups": "cup", "lights": "light", "flights": "flight",
    "makes": "make", "making": "make", "made": "make",
    "turns": "turn", "turning": "turn", "turned": "turn",
    "books": "book", "booking": "book", "booked": "book",
    "wants": "want", "wanted": "want", "prepares": "prepare",
    "prepared": "prepare", "preparing": "prepare",
}


def get_resources(language: str = "en") -> dict:
    """Resource bundle for a language (only ``en`` is shipped)."""
    if language != "en":
        raise ValueError(f"unsupported language: {language!r}")
    return {
        "language": "en",
        "stop_words": set(EN_STOP_WORDS),
        "noise": list(EN_NOISE),
        "stems": dict(EN_STEMS),
        "gazetteers": {},
        "word_clusters": {},
    }

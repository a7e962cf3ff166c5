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
# Includes generic assistant/tool-chatter vocabulary so that transcript
# filler turns (the dominant None-class input in this pipeline) are learned
# as None by the classifier — the reference ships a large real-word noise
# corpus in its language-resource packages for the same purpose.
EN_NOISE = """
the be to of and a in that have i it for not on with he as you do at
this but his by from they we say her she or an will my one all would
there their what so up out if about who get which go me when can like
time no just him know take people into year your good some could them
see other than then now look only come its over think also back after
use two how our work first well way even new want because any these
give day most us is was are been has had were said did having may
alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima
mike november oscar papa quebec romeo sierra tango uniform victor whiskey
xray yankee zulu apple banana cherry date elderberry fig grape honeydew
kiwi lemon mango nectarine orange papaya quince raspberry strawberry
tangerine ugli vanilla walnut ximenia yam zucchini anchor bridge castle
dragon engine falcon garden harbor island jungle kettle ladder meadow
needle orchard pebble quarry river saddle temple umbrella valley window
sure working found logs processing request operation completed
successfully anything relevant checking system status done generated
querying backend service acknowledged standing unable reach device
retrying configuration saved report results pending update verified
received queue task finished running started stopped failed error
warning notice output input response data record entry field value
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

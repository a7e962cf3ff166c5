"""Training fixtures + generation pools.

Three datasets with the same *feature coverage* as the reference's sample
datasets (/root/reference/sample_datasets/{beverage,lights,flights}
_dataset.json — builtin number, synonym canonicalization, extensible and
non-extensible custom entities, multi-intent, datetime) but authored fresh
for this project. ``combined_dataset`` merges them into the single engine
the KG pipeline ships.

Every pool below is an ordered tuple — generation indexes into them
deterministically (see datagen.py); nothing is ever randomly drawn.
"""

from __future__ import annotations


def beverage_dataset() -> dict:
    return {
        "language": "en",
        "intents": {
            "prepareBeverage": {
                "utterances": [
                    {"data": [
                        {"text": "make me "},
                        {"text": "two", "entity": "snips/number",
                         "slot_name": "number_of_cups"},
                        {"text": " cups of "},
                        {"text": "coffee", "entity": "beverage_type",
                         "slot_name": "beverage_type"},
                    ]},
                    {"data": [
                        {"text": "brew "},
                        {"text": "three", "entity": "snips/number",
                         "slot_name": "number_of_cups"},
                        {"text": " cups of "},
                        {"text": "green tea", "entity": "beverage_type",
                         "slot_name": "beverage_type"},
                        {"text": " please"},
                    ]},
                    {"data": [
                        {"text": "prepare a cup of "},
                        {"text": "espresso", "entity": "beverage_type",
                         "slot_name": "beverage_type"},
                    ]},
                    {"data": [
                        {"text": "i want "},
                        {"text": "one", "entity": "snips/number",
                         "slot_name": "number_of_cups"},
                        {"text": " "},
                        {"text": "hot chocolate", "entity": "beverage_type",
                         "slot_name": "beverage_type"},
                        {"text": " right now"},
                    ]},
                    {"data": [
                        {"text": "can you brew an "},
                        {"text": "espresso", "entity": "beverage_type",
                         "slot_name": "beverage_type"},
                        {"text": " for me"},
                    ]},
                ]
            }
        },
        "entities": {
            "beverage_type": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "espresso",
                     "synonyms": ["expresso", "espressi", "espressos"]},
                    {"value": "coffee", "synonyms": ["cup of joe"]},
                    {"value": "green tea", "synonyms": []},
                    {"value": "hot chocolate", "synonyms": ["cocoa"]},
                    {"value": "latte", "synonyms": ["caffe latte"]},
                ],
            },
            "snips/number": {},
        },
    }


def lights_dataset() -> dict:
    return {
        "language": "en",
        "intents": {
            "setLightColor": {
                "utterances": [
                    {"data": [
                        {"text": "set the light in the "},
                        {"text": "kitchen", "entity": "room",
                         "slot_name": "room"},
                        {"text": " to "},
                        {"text": "blue", "entity": "color",
                         "slot_name": "color"},
                    ]},
                    {"data": [
                        {"text": "change the "},
                        {"text": "bedroom", "entity": "room",
                         "slot_name": "room"},
                        {"text": " light color to "},
                        {"text": "red", "entity": "color",
                         "slot_name": "color"},
                    ]},
                    {"data": [
                        {"text": "make the lights "},
                        {"text": "purple", "entity": "color",
                         "slot_name": "color"},
                    ]},
                    {"data": [
                        {"text": "i would like "},
                        {"text": "green", "entity": "color",
                         "slot_name": "color"},
                        {"text": " lights in the "},
                        {"text": "living room", "entity": "room",
                         "slot_name": "room"},
                    ]},
                ]
            },
            "turnLightOn": {
                "utterances": [
                    {"data": [{"text": "turn on the lights"}]},
                    {"data": [
                        {"text": "switch on the light in the "},
                        {"text": "bathroom", "entity": "room",
                         "slot_name": "room"},
                    ]},
                    {"data": [
                        {"text": "lights on in the "},
                        {"text": "garage", "entity": "room",
                         "slot_name": "room"},
                        {"text": " please"},
                    ]},
                    {"data": [{"text": "give me some light"}]},
                ]
            },
            "turnLightOff": {
                "utterances": [
                    {"data": [{"text": "turn off the lights"}]},
                    {"data": [
                        {"text": "switch off the light in the "},
                        {"text": "bedroom", "entity": "room",
                         "slot_name": "room"},
                    ]},
                    {"data": [
                        {"text": "lights out in the "},
                        {"text": "kitchen", "entity": "room",
                         "slot_name": "room"},
                    ]},
                    {"data": [{"text": "kill the lights"}]},
                ]
            },
        },
        "entities": {
            # non-extensible: unresolvable color slots must be DROPPED
            # (exercises nlu_engine.py:398-450 drop rule)
            "color": {
                "use_synonyms": True,
                "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "blue", "synonyms": ["navy"]},
                    {"value": "red", "synonyms": ["crimson"]},
                    {"value": "green", "synonyms": []},
                    {"value": "purple", "synonyms": ["violet"]},
                    {"value": "white", "synonyms": []},
                    {"value": "yellow", "synonyms": []},
                ],
            },
            "room": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "kitchen", "synonyms": []},
                    {"value": "bedroom", "synonyms": ["sleeping room"]},
                    {"value": "living room", "synonyms": ["lounge"]},
                    {"value": "bathroom", "synonyms": []},
                    {"value": "garage", "synonyms": []},
                ],
            },
        },
    }


def flights_dataset() -> dict:
    return {
        "language": "en",
        "intents": {
            "bookFlight": {
                "utterances": [
                    {"data": [
                        {"text": "book me a flight to "},
                        {"text": "paris", "entity": "locality",
                         "slot_name": "destination"},
                        {"text": " "},
                        {"text": "tomorrow", "entity": "snips/datetime",
                         "slot_name": "departure_date"},
                    ]},
                    {"data": [
                        {"text": "i need a plane ticket to "},
                        {"text": "london", "entity": "locality",
                         "slot_name": "destination"},
                    ]},
                    {"data": [
                        {"text": "find a flight from "},
                        {"text": "berlin", "entity": "locality",
                         "slot_name": "origin"},
                        {"text": " to "},
                        {"text": "madrid", "entity": "locality",
                         "slot_name": "destination"},
                    ]},
                    {"data": [
                        {"text": "fly me to "},
                        {"text": "tokyo", "entity": "locality",
                         "slot_name": "destination"},
                        {"text": " "},
                        {"text": "on monday", "entity": "snips/datetime",
                         "slot_name": "departure_date"},
                    ]},
                ]
            },
            "cancelFlight": {
                "utterances": [
                    {"data": [
                        {"text": "cancel my flight to "},
                        {"text": "rome", "entity": "locality",
                         "slot_name": "destination"},
                    ]},
                    {"data": [{"text": "cancel my plane ticket"}]},
                    {"data": [
                        {"text": "drop the booking to "},
                        {"text": "oslo", "entity": "locality",
                         "slot_name": "destination"},
                    ]},
                    {"data": [
                        {"text": "cancel the flight "},
                        {"text": "tomorrow", "entity": "snips/datetime",
                         "slot_name": "departure_date"},
                    ]},
                ]
            },
        },
        "entities": {
            "locality": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "paris", "synonyms": []},
                    {"value": "london", "synonyms": []},
                    {"value": "berlin", "synonyms": []},
                    {"value": "madrid", "synonyms": []},
                    {"value": "tokyo", "synonyms": []},
                    {"value": "rome", "synonyms": []},
                    {"value": "oslo", "synonyms": []},
                    {"value": "new york", "synonyms": ["big apple"]},
                ],
            },
            "snips/datetime": {},
        },
    }


def fr_dataset() -> dict:
    """French fixture (round-2 language expansion): exercises the full
    cascade — lookup keys with fr stop words, fr number grammar (un/une,
    deux, vingt et un), fr datetime (demain, weekday, 8h30), synonym
    canonicalization, extensible and non-extensible entities."""
    return {
        "language": "fr",
        "intents": {
            "preparerBoisson": {
                "utterances": [
                    {"data": [
                        {"text": "fais moi "},
                        {"text": "deux", "entity": "snips/number",
                         "slot_name": "nombre_de_tasses"},
                        {"text": " tasses de "},
                        {"text": "café", "entity": "boisson",
                         "slot_name": "boisson"},
                    ]},
                    {"data": [
                        {"text": "prépare "},
                        {"text": "une", "entity": "snips/number",
                         "slot_name": "nombre_de_tasses"},
                        {"text": " tasse de "},
                        {"text": "thé", "entity": "boisson",
                         "slot_name": "boisson"},
                        {"text": " s il te plaît"},
                    ]},
                    {"data": [
                        {"text": "je veux un "},
                        {"text": "chocolat chaud", "entity": "boisson",
                         "slot_name": "boisson"},
                    ]},
                    {"data": [
                        {"text": "sers moi "},
                        {"text": "trois", "entity": "snips/number",
                         "slot_name": "nombre_de_tasses"},
                        {"text": " "},
                        {"text": "expresso", "entity": "boisson",
                         "slot_name": "boisson"},
                    ]},
                ]
            },
            "reserverVol": {
                "utterances": [
                    {"data": [
                        {"text": "réserve moi un vol pour "},
                        {"text": "paris", "entity": "ville",
                         "slot_name": "destination"},
                        {"text": " "},
                        {"text": "demain", "entity": "snips/datetime",
                         "slot_name": "date_depart"},
                    ]},
                    {"data": [
                        {"text": "je veux un billet pour "},
                        {"text": "lyon", "entity": "ville",
                         "slot_name": "destination"},
                    ]},
                    {"data": [
                        {"text": "trouve un vol pour "},
                        {"text": "marseille", "entity": "ville",
                         "slot_name": "destination"},
                        {"text": " "},
                        {"text": "lundi", "entity": "snips/datetime",
                         "slot_name": "date_depart"},
                    ]},
                ]
            },
        },
        "entities": {
            "boisson": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "café", "synonyms": ["petit noir"]},
                    {"value": "thé", "synonyms": ["thé vert"]},
                    {"value": "expresso", "synonyms": ["espresso"]},
                    {"value": "chocolat chaud", "synonyms": ["cacao"]},
                ],
            },
            "ville": {
                "use_synonyms": True,
                "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "paris", "synonyms": []},
                    {"value": "lyon", "synonyms": []},
                    {"value": "marseille", "synonyms": []},
                    {"value": "nice", "synonyms": []},
                ],
            },
            "snips/number": {},
            "snips/datetime": {},
        },
    }


def es_dataset() -> dict:
    """Spanish fixture (round-2 language expansion #2): lookup keys with
    es stop words, es number grammar (dos, treinta y dos), es datetime
    (mañana, lunes, a las 8:30), synonyms, extensibility."""
    return {
        "language": "es",
        "intents": {
            "prepararBebida": {
                "utterances": [
                    {"data": [
                        {"text": "hazme "},
                        {"text": "dos", "entity": "snips/number",
                         "slot_name": "numero_de_tazas"},
                        {"text": " tazas de "},
                        {"text": "café", "entity": "bebida",
                         "slot_name": "bebida"},
                    ]},
                    {"data": [
                        {"text": "prepara "},
                        {"text": "una", "entity": "snips/number",
                         "slot_name": "numero_de_tazas"},
                        {"text": " taza de "},
                        {"text": "té", "entity": "bebida",
                         "slot_name": "bebida"},
                        {"text": " por favor"},
                    ]},
                    {"data": [
                        {"text": "quiero un "},
                        {"text": "chocolate caliente", "entity": "bebida",
                         "slot_name": "bebida"},
                    ]},
                ]
            },
            "reservarVuelo": {
                "utterances": [
                    {"data": [
                        {"text": "resérvame un vuelo a "},
                        {"text": "madrid", "entity": "ciudad",
                         "slot_name": "destino"},
                        {"text": " "},
                        {"text": "mañana", "entity": "snips/datetime",
                         "slot_name": "fecha_salida"},
                    ]},
                    {"data": [
                        {"text": "quiero un billete a "},
                        {"text": "barcelona", "entity": "ciudad",
                         "slot_name": "destino"},
                    ]},
                    {"data": [
                        {"text": "busca un vuelo a "},
                        {"text": "sevilla", "entity": "ciudad",
                         "slot_name": "destino"},
                        {"text": " el "},
                        {"text": "lunes", "entity": "snips/datetime",
                         "slot_name": "fecha_salida"},
                    ]},
                ]
            },
        },
        "entities": {
            "bebida": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "café", "synonyms": ["cafecito"]},
                    {"value": "té", "synonyms": ["té verde"]},
                    {"value": "chocolate caliente", "synonyms": ["cacao"]},
                ],
            },
            "ciudad": {
                "use_synonyms": True,
                "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "madrid", "synonyms": []},
                    {"value": "barcelona", "synonyms": []},
                    {"value": "sevilla", "synonyms": []},
                    {"value": "valencia", "synonyms": []},
                ],
            },
            "snips/number": {},
            "snips/datetime": {},
        },
    }


def combined_dataset() -> dict:
    """All three fixtures merged — the engine the KG pipeline broadcasts."""
    out = {"language": "en", "intents": {}, "entities": {}}
    for ds in (beverage_dataset(), lights_dataset(), flights_dataset()):
        out["intents"].update(ds["intents"])
        for name, entity in ds["entities"].items():
            out["entities"].setdefault(name, entity)
    return out


# ---------------------------------------------------------------------------
# Generation pools for the synthetic transcript table (datagen.py)
# ---------------------------------------------------------------------------
# Each template: (intent, [chunk, ...]) where a chunk is either a literal
# string or a (slot_name, entity, pool_name) placeholder. Values are drawn
# from VALUE_POOLS by deterministic index. Some pool values are synonyms
# (canonicalization check) and some are unseen (extensible-entity check).

GEN_TEMPLATES: tuple = (
    ("prepareBeverage",
     ("make me ", ("number_of_cups", "snips/number", "numbers"),
      " cups of ", ("beverage_type", "beverage_type", "beverages"))),
    ("prepareBeverage",
     ("prepare a cup of ", ("beverage_type", "beverage_type", "beverages"))),
    ("prepareBeverage",
     ("brew ", ("number_of_cups", "snips/number", "numbers"), " cups of ",
      ("beverage_type", "beverage_type", "beverages"), " please")),
    ("setLightColor",
     ("set the light in the ", ("room", "room", "rooms"), " to ",
      ("color", "color", "colors"))),
    ("setLightColor",
     ("make the lights ", ("color", "color", "colors"))),
    ("turnLightOn", ("turn on the lights",)),
    ("turnLightOn",
     ("switch on the light in the ", ("room", "room", "rooms"),)),
    ("turnLightOff", ("turn off the lights",)),
    ("turnLightOff",
     ("switch off the light in the ", ("room", "room", "rooms"),)),
    ("bookFlight",
     ("book me a flight to ", ("destination", "locality", "cities"), " ",
      ("departure_date", "snips/datetime", "datetimes"))),
    ("bookFlight",
     ("i need a plane ticket to ", ("destination", "locality", "cities"))),
    ("cancelFlight",
     ("cancel my flight to ", ("destination", "locality", "cities"))),
    ("cancelFlight", ("cancel my plane ticket",)),
)

VALUE_POOLS: dict[str, tuple] = {
    "numbers": ("two", "three", "one", "five", "4", "ten"),
    # includes synonyms (expresso→espresso, cocoa→hot chocolate) and an
    # unseen value ("oolong tea") for the extensible path
    "beverages": ("coffee", "espresso", "green tea", "expresso",
                  "hot chocolate", "cocoa", "latte", "oolong tea"),
    "rooms": ("kitchen", "bedroom", "living room", "lounge", "garage",
              "bathroom", "attic"),
    # includes synonym "crimson" and unseen "teal" (color is NOT extensible
    # → "teal" slot must be dropped)
    "colors": ("blue", "red", "green", "purple", "crimson", "white", "teal"),
    "cities": ("paris", "london", "berlin", "madrid", "tokyo", "rome",
               "big apple", "oslo", "lisbon"),
    "datetimes": ("tomorrow", "on monday", "today", "tomorrow evening",
                  "at 8pm", "on friday"),
}

# Non-user turns: assistant/tool filler that must parse to the None intent.
FILLER_TEXTS: tuple = (
    "sure, working on that now",
    "here is what i found in the logs",
    "processing your request",
    "the operation completed successfully",
    "i could not find anything relevant",
    "let me check the system status",
    "done, anything else i can help with",
    "the report has been generated",
    "querying the backend service",
    "acknowledged, standing by",
    "unable to reach the device, retrying",
    "configuration saved",
)

TOOL_NAMES: tuple = ("search", "calendar", "home_api", "flight_api",
                     "coffee_machine")


def de_dataset() -> dict:
    return {
        "language": "de",
        "intents": {
            "getraenkKochen": {
                "utterances": [
                    {"data": [
                        {"text": "mach mir "},
                        {"text": "zwei", "entity": "snips/number",
                         "slot_name": "anzahl_tassen"},
                        {"text": " tassen "},
                        {"text": "kaffee", "entity": "getraenk",
                         "slot_name": "getraenk"},
                    ]},
                    {"data": [
                        {"text": "koche bitte "},
                        {"text": "eine", "entity": "snips/number",
                         "slot_name": "anzahl_tassen"},
                        {"text": " tasse "},
                        {"text": "tee", "entity": "getraenk",
                         "slot_name": "getraenk"},
                    ]},
                    {"data": [
                        {"text": "ich möchte eine "},
                        {"text": "heiße schokolade", "entity": "getraenk",
                         "slot_name": "getraenk"},
                    ]},
                ]
            },
            "flugBuchen": {
                "utterances": [
                    {"data": [
                        {"text": "buche mir einen flug nach "},
                        {"text": "berlin", "entity": "stadt",
                         "slot_name": "ziel"},
                        {"text": " "},
                        {"text": "morgen", "entity": "snips/datetime",
                         "slot_name": "abflugdatum"},
                    ]},
                    {"data": [
                        {"text": "ich brauche ein ticket nach "},
                        {"text": "münchen", "entity": "stadt",
                         "slot_name": "ziel"},
                    ]},
                    {"data": [
                        {"text": "finde einen flug nach "},
                        {"text": "hamburg", "entity": "stadt",
                         "slot_name": "ziel"},
                        {"text": " am "},
                        {"text": "montag", "entity": "snips/datetime",
                         "slot_name": "abflugdatum"},
                    ]},
                ]
            },
        },
        "entities": {
            "getraenk": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "kaffee", "synonyms": []},
                    {"value": "tee", "synonyms": ["grüner tee"]},
                    {"value": "heiße schokolade", "synonyms": ["kakao"]},
                ],
            },
            "stadt": {
                "use_synonyms": True,
                "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "berlin", "synonyms": []},
                    {"value": "münchen", "synonyms": []},
                    {"value": "hamburg", "synonyms": []},
                    {"value": "köln", "synonyms": []},
                ],
            },
            "snips/number": {},
            "snips/datetime": {},
        },
    }


def it_dataset() -> dict:
    return {
        "language": "it",
        "intents": {
            "preparareBevanda": {
                "utterances": [
                    {"data": [
                        {"text": "fammi "},
                        {"text": "due", "entity": "snips/number",
                         "slot_name": "numero_tazze"},
                        {"text": " tazze di "},
                        {"text": "caffè", "entity": "bevanda",
                         "slot_name": "bevanda"},
                    ]},
                    {"data": [
                        {"text": "prepara "},
                        {"text": "una", "entity": "snips/number",
                         "slot_name": "numero_tazze"},
                        {"text": " tazza di "},
                        {"text": "tè", "entity": "bevanda",
                         "slot_name": "bevanda"},
                        {"text": " per favore"},
                    ]},
                    {"data": [
                        {"text": "voglio una "},
                        {"text": "cioccolata calda", "entity": "bevanda",
                         "slot_name": "bevanda"},
                    ]},
                ]
            },
            "prenotareVolo": {
                "utterances": [
                    {"data": [
                        {"text": "prenotami un volo per "},
                        {"text": "roma", "entity": "citta",
                         "slot_name": "destinazione"},
                        {"text": " "},
                        {"text": "domani", "entity": "snips/datetime",
                         "slot_name": "data_partenza"},
                    ]},
                    {"data": [
                        {"text": "voglio un biglietto per "},
                        {"text": "milano", "entity": "citta",
                         "slot_name": "destinazione"},
                    ]},
                    {"data": [
                        {"text": "trova un volo per "},
                        {"text": "napoli", "entity": "citta",
                         "slot_name": "destinazione"},
                        {"text": " "},
                        {"text": "lunedì", "entity": "snips/datetime",
                         "slot_name": "data_partenza"},
                    ]},
                ]
            },
        },
        "entities": {
            "bevanda": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "caffè", "synonyms": ["espresso"]},
                    {"value": "tè", "synonyms": ["tè verde"]},
                    {"value": "cioccolata calda", "synonyms": ["cacao"]},
                ],
            },
            "citta": {
                "use_synonyms": True,
                "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "roma", "synonyms": []},
                    {"value": "milano", "synonyms": []},
                    {"value": "napoli", "synonyms": []},
                    {"value": "torino", "synonyms": []},
                ],
            },
            "snips/number": {},
            "snips/datetime": {},
        },
    }


def pt_dataset() -> dict:
    return {
        "language": "pt",
        "intents": {
            "prepararBebida": {
                "utterances": [
                    {"data": [
                        {"text": "faz "},
                        {"text": "duas", "entity": "snips/number",
                         "slot_name": "numero_xicaras"},
                        {"text": " xícaras de "},
                        {"text": "café", "entity": "bebida",
                         "slot_name": "bebida"},
                    ]},
                    {"data": [
                        {"text": "prepara "},
                        {"text": "uma", "entity": "snips/number",
                         "slot_name": "numero_xicaras"},
                        {"text": " xícara de "},
                        {"text": "chá", "entity": "bebida",
                         "slot_name": "bebida"},
                        {"text": " por favor"},
                    ]},
                    {"data": [
                        {"text": "quero um "},
                        {"text": "chocolate quente", "entity": "bebida",
                         "slot_name": "bebida"},
                    ]},
                ]
            },
            "reservarVoo": {
                "utterances": [
                    {"data": [
                        {"text": "reserva um voo para "},
                        {"text": "lisboa", "entity": "cidade",
                         "slot_name": "destino"},
                        {"text": " "},
                        {"text": "amanhã", "entity": "snips/datetime",
                         "slot_name": "data_partida"},
                    ]},
                    {"data": [
                        {"text": "quero um bilhete para "},
                        {"text": "porto", "entity": "cidade",
                         "slot_name": "destino"},
                    ]},
                    {"data": [
                        {"text": "procura um voo para "},
                        {"text": "recife", "entity": "cidade",
                         "slot_name": "destino"},
                        {"text": " na "},
                        {"text": "segunda", "entity": "snips/datetime",
                         "slot_name": "data_partida"},
                    ]},
                ]
            },
        },
        "entities": {
            "bebida": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "café", "synonyms": ["cafezinho"]},
                    {"value": "chá", "synonyms": ["chá verde"]},
                    {"value": "chocolate quente", "synonyms": ["cacau"]},
                ],
            },
            "cidade": {
                "use_synonyms": True,
                "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "lisboa", "synonyms": []},
                    {"value": "porto", "synonyms": []},
                    {"value": "recife", "synonyms": []},
                    {"value": "coimbra", "synonyms": []},
                ],
            },
            "snips/number": {},
            "snips/datetime": {},
        },
    }


def ja_dataset() -> dict:
    return {
        "language": "ja",
        "intents": {
            "nomimonoJunbi": {
                "utterances": [
                    {"data": [
                        {"text": "飲み物", "entity": "nomimono",
                         "slot_name": "nomimono"},
                        {"text": "を"},
                        {"text": "二", "entity": "snips/number",
                         "slot_name": "kazu"},
                        {"text": "杯作って"},
                    ]},
                    {"data": [
                        {"text": "コーヒー", "entity": "nomimono",
                         "slot_name": "nomimono"},
                        {"text": "をください"},
                    ]},
                    {"data": [
                        {"text": "熱い"},
                        {"text": "紅茶", "entity": "nomimono",
                         "slot_name": "nomimono"},
                        {"text": "をお願いします"},
                    ]},
                ]
            },
            "hikoukiYoyaku": {
                "utterances": [
                    {"data": [
                        {"text": "東京", "entity": "toshi",
                         "slot_name": "ikisaki"},
                        {"text": "行きの飛行機を"},
                        {"text": "明日", "entity": "snips/datetime",
                         "slot_name": "hizuke"},
                        {"text": "予約して"},
                    ]},
                    {"data": [
                        {"text": "大阪", "entity": "toshi",
                         "slot_name": "ikisaki"},
                        {"text": "までの切符がほしい"},
                    ]},
                    {"data": [
                        {"text": "札幌", "entity": "toshi",
                         "slot_name": "ikisaki"},
                        {"text": "への便を探して"},
                    ]},
                ]
            },
        },
        "entities": {
            "nomimono": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "コーヒー", "synonyms": ["珈琲"]},
                    {"value": "紅茶", "synonyms": []},
                    {"value": "お茶", "synonyms": ["緑茶"]},
                ],
            },
            "toshi": {
                "use_synonyms": True,
                "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "東京", "synonyms": []},
                    {"value": "大阪", "synonyms": []},
                    {"value": "札幌", "synonyms": []},
                    {"value": "京都", "synonyms": []},
                ],
            },
            "snips/number": {},
            "snips/datetime": {},
        },
    }


def ko_dataset() -> dict:
    return {
        "language": "ko",
        "intents": {
            "eumnyoJunbi": {
                "utterances": [
                    {"data": [
                        {"text": "커피", "entity": "eumnyo",
                         "slot_name": "eumnyo"},
                        {"text": " "},
                        {"text": "두", "entity": "snips/number",
                         "slot_name": "su"},
                        {"text": " 잔 만들어줘"},
                    ]},
                    {"data": [
                        {"text": "홍차", "entity": "eumnyo",
                         "slot_name": "eumnyo"},
                        {"text": " 한 잔 주세요"},
                    ]},
                    {"data": [
                        {"text": "뜨거운 "},
                        {"text": "녹차", "entity": "eumnyo",
                         "slot_name": "eumnyo"},
                        {"text": "를 부탁해"},
                    ]},
                ]
            },
            "bihaenggiYeyak": {
                "utterances": [
                    {"data": [
                        {"text": "서울", "entity": "dosi",
                         "slot_name": "mokjeokji"},
                        {"text": "로 가는 비행기를 "},
                        {"text": "내일", "entity": "snips/datetime",
                         "slot_name": "naljja"},
                        {"text": " 예약해줘"},
                    ]},
                    {"data": [
                        {"text": "부산", "entity": "dosi",
                         "slot_name": "mokjeokji"},
                        {"text": "까지 가는 표를 원해"},
                    ]},
                    {"data": [
                        {"text": "인천", "entity": "dosi",
                         "slot_name": "mokjeokji"},
                        {"text": "으로 가는 편을 찾아줘"},
                    ]},
                ]
            },
        },
        "entities": {
            "eumnyo": {
                "use_synonyms": True,
                "automatically_extensible": True,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "커피", "synonyms": ["아메리카노"]},
                    {"value": "홍차", "synonyms": []},
                    {"value": "녹차", "synonyms": ["차"]},
                ],
            },
            "dosi": {
                "use_synonyms": True,
                "automatically_extensible": False,
                "matching_strictness": 1.0,
                "data": [
                    {"value": "서울", "synonyms": []},
                    {"value": "부산", "synonyms": []},
                    {"value": "인천", "synonyms": []},
                    {"value": "대구", "synonyms": []},
                ],
            },
            "snips/number": {},
            "snips/datetime": {},
        },
    }


def multilang_datasets() -> dict[str, dict]:
    """One compact dataset per non-en language pack — the multilingual
    gate query (kg_multilang_triples) fits one engine per language from
    these and parses the deterministic multilang_turns() table."""
    return {"fr": fr_dataset(), "es": es_dataset(), "de": de_dataset(),
            "it": it_dataset(), "pt": pt_dataset(), "ja": ja_dataset(),
            "ko": ko_dataset()}


# datetime-grammar breadth utterances for the kg_multilang_triples gate
# (round-3 VERDICT #8: recurrences, relative ranges, and the round-4
# holiday / part-of-day / period-boundary families exercised under the
# driver's hash gate, not only in pytest). Each parses to the language's
# flight intent with a city slot + a datetime slot.
MULTILANG_DATETIME_BREADTH: dict[str, tuple] = {
    "de": ("buche mir einen flug nach berlin jeden montag",
           "buche mir einen flug nach berlin in den nächsten 3 wochen",
           "buche mir einen flug nach berlin an weihnachten",
           "buche mir einen flug nach berlin anfang nächsten monats",
           # round 5: movable feast (Easter computus) + boundary+clock
           "buche mir einen flug nach berlin an karfreitag",
           "buche mir einen flug nach berlin ende nächsten monats "
           "um 17 uhr",
           # round 5b: recurrence + part-of-day
           "buche mir einen flug nach berlin jeden abend",
           # round 5b: nested grain (nth weekday of month)
           "buche mir einen flug nach berlin am ersten montag im juni",
           # round 5d: open "until X" interval
           "buche mir einen flug nach berlin bis morgen um 8:30",
           # round 5d: open lower bound
           "buche mir einen flug nach berlin ab morgen"),
    "es": ("resérvame un vuelo a madrid cada lunes",
           "resérvame un vuelo a madrid en las próximas 3 semanas",
           "resérvame un vuelo a madrid en navidad",
           "resérvame un vuelo a madrid a principios del próximo mes",
           "resérvame un vuelo a madrid esta noche",
           "resérvame un vuelo a madrid en viernes santo",
           "resérvame un vuelo a madrid a finales del próximo mes "
           "a las 8:30",
           "resérvame un vuelo a madrid cada tarde",
           "resérvame un vuelo a madrid el primer lunes de junio",
           "resérvame un vuelo a madrid hasta el viernes",
           "resérvame un vuelo a madrid a partir de mañana"),
    "fr": ("réserve moi un vol pour paris chaque lundi",
           "réserve moi un vol pour paris dans les 3 prochaines semaines",
           "réserve moi un vol pour paris à noël",
           "réserve moi un vol pour paris fin du mois",
           "réserve moi un vol pour paris ce soir",
           "réserve moi un vol pour paris le lundi de pâques",
           "réserve moi un vol pour paris fin du mois à 8h30",
           "réserve moi un vol pour paris chaque matin",
           "réserve moi un vol pour paris le premier lundi de juin",
           "réserve moi un vol pour paris de demain à 8h à 10h",
           "réserve moi un vol pour paris jusqu'à demain 8h30",
           "réserve moi un vol pour paris à partir de demain"),
    "it": ("prenotami un volo per roma ogni lunedì",
           "prenotami un volo per roma nelle prossime 3 settimane",
           "prenotami un volo per roma a natale",
           "prenotami un volo per roma a fine del mese",
           "prenotami un volo per roma stasera",
           "prenotami un volo per roma a pasquetta",
           "prenotami un volo per roma a fine del mese alle 8:30",
           "prenotami un volo per roma ogni sera",
           "prenotami un volo per roma il primo lunedì di giugno",
           "prenotami un volo per roma fino a domani",
           "prenotami un volo per roma da domani"),
    "ja": ("東京行きの飛行機を毎週月曜日予約して",
           "東京行きの飛行機を3週間後予約して",
           "東京行きの飛行機をクリスマス予約して",
           "東京行きの飛行機を月末予約して",
           "東京行きの飛行機を復活祭予約して",
           "東京行きの飛行機を月末8時30分予約して",
           "東京行きの飛行機を毎朝予約して",
           # round 5c: day-anchored clock range
           "東京行きの飛行機を明日8時から10時まで予約して",
           # round 5d: open until-interval (lone postfix まで)
           "東京行きの飛行機を明日の8時半まで予約して",
           # round 5d: open lower bound (lone postfix から)
           "東京行きの飛行機を明日から予約して"),
    "ko": ("서울로 가는 비행기를 매주 월요일 예약해줘",
           "서울로 가는 비행기를 3주 후 예약해줘",
           "서울로 가는 비행기를 크리스마스 예약해줘",
           "서울로 가는 비행기를 월말 예약해줘",
           "서울로 가는 비행기를 부활절 예약해줘",
           "서울로 가는 비행기를 월말 8시 30분 예약해줘",
           "서울로 가는 비행기를 매일 아침 예약해줘",
           "서울로 가는 비행기를 내일 8시부터 10시까지 예약해줘",
           "서울로 가는 비행기를 내일 8시 반까지 예약해줘",
           "서울로 가는 비행기를 내일부터 예약해줘"),
    "pt": ("reserva um voo para lisboa cada segunda",
           "reserva um voo para lisboa nas próximas 3 semanas",
           "reserva um voo para lisboa no natal",
           "reserva um voo para lisboa no fim do mês",
           "reserva um voo para lisboa esta noite",
           "reserva um voo para lisboa na sexta feira santa",
           "reserva um voo para lisboa no fim do mês às 8:30",
           "reserva um voo para lisboa cada manhã",
           "reserva um voo para lisboa na primeira segunda de junho",
           "reserva um voo para lisboa até às 8:30",
           "reserva um voo para lisboa a partir de amanhã"),
}


def _ko_particle_alternation(value: str, following: str) -> str:
    """Adjust the particle opening ``following`` to the allomorph the
    final syllable of ``value`` selects (closed syllable → 은/이/을/과/
    으로, open → 는/가/를/와/로, ㄹ-final patterns open for 로), so
    slot-swapped synthetic Korean stays morphologically well-formed.
    Only a particle followed by a space (or chunk end) is adjusted."""
    code = ord(value[-1]) - 0xAC00
    if not (0 <= code < 11172):
        return following
    final = code % 28
    for closed, open_ in (("으로", "로"), ("이", "가"), ("은", "는"),
                          ("을", "를"), ("과", "와")):
        matched = next((p for p in (closed, open_)
                        if following.startswith(p)), None)
        if matched is None:
            continue
        rest = following[len(matched):]
        if rest and not rest[0].isspace():
            return following
        if closed == "으로":
            want = "로" if final in (0, 8) else "으로"
        else:
            want = open_ if final == 0 else closed
        return want + rest
    return following


def multilang_turns() -> list[dict]:
    """Deterministic multilingual transcript rows
    (lang, conv_id, turn_idx, text, ts) — a pure function of the fixture
    datasets, so the Spark query and the committed oracle see the same
    input without any external data:

    * every training surface form (lookup exact-match path),
    * slot-substituted variants — each custom-entity chunk swapped for
      the NEXT value of its entity (unseen text: placeholder
      substitution + CRF path),
    * three noise texts from the language's resource pack (None path).
    """
    import datetime as _dt

    from .resources import get_resources

    base_ts = _dt.datetime(2024, 5, 2, 9, 0, 0)
    rows: list[dict] = []
    for lang, ds in sorted(multilang_datasets().items()):
        texts: list[str] = []
        for intent in sorted(ds["intents"]):
            for utt in ds["intents"][intent]["utterances"]:
                texts.append("".join(c["text"] for c in utt["data"]))
                swapped = []
                changed = False
                for c in utt["data"]:
                    ent = c.get("entity")
                    values = [d["value"]
                              for d in ds["entities"].get(ent, {})
                              .get("data", [])] if ent else []
                    if ent and values and c["text"] in values:
                        nxt = values[(values.index(c["text"]) + 1)
                                     % len(values)]
                        swapped.append(nxt)
                        changed = changed or nxt != c["text"]
                    else:
                        swapped.append(c["text"])
                if changed:
                    if lang == "ko":
                        # keep slot-swapped Korean well-formed: the
                        # particle opening the chunk after a swapped
                        # value alternates on that value's final
                        # syllable (서울로 → 부산으로, 인천으로 → 대구로)
                        for j in range(1, len(swapped)):
                            prev = utt["data"][j - 1]
                            if (prev.get("entity")
                                    and swapped[j - 1] != prev["text"]):
                                swapped[j] = _ko_particle_alternation(
                                    swapped[j - 1], swapped[j])
                    texts.append("".join(swapped))
        texts.extend(MULTILANG_DATETIME_BREADTH.get(lang, ()))
        noise = get_resources(lang)["noise"]
        texts.extend(" ".join(noise[j:j + 3]) for j in (0, 7, 19))
        for i, text in enumerate(texts):
            rows.append({
                "lang": lang,
                "conv_id": f"{lang}-{i // 5}",
                "turn_idx": i % 5,
                "text": text,
                "ts": base_ts + _dt.timedelta(seconds=137 * i),
            })
    return rows

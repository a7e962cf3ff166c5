"""snips_nlu_spark — a from-scratch, PySpark-native knowledge-graph
construction pipeline with the query/data-processing capabilities of
snipsco/snips-nlu (reference at /root/reference, v0.20.2).

The reference is a single-process, per-utterance NLU library. This package
re-creates *what it computes* — deterministic lookup/regex intent parsing,
TF-IDF + logistic-regression intent classification, CRF slot filling, and
gazetteer/builtin entity resolution — as vectorized, Arrow-batched stages
over a Spark DataFrame of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)``, emitting
``(subj=conv_id:turn_idx, pred=intent|slot_name, obj=canonical_value)``
knowledge-graph triples plus node/edge rollups.

Layout:
  textcore     — tokenizer w/ char spans, normalizer, span overlap dedup,
                 placeholder substitution (pure functions, shared by driver
                 fit and executor UDF kernels)
  tagging      — IO/BIO/BILOU sequence-tagging codec
  dataset/     — training-dataset validation + gazetteer compilation
  entities/    — gazetteer (Aho-Corasick) and builtin (number/datetime/...)
                 entity parsers
  ml/          — numpy TF-IDF, chi², logistic regression, linear-chain CRF
  parsers/     — lookup, deterministic-regex, probabilistic intent parsers
  engine       — the parser cascade + slot resolution (fit/parse/persist)
  spark/       — DataFrame stages: transcript scan, mapInPandas parse
                 kernel, triple/node/edge materialization, lineage/resume
  datagen      — deterministic synthetic transcript generator (bench/test)
"""

__version__ = "0.1.0"

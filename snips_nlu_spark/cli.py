"""Command-line interface: train / parse / metrics.

Mirrors the reference's CLI surface (/root/reference/snips_nlu/cli/
training.py, inference.py, metrics.py) on this engine:

    python -m snips_nlu_spark train dataset.json model.json
    python -m snips_nlu_spark parse model.json "make me two coffees"
    python -m snips_nlu_spark metrics dataset.json --folds 5

YAML datasets (the reference's `generate-dataset` input format) are
accepted anywhere a dataset path is taken.
"""

from __future__ import annotations

import argparse
import datetime as _dt
import json
import sys
from pathlib import Path


def _load_dataset(path: str) -> dict:
    p = Path(path)
    if p.suffix in (".yaml", ".yml"):
        from .dataset.yaml_loader import dataset_from_yaml
        return dataset_from_yaml(p)
    return json.loads(p.read_text("utf8"))


def _cmd_train(args) -> int:
    from .engine import NluEngine
    dataset = _load_dataset(args.dataset)
    engine = NluEngine(random_seed=args.seed).fit(dataset)
    engine.persist(args.output)
    print(f"model -> {args.output}")
    return 0


def _cmd_parse(args) -> int:
    from .engine import NluEngine
    engine = NluEngine.from_path(args.model)
    anchor = None
    if args.anchor:
        anchor = _dt.datetime.fromisoformat(args.anchor)
    if args.text:
        texts = [" ".join(args.text)]
    else:  # REPL over stdin (reference inference.py behavior)
        texts = (line.strip() for line in sys.stdin)
    for text in texts:
        if not text:
            continue
        print(json.dumps(engine.parse(text, anchor=anchor),
                         ensure_ascii=False))
    return 0


def _cmd_generate_dataset(args) -> int:
    """YAML intent/entity docs → JSON dataset (ref: cli/
    generate_dataset.py wrapping dataset/dataset.py)."""
    from .dataset.yaml_loader import dataset_from_yaml
    dataset = dataset_from_yaml(args.yaml, language=args.language)
    print(json.dumps(dataset, indent=2, sort_keys=True,
                     ensure_ascii=False))
    return 0


def _cmd_metrics(args) -> int:
    from .ml.metrics import (compute_cross_val_metrics,
                             compute_train_test_metrics)
    dataset = _load_dataset(args.dataset)
    if args.test_dataset:
        out = compute_train_test_metrics(dataset,
                                         _load_dataset(args.test_dataset))
    else:
        out = compute_cross_val_metrics(dataset, nb_folds=args.folds,
                                        random_seed=args.seed)
    print(json.dumps(out, indent=2, sort_keys=True))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="snips_nlu_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="fit an engine, persist bundle")
    p_train.add_argument("dataset")
    p_train.add_argument("output")
    p_train.add_argument("--seed", type=int, default=42)
    p_train.set_defaults(fn=_cmd_train)

    p_parse = sub.add_parser("parse", help="parse text with a bundle")
    p_parse.add_argument("model")
    p_parse.add_argument("text", nargs="*")
    p_parse.add_argument("--anchor", help="ISO datetime anchor")
    p_parse.set_defaults(fn=_cmd_parse)

    p_gen = sub.add_parser(
        "generate-dataset", help="YAML docs → JSON dataset on stdout")
    p_gen.add_argument("language")
    p_gen.add_argument("yaml")
    p_gen.set_defaults(fn=_cmd_generate_dataset)

    p_metrics = sub.add_parser(
        "metrics", help="cross-val (or train-test) quality metrics")
    p_metrics.add_argument("dataset")
    p_metrics.add_argument("--test-dataset",
                           help="evaluate on this dataset instead of k-fold")
    p_metrics.add_argument("--folds", type=int, default=5)
    p_metrics.add_argument("--seed", type=int, default=42)
    p_metrics.set_defaults(fn=_cmd_metrics)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

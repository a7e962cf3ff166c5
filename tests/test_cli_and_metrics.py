"""CLI (train/parse/metrics) + cross-val metrics module — mirrors the
reference's cli/training.py, cli/inference.py, cli/metrics.py surface."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_cross_val_metrics_on_fixture():
    from snips_nlu_spark.fixtures import lights_dataset
    from snips_nlu_spark.ml.metrics import compute_cross_val_metrics
    out = compute_cross_val_metrics(lights_dataset(), nb_folds=2,
                                    random_seed=7)
    assert set(out) == {"metrics", "average_metrics", "confusion_matrix"}
    assert set(out["metrics"]) == {"setLightColor", "turnLightOn",
                                   "turnLightOff"}
    for m in out["metrics"].values():
        assert 0.0 <= m["intent"]["f1"] <= 1.0
        assert 0.0 <= m["slots"]["f1"] <= 1.0
        assert m["utterances"] > 0
    assert 0.0 <= out["average_metrics"]["intent_accuracy"] <= 1.0
    # deterministic under the same seed
    again = compute_cross_val_metrics(lights_dataset(), nb_folds=2,
                                      random_seed=7)
    assert again == out


def test_train_test_metrics_quality_gate():
    """Self-evaluation on the training data must be near-perfect — this
    is the sanity bound, not a generalization claim."""
    from snips_nlu_spark.fixtures import beverage_dataset
    from snips_nlu_spark.ml.metrics import compute_train_test_metrics
    ds = beverage_dataset()
    out = compute_train_test_metrics(ds, ds)
    assert out["average_metrics"]["intent_accuracy"] == 1.0
    assert out["metrics"]["prepareBeverage"]["slots"]["f1"] == 1.0


def test_cli_train_parse_metrics(tmp_path):
    from snips_nlu_spark.fixtures import beverage_dataset
    ds_path = tmp_path / "ds.json"
    ds_path.write_text(json.dumps(beverage_dataset()), "utf8")
    model_path = tmp_path / "model.json"

    def run(*args):
        return subprocess.run(
            [sys.executable, "-m", "snips_nlu_spark", *args],
            capture_output=True, text=True, cwd=str(REPO), timeout=300)

    p = run("train", str(ds_path), str(model_path))
    assert p.returncode == 0, p.stderr[-1500:]
    assert model_path.exists()

    p = run("parse", str(model_path), "make me two cups of coffee")
    assert p.returncode == 0, p.stderr[-1500:]
    result = json.loads(p.stdout.strip())
    assert result["intent"]["intentName"] == "prepareBeverage"

    p = run("metrics", str(ds_path), "--folds", "2")
    assert p.returncode == 0, p.stderr[-1500:]
    out = json.loads(p.stdout)
    assert "average_metrics" in out


def test_cli_generate_dataset(tmp_path):
    yaml_path = tmp_path / "intents.yaml"
    yaml_path.write_text("""
type: intent
name: sayHello
utterances:
  - hello [name](alice)
  - hi [name](bob) there
---
type: entity
name: name
values:
  - alice
  - bob
""", "utf8")
    p = subprocess.run(
        [sys.executable, "-m", "snips_nlu_spark", "generate-dataset",
         "en", str(yaml_path)],
        capture_output=True, text=True, cwd=str(REPO), timeout=120)
    assert p.returncode == 0, p.stderr[-1500:]
    ds = json.loads(p.stdout)
    assert ds["language"] == "en"
    assert "sayHello" in ds["intents"]
    assert "name" in ds["entities"]

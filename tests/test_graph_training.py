"""Graph-head training: dataset build + both heads fit labeled nodes."""
import json

import numpy as np
import pytest

from lameness_tpu.pipeline.graph_training import (build_graph_dataset,
                                                  train_graph_heads)
from tests.test_graph_runner import _write_stage_results


def _labeled_graph_data(dirs, rng, n=10):
    labels_dir = dirs.training / "labels"
    labels_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        label = i % 2
        # correlate the dinov3 neighbor evidence (node feature 47) with label
        _write_stage_results(dirs, f"gt{i}", rng,
                             cow=f"COW-{i % 3:04d}",
                             lame=0.9 if label else 0.1)
        json.dump({"label": label},
                  open(labels_dir / f"gt{i}_label.json", "w"))


def test_build_graph_dataset(tmp_data_root, rng):
    cfg = tmp_data_root
    _labeled_graph_data(cfg.dirs, rng, 6)
    g = build_graph_dataset(cfg.dirs, max_nodes=16)
    assert g is not None
    assert g["x"].shape == (16, 50)
    assert g["label_mask"].sum() == 6
    assert set(g["labels"][:6]) == {0.0, 1.0}
    assert g["spd"].shape == (16, 16)


def test_build_graph_dataset_insufficient(tmp_data_root, rng):
    assert build_graph_dataset(tmp_data_root.dirs) is None


@pytest.mark.slow
def test_train_graph_heads(tmp_data_root, rng):
    cfg = tmp_data_root
    _labeled_graph_data(cfg.dirs, rng, 10)
    report = train_graph_heads(cfg.dirs, cfg.dirs.models)
    assert report["status"] == "completed", report
    assert report["num_nodes"] == 10
    assert min(report["loss_history"]) < report["loss_history"][0]
    # the label is encoded in node feature 47 (neighbor evidence): learnable
    assert report["train_accuracy"]["gnn"] >= 0.8
    assert report["train_accuracy"]["graphormer"] >= 0.8
    # checkpoints restorable
    from lameness_tpu.pipeline.checkpoint import load_params
    from lameness_tpu.models.graphgps import EnhancedGraphGPS
    assert (cfg.dirs.models / "gnn" / "params").exists() or \
        (cfg.dirs.models / "gnn" / "params.pkl").exists()

"""Stacking meta-model + voting/blending helpers."""
import json
import pickle

import numpy as np
import pytest

from lameness_tpu.fuse import fusion as fu
from lameness_tpu.fuse.stacking import (blending, collect_stacking_dataset,
                                        soft_voting, train_stacking_model)
from lameness_tpu.io import schemas


def test_voting_and_blending():
    assert soft_voting([0.2, 0.4, 0.6]) == pytest.approx(0.4)
    assert soft_voting([0.0, 1.0], [1, 3]) == pytest.approx(0.75)
    # blending ignores at-chance models
    assert blending([0.9, 0.1], [0.9, 0.5]) == pytest.approx(0.9)
    assert blending([0.9, 0.1], [0.5, 0.5]) == pytest.approx(0.5)


def _write_fusion_with_contribs(dirs, vid, probs, label, rng):
    contribs = {k: {"probability": p, "uncertainty": 0.1,
                    "prediction": int(p > 0.5), "weight": 0.1}
                for k, p in probs.items()}
    schemas.write_result(dirs.results_for("fusion") / f"{vid}_fusion.json", {
        "video_id": vid, "cow_id": None,
        "fusion_result": {"pipeline_contributions": contribs},
        "pipeline_predictions": {}, "timestamp": ""})
    labels_dir = dirs.training / "labels"
    labels_dir.mkdir(parents=True, exist_ok=True)
    json.dump({"label": label}, open(labels_dir / f"{vid}_label.json", "w"))


def test_train_stacking_and_fusion_uses_it(tmp_data_root):
    cfg = tmp_data_root
    # local deterministic rng: the shared session fixture makes the noise
    # features order-dependent, and by chance they can rival tcn
    rng = np.random.default_rng(11)
    # tcn probability is perfectly informative; others are noise
    for i in range(12):
        label = i % 2
        probs = {"ml": float(rng.random()),
                 "tcn": 0.85 if label else 0.15,
                 "transformer": float(rng.random()),
                 "gnn": 0.5, "graph_transformer": 0.5}
        _write_fusion_with_contribs(cfg.dirs, f"s{i}", probs, label, rng)
    ds = collect_stacking_dataset(cfg.dirs)
    assert ds is not None and ds["x"].shape == (12, 5)
    report = train_stacking_model(cfg.dirs)
    assert report["status"] == "completed"
    assert report["train_accuracy"] >= 0.9
    # tcn coefficient dominates
    coefs = dict(zip(report["feature_order"], report["coefficients"]))
    assert abs(coefs["tcn"]) == max(abs(c) for c in report["coefficients"])

    # the fusion service picks the pickle up and uses it in automated mode
    svc = fu.FusionService(cfg.dirs)
    assert svc.stacking_model is not None
    preds = {k: {"probability": 0.9 if k == "tcn" else 0.85,
                 "uncertainty": 0.05}
             for k in ("ml", "tcn", "transformer", "gnn",
                       "graph_transformer")}
    out = fu.fuse_predictions(preds, svc.stacking_model)
    assert out["decision_mode"] == "automated"
    assert out["final_probability"] > 0.6       # meta-model trusts tcn


def test_train_stacking_insufficient(tmp_data_root):
    assert train_stacking_model(tmp_data_root.dirs)["status"] == "failed"

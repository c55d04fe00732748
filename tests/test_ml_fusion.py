"""ML features/ensemble/training + fusion gating/aggregation."""
import json

import numpy as np
import pytest

from lameness_tpu.fuse import fusion as fu
from lameness_tpu.io import schemas
from lameness_tpu.ml.ensemble import GBDTEnsemble
from lameness_tpu.ml.features import extract_features
from lameness_tpu.ml.training import TrainingService


# ---------------------------------------------------------------- features --
def test_extract_features_full():
    results = {
        "yolo": {"features": {"avg_confidence": 0.8, "position_stability": 0.9,
                              "avg_box_area": 1000, "detection_rate": 0.7}},
        "sam3": {"features": {"avg_area_ratio": 0.2, "avg_circularity": 0.5,
                              "avg_aspect_ratio": 2.0}},
        "dinov3": {"neighbor_evidence": 0.6, "similar_cases": [1, 2, 3]},
        "tleap": {"locomotion_features": {
            "stride_fl_mean": 10, "stride_fr_mean": 12,
            "head_bob_magnitude": 5.0, "front_leg_asymmetry": 0.1}},
    }
    feats, names = extract_features(results)
    assert len(feats) == 12 and len(names) == 12
    assert feats[0] == 0.8
    assert feats[8] == 3                     # similar_cases count
    assert feats[9] == pytest.approx(11.0)   # mean stride
    assert feats[10] == 5.0                  # head bob magnitude preferred


def test_extract_features_empty_default():
    feats, names = extract_features({})
    assert len(feats) == 10 and np.all(feats == 0.5)
    assert names[0] == "default_0"


# ---------------------------------------------------------------- ensemble --
def _toy_dataset(rng, n=120):
    x = rng.standard_normal((n, 6))
    y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(int)
    return x, y


def test_gbdt_ensemble_train_predict_persist(tmp_path, rng):
    x, y = _toy_dataset(rng)
    ens = GBDTEnsemble(tmp_path / "ml")
    report = ens.fit(x, y, cv_folds=3)
    assert set(report["models"]) == {"catboost", "xgboost", "lightgbm"}
    for m in report["models"].values():
        assert m["cv_accuracy_mean"] > 0.8
    preds = ens.predict(x[0])
    assert "ensemble" in preds
    assert set(preds["ensemble"]["weights"]) == {"catboost", "xgboost",
                                                 "lightgbm"}
    assert 0 <= preds["ensemble"]["probability"] <= 1
    # reload from disk
    ens2 = GBDTEnsemble(tmp_path / "ml")
    assert ens2.has_models
    p2 = ens2.predict(x[0])
    assert p2["ensemble"]["probability"] == pytest.approx(
        preds["ensemble"]["probability"], abs=1e-9)


def test_gbdt_ensemble_no_models_default():
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        ens = GBDTEnsemble(d)
        preds = ens.predict(np.zeros(5))
        assert preds["ensemble"]["probability"] == 0.5


# ---------------------------------------------------------------- training --
def test_training_service_skips_featureless(tmp_data_root, rng):
    cfg = tmp_data_root
    svc = TrainingService(cfg.dirs)
    # labeled video with features
    for i in range(8):
        vid = f"v{i}"
        svc.add_label(vid, i % 2)
        schemas.write_result(
            cfg.dirs.results_for("yolo") / f"{vid}_yolo.json",
            {"features": {"avg_confidence": 0.5 + 0.04 * i * (i % 2 * 2 - 1),
                          "num_detections": 5 + i,
                          "avg_box_area": 100.0 * i}})
    # labeled video with NO features anywhere -> must be skipped, not faked
    svc.add_label("ghost", 1)
    x, y, vids, skipped = svc.get_labeled_data()
    assert "ghost" in skipped
    assert len(vids) == 8
    status = svc.run_training(cv_folds=2)
    assert status["status"] == "completed"
    assert status["num_skipped_no_features"] == 1
    assert svc.get_status()["status"] == "completed"


def test_training_insufficient_data(tmp_data_root):
    svc = TrainingService(tmp_data_root.dirs)
    status = svc.run_training()
    assert status["status"] == "failed"


# ------------------------------------------------------------------ fusion --
def test_gating_rules():
    # strong agreement, confident -> automated
    preds = {k: {"probability": 0.9, "uncertainty": 0.05}
             for k in ("ml", "tcn", "transformer")}
    mode, _ = fu.apply_gating_rules(preds)
    assert mode == "automated"
    # disagreement -> uncertain
    preds2 = {"ml": {"probability": 0.1}, "tcn": {"probability": 0.9},
              "transformer": {"probability": 0.2}}
    mode2, _ = fu.apply_gating_rules(preds2)
    assert mode2 == "uncertain"
    # strong human consensus -> human
    preds3 = {"ml": {"probability": 0.6},
              "human": {"probability": 0.8, "confidence": 0.9,
                        "num_raters": 5}}
    mode3, _ = fu.apply_gating_rules(preds3)
    assert mode3 == "human"
    # nothing -> uncertain
    assert fu.apply_gating_rules({})[0] == "uncertain"


def test_fuse_predictions_weighted_math():
    preds = {
        "ml": {"probability": 0.8, "uncertainty": 0.1},
        "tcn": {"probability": 0.7, "uncertainty": 0.2},
        "human": {"probability": 0.75, "confidence": 0.6, "num_raters": 2},
    }
    out = fu.fuse_predictions(preds)
    assert out["decision_mode"] == "hybrid"
    # verify uncertainty-adjusted weighted average by hand
    w_ml = 0.15 * (1 - 0.1 * 0.5)
    w_tcn = 0.12 * (1 - 0.2 * 0.5)
    w_h = 0.35 * (1 - (1 - 0.6) * 0.5)
    expect = (0.8 * w_ml + 0.7 * w_tcn + 0.75 * w_h) / (w_ml + w_tcn + w_h)
    assert out["final_probability"] == pytest.approx(expect, abs=1e-9)
    assert out["final_prediction"] == 1
    assert set(out["pipeline_contributions"]) == {"ml", "tcn", "human"}
    assert out["unanimous"]


def test_fusion_service_end_to_end(tmp_data_root):
    cfg = tmp_data_root
    vid = "vidA"
    # write predictor results
    schemas.write_result(cfg.dirs.results_for("ml") / f"{vid}_ml.json",
                         {"predictions": {"ensemble": {"probability": 0.85}}})
    schemas.write_result(cfg.dirs.results_for("tcn") / f"{vid}_tcn.json",
                         {"severity_score": 0.8, "uncertainty": 0.05})
    # tracking maps the video to a cow
    schemas.write_result(
        cfg.dirs.results_for("tracking") / f"{vid}_tracking.json",
        {"video_id": vid,
         "reid_results": [{"track_id": 0, "cow_id": "COW-0001"}]})
    from lameness_tpu.io.bus import MessageBus
    from lameness_tpu.core.config import Subjects
    bus = MessageBus()
    done = []
    bus.subscribe_sync("analysis.complete", lambda m: done.append(m))
    cow_updates = []
    bus.subscribe_sync("cow.prediction.updated", lambda m: cow_updates.append(m))
    svc = fu.FusionService(cfg.dirs, bus=bus, subjects=Subjects())
    result = svc.process_video(vid)
    assert result is not None
    assert schemas.validate("fusion", result) == []
    assert result["cow_id"] == "COW-0001"
    assert result["fusion_result"]["final_probability"] > 0.7
    assert result["cow_prediction"]["severity_level"] == "severe"
    assert done and done[0]["video_id"] == vid
    assert cow_updates and cow_updates[0]["cow_id"] == "COW-0001"
    # cow prediction file exists with the reference layout
    cow_file = cfg.dirs.results / "cow_predictions" / "COW-0001_prediction.json"
    data = json.load(open(cow_file))
    assert data["latest_video"] == vid


def test_severity_bands():
    assert fu.severity_level(0.1) == "healthy"
    assert fu.severity_level(0.4) == "mild"
    assert fu.severity_level(0.6) == "moderate"
    assert fu.severity_level(0.9) == "severe"

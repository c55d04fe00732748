"""Head training loop + checkpoint restore round trip."""
import json

import numpy as np
import pytest

import jax

from lameness_tpu.io import schemas
from lameness_tpu.models import sequence_features as seqf
from lameness_tpu.pipeline import checkpoint as ckpt
from lameness_tpu.pipeline.head_training import build_dataset, train_heads


def _make_labeled_video(dirs, vid, label, rng):
    """Write a label + synthetic tleap result where lame cows bob more."""
    from lameness_tpu.models import pose
    labels_dir = dirs.training / "labels"
    labels_dir.mkdir(parents=True, exist_ok=True)
    json.dump({"label": label}, open(labels_dir / f"{vid}_label.json", "w"))
    seqs = []
    # lame cows: whole posture sags + head bob — a broad multivariate shift
    # strong enough for a 12-sample smoke-training run to latch onto
    sag = 100.0 if label else 0.0
    bob = 25.0 if label else 2.0
    for i in range(30):
        x0 = 50 + 6 * i
        bbox = [x0, 100, x0 + 400, 400]
        kps = pose.heuristic_keypoints(bbox)
        for k in kps:
            k["y"] += sag + rng.standard_normal()
            if k["name"] == "nose":
                k["y"] += bob * np.sin(i * 1.1)
        seqs.append({"frame": i * 5, "bbox": bbox, "keypoints": kps,
                     "detection_confidence": 0.9})
    schemas.write_result(dirs.results_for("tleap") / f"{vid}_tleap.json",
                         {"pose_sequences": seqs})


def test_build_dataset(tmp_data_root, rng):
    cfg = tmp_data_root
    for i in range(4):
        _make_labeled_video(cfg.dirs, f"v{i}", i % 2, rng)
    data = build_dataset(cfg.dirs)
    assert data is not None
    assert data["features"].shape == (4, 125, 44)
    assert set(data["labels"]) == {0.0, 1.0}


def test_build_dataset_insufficient(tmp_data_root, rng):
    _make_labeled_video(tmp_data_root.dirs, "only", 1, rng)
    assert build_dataset(tmp_data_root.dirs) is None


@pytest.mark.slow
def test_train_heads_learns_and_checkpoints(tmp_data_root):
    cfg = tmp_data_root
    local_rng = np.random.default_rng(7)   # independent of the shared fixture
    for i in range(12):
        _make_labeled_video(cfg.dirs, f"t{i}", i % 2, local_rng)
    models_dir = cfg.dirs.models
    report = train_heads(cfg.dirs, models_dir, epochs=30, batch_size=6,
                         lr=3e-3)
    assert report["status"] == "completed", report
    assert report["num_samples"] == 12
    # separable synthetic data -> heads should fit it
    assert report["train_accuracy"]["tcn"] >= 0.8
    # best-epoch loss improved (late epochs can spike once saturated,
    # which is why the trainer checkpoints the best epoch)
    assert report["best_loss"] < report["loss_history"][0]

    # engine restore picks the checkpoints up
    from lameness_tpu.pipeline.engine import make_test_engine
    eng = make_test_engine()
    before = np.asarray(jax.tree_util.tree_leaves(eng.params["tcn"])[0]).copy()
    loaded = ckpt.restore_engine(eng, models_dir)
    assert loaded["tcn"] and loaded["gait"]
    after = np.asarray(jax.tree_util.tree_leaves(eng.params["tcn"])[0])
    assert not np.allclose(before, after)
    assert eng.loaded_weights["tcn"]


def test_checkpoint_roundtrip(tmp_path, rng):
    params = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
              "nested": {"b": np.ones(4, np.float32)}}
    ckpt.save_params(tmp_path, "m", params)
    restored = ckpt.load_params(tmp_path, "m", params)
    np.testing.assert_allclose(restored["a"], params["a"])
    np.testing.assert_allclose(restored["nested"]["b"], params["nested"]["b"])
    assert ckpt.load_params(tmp_path, "missing", params) is None

"""Pose trainer: target assignment + loss decreases on synthetic data."""
import numpy as np
import pytest

from lameness_tpu.pipeline.pose_training import (assign_targets,
                                                 train_pose_model)


def _synthetic_pose_data(rng, n=16, img=160, nk=20):
    """White cow-blobs with deterministic keypoint layout."""
    images = np.full((n, img, img, 3), 40, np.uint8)
    boxes = np.zeros((n, 4), np.float32)
    kpts = np.zeros((n, nk, 3), np.float32)
    for i in range(n):
        w = rng.integers(img * 5 // 16, img * 9 // 16)
        h = rng.integers(img * 7 // 32, img * 3 // 8)
        x1 = rng.integers(0, img - w)
        y1 = rng.integers(0, img - h)
        images[i, y1:y1 + h, x1:x1 + w] = 210
        boxes[i] = [x1, y1, x1 + w, y1 + h]
        for k in range(nk):
            kpts[i, k] = [x1 + (k % 5 + 0.5) / 5 * w,
                          y1 + (k // 5 + 0.5) / 4 * h, 1.0]
    return images, boxes, kpts


def test_assign_targets_one_positive_cell(rng):
    images, boxes, kpts = _synthetic_pose_data(rng, n=4)
    t = assign_targets(boxes, kpts, 160)
    total_pos = sum(t[f"obj{li}"].sum() for li in range(3))
    assert total_pos == 4                      # exactly one cell per image
    # target ltrb distances are non-negative
    for li in range(3):
        pos = t[f"obj{li}"] > 0
        assert np.all(t[f"box{li}"][pos] >= -1e-4)


@pytest.mark.slow
def test_pose_training_loss_decreases(rng):
    images, boxes, kpts = _synthetic_pose_data(rng, n=8)
    report = train_pose_model(images, boxes, kpts, epochs=8, batch_size=4,
                              img_size=160, lr=2e-3)
    assert report["status"] == "completed"
    hist = report["loss_history"]
    assert hist[-1] < hist[0] * 0.9, hist
    assert np.isfinite(hist[-1])


@pytest.mark.slow
def test_trained_pose_reaches_inference_end_to_end(tmp_data_root, tmp_path,
                                                   rng):
    """A (synthetically) trained pose model auto-loads via restore_engine
    and flips the tleap result's model_type to 'trained' — the reference's
    cow_pose_roboflow.pt deployment path (tleap:122-197)."""
    import json

    from lameness_tpu.models import pose as pose_mod
    from lameness_tpu.pipeline.checkpoint import restore_engine
    from lameness_tpu.pipeline.engine import make_test_engine
    from lameness_tpu.serve.driver import PipelineDriver
    from lameness_tpu.video.curation import ClipCurator
    from tests.test_video import _square_detector, _synthetic_walk_video

    cfg = tmp_data_root
    images, boxes, kpts = _synthetic_pose_data(rng, n=4, img=64)
    train_pose_model(images, boxes, kpts, models_dir=cfg.dirs.models,
                     epochs=2, batch_size=4, img_size=64)

    engine = make_test_engine()
    assert not engine.loaded_weights["pose"]
    loaded = restore_engine(engine, cfg.dirs.models)
    assert loaded.get("pose") is True and engine.loaded_weights["pose"]

    curator = ClipCurator(cfg.dirs, detector=_square_detector)
    driver = PipelineDriver(config=cfg, engine=engine, curator=curator)
    vp = _synthetic_walk_video(tmp_path / "tp.mp4", n_frames=40, w=160,
                               h=90, fps=5)
    vid = driver.ingest(vp, "posed")
    pre = driver.preprocess(vid)
    driver.run_feature_stages(vid, pre["processed_path"])
    tleap = json.load(open(cfg.dirs.results_for("tleap")
                           / "posed_tleap.json"))
    assert tleap["model_type"] == "trained"
    names = [k["name"] for k in tleap["pose_sequences"][0]["keypoints"]]
    assert names == pose_mod.KEYPOINT_NAMES      # Roboflow names in trained mode


@pytest.mark.slow
def test_pose_training_checkpoints(tmp_path, rng):
    images, boxes, kpts = _synthetic_pose_data(rng, n=4)
    train_pose_model(images, boxes, kpts, models_dir=tmp_path, epochs=2,
                     batch_size=4, img_size=160)
    from lameness_tpu.pipeline.checkpoint import load_params
    from lameness_tpu.models.yolo import YoloV8, init_params
    import jax
    template = init_params(YoloV8(variant="n", num_classes=1,
                                  num_keypoints=20),
                           jax.random.PRNGKey(0), img=160)
    restored = load_params(tmp_path, "pose", template)
    assert restored is not None

"""Pose: heuristic keypoints + locomotion features, host vs device parity."""
import numpy as np
import pytest

import jax.numpy as jnp

from lameness_tpu.models import pose


def test_heuristic_keypoints_positions():
    kps = pose.heuristic_keypoints([100, 200, 500, 500])  # w=400, h=300
    d = {k["name"]: k for k in kps}
    assert len(kps) == 20
    assert d["nose"]["x"] == pytest.approx(100 + 0.10 * 400)
    assert d["nose"]["y"] == pytest.approx(200 + 0.35 * 300)
    assert d["withers"]["x"] == pytest.approx(100 + 0.30 * 400)
    assert d["withers"]["y"] == pytest.approx(200 + 0.15 * 300)
    assert d["left_front_paw"]["y"] == pytest.approx(500 - 0.05 * 300)
    assert d["tailbase"]["x"] == pytest.approx(100 + 0.9 * 400)
    assert d["throat"]["confidence"] == 0.8


def test_heuristic_device_matches_host():
    box = [100.0, 200.0, 500.0, 500.0]
    host = pose.heuristic_keypoints(box)
    dev = np.asarray(pose.heuristic_keypoints_device(jnp.asarray(box)))
    for idx, k in enumerate(host):
        assert dev[idx, 0] == pytest.approx(k["x"], abs=1e-3)
        assert dev[idx, 1] == pytest.approx(k["y"], abs=1e-3)
        assert dev[idx, 2] == pytest.approx(k["confidence"], abs=1e-6)


def _walking_sequence(t=20, stride=12.0, bob=5.0):
    """Synthesize a walking cow: bbox translates right, head bobs."""
    seq = []
    rng = np.random.default_rng(0)
    for i in range(t):
        x0 = 50 + stride * i
        bbox = [x0, 100, x0 + 400, 400]
        kps = pose.heuristic_keypoints(bbox)
        for k in kps:
            if k["name"] == "nose":
                k["y"] += bob * np.sin(i * 1.3)
        seq.append({"frame": i * 5, "bbox": bbox, "keypoints": kps,
                    "detection_confidence": 0.9})
    return seq


def test_locomotion_features_on_walking_sequence():
    f = pose.compute_locomotion_features(_walking_sequence())
    # all feature groups resolve with heuristic (old-name) keypoints
    for k in ("back_arch_mean", "back_arch_score", "head_bob_magnitude",
              "head_bob_frequency", "stride_fl_mean", "stride_fr_mean",
              "stride_rl_mean", "stride_rr_mean", "front_leg_asymmetry",
              "rear_leg_asymmetry", "lameness_score"):
        assert k in f, k
    # constant stride: every leg moves `stride` px/frame, asymmetry ~ 0
    assert f["stride_fl_mean"] == pytest.approx(12.0, abs=1e-3)
    assert f["front_leg_asymmetry"] == pytest.approx(0.0, abs=1e-4)
    # rigid bbox geometry: spine angle constant
    assert f["back_arch_std"] == pytest.approx(0.0, abs=1e-3)
    assert 0.0 <= f["lameness_score"] <= 1.0


def test_locomotion_empty_and_short():
    assert pose.compute_locomotion_features([]) == {}
    assert pose.compute_locomotion_features(_walking_sequence(1)) == {}


def test_locomotion_device_matches_host():
    seq = _walking_sequence(15)
    host = pose.compute_locomotion_features(seq)
    kp_xy = np.array([[[k["x"], k["y"]] for k in f["keypoints"]] for f in seq],
                     np.float32)
    kp_conf = np.array([[k["confidence"] for k in f["keypoints"]] for f in seq],
                       np.float32)
    dev = pose.locomotion_features_device(
        jnp.asarray(kp_xy), jnp.asarray(kp_conf), jnp.ones(15, bool))
    got = pose.features_dict_from_device(dev)
    for k, v in host.items():
        assert k in got, k
        assert got[k] == pytest.approx(v, rel=1e-4, abs=1e-4), k


def test_locomotion_device_respects_frame_mask():
    seq = _walking_sequence(15)
    kp_xy = np.array([[[k["x"], k["y"]] for k in f["keypoints"]] for f in seq],
                     np.float32)
    kp_conf = np.array([[k["confidence"] for k in f["keypoints"]] for f in seq],
                       np.float32)
    valid = np.ones(15, bool)
    valid[10:] = False
    # garbage in the masked tail must not change features
    kp_xy2 = kp_xy.copy()
    kp_xy2[10:] += 1e5
    d1 = pose.locomotion_features_device(jnp.asarray(kp_xy), jnp.asarray(kp_conf),
                                         jnp.asarray(valid))
    d2 = pose.locomotion_features_device(jnp.asarray(kp_xy2), jnp.asarray(kp_conf),
                                         jnp.asarray(valid))
    for k in d1:
        assert np.allclose(np.asarray(d1[k]), np.asarray(d2[k]), atol=1e-4), k


def test_skeleton_contract_shapes():
    assert len(pose.KEYPOINT_NAMES) == 20
    assert len(pose.OLD_NAMES) == 20
    assert len(pose.COW_SKELETON) == 16
    assert set(pose.ROBOFLOW_TO_OLD.keys()) <= set(pose.KEYPOINT_NAMES)
    assert set(pose.ROBOFLOW_TO_OLD.values()) <= set(pose.OLD_NAMES)


def test_roboflow_to_old_device_mapping():
    """Trained-model keypoints (Roboflow order) map into the old-name slots
    that locomotion features index; unmappable slots are conf-masked."""
    import numpy as np
    rng = np.random.default_rng(3)
    kpts = rng.uniform(0, 100, (2, pose.NUM_KEYPOINTS, 3)).astype(np.float32)
    kpts[..., 2] = 0.9
    old = np.asarray(pose.map_roboflow_to_old_device(jnp.asarray(kpts)))
    assert old.shape == kpts.shape
    robo_idx = {n: i for i, n in enumerate(pose.KEYPOINT_NAMES)}
    old_idx = {n: i for i, n in enumerate(pose.H_NAMES)}
    for rb, on in pose.ROBOFLOW_TO_OLD.items():
        np.testing.assert_allclose(old[:, old_idx[on], :2],
                                   kpts[:, robo_idx[rb], :2], err_msg=on)
        assert np.all(old[:, old_idx[on], 2] == 0.9)
    # old names with no Roboflow source are confidence-masked
    mapped_targets = set(pose.ROBOFLOW_TO_OLD.values())
    for on in pose.H_NAMES:
        if on not in mapped_targets:
            assert np.all(old[:, old_idx[on], 2] == 0.0), on

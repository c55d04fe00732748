"""Heuristic-pose wire trim (EngineSpec.pose_pixels=False).

The heuristic keypoint path (models/pose.py::heuristic_keypoints_device,
the reference's tleap:199-265 anatomical fallback) derives keypoints from
the nearest-det bbox alone — pose-frame PIXELS are never read by any
stage when no trained pose model is installed.  pose_pixels=False drops
the pose-only frames (pose_idx minus det∪dino) from the packed/lo wire
arrays; outputs must stay bit-identical because the dropped rows were
unread.  These tests pin:
- spec index bookkeeping (packed/lo subsets, guarded pose positions),
- bit-identical engine outputs vs the full-wire path (shared params via
  with_spec), packed and split,
- install_pose_params / with_spec refusals when pose frames are absent,
- driver decode + schema-valid results on the trimmed wire,
- ingest_spec auto-selection (checkpoint dir / env override),
- bench._pack_ingest's default-packed row subselection.
"""
import dataclasses
import json

import numpy as np
import pytest

from lameness_tpu.pipeline.engine import EngineSpec, make_test_engine


def test_spec_nopose_bookkeeping():
    s = EngineSpec(pose_pixels=False)
    full = EngineSpec()
    assert np.array_equal(
        s.packed_idx, np.unique(np.concatenate([s.det_idx, s.dino_idx])))
    assert np.array_equal(s.lo_idx, s.dino_idx)
    # the trimmed packing is a strict subset of the full one
    assert set(s.packed_idx) < set(full.packed_idx)
    assert s.n_packed < full.n_packed
    # temporal logic (pose_idx itself) is unchanged — only pixels go
    assert np.array_equal(s.pose_idx, full.pose_idx)
    # pixel positions for pose frames are meaningless and guarded
    with pytest.raises(AssertionError):
        s.pose_pos
    with pytest.raises(AssertionError):
        s.pose_pos_lo
    # det/dino positions still index their frames correctly
    assert np.array_equal(s.packed_idx[s.det_pos], s.det_idx)
    assert np.array_equal(s.packed_idx[s.dino_pos], s.dino_idx)
    assert np.array_equal(s.lo_idx[s.dino_pos_lo], s.dino_idx)


@pytest.fixture(scope="module")
def base_engine():
    return make_test_engine()


def test_nopose_outputs_bit_identical_packed(base_engine):
    """Full-clip in, trimmed packing: every output key matches the
    full-wire engine bit-for-bit (same params via with_spec)."""
    import jax
    eng = base_engine
    s = eng.spec
    eng_np = eng.with_spec(dataclasses.replace(s, pose_pixels=False))
    rng0 = np.random.default_rng(7)
    full = rng0.integers(0, 255, (1, s.clip_frames, s.frame_height,
                                  s.frame_width, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(0)
    a = eng.run_staged(jax.device_put(full[:, s.packed_idx]), rng)
    b = eng_np.run_staged(
        jax.device_put(full[:, eng_np.spec.packed_idx]), rng)
    assert set(a) == set(b)
    for key in sorted(a):
        np.testing.assert_array_equal(np.asarray(a[key]),
                                      np.asarray(b[key]), err_msg=key)


def test_nopose_outputs_bit_identical_split(base_engine):
    import jax
    eng_s = base_engine.with_spec(dataclasses.replace(
        base_engine.spec, lo_height=45, lo_width=80))
    eng_np = base_engine.with_spec(dataclasses.replace(
        base_engine.spec, lo_height=45, lo_width=80, pose_pixels=False))
    s = eng_s.spec
    assert len(eng_np.spec.lo_idx) < len(s.lo_idx)
    rng0 = np.random.default_rng(8)
    full = rng0.integers(0, 255, (1, s.clip_frames, s.frame_height,
                                  s.frame_width, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(0)
    a = eng_s.run_staged({k: jax.device_put(v) for k, v in
                          s.split_pack_host(full).items()}, rng)
    b = eng_np.run_staged({k: jax.device_put(v) for k, v in
                           eng_np.spec.split_pack_host(full).items()}, rng)
    assert set(a) == set(b)
    for key in sorted(a):
        np.testing.assert_array_equal(np.asarray(a[key]),
                                      np.asarray(b[key]), err_msg=key)


def test_trained_pose_refused_without_pose_frames():
    # fresh engines: install_pose_params mutates loaded_weights, which
    # with_spec-derived engines share with their base
    from lameness_tpu.models import pose as pose_mod
    from lameness_tpu.models.yolo import YoloV8, init_params
    eng = make_test_engine()
    eng_np = eng.with_spec(dataclasses.replace(
        eng.spec, pose_pixels=False))
    model = YoloV8(variant="n", num_classes=1,
                   num_keypoints=pose_mod.NUM_KEYPOINTS)
    params = init_params(model, img=eng_np.spec.pose_size)
    with pytest.raises(ValueError, match="pose_pixels"):
        eng_np.install_pose_params(params)
    # and the reverse direction: a pose-loaded engine refuses to derive
    # a trimmed-wire sibling
    eng.install_pose_params(params)
    with pytest.raises(ValueError, match="pose_pixels"):
        eng.with_spec(dataclasses.replace(eng.spec, pose_pixels=False))


def test_restore_engine_skips_pose_on_trimmed_wire(base_engine, tmp_path):
    """A pose checkpoint on disk must not crash a pose_pixels=False
    engine — restore reports pose not loaded and says why."""
    from lameness_tpu.pipeline.checkpoint import restore_engine
    eng_np = base_engine.with_spec(dataclasses.replace(
        base_engine.spec, pose_pixels=False))
    (tmp_path / "pose").mkdir()
    loaded = restore_engine(eng_np, tmp_path)
    assert loaded.get("pose") is False
    assert not eng_np.loaded_weights.get("pose")


def test_driver_nopose_results(tmp_data_root, tmp_path):
    """Driver decodes the trimmed frame set and writes the same
    schema-valid result files (keypoints present from the heuristic)."""
    from lameness_tpu.serve.driver import PipelineDriver
    from lameness_tpu.io import schemas
    from tests.test_video import _synthetic_walk_video
    eng = make_test_engine()
    eng.spec.pose_pixels = False
    drv = PipelineDriver(config=tmp_data_root, engine=eng)
    vid = _synthetic_walk_video(tmp_path / "w.mp4", n_frames=40, w=160,
                                h=90, fps=5)
    frames, scale, info = drv._load_engine_frames(vid)
    assert frames.shape[1] == eng.spec.n_packed
    out = drv.run_feature_stages("npx1", vid)
    assert out is not None
    for kind in ("yolo", "sam3", "dinov3", "tleap", "tcn", "transformer"):
        f = drv.dirs.results_for(kind) / f"npx1_{kind}.json"
        assert f.exists(), kind
        assert schemas.validate(kind, json.load(open(f))) == [], kind
    tleap = json.load(open(drv.dirs.results_for("tleap")
                           / "npx1_tleap.json"))
    assert tleap["pose_sequences"], \
        "heuristic keypoints must still be written"


def test_ingest_spec_pose_pixels_auto(monkeypatch, tmp_path):
    from lameness_tpu.__main__ import ingest_spec
    from lameness_tpu.core.config import Config

    cfg = Config.load(data_root=tmp_path)
    monkeypatch.delenv("LAMENESS_POSE_PIXELS", raising=False)
    monkeypatch.delenv("LAMENESS_INGEST", raising=False)
    # no pose checkpoint dir -> trimmed wire
    assert ingest_spec(cfg).pose_pixels is False
    # checkpoint dir present -> pose frames kept
    (cfg.dirs.models / "pose").mkdir(parents=True, exist_ok=True)
    assert ingest_spec(cfg).pose_pixels is True
    # env override wins both ways
    monkeypatch.setenv("LAMENESS_POSE_PIXELS", "0")
    assert ingest_spec(cfg).pose_pixels is False
    monkeypatch.setenv("LAMENESS_POSE_PIXELS", "1")
    monkeypatch.setenv("LAMENESS_INGEST", "1024x576+640x360")
    s = ingest_spec(cfg)
    assert s.pose_pixels is True and s.split
    # no cfg and no env -> conservative default (full wire)
    monkeypatch.delenv("LAMENESS_POSE_PIXELS", raising=False)
    assert ingest_spec().pose_pixels is True


def test_bench_pack_ingest_subselects_default_packing():
    """bench.load_clip_frames caches rows under the FULL default packing;
    _pack_ingest must subselect them for a trimmed spec."""
    import bench
    full_spec = EngineSpec()
    np_spec = EngineSpec(frame_height=576, frame_width=1024,
                         lo_height=360, lo_width=640, pose_pixels=False)
    rng = np.random.default_rng(9)
    default_packed = rng.integers(
        0, 255, (1, full_spec.n_packed, 72, 128, 3), dtype=np.uint8)
    d = bench._pack_ingest(default_packed, 2, np_spec, 1024, 576)
    assert d["hi"].shape == (2, len(np_spec.hi_idx), 576, 1024, 3)
    assert d["lo"].shape == (2, len(np_spec.lo_idx), 360, 640, 3)
    # the selected rows are exactly the trimmed spec's frames
    pos = np.searchsorted(full_spec.packed_idx, np_spec.packed_idx)
    manual = np_spec.split_pack_host(
        np.repeat(default_packed[:, pos], 2, axis=0))
    np.testing.assert_array_equal(d["hi"], manual["hi"])
    np.testing.assert_array_equal(d["lo"], manual["lo"])

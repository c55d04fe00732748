"""Split-resolution ingest: det/SAM frames at hi geometry, dino/pose at
a reduced lo geometry (engine.EngineSpec lo_height/lo_width).

Neither dino (224-crop) nor pose (640-letterbox) reads more pixels than
the lo geometry carries, so the split only shrinks wire bytes; all
boxes/keypoints stay in hi coordinates.  These tests pin:
- spec index/position bookkeeping,
- stage-output equivalence vs the single-array path (det/SAM/heads are
  bit-identical in heuristic-pose mode — they never touch lo pixels),
- the driver decode + result-writing path at native coordinates,
- ingest_spec env parsing of the WxH+WlxHl syntax.
"""
import json

import numpy as np
import pytest

from lameness_tpu.pipeline.engine import EngineSpec, make_test_engine


def test_spec_split_bookkeeping():
    s = EngineSpec(lo_height=360, lo_width=640)
    assert s.split
    assert np.array_equal(s.hi_idx, s.det_idx)
    assert np.array_equal(s.lo_idx,
                          np.unique(np.concatenate([s.dino_idx,
                                                    s.pose_idx])))
    # dino frames (1 FPS over 25 fps) are a subset of pose frames (5 FPS)
    assert set(s.dino_idx).issubset(set(s.pose_idx))
    assert np.array_equal(s.lo_idx[s.dino_pos_lo], s.dino_idx)
    assert np.array_equal(s.lo_idx[s.pose_pos_lo], s.pose_idx)
    assert not EngineSpec().split


def test_split_pack_host_shapes():
    s = EngineSpec(clip_frames=15, fps=5, frame_height=90, frame_width=160,
                   lo_height=45, lo_width=80)
    rng = np.random.default_rng(0)
    full = rng.integers(0, 255, (2, 15, 90, 160, 3), dtype=np.uint8)
    d = s.split_pack_host(full)
    assert d["hi"].shape == (2, len(s.hi_idx), 90, 160, 3)
    assert d["lo"].shape == (2, len(s.lo_idx), 45, 80, 3)
    # hi rows need no resize -> exact copies of the det frames
    assert np.array_equal(d["hi"], full[:, s.det_idx])
    # packed input accepted too
    packed = full[:, s.packed_idx]
    d2 = s.split_pack_host(packed)
    assert np.array_equal(d2["hi"], d["hi"])
    assert np.array_equal(d2["lo"], d["lo"])


@pytest.fixture(scope="module")
def split_engine():
    eng = make_test_engine()
    eng.spec.lo_height = 45
    eng.spec.lo_width = 80
    return eng


def test_split_outputs_match_single(split_engine):
    """det/SAM/heads never read lo pixels in heuristic-pose mode, so the
    split path must reproduce the single-array path bit-for-bit there;
    dino embeddings change only through the host resize."""
    import jax
    eng = split_engine
    s = eng.spec
    rng0 = np.random.default_rng(1)
    full = rng0.integers(0, 255, (1, s.clip_frames, s.frame_height,
                                  s.frame_width, 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(0)
    single = eng.run_staged(jax.device_put(full[:, s.packed_idx]), rng)
    d = s.split_pack_host(full)
    split = eng.run_staged({k: jax.device_put(v) for k, v in d.items()},
                           rng)
    for key in ("det_boxes", "det_scores", "primary_boxes", "masks",
                "keypoints", "pose_boxes", "tcn_probability",
                "gait_probability", "locomotion"):
        np.testing.assert_array_equal(np.asarray(single[key]),
                                      np.asarray(split[key]), err_msg=key)
    emb = np.asarray(split["embeddings"])
    assert emb.shape == np.asarray(single["embeddings"]).shape
    assert np.isfinite(emb).all()


def test_split_to_device_and_process(split_engine):
    """to_device builds the dict (rgb path on CPU) and process_clip_batch
    accepts full clips, host dicts, and device dicts."""
    eng = split_engine
    s = eng.spec
    rng0 = np.random.default_rng(2)
    full = rng0.integers(0, 255, (1, s.clip_frames, s.frame_height,
                                  s.frame_width, 3), dtype=np.uint8)
    fd = eng.to_device(full)
    assert set(fd) == {"hi", "lo"}
    assert fd["lo"].shape == (1, len(s.lo_idx), 45, 80, 3)
    out = eng.process_clip_batch(fd)
    out2 = eng.process_clip_batch(full)
    np.testing.assert_array_equal(out["det_boxes"], out2["det_boxes"])
    # wrong lo geometry is rejected
    bad = {"hi": fd["hi"], "lo": fd["lo"][:, :3]}
    with pytest.raises(ValueError):
        eng.run_staged(bad)


def test_split_yuv_roundtrip(split_engine):
    """yuv420 transfer works per-array (even lo dims required)."""
    eng = split_engine
    s = eng.spec
    old = (s.lo_height, s.lo_width)
    s.lo_height, s.lo_width = 44, 80        # even dims for i420
    try:
        rng0 = np.random.default_rng(3)
        # chroma-smooth frames (2x2 blocks share color): 4:2:0 chroma
        # subsampling is lossless there, isolating the conversion math
        half = rng0.integers(0, 255, (1, s.clip_frames, s.frame_height // 2,
                                      s.frame_width // 2, 3), dtype=np.uint8)
        full = np.kron(half, np.ones((1, 1, 2, 2, 1), np.uint8))
        fd = eng.to_device(full, transfer="yuv420")
        assert fd["lo"].shape == (1, len(s.lo_idx), 44, 80, 3)
        rgb = eng.to_device(full, transfer="rgb")
        # i420 roundtrip stays within quantization error of the rgb path
        diff = np.abs(np.asarray(fd["hi"], np.int16)
                      - np.asarray(rgb["hi"], np.int16))
        assert diff.max() <= 3
    finally:
        s.lo_height, s.lo_width = old


def test_driver_split_decode_and_results(tmp_data_root, tmp_path):
    """Driver decodes straight into the split dict and writes the same
    schema-valid results with native-space coordinates."""
    from lameness_tpu.serve.driver import PipelineDriver
    from lameness_tpu.io import schemas
    from tests.test_video import _synthetic_walk_video
    eng = make_test_engine()
    eng.spec.lo_height = 45
    eng.spec.lo_width = 80
    drv = PipelineDriver(config=tmp_data_root, engine=eng)
    vid = _synthetic_walk_video(tmp_path / "w.mp4", n_frames=40, w=160,
                                h=90, fps=5)
    frames, scale, info = drv._load_engine_frames(vid)
    assert set(frames) == {"hi", "lo"}
    assert frames["hi"].shape[2:] == (90, 160, 3)
    assert frames["lo"].shape[2:] == (45, 80, 3)
    out = drv.run_feature_stages("spl1", vid)
    assert out is not None
    for kind in ("yolo", "sam3", "dinov3", "tleap", "tcn", "transformer"):
        f = drv.dirs.results_for(kind) / f"spl1_{kind}.json"
        assert f.exists(), kind
        assert schemas.validate(kind, json.load(open(f))) == [], kind
    yolo = json.load(open(drv.dirs.results_for("yolo") / "spl1_yolo.json"))
    for entry in yolo["detections"]:
        for det in entry["detections"]:
            x1, y1, x2, y2 = det["bbox"]
            assert 0 <= x1 <= x2 <= info["width"] + 1e-6
            assert 0 <= y1 <= y2 <= info["height"] + 1e-6


def test_ingest_spec_split_syntax(monkeypatch):
    from lameness_tpu.__main__ import ingest_spec
    monkeypatch.setenv("LAMENESS_INGEST", "1024x576+640x360")
    s = ingest_spec()
    assert (s.frame_width, s.frame_height) == (1024, 576)
    assert (s.lo_width, s.lo_height) == (640, 360)
    assert s.split


def test_with_spec_shares_params(split_engine):
    """with_spec derives a second engine over the same params (the bench
    uses this to avoid re-initializing on-chip); outputs match the
    spec-mutated engine bit-for-bit."""
    import dataclasses
    import jax
    eng = split_engine
    spec2 = dataclasses.replace(eng.spec)
    eng2 = eng.with_spec(spec2)
    assert eng2.params is eng.params
    s = eng.spec
    rng0 = np.random.default_rng(4)
    full = rng0.integers(0, 255, (1, s.clip_frames, s.frame_height,
                                  s.frame_width, 3), dtype=np.uint8)
    d = {k: jax.device_put(v)
         for k, v in s.split_pack_host(full).items()}
    rng = jax.random.PRNGKey(0)
    a = eng.run_staged(d, rng)
    b = eng2.run_staged(d, rng)
    np.testing.assert_array_equal(np.asarray(a["det_boxes"]),
                                  np.asarray(b["det_boxes"]))
    np.testing.assert_array_equal(np.asarray(a["tcn_probability"]),
                                  np.asarray(b["tcn_probability"]))
    # mismatched model-input geometry is rejected
    with pytest.raises(AssertionError):
        eng.with_spec(dataclasses.replace(eng.spec, yolo_size=128))

def test_with_spec_inherits_dtype(split_engine):
    """A fresh spec defaults to f32; with_spec must override it with the
    base engine's policy dtype, or bf16-cast params silently promote back
    to f32 compute (the 17:08 bench capture's 0.377 vs 0.284 s/clip)."""
    import dataclasses
    import jax.numpy as jnp
    eng = split_engine
    old = eng.spec.dtype
    try:
        eng.spec.dtype = jnp.bfloat16
        spec2 = dataclasses.replace(eng.spec, dtype=jnp.float32)
        eng2 = eng.with_spec(spec2)
        assert eng2.spec.dtype == jnp.bfloat16
    finally:
        eng.spec.dtype = old

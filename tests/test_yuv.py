"""YUV420 transfer format: conversion parity and engine integration.

The serving path on TPU backends ships I420 planes (1.5 bytes/pixel)
instead of RGB (3) and rebuilds RGB on device (video/yuv.py); these
tests pin the device conversion to cv2's within ±2 LSB and exercise the
engine's yuv420 ingest end-to-end on the small CPU engine.
"""
import numpy as np
import pytest

import jax

from lameness_tpu.video.yuv import (i420_shape, i420_to_rgb_device,
                                    rgb_to_i420)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("h,w", [(90, 160), (720, 1280), (46, 64)])
def test_device_conversion_matches_cv2(rng, h, w):
    import cv2
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    yuv = rgb_to_i420(img)
    assert yuv.shape == i420_shape(h, w)
    ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
    dev = np.asarray(jax.jit(i420_to_rgb_device)(yuv))
    assert np.abs(dev.astype(int) - ref.astype(int)).max() <= 2


def test_odd_half_height_plane_layout(rng):
    # H=90 → H/2=45 chroma rows do NOT align to W-wide buffer rows; the
    # flat-byte-stream reshape must still recover the planes exactly
    import cv2
    img = rng.integers(0, 256, (90, 160, 3), np.uint8)
    yuv = rgb_to_i420(img)
    ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
    dev = np.asarray(jax.jit(i420_to_rgb_device)(yuv))
    assert np.abs(dev.astype(int) - ref.astype(int)).max() <= 2


def test_batched_shapes(rng):
    b = rng.integers(0, 256, (2, 3, 90, 160, 3), np.uint8)
    yuv = rgb_to_i420(b)
    assert yuv.shape == (2, 3, 135, 160)
    out = np.asarray(jax.jit(i420_to_rgb_device)(yuv))
    assert out.shape == b.shape and out.dtype == np.uint8


def test_flat_pack_matches_per_key_path(rng):
    # the single-contiguous-buffer transfer path must produce EXACTLY
    # the per-array conversion's output for dicts and bare arrays
    from lameness_tpu.video.yuv import i420_flat_to_rgb_device, \
        pack_i420_flat
    tree = {"hi": rgb_to_i420(
                rng.integers(0, 256, (2, 3, 90, 160, 3), np.uint8)),
            "lo": rgb_to_i420(
                rng.integers(0, 256, (2, 5, 46, 64, 3), np.uint8))}
    flat, layout = pack_i420_flat(tree)
    assert flat.ndim == 1 and flat.dtype == np.uint8
    assert flat.nbytes == sum(v.nbytes for v in tree.values())
    got = jax.jit(lambda f: i420_flat_to_rgb_device(f, layout))(flat)
    for k, v in tree.items():
        ref = np.asarray(jax.jit(i420_to_rgb_device)(v))
        assert np.array_equal(np.asarray(got[k]), ref), k

    # bare array: sentinel layout returns the array, not a dict
    arr = tree["hi"]
    flat1, layout1 = pack_i420_flat(arr)
    got1 = jax.jit(lambda f: i420_flat_to_rgb_device(f, layout1))(flat1)
    assert not isinstance(got1, dict)
    assert np.array_equal(np.asarray(got1),
                          np.asarray(jax.jit(i420_to_rgb_device)(arr)))


def test_roundtrip_close_to_original(rng):
    # 4:2:0 is lossy on chroma; luma-dominant content must survive
    grad = np.tile(np.linspace(0, 255, 160, dtype=np.uint8)[None, :, None],
                   (90, 1, 3))
    out = np.asarray(jax.jit(i420_to_rgb_device)(rgb_to_i420(grad)))
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 4


class TestEngineIngest:
    @pytest.fixture(scope="class")
    def engine(self):
        from lameness_tpu.pipeline.engine import make_test_engine
        return make_test_engine()

    def test_default_transfer_env(self, engine, monkeypatch):
        monkeypatch.setenv("LAMENESS_YUV_INGEST", "0")
        assert engine.default_transfer() == "rgb"
        monkeypatch.setenv("LAMENESS_YUV_INGEST", "1")
        assert engine.default_transfer() == "yuv420"
        monkeypatch.delenv("LAMENESS_YUV_INGEST")
        # CPU backend → rgb (yuv420 is the TPU default)
        assert engine.default_transfer() == "rgb"

    def test_to_device_yuv_matches_host_conversion(self, engine, rng):
        import cv2
        s = engine.spec
        frames = rng.integers(0, 256, (1, s.n_packed, s.frame_height,
                                       s.frame_width, 3), np.uint8)
        fd = engine.to_device(frames, transfer="yuv420")
        assert fd.shape == frames.shape and fd.dtype == np.uint8
        yuv = rgb_to_i420(frames[0, 0])
        ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420)
        assert np.abs(np.asarray(fd[0, 0]).astype(int)
                      - ref.astype(int)).max() <= 2

    def test_process_clip_batch_yuv_end_to_end(self, engine, rng):
        s = engine.spec
        frames = rng.integers(0, 256, (1, s.clip_frames, s.frame_height,
                                       s.frame_width, 3), np.uint8)
        out_rgb = engine.process_clip_batch(frames, transfer="rgb")
        out_yuv = engine.process_clip_batch(frames, transfer="yuv420")
        assert set(out_yuv) == set(out_rgb)
        lr = jax.tree_util.tree_leaves_with_path(out_rgb)
        ly = dict(jax.tree_util.tree_leaves_with_path(out_yuv))
        for path, leaf in lr:
            y = ly[path]
            assert np.asarray(y).shape == np.asarray(leaf).shape, path
            assert np.all(np.isfinite(np.asarray(y, np.float32))), path
        # ±2 LSB input perturbation must not change the clip-level
        # probability by more than a hair
        assert abs(float(out_yuv["tcn_probability"][0])
                   - float(out_rgb["tcn_probability"][0])) < 0.05

    def test_device_array_passthrough(self, engine, rng):
        s = engine.spec
        frames = rng.integers(0, 256, (1, s.n_packed, s.frame_height,
                                       s.frame_width, 3), np.uint8)
        fd = engine.to_device(frames, transfer="rgb")
        out = engine.process_clip_batch(fd)
        assert "tcn_probability" in out

"""Fused engine: staged vs monolith equivalence, stage outputs, fallbacks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.pipeline.engine import make_test_engine


@pytest.fixture(scope="module")
def engine():
    return make_test_engine()


@pytest.fixture(scope="module")
def frames(engine):
    rng = np.random.default_rng(0)
    s = engine.spec
    f = rng.integers(0, 255, (2, s.clip_frames, s.frame_height,
                              s.frame_width, 3), dtype=np.uint8)
    return f


def test_engine_output_shapes(engine, frames):
    out = engine.process_clip_batch(frames)
    s = engine.spec
    td = len(s.det_idx)
    tp = len(s.pose_idx)
    assert out["det_boxes"].shape == (2, td, s.max_det, 4)
    assert out["primary_boxes"].shape == (2, td, 4)
    assert out["masks"].shape == (2, td, s.sam_mask_size, s.sam_mask_size)
    assert out["embeddings"].shape[0] == 2
    assert out["keypoints"].shape == (2, tp, 20, 3)
    assert out["seq_features"].shape == (2, 125, 44)
    assert out["tcn_probability"].shape == (2,)
    assert out["gait_probability"].shape == (2,)
    assert np.all((out["tcn_probability"] >= 0)
                  & (out["tcn_probability"] <= 1))


@pytest.mark.slow
def test_staged_equals_monolith(engine, frames):
    rng = jax.random.PRNGKey(3)
    staged = engine.process_clip_batch(frames, rng=rng, mode="staged")
    mono = engine.process_clip_batch(frames, rng=rng, mode="monolith")
    for k in ("det_boxes", "primary_boxes", "masks", "embeddings",
              "tcn_probability", "gait_probability"):
        np.testing.assert_allclose(staged[k], mono[k], atol=1e-5, err_msg=k)


def test_staged_equals_paired(engine, frames):
    """The 2-program chain ([detect+dino] -> [sam+heads]) is the same
    computation as the 4-program chain."""
    rng = jax.random.PRNGKey(3)
    staged = engine.process_clip_batch(frames, rng=rng, mode="staged")
    pair = engine.process_clip_batch(frames, rng=rng, mode="pair")
    for k in ("det_boxes", "primary_boxes", "masks", "embeddings",
              "tcn_probability", "gait_probability"):
        np.testing.assert_allclose(staged[k], pair[k], atol=1e-5, err_msg=k)


def test_readback_false_returns_device_tree(engine, frames):
    """readback=False returns on-device arrays (the stream writer thread
    does the host copy off the dispatch path) with identical values."""
    rng = jax.random.PRNGKey(3)
    host = engine.process_clip_batch(frames, rng=rng)
    dev = engine.process_clip_batch(frames, rng=rng, readback=False)
    assert all(isinstance(leaf, jax.Array)
               for leaf in jax.tree_util.tree_leaves(dev))
    for k in ("primary_boxes", "masks", "tcn_probability"):
        np.testing.assert_allclose(host[k], np.asarray(dev[k]), atol=1e-6,
                                   err_msg=k)


def test_pack_output_roundtrip_exact(engine, frames):
    """The flat single-readback path (pack_output + unpack_output) must
    restore every leaf of the output tree bit-exactly — shapes, dtypes
    (bool/int/float/bf16), and nesting (locomotion is a nested dict)."""
    rng = jax.random.PRNGKey(3)
    dev = engine.process_clip_batch(frames, rng=rng, readback=False)
    # add a bf16 leaf: the real engine's bf16 policy produces bf16
    # outputs the roundtrip must survive (no bf16 in the CPU test engine)
    dev = dict(dev, _bf16_probe=jax.numpy.asarray(
        [[1.5, -2.25], [0.0, 3.0e-3]], jax.numpy.bfloat16))
    ref = jax.tree_util.tree_map(np.asarray, dev)
    flat, meta = engine.pack_output(dev)
    assert np.asarray(flat).dtype == np.uint8
    got = engine.unpack_output(np.asarray(flat), meta)
    ref_l = jax.tree_util.tree_leaves_with_path(ref)
    got_l = dict(jax.tree_util.tree_leaves_with_path(got))
    assert len(ref_l) == len(got_l)
    for path, leaf in ref_l:
        g = got_l[path]
        assert g.shape == leaf.shape, path
        assert g.dtype == leaf.dtype, path
        assert np.array_equal(np.asarray(g), np.asarray(leaf)), path


def test_primary_box_fallback(engine, frames):
    """Random-weight YOLO rarely finds 'cows'; every frame must still have a
    primary box (the tleap margin fallback)."""
    out = engine.process_clip_batch(frames)
    pb = out["primary_boxes"]
    s = engine.spec
    assert np.all(pb[..., 2] > pb[..., 0])
    assert np.all(pb[..., 3] > pb[..., 1])
    assert np.all(pb[..., 0] >= 0) and np.all(pb[..., 2] <= s.frame_width)
    # fallback box is the 10%-margin frame box
    fallback = [0.1 * s.frame_width, 0.1 * s.frame_height,
                0.9 * s.frame_width, 0.9 * s.frame_height]
    no_det = ~out["primary_valid"]
    if no_det.any():
        idx = np.argwhere(no_det)[0]
        np.testing.assert_allclose(pb[idx[0], idx[1]], fallback, atol=1e-3)


def test_primary_box_prefers_cow_over_confident_noncow(engine):
    """A lower-confidence cow must beat a larger, higher-confidence non-cow
    (the reference filters on the cow class, tleap:295-304)."""
    cow = engine.config.yolo.cow_class_id
    boxes = jnp.asarray([[[0., 0., 100., 100.],     # big non-cow
                          [10., 10., 40., 40.]]])   # small cow
    scores = jnp.asarray([[0.95, 0.4]])
    classes = jnp.asarray([[cow + 1, cow]], dtype=jnp.int32)
    valid = jnp.ones((1, 2), bool)
    pb, ps, has = jax.jit(engine._primary_boxes, static_argnums=(4, 5))(
        boxes, scores, classes, valid, 90.0, 160.0)
    np.testing.assert_allclose(np.asarray(pb[0]), [10., 10., 40., 40.])
    assert float(ps[0]) == pytest.approx(0.4)
    assert bool(has[0])
    # with no cow at all, the high-conf non-cow stands in
    classes2 = jnp.asarray([[cow + 1, cow + 2]], dtype=jnp.int32)
    pb2, ps2, has2 = jax.jit(engine._primary_boxes, static_argnums=(4, 5))(
        boxes, scores, classes2, valid, 90.0, 160.0)
    np.testing.assert_allclose(np.asarray(pb2[0]), [0., 0., 100., 100.])
    assert bool(has2[0])


def test_sam_fallback_mask_is_box_rectangle(engine, frames):
    out = engine.process_clip_batch(frames)
    s = engine.spec
    masks = out["masks"]
    pb = out["primary_boxes"]
    # mask area fraction ≈ box area fraction (rectangle fallback)
    box_frac = ((pb[..., 2] - pb[..., 0]) * (pb[..., 3] - pb[..., 1])
                / (s.frame_width * s.frame_height))
    np.testing.assert_allclose(out["mask_area_frac"], box_frac, atol=0.06)


def test_locomotion_outputs_present(engine, frames):
    out = engine.process_clip_batch(frames)
    loco = out["locomotion"]
    assert "lameness_score" in loco
    assert loco["lameness_score"].shape == (2,)
    assert "back_arch_mean" in loco and "stride_fl_mean" in loco


def test_mc_dropout_rng_determinism(engine, frames):
    rng = jax.random.PRNGKey(9)
    o1 = engine.process_clip_batch(frames, rng=rng)
    o2 = engine.process_clip_batch(frames, rng=rng)
    np.testing.assert_allclose(o1["tcn_probability"], o2["tcn_probability"])
    o3 = engine.process_clip_batch(frames, rng=jax.random.PRNGKey(10))
    assert not np.allclose(o1["tcn_probability"], o3["tcn_probability"])


def test_warmup_pair_mode(engine):
    t = engine.warmup(batch=1, mode="pair")
    assert set(t) == {"front", "back"}
    assert all(v >= 0 for v in t.values())


def test_unpad_mask_logits_frame_space():
    """Model-path masks come back over the PADDED square canvas (content
    in the top rows for landscape frames); the driver, the rectangle
    fallback, and mask_area_frac all treat the low-res mask as frame
    space.  unpad_mask_logits must slice the content region and rescale —
    previously the pad region was kept and model-path masks were
    vertically squashed in every result JSON."""
    import jax.numpy as jnp
    from lameness_tpu.pipeline.engine import unpad_mask_logits
    s = 64
    mh, mw = 36, 64          # 720p content inside a 1024 canvas at s=64
    canvas = jnp.full((1, s, s), -10.0)
    # a stripe spanning the full content height (frame top to bottom)
    canvas = canvas.at[0, :mh, 20:40].set(10.0)
    out = unpad_mask_logits(canvas, mh, mw, s)
    bits = np.asarray(out[0] > 0)
    # stripe now spans the full frame height, same columns
    assert bits[:, 30].all()
    assert not bits[:, 10].any() and not bits[:, 50].any()
    # identity when content fills the canvas
    same = unpad_mask_logits(canvas, s, s, s)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(canvas))

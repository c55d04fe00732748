"""Mixed precision policy: casting rules + engine still agrees closely."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.pipeline.precision import apply_engine_policy, cast_tree_bf16


def test_cast_tree_keeps_norm_params_f32():
    tree = {"block0": {"attn": {"query": {"kernel": np.ones((4, 4), np.float32)}},
                       "norm1": {"scale": np.ones(4, np.float32)},
                       "bn": {"mean": np.zeros(4, np.float32),
                              "var": np.ones(4, np.float32)}}}
    tree = jax.tree_util.tree_map(jnp.asarray, tree)
    out = cast_tree_bf16(tree)
    assert out["block0"]["attn"]["query"]["kernel"].dtype == jnp.bfloat16
    assert out["block0"]["norm1"]["scale"].dtype == jnp.float32
    assert out["block0"]["bn"]["mean"].dtype == jnp.float32
    assert out["block0"]["bn"]["var"].dtype == jnp.float32


def test_engine_bf16_close_to_f32():
    from lameness_tpu.pipeline.engine import make_test_engine
    rng = np.random.default_rng(0)
    eng = make_test_engine()
    s = eng.spec
    frames = rng.integers(0, 255, (1, s.clip_frames, s.frame_height,
                                   s.frame_width, 3), dtype=np.uint8)
    ref = eng.process_clip_batch(frames)
    summary = apply_engine_policy(eng)
    assert "yolo" in summary and "dino" in summary
    got = eng.process_clip_batch(frames)
    # probabilities from random-weight heads on bf16 encoders stay close
    np.testing.assert_allclose(got["tcn_probability"],
                               ref["tcn_probability"], atol=0.05)
    np.testing.assert_allclose(np.asarray(got["embeddings"], np.float32),
                               np.asarray(ref["embeddings"], np.float32),
                               atol=0.15)
    # boxes from the detector remain structurally valid
    assert np.all(got["primary_boxes"][..., 2] > got["primary_boxes"][..., 0])

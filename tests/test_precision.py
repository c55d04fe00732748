"""Mixed precision policy: casting rules + engine still agrees closely."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.pipeline.precision import apply_engine_policy, cast_tree_bf16


def test_cast_tree_policy_islands():
    """BN folded stats stay f32 (module casts its output back); plain
    transformer LayerNorms are cast to bf16 — flax computes their stat
    reductions in f32 regardless, and f32 scale/bias would promote every
    downstream matmul to f32 (HLO census regression below)."""
    tree = {"block0": {"attn": {"query": {"kernel": np.ones((4, 4), np.float32)}},
                       "norm1": {"scale": np.ones(4, np.float32)},
                       "bn": {"mean": np.zeros(4, np.float32),
                              "var": np.ones(4, np.float32)}},
            "neck_ln1": {"weight": np.ones(4, np.float32)}}
    tree = jax.tree_util.tree_map(jnp.asarray, tree)
    out = cast_tree_bf16(tree)
    assert out["block0"]["attn"]["query"]["kernel"].dtype == jnp.bfloat16
    assert out["block0"]["norm1"]["scale"].dtype == jnp.bfloat16
    assert out["block0"]["bn"]["mean"].dtype == jnp.float32
    assert out["block0"]["bn"]["var"].dtype == jnp.float32
    assert out["neck_ln1"]["weight"].dtype == jnp.float32


def _hlo_census(fn, *args):
    import re
    from collections import Counter
    txt = jax.jit(fn).lower(*args).as_text()
    c = Counter()
    for m in re.finditer(
            r"stablehlo\.(dot_general|convolution)[^\n]*"
            r"-> tensor<[^>]*x(\w+)>", txt):
        c[f"{m.group(1)}:{m.group(2)}"] += 1
    return c


def test_bf16_policy_reaches_the_matmuls():
    """Regression for the silent-f32 promotion bug: with the bf16 policy
    active, the detect stage's convs and DINO's transformer matmuls must
    lower as bf16 ops.  Before the fix, f32 BN/LN params promoted the
    activations and XLA upcast every bf16 kernel back to f32 (the 'bf16'
    engine ran its detect/dino/pose FLOPs in f32)."""
    from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine
    spec = EngineSpec(clip_frames=10, frame_height=96, frame_width=128,
                      fps=5, yolo_size=64, pose_size=64, dino_size=56,
                      sam_size=128)
    eng = LamenessEngine(spec=spec)
    apply_engine_policy(eng)
    frames = jnp.zeros((1, spec.n_packed, 96, 128, 3), jnp.uint8)
    det = _hlo_census(eng._detect_stage, eng.params, frames)
    assert det.get("convolution:f32", 0) == 0, det
    assert det.get("convolution:bf16", 0) >= 40, det
    dino = _hlo_census(eng._dino_stage, eng.params, frames)
    # 12 layers x 6 projections (q,k,v,out,fc1,fc2); f32 dots are the
    # attention softmax path's intended f32 accumulation
    assert dino.get("dot_general:bf16", 0) >= 70, dino
    # trained-pose path: installed pose weights must be recast too
    import lameness_tpu.models.pose as pose_mod
    from lameness_tpu.models.yolo import YoloV8
    pm = YoloV8(variant="n", num_classes=1,
                num_keypoints=pose_mod.NUM_KEYPOINTS)
    pp = jax.jit(pm.init)(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3), jnp.float32))
    eng.install_pose_params(pp)
    boxes = jnp.zeros((1, len(spec.det_idx), 4), jnp.float32)
    scores = jnp.zeros((1, len(spec.det_idx)), jnp.float32)
    heads = _hlo_census(eng._heads_stage, eng.params, frames, boxes,
                        scores, jax.random.PRNGKey(0))
    # pose convs bf16; remaining f32 convs are the TCN head's f32 island
    assert heads.get("convolution:bf16", 0) >= 40, heads


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

"""Rect-canvas SAM (EngineSpec.sam_rect / LAMENESS_SAM_RECT).

The serving knob encodes the pad-free (h·ratio, sam_size) canvas instead
of the reference's padded square (segment_anything always pads to
1024², sam3-pipeline/app/main.py:74-92): a 16:9 frame drops 4096 -> 2304
encoder tokens.  NOT bit-parity with the square canvas (pad tokens there
participate in attention), so it is default-off; these tests pin the
rect machinery itself: kernel parity at rect grids, exact table/PE slice
semantics, and the engine contract.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.ops.sam_attention import (project_rel_tables,
                                            sam_attention_reference,
                                            sam_global_attention)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_global_kernel_rect_parity(rng):
    """Fused kernel == materialized-bias reference on a 4x8 token grid."""
    gh, gw, d, bh = 4, 8, 8, 6
    mk = lambda *s: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * 0.2)
    q, k, v = mk(bh, gh * gw, d), mk(bh, gh * gw, d), mk(bh, gh * gw, d)
    rph, rpw = mk(2 * gh - 1, d), mk(2 * gw - 1, d)
    rh, rw = project_rel_tables(q, rph, rpw, gh, gw)
    assert rh.shape == (bh, gh, gw, gh)
    assert rw.shape == (bh, gh, gw, gw)
    ref = sam_attention_reference(q, k, v, rh, rw)
    got = sam_global_attention(q, k, v, rh, rw, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_project_rel_tables_rect_manual(rng):
    """rel_h[b, qh, qw, kh] = q[b, qh*GW+qw] . Rh[(qh-kh)+GH-1]."""
    gh, gw, d = 3, 5, 4
    q = jnp.asarray(rng.standard_normal((1, gh * gw, d)).astype(np.float32))
    rph = jnp.asarray(rng.standard_normal((2 * gh - 1, d)).astype(np.float32))
    rpw = jnp.asarray(rng.standard_normal((2 * gw - 1, d)).astype(np.float32))
    rh, rw = project_rel_tables(q, rph, rpw, gh, gw)
    for qh, qw, kh, kw in [(0, 0, 0, 0), (2, 4, 1, 3), (1, 2, 2, 0)]:
        qv = np.asarray(q[0, qh * gw + qw])
        np.testing.assert_allclose(
            float(rh[0, qh, qw, kh]),
            float(qv @ np.asarray(rph[(qh - kh) + gh - 1])), rtol=1e-5)
        np.testing.assert_allclose(
            float(rw[0, qh, qw, kw]),
            float(qv @ np.asarray(rpw[(qw - kw) + gw - 1])), rtol=1e-5)


def test_image_pe_rect_is_topleft_slice():
    """Rect decoder PE == top-left slice of the square PE (content tokens
    keep their padded-canvas coordinates)."""
    from lameness_tpu.models.sam import SamPromptEncoder
    pe = SamPromptEncoder(embed_dim=32, image_embedding_size=8,
                          input_image_size=128)
    params = pe.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    full = pe.apply(params, method=pe.image_pe)
    rect = pe.apply(params, 6, 8, method=pe.image_pe)
    np.testing.assert_array_equal(np.asarray(rect),
                                  np.asarray(full[:, :6, :8]))
    dense = pe.apply(params, 2, 6, 8, method=pe.dense_no_mask)
    assert dense.shape == (2, 6, 8, 32)


def test_encoder_rect_fused_vs_unfused(rng):
    """Rect token grid through the fused kernels (interpret) == the
    unfused einsum path, including the center-sliced rel tables."""
    from lameness_tpu.models.sam import SamVisionEncoder
    x = jnp.asarray(rng.standard_normal((2, 96, 128, 3)).astype(np.float32))
    outs = []
    for fused in (False, True):
        enc = SamVisionEncoder(img_size=128, patch_size=16, dim=32,
                               depth=2, heads=4, out_chans=16,
                               window_size=4, global_attn_indexes=(1,),
                               fused_global=fused)
        params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        # nonzero rel tables + pos embed so slicing is actually exercised
        params = jax.tree_util.tree_map(
            lambda a: a + 0.05 * np.random.default_rng(1).standard_normal(
                a.shape).astype(np.float32) if a.ndim in (2, 4) else a,
            params)
        outs.append(np.asarray(jax.jit(enc.apply)(params, x)))
    assert outs[0].shape == (2, 6, 8, 16)
    np.testing.assert_allclose(outs[1], outs[0], atol=2e-4)


def _rect_engine(sam_rect):
    from lameness_tpu.core.config import Config
    from lameness_tpu.models.sam import Sam
    from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine
    spec = EngineSpec(clip_frames=4, frame_height=64, frame_width=96,
                      fps=2, yolo_size=64, dino_size=56, sam_size=128,
                      sam_mask_size=32, sam_rect=sam_rect)
    eng = LamenessEngine(config=Config(), spec=spec, init_models=False)
    eng.sam = Sam(img_size=128, encoder_dim=64, encoder_depth=2,
                  encoder_heads=4, global_attn_indexes=(1,),
                  fused_global=False)
    eng.params = {"sam": jax.jit(eng.sam.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 4)))}
    eng.yolo = eng.dino = eng.tcn = eng.gait = None
    eng.loaded_weights = {}
    eng._jit_sam = jax.jit(eng._sam_stage)
    return eng


def test_engine_sam_rect_contract(rng):
    """sam_rect engine encodes a (96, 128) canvas for 64x96 frames (vs
    128x128 square) and still emits the frame-space 32x32 mask contract."""
    frames = rng.integers(0, 255, (1, 4, 64, 96, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([10.0, 10.0, 80.0, 60.0], np.float32),
                    (1, 4, 1))
    eng = _rect_engine(True)
    out = eng._jit_sam(eng.params, jnp.asarray(frames), jnp.asarray(boxes))
    assert out["masks"].shape == (1, 4, 32, 32)
    assert out["masks"].dtype == jnp.bool_
    frac = np.asarray(out["mask_area_frac"])
    assert ((frac >= 0) & (frac <= 1)).all()
    assert np.isfinite(np.asarray(out["mask_iou_pred"])).all()

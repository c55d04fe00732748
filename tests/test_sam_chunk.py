"""Chunked SAM encoding (EngineSpec.sam_encode_chunk) and encoder remat:
the single-chip memory governors that let vit_h fit batch 8 (VERDICT r4
item 2).  Chunking must be BIT-identical to the one-call batch (same
per-image math, lax.map just sequences sub-batches), remat must leave
the param tree and the forward pass unchanged.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.core.config import Config
from lameness_tpu.models.sam import Sam
from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine


def _mk(chunk, remat=False):
    spec = EngineSpec(clip_frames=4, frame_height=64, frame_width=96,
                      fps=2, yolo_size=64, dino_size=56, sam_size=128,
                      sam_mask_size=32, sam_encode_chunk=chunk)
    eng = LamenessEngine(config=Config(), spec=spec, init_models=False)
    eng.sam = Sam(img_size=128, encoder_dim=64, encoder_depth=2,
                  encoder_heads=4, global_attn_indexes=(1,),
                  fused_global=True, encoder_remat=remat)
    eng.params = {"sam": jax.jit(eng.sam.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 4)))}
    eng.yolo = eng.dino = eng.tcn = eng.gait = None
    eng.loaded_weights = {}
    return eng


@pytest.fixture(scope="module")
def frames_boxes(rng):
    frames = rng.integers(0, 255, (1, 4, 64, 96, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([10.0, 10.0, 80.0, 60.0], np.float32),
                    (1, 4, 1))
    return jnp.asarray(frames), jnp.asarray(boxes)


@pytest.mark.parametrize("chunk", [2, 3, 1])
def test_chunked_encode_matches_batched(frames_boxes, chunk):
    """chunk=2 divides the 4 det frames evenly; chunk=3 exercises the
    pad-to-multiple tail; chunk=1 is the frame-by-frame extreme.  Mask
    BITS must be identical; iou_pred is equivalent within float
    reassociation (XLA fuses the decoder differently per batch shape,
    observed diff ~3e-7)."""
    frames, boxes = frames_boxes
    full = jax.jit(_mk(0)._sam_stage)(_mk(0).params, frames, boxes)
    eng = _mk(chunk)
    assert eng._sam_fused_active()
    # chunked engines share init seeds, so params are identical
    out = jax.jit(eng._sam_stage)(eng.params, frames, boxes)
    np.testing.assert_array_equal(np.asarray(full["masks"]),
                                  np.asarray(out["masks"]))
    np.testing.assert_allclose(np.asarray(full["mask_iou_pred"]),
                               np.asarray(out["mask_iou_pred"]),
                               atol=1e-5)


def test_encoder_remat_same_tree_same_forward(frames_boxes):
    frames, boxes = frames_boxes
    plain, remat = _mk(0), _mk(0, remat=True)
    k1 = {jax.tree_util.keystr(k) for k, _ in
          jax.tree_util.tree_leaves_with_path(plain.params["sam"])}
    k2 = {jax.tree_util.keystr(k) for k, _ in
          jax.tree_util.tree_leaves_with_path(remat.params["sam"])}
    assert k1 == k2          # a real checkpoint loads into either
    o1 = jax.jit(plain._sam_stage)(plain.params, frames, boxes)
    o2 = jax.jit(remat._sam_stage)(plain.params, frames, boxes)
    np.testing.assert_array_equal(np.asarray(o1["masks"]),
                                  np.asarray(o2["masks"]))


def test_config_knob_reaches_spec():
    """config.sam.encode_chunk flows onto EngineSpec at model init (the
    YAML-overlay path a deployment tunes)."""
    import dataclasses
    cfg = dataclasses.replace(
        Config(), sam=dataclasses.replace(Config().sam, encode_chunk=4))
    spec = EngineSpec(clip_frames=4, frame_height=48, frame_width=64,
                      fps=2, yolo_size=64, pose_size=64, dino_size=56,
                      sam_size=128, sam_mask_size=32, use_sam_model=False)
    eng = LamenessEngine(config=cfg, spec=spec)
    assert eng.spec.sam_encode_chunk == 4

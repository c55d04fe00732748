"""SAM stage: fused-batched encoding equals frame-serial lax.map path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.core.config import Config
from lameness_tpu.models.sam import Sam
from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine


def _tiny_sam_engine(fused):
    """Engine with a 128² SAM (grid 8) and tiny other models."""
    spec = EngineSpec(clip_frames=4, frame_height=64, frame_width=96,
                      fps=2, yolo_size=64, dino_size=56, sam_size=128,
                      sam_mask_size=32)
    eng = LamenessEngine(config=Config(), spec=spec, init_models=False)
    eng.sam = Sam(img_size=128, encoder_dim=64, encoder_depth=2,
                  encoder_heads=4, global_attn_indexes=(1,),
                  fused_global=fused)
    eng.params = {"sam": jax.jit(eng.sam.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 4)))}
    # nonzero rel-pos tables so the fused path is actually exercised
    eng.params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * np.random.default_rng(1).standard_normal(
            a.shape).astype(a.dtype) if a.ndim == 2 else a, eng.params)
    eng.yolo = eng.dino = eng.tcn = eng.gait = None
    eng.loaded_weights = {}
    eng._jit_sam = jax.jit(eng._sam_stage)
    return eng


def test_batched_fused_equals_serial_unfused(rng):
    frames = rng.integers(0, 255, (1, 4, 64, 96, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([10.0, 10.0, 80.0, 60.0], np.float32),
                    (1, 4, 1))      # Td = 4 (fps 2 ⇒ det on every frame)

    eng_serial = _tiny_sam_engine(fused=False)
    assert not eng_serial._sam_fused_active()
    out_serial = eng_serial._jit_sam(eng_serial.params, jnp.asarray(frames),
                                     jnp.asarray(boxes))

    eng_fused = _tiny_sam_engine(fused=True)
    assert eng_fused._sam_fused_active()
    out_fused = eng_fused._jit_sam(eng_fused.params, jnp.asarray(frames),
                                   jnp.asarray(boxes))

    np.testing.assert_allclose(np.asarray(out_fused["mask_iou_pred"]),
                               np.asarray(out_serial["mask_iou_pred"]),
                               atol=1e-3)
    agree = (np.asarray(out_fused["masks"])
             == np.asarray(out_serial["masks"])).mean()
    assert agree > 0.995

"""Mixed-precision policy for the fused engine.

bf16 doubles MXU throughput on v5e; the policy here casts the encoder
param trees (YOLO convs, SAM ViT encoder, DINO ViT) to bf16 while keeping
f32 islands where parity is numerically sensitive (SURVEY §7 hard part 2):

- SAM prompt encoder + mask decoder stay f32 (mask IoU ≥ 0.99 gate),
- all LayerNorm/BatchNorm scale/bias/stats stay f32 (variance in bf16
  loses ~3 decimal digits),
- the tiny sequence/graph heads stay f32 (they are not compute-bound).

Matmuls accumulate in f32 everywhere (``preferred_element_type`` /
XLA default for bf16 inputs on TPU).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

_F32_KEY_HINTS = ("bn", "norm", "ln", "bias_stats")


def _keep_f32(path_str: str) -> bool:
    p = path_str.lower()
    # normalization params and their running stats stay f32
    if any(h in p for h in ("'bn", "norm", "_ln", "/ln", "mean", "var")):
        return True
    # SAM decoder + prompt encoder stay f32
    if "mask_decoder" in p or "prompt_encoder" in p:
        return True
    return False


def cast_tree_bf16(params: Any) -> Any:
    """Cast float32 leaves to bf16 except the f32 islands above."""
    def cast(path, leaf):
        if leaf.dtype != jnp.float32:
            return leaf
        path_str = jax.tree_util.keystr(path)
        if _keep_f32(path_str):
            return leaf
        return leaf.astype(jnp.bfloat16)
    return jax.tree_util.tree_map_with_path(cast, params)


def apply_engine_policy(engine) -> Dict[str, str]:
    """In-place: bf16 the encoder params, keep heads + SAM decoder f32.
    Returns a summary of what was cast."""
    summary = {}
    for name in ("yolo", "dino"):
        if name in engine.params:
            engine.params[name] = cast_tree_bf16(engine.params[name])
            summary[name] = "bf16 (norm/bn stats f32)"
    if "sam" in engine.params:
        p = engine.params["sam"]
        p = dict(p)
        inner = dict(p["params"])
        inner["vision_encoder"] = cast_tree_bf16(
            {"params": inner["vision_encoder"]})["params"]
        p["params"] = inner
        engine.params["sam"] = p
        summary["sam"] = "encoder bf16, prompt+decoder f32"
    engine.spec.dtype = jnp.bfloat16
    engine._build_jits()
    return summary

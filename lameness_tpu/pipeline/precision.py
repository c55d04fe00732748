"""Mixed-precision policy for the fused engine.

bf16 doubles MXU throughput on v5e; the policy here casts the encoder
param trees (YOLO + pose convs, SAM ViT encoder, DINO ViT) to bf16 while
keeping f32 islands where parity is numerically sensitive (SURVEY §7
hard part 2):

- SAM prompt encoder + mask decoder stay f32 (mask IoU ≥ 0.99 gate),
- BatchNorm folded running stats and the SAM neck LayerNorm2d params
  stay f32 (rsqrt(var) in bf16 loses ~3 decimal digits); the BN module
  casts its OUTPUT back to the input dtype (torch-autocast semantics)
  so f32 params never promote the downstream convs back to f32,
- transformer LayerNorm scale/bias CAST to bf16: flax computes the
  mean/var reductions in f32 internally (force_float32_reductions)
  regardless of param dtype, and keeping them f32 would promote every
  activation — and with it every following matmul — to f32, silently
  destroying the bf16 MXU rate (found via HLO dot/conv dtype census),
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
    # BN folded running stats + SAM neck LayerNorm2d stay f32 (their
    # modules cast outputs back to the input dtype); plain transformer
    # LayerNorms ('norm*', 'ln1/ln2') are NOT kept — flax already does
    # the stat reductions in f32, and f32 scale/bias would promote all
    # downstream matmuls to f32
    if any(h in p for h in ("'bn", "_ln", "/ln", "mean", "var")):
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


def _cast_tree_jit(tree: Any) -> Any:
    """One jitted program for the whole-tree cast: per-leaf .astype on a
    tunnelled backend dispatches each convert as its own remote op
    (~100 s for the engine's ~300 params); a single jit is one dispatch."""
    return jax.jit(cast_tree_bf16)(tree)


def recast_installed(name: str, tree: Any) -> Any:
    """Apply the per-model policy cast to one param tree (used both by
    apply_engine_policy and when weights are installed after the policy
    is already active)."""
    if name in ("yolo", "dino", "pose"):
        return _cast_tree_jit(tree)
    if name == "sam":
        p = dict(tree)
        inner = dict(p["params"])
        inner["vision_encoder"] = _cast_tree_jit(
            {"params": inner["vision_encoder"]})["params"]
        p["params"] = inner
        return p
    return tree


def apply_engine_policy(engine) -> Dict[str, str]:
    """In-place: bf16 the encoder params, keep heads + SAM decoder f32.
    Returns a summary of what was cast."""
    summary = {}
    for name in ("yolo", "dino", "pose"):
        if name in engine.params:
            engine.params[name] = recast_installed(name, engine.params[name])
            summary[name] = "bf16 (bn stats f32)"
    if "sam" in engine.params:
        engine.params["sam"] = recast_installed("sam", engine.params["sam"])
        summary["sam"] = "encoder bf16, prompt+decoder f32"
    engine.spec.dtype = jnp.bfloat16
    engine._build_jits()
    return summary

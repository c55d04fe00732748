"""Attention ops: Pallas TPU block attention for the ViT encoders.

The only "long" sequences in this system are the ViT image encoders
(SAM-B global layers: 64×64 = 4096 tokens; DINO: 257 tokens — SURVEY.md
§5.7), so the kernel below is a block-softmax attention tuned for those
sizes: each grid program owns one (batch·head, q-block) tile, streams K/V
from VMEM, computes the full score row block at f32 on the MXU, and writes
the output tile.  For S ≤ 4096, K/V for one head fit comfortably in VMEM
(4096·64·2B ≈ 512 KiB bf16), so no online-softmax rescaling pass is
needed — one fused kernel, zero HBM round-trips for the S×S score matrix
(which is what makes naive attention HBM-bound on TPU).

Falls back to plain jnp attention off-TPU (and under vmap-of-jit on CPU
test meshes).  Numerical parity between the two paths is unit-tested.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        bias: Optional[jnp.ndarray] = None,
                        scale: Optional[float] = None) -> jnp.ndarray:
    """Plain softmax attention, f32 accumulation.  (B, H, S, D) layout."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _block_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       valid_len: int):
    q = q_ref[0]                       # (Bq, D)
    k = k_ref[0]                       # (S, D)
    v = v_ref[0]                       # (S, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (Bq, S)
    if valid_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (Bq, D)
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      scale: float, block_q: int = 256,
                      interpret: bool = False) -> jnp.ndarray:
    """(BH, S, D) block attention via pallas_call.  S padded to block_q."""
    bh, s_len, d = q.shape
    pad_s = (-s_len) % block_q
    s_pad = s_len + pad_s
    if pad_s:
        q = jnp.pad(q, ((0, 0), (0, pad_s), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad_s), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_s), (0, 0)))
    grid = (bh, s_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_block_attn_kernel, scale=scale, valid_len=s_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s_len, :]


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None,
                    use_pallas: Optional[bool] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Multi-head attention over (B, H, S, D).

    Dispatches to the Pallas TPU kernel when running on TPU and no bias is
    supplied (ViT encoders); biased attention (Graphormer's tiny graphs,
    SAM decoder rel-pos) uses the jnp path where XLA fusion is already fine.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = _on_tpu() and bias is None
    if not use_pallas or bias is not None:
        return reference_attention(q, k, v, bias=bias, scale=scale)
    b, h, s_len, d = q.shape
    qf = q.reshape(b * h, s_len, d)
    kf = k.reshape(b * h, s_len, d)
    vf = v.reshape(b * h, s_len, d)
    out = _pallas_attention(qf, kf, vf, scale, interpret=interpret)
    return out.reshape(b, h, s_len, d)

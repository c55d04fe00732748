"""Sequence parallelism: ring attention over a ``seq`` mesh axis.

Completes the parallelism suite (dp in the engine, tp in the train step,
pp in ``pipeline_parallel.py``): the sequence axis is sharded across
devices, K/V blocks rotate around the ring via ``jax.lax.ppermute``, and
each device folds the visiting block into its online-softmax accumulators
— after N−1 rotations every query has attended to every key, with only
point-to-point neighbour transfers that overlap with the block matmuls.

The system's sequences are short (257–4096 tokens, SURVEY §5.7), so the
engine does not need this on a v5e-4; it is the scaling path for longer
contexts and is numerically verified against full attention on the CPU
mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

SEQ_AXIS = "seq"


def make_seq_mesh(n_devices: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices[:n_devices]), (SEQ_AXIS,))


def _ring_attn_local(q, k_local, v_local, scale: float, n_ring: int):
    """Per-device body: q (B, H, Sq_local, D); k/v local shards of the same
    shape.  Online-softmax across the ring."""
    m = jnp.full(q.shape[:-1] + (1,), -jnp.inf, q.dtype)
    l = jnp.zeros(q.shape[:-1] + (1,), q.dtype)
    o = jnp.zeros_like(q)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    def step(carry, _):
        m, l, o, k_blk, v_blk = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk,
                       preferred_element_type=jnp.float32) * scale
        s = s.astype(q.dtype)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = alpha * l + p.sum(axis=-1, keepdims=True)
        o = alpha * o + jnp.einsum("bhqk,bhkd->bhqd", p, v_blk)
        k_blk = jax.lax.ppermute(k_blk, SEQ_AXIS, perm)
        v_blk = jax.lax.ppermute(v_blk, SEQ_AXIS, perm)
        return (m_new, l, o, k_blk, v_blk), None

    (m, l, o, _, _), _ = jax.lax.scan(
        step, (m, l, o, k_local, v_local), None, length=n_ring)
    return o / l


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, scale: Optional[float] = None) -> jnp.ndarray:
    """Full (non-causal) attention with the sequence sharded over the mesh.

    q, k, v: (B, H, S, D) with S divisible by the mesh size.  Returns the
    same shape; exact (up to fp error) vs unsharded softmax attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[SEQ_AXIS]
    assert q.shape[2] % n == 0, (q.shape, n)

    def body(q_l, k_l, v_l):
        return _ring_attn_local(q_l, k_l, v_l, scale, n)

    fn = jax.shard_map(body, mesh=mesh,
                       in_specs=(P(None, None, SEQ_AXIS, None),) * 3,
                       out_specs=P(None, None, SEQ_AXIS, None),
                       check_vma=False)
    return fn(q, k, v)

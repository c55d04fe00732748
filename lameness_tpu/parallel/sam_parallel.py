"""Multi-chip scaling paths for the SAM ViTDet encoder.

The SAM encoder is the heaviest model in the engine (12 x 768-d ViT
layers over 4096 tokens/frame — reference sam3-pipeline/app/main.py
runs it per frame on one GPU).  Two sharded execution paths for when a
deployment outgrows a single chip:

* ``sam_encoder_pipeline`` — GPipe pipeline parallelism over a ``stage``
  mesh axis (``parallel/pipeline_parallel.py``).  ViTDet-B's layer
  pattern repeats every 3 layers ([window, window, global] with
  ``global_attn_indexes=(2, 5, 8, 11)``), so 4 stages x 3 layers have
  identical parameter structure and stack cleanly; each device holds a
  quarter of the encoder weights.
* ``sam_ring_attention`` — sequence parallelism for one global-attention
  layer over a ``seq`` mesh axis: the 4096-token grid is sharded across
  devices, K/V blocks rotate via ``ppermute``, and the decomposed
  rel-pos bias b[q, k] = rh[q, k//G] + rw[q, k%G] is rebuilt per
  visiting block from the (.., G)-sized projected tables — the (N, N)
  bias never exists anywhere, on any chip (same trick as the single-chip
  Pallas kernel in ``ops/sam_attention.py``, stretched across the ring).

Both are numerically exact vs their sequential references (tested on the
virtual CPU mesh; ``__graft_entry__.dryrun_multichip`` exercises them).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.sam import LayerNorm2d, SamVisionEncoder, VisionLayer
from .pipeline_parallel import STAGE_AXIS, pipeline_apply, stack_stage_params
from .ring_attention import SEQ_AXIS


# ---------------------------------------------------------------------------
# pipeline-parallel encoder
# ---------------------------------------------------------------------------
def _stage_windows(enc: SamVisionEncoder, n_stages: int) -> list:
    """Per-stage window sizes; asserts the pattern is stage-uniform."""
    assert enc.depth % n_stages == 0, (enc.depth, n_stages)
    per = enc.depth // n_stages
    wins = [0 if i in enc.global_attn_indexes else enc.window_size
            for i in range(enc.depth)]
    stages = [wins[s * per:(s + 1) * per] for s in range(n_stages)]
    assert all(s == stages[0] for s in stages), \
        f"layer pattern not uniform across stages: {stages}"
    return stages[0]


def sam_encoder_pipeline(enc: SamVisionEncoder, params, images: jnp.ndarray,
                         mesh: Mesh, num_microbatches: int = 2,
                         fused_global: Optional[bool] = False) -> jnp.ndarray:
    """Run the ViTDet encoder with its layers pipelined over ``mesh``'s
    ``stage`` axis.  ``params``: the full Sam (or encoder) param tree;
    ``images``: (B, img, img, 3) with B divisible by num_microbatches.
    Exact vs ``sam.encode`` up to fp reordering."""
    p = params["params"]
    ep = p["vision_encoder"] if "vision_encoder" in p else p
    g = enc.img_size // enc.patch_size
    n_stages = mesh.shape[STAGE_AXIS]
    wins = _stage_windows(enc, n_stages)
    per = enc.depth // n_stages

    x = nn.Conv(enc.dim, (enc.patch_size, enc.patch_size),
                strides=(enc.patch_size, enc.patch_size),
                padding="VALID").apply({"params": ep["patch_embed"]}, images)
    x = x + ep["pos_embed"]

    stage_params = [{f"sub{j}": ep[f"layer{s * per + j}"]
                     for j in range(per)} for s in range(n_stages)]
    stacked = stack_stage_params(stage_params)

    def stage_fn(p_s, mx):
        h = mx
        for j, win in enumerate(wins):
            layer = VisionLayer(enc.dim, enc.heads, enc.mlp_ratio, win,
                                (g, g), fused_global)
            h = layer.apply({"params": p_s[f"sub{j}"]}, h)
        return h

    x = pipeline_apply(stage_fn, stacked, x, mesh, num_microbatches)

    x = nn.Conv(enc.out_chans, (1, 1),
                use_bias=False).apply({"params": ep["neck_conv1"]}, x)
    x = LayerNorm2d().apply({"params": ep["neck_ln1"]}, x)
    x = nn.Conv(enc.out_chans, (3, 3), padding=1,
                use_bias=False).apply({"params": ep["neck_conv2"]}, x)
    x = LayerNorm2d().apply({"params": ep["neck_ln2"]}, x)
    return x


# ---------------------------------------------------------------------------
# sequence-parallel global attention
# ---------------------------------------------------------------------------
def sam_ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       rel_h: jnp.ndarray, rel_w: jnp.ndarray,
                       mesh: Mesh) -> jnp.ndarray:
    """Biased attention over the (G, G) token grid, sequence-sharded.

    q, k, v: (BH, N, D) with N = G² divisible by the mesh size;
    rel_h, rel_w: (BH, G, G, G) q-projected tables ([qh, qw, kh] /
    [qh, qw, kw]) as produced by ``ops.sam_attention.project_rel_tables``.
    Matches ``ops.sam_attention.sam_attention_reference`` exactly (up to
    fp): each ring step rebuilds only the visiting block's bias slice
    from the flattened (BH, N, G) tables.
    """
    bh, n, d = q.shape
    g = rel_h.shape[1]
    assert n == g * g, (n, g)
    n_ring = mesh.shape[SEQ_AXIS]
    assert n % n_ring == 0, (n, n_ring)
    blk = n // n_ring
    scale = d ** -0.5
    rh_flat = rel_h.reshape(bh, n, g)      # [bh, q, kh]
    rw_flat = rel_w.reshape(bh, n, g)      # [bh, q, kw]

    def body(q_l, k_l, v_l, rh_l, rw_l):
        me = jax.lax.axis_index(SEQ_AXIS)
        m = jnp.full((bh, blk, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((bh, blk, 1), jnp.float32)
        o = jnp.zeros((bh, blk, d), jnp.float32)
        perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

        def step(carry, t):
            m, l, o, k_blk, v_blk = carry
            # the block visiting at step t started on device (me - t) mod n
            src = jax.lax.rem(me - t + n_ring, n_ring)
            k_idx = src * blk + jnp.arange(blk)             # global k ids
            kh = jnp.broadcast_to((k_idx // g)[None, None, :],
                                  (bh, blk, blk))
            kw = jnp.broadcast_to((k_idx % g)[None, None, :],
                                  (bh, blk, blk))
            bias = (jnp.take_along_axis(rh_l, kh, axis=-1)
                    + jnp.take_along_axis(rw_l, kw, axis=-1))
            s = jnp.einsum("bqd,bkd->bqk", q_l, k_blk,
                           preferred_element_type=jnp.float32) * scale
            s = s + bias.astype(jnp.float32)
            m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l + p.sum(axis=-1, keepdims=True)
            o_new = alpha * o + jnp.einsum(
                "bqk,bkd->bqd", p, v_blk.astype(jnp.float32))
            k_nxt = jax.lax.ppermute(k_blk, SEQ_AXIS, perm)
            v_nxt = jax.lax.ppermute(v_blk, SEQ_AXIS, perm)
            return (m_new, l_new, o_new, k_nxt, v_nxt), None

        (m, l, o, _, _), _ = jax.lax.scan(
            step, (m, l, o, k_l, v_l), jnp.arange(n_ring))
        return (o / l).astype(q_l.dtype)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, SEQ_AXIS, None),) * 3
        + (P(None, SEQ_AXIS, None),) * 2,
        out_specs=P(None, SEQ_AXIS, None),
        check_vma=False)
    return fn(q, k, v, rh_flat, rw_flat)

"""Pallas kernel: SAM global attention with fused decomposed rel-pos bias.

The ViTDet global-attention layers add a decomposed relative-position bias
b[q, k] = q·Rh[qh, kh] + q·Rw[qw, kw] to every score.  Materialised
naively that is an (HW, HW) = 4096² f32 array per head per frame —
~800 MB/frame, 17 GB for a 2-FPS clip batch — which is why the engine had
to serialise SAM frame-by-frame (engine.py).

This kernel never materialises it: the q-projected tables
rel_h[qh, qw, kh] and rel_w[qh, qw, kw] are only (G, G, G) each
(G = 64 → 1 MB), and each grid program owns one qh row of the token grid,
rebuilding its (G, G²) bias tile in VMEM from two (G, G) slices:

  bias[qw, kh·G + kw] = rel_h[qh, qw, kh] + rel_w[qh, qw, kw]

Grid: (B·heads, G).  Per program VMEM: q tile (G, D) + K/V (G², D) +
scores (G, G²) ≈ 4 MB f32 — fits with room to spare.  HBM traffic per
(frame, head) drops from ~1.6 GB (bias+scores) to ~2 MB (K/V + out),
which is what lets the engine batch all clip frames through SAM at once.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, scale: float):
    q = q_ref[0]                    # (R*GW, D) — R qh rows (qw = 0..GW-1)
    k = k_ref[0]                    # (GH*GW, D)
    v = v_ref[0]                    # (GH*GW, D)
    # f32 immediately: Mosaic can't insert/tile minor dims on 16-bit
    # vectors, and the bias feeds an f32 softmax anyway
    r, gw, gh = rh_ref.shape[1], rh_ref.shape[2], rh_ref.shape[3]
    # (R, GW, G*) -> (R*GW, G*): major-dim merge only, Mosaic-safe
    rh = rh_ref[0].astype(jnp.float32).reshape(r * gw, gh)  # [qh·GW+qw, kh]
    rw = rw_ref[0].astype(jnp.float32).reshape(r * gw, gw)  # [qh·GW+qw, kw]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # bias[q, kh*GW + kw] = rh[q, kh] + rw[q, kw], built WITHOUT the
    # (.., GH, GW) -> (.., GH·GW) minor reshape (Mosaic rejects that
    # shape cast on real TPU; interpret mode accepted it).  The kh spread
    # (index j//GW) is one small MXU matmul against a one-hot selector;
    # the kw tile (index j%GW) is a lane-repeat.
    n = gh * gw
    j = jax.lax.broadcasted_iota(jnp.int32, (gh, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (gh, n), 0)
    spread = jnp.where(j // gw == row, 1.0, 0.0)         # (GH, N) one-hot
    s = s + jax.lax.dot_general(rh, spread, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = s + pltpu.repeat(rw, gh, axis=1)                 # rw[q, j % GW]

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def sam_global_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         rel_h: jnp.ndarray, rel_w: jnp.ndarray,
                         interpret: bool = False,
                         rows_per_program: int = 1) -> jnp.ndarray:
    """Fused biased attention over the (G, G) token grid.

    q, k, v: (BH, GH*GW, D); rel_h: (BH, GH, GW, GH) and rel_w:
    (BH, GH, GW, GW) q-projected tables ([qh, qw, kh] / [qh, qw, kw]).
    Returns (BH, GH*GW, D).  GH == GW for the reference's square 1024²
    canvas; rectangular grids (sam_rect serving mode) are supported with
    the same bias construction.

    ``rows_per_program`` (R): each grid program owns R qh rows (K/V HBM
    refetch scales 1/R).  Measured on a v5e at clip geometry (G=64,
    D=64, BH=132): R=1 49.6 ms, R=4 53.6 ms (bit-identical), R=8 fails
    to compile (VMEM) — the kernel is NOT refetch-bound, so R=1 stays
    the default; the machinery + LAMENESS_SAM_ROWS env knob remain for
    other geometries.
    """
    bh, n, d = q.shape
    gh, gw = rel_h.shape[1], rel_w.shape[3]
    assert n == gh * gw, (n, gh, gw)
    assert rel_h.shape[1:] == (gh, gw, gh) and rel_w.shape[1:] == (gh, gw, gw)
    import os
    glb = os.environ.get("LAMENESS_GLB_KERNEL", "v4")
    if glb == "v4":
        # software-pipelined two-half default: v4_r2 beat v2_r4 in two
        # independent on-chip windows (75.1 vs 79.9 and 77.2 vs 80.0 ms
        # at 528 heads bf16, docs/PROBES_r03.json glb_v4_r2), outputs
        # within 1 bf16 ulp of v1/v2 (folded softmax denominator).
        # LAMENESS_GLB_KERNEL=v2/v1 reverts.
        return sam_global_attention_v4(q, k, v, rel_h, rel_w,
                                       interpret=interpret)
    if glb != "v1":
        # augmented-matmul variant: bias_h folded into the score
        # contraction.  On-chip at serving shape (528 heads, 4096 tokens,
        # bf16): v1 63 ms -> v2 47 ms real, bitwise-identical outputs
        # (docs/PROBES_r03.json glbvar).  LAMENESS_GLB_KERNEL=v1 reverts.
        return sam_global_attention_v2(q, k, v, rel_h, rel_w,
                                       interpret=interpret)
    try:
        r = int(os.environ.get("LAMENESS_SAM_ROWS", rows_per_program))
    except ValueError:
        r = rows_per_program
    r = max(1, min(r, gh))           # clamp: 0/negative/huge are operator
    while gh % r:                    # error, not a crash; then ensure gh % r
        r -= 1
    scale = d ** -0.5
    grid = (bh, gh // r)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r * gw, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, gw, gh), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, gw, gw), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * gw, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


def _global_kernel_v2(qa_ref, ka_ref, rw_ref, v_ref, o_ref, *, gh: int):
    """Augmented global attention: QK + bias_h in ONE K=(D+GH) matmul.

    qa = [q·scale | rh] and ka = [k | spreadᵀ] are built in HLO (see
    sam_global_attention_v2); with D=64 and GH≤64 the contraction is at
    most 128 — exactly one MXU K tile, so bias_h costs nothing over the
    v1 kernel's q@kᵀ alone (which pads K 64→128 anyway) and the separate
    bias-spread matmul disappears.  bias_w stays a lane-repeat.
    """
    qa = qa_ref[0]                  # (R·GW, A)
    ka = ka_ref[0]                  # (N, A)
    v = v_ref[0]                    # (N, D)
    rw = rw_ref[0].astype(jnp.float32)                   # (R·GW, GW)
    s = jax.lax.dot_general(qa, ka, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + pltpu.repeat(rw, gh, axis=1)                 # rw[t, j % GW]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def sam_global_attention_v2(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            rel_h: jnp.ndarray, rel_w: jnp.ndarray,
                            interpret: bool = False,
                            rows_per_program: int = 4) -> jnp.ndarray:
    """Augmented-matmul variant of sam_global_attention (same signature).

    Numerics: scale = D^-1/2 is a power of two for SAM's hd=64 (exact in
    bf16); rh rounds to the compute dtype before the exact one-hot
    selection — the only delta vs v1, inside the existing parity gates.
    ``rows_per_program`` default 4 (best measured: 63/58/50/47 ms for
    v1/R1/R2/R4) — M = R·GW rows fills the MXU sublane tile that v1's
    single-row (M=64) programs half-wasted.
    """
    bh, n, d = q.shape
    gh, gw = rel_h.shape[1], rel_w.shape[3]
    assert n == gh * gw, (n, gh, gw)
    import os
    try:
        r = int(os.environ.get("LAMENESS_SAM_ROWS_V2", rows_per_program))
    except ValueError:
        r = rows_per_program
    r = max(1, min(r, gh))
    while gh % r:
        r -= 1
    scale = d ** -0.5
    jj = np.arange(n)
    spread_t = jnp.asarray(
        ((jj[:, None] // gw) == np.arange(gh)[None, :]).astype(np.float32),
        q.dtype)                                          # (N, GH)
    qa = jnp.concatenate(
        [q * scale, rel_h.reshape(bh, n, gh).astype(q.dtype)], axis=-1)
    ka = jnp.concatenate(
        [k, jnp.broadcast_to(spread_t, (bh, n, gh))], axis=-1)
    rw = rel_w.reshape(bh, n, gw)
    a = d + gh
    return pl.pallas_call(
        functools.partial(_global_kernel_v2, gh=gh),
        grid=(bh, gh // r),
        in_specs=[
            pl.BlockSpec((1, r * gw, a), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, a), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r * gw, gw), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * gw, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(qa, ka, rw, v)


def _global_kernel_v4(qa_ref, ka_ref, rw_ref, v_ref, o_ref, *,
                      gh: int, half: int):
    """v2's augmented QK with two software-pipelined row halves.

    Each program owns TWO r-row blocks and interleaves their stages:
    QK(h0); QK(h1); softmax(h0); PV(h0); softmax(h1); PV(h1).  The
    halves are data-independent, so Mosaic's VLIW scheduler can pack
    h1's MXU matmuls against h0's VPU softmax (one serial chain per
    program is what caps v2 at ~46% MXU).  The softmax denominator is
    folded into the PV output (rows scale by 1/sum on the (M, D) tile
    instead of dividing the (M, N) score tile): same result, ~1/3 the
    VPU elementwise work; division after the f32-accumulated PV dot
    instead of before it changes numerics by ≤1 bf16 ulp on p.
    """
    qa = qa_ref[0]                  # (2·half, A)
    ka = ka_ref[0]                  # (N, A)
    v = v_ref[0]                    # (N, D)
    rw = rw_ref[0].astype(jnp.float32)                   # (2·half, GW)

    s0 = jax.lax.dot_general(qa[:half], ka, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s0 = s0 + pltpu.repeat(rw[:half], gh, axis=1)
    s1 = jax.lax.dot_general(qa[half:], ka, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s1 = s1 + pltpu.repeat(rw[half:], gh, axis=1)

    p0 = jnp.exp(s0 - jnp.max(s0, axis=-1, keepdims=True))
    i0 = 1.0 / jnp.sum(p0, axis=-1, keepdims=True)
    o0 = jax.lax.dot_general(p0.astype(v.dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * i0
    p1 = jnp.exp(s1 - jnp.max(s1, axis=-1, keepdims=True))
    i1 = 1.0 / jnp.sum(p1, axis=-1, keepdims=True)
    o1 = jax.lax.dot_general(p1.astype(v.dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * i1
    o_ref[0, :half] = o0.astype(o_ref.dtype)
    o_ref[0, half:] = o1.astype(o_ref.dtype)


def sam_global_attention_v4(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            rel_h: jnp.ndarray, rel_w: jnp.ndarray,
                            interpret: bool = False,
                            rows_per_block: int = 2) -> jnp.ndarray:
    """Software-pipelined variant of sam_global_attention_v2 (same
    signature/layout).  Each grid program processes 2·rows_per_block qh
    rows as two interleaved halves — see _global_kernel_v4.  Numerics:
    identical augmented-QK construction to v2; the folded denominator
    moves the divide after the f32 PV accumulation (≤1 bf16 ulp delta
    vs v2 on the normalized weights)."""
    bh, n, d = q.shape
    gh, gw = rel_h.shape[1], rel_w.shape[3]
    assert n == gh * gw, (n, gh, gw)
    import os
    try:
        r = int(os.environ.get("LAMENESS_SAM_ROWS_V4", rows_per_block))
    except ValueError:
        r = rows_per_block
    r = max(1, min(r, gh // 2))
    while gh % (2 * r):
        r -= 1
    scale = d ** -0.5
    jj = np.arange(n)
    spread_t = jnp.asarray(
        ((jj[:, None] // gw) == np.arange(gh)[None, :]).astype(np.float32),
        q.dtype)                                          # (N, GH)
    qa = jnp.concatenate(
        [q * scale, rel_h.reshape(bh, n, gh).astype(q.dtype)], axis=-1)
    ka = jnp.concatenate(
        [k, jnp.broadcast_to(spread_t, (bh, n, gh))], axis=-1)
    rw = rel_w.reshape(bh, n, gw)
    a = d + gh
    m = 2 * r * gw                                        # rows per program
    return pl.pallas_call(
        functools.partial(_global_kernel_v4, gh=gh, half=r * gw),
        grid=(bh, gh // (2 * r)),
        in_specs=[
            pl.BlockSpec((1, m, a), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, a), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, gw), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(qa, ka, rw, v)


def _window_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *,
                   scale: float, win: int, heads: int):
    """All heads of one 14x14 window per program.

    Refs: q/k/v/o (1, nH, N, D); rh/rw (1, nH, N, win) with
    N = win².  Per head: s = qk^T·scale + bias, softmax, @v — the bias
    tile bias[q, kh·win + kw] = rh[q, kh] + rw[q, kw] is rebuilt with
    the same Mosaic-safe construction as the global kernel above (one-
    hot MXU matmul for the kh spread, lane tiling for kw; no minor-dim
    reshapes — those fail to compile on real TPU).
    """
    n = win * win
    # one-hot spread shared across heads: spread[r, j] = 1 iff j//win == r
    j = jax.lax.broadcasted_iota(jnp.int32, (win, n), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (win, n), 0)
    spread = jnp.where(j // win == row, 1.0, 0.0)          # (win, N)
    for h in range(heads):
        q = q_ref[0, h]                                    # (N, D)
        k = k_ref[0, h]
        v = v_ref[0, h]
        rh = rh_ref[0, h].astype(jnp.float32)              # (N, win)
        rw = rw_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = s + jax.lax.dot_general(rh, spread, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        s = s + pltpu.repeat(rw, win, axis=1)              # rw[q, j % win]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def sam_window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         rel_h: jnp.ndarray, rel_w: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused biased attention over ViTDet's padded 14x14 windows.

    q, k, v: (BW, nH, N, D) — BW = frames · windows, N = win² tokens;
    rel_h, rel_w: (BW, nH, N, win) q-projected decomposed rel-pos tables
    ([token, kh] / [token, kw]).  Returns (BW, nH, N, D).

    The windowed layers are 361 of SAM's 395 ms f32 compute (ROUND2
    attribution); unfused, each window's (196, 196) bias + scores round-
    trip HBM with 196-token layouts that tile poorly (196 = 1.5 lane
    tiles) and turn bf16 into relayout soup (~18% gain).  One grid
    program per window fuses bias + softmax + both matmuls for all 12
    heads in VMEM: HBM touches only q/k/v/out and the (N, win) tables.

    Pad parity: the caller zero-pads the token grid BEFORE qkv (exactly
    like the reference ViTDet, ``segment_anything`` image encoder /
    sam3-pipeline usage), so pad K/V rows hold the qkv bias values and
    participate in attention identically — bit-for-bit the reference's
    edge-window numerics, no masking required.
    """
    import os
    if os.environ.get("LAMENESS_WIN_KERNEL", "v1") == "v2":
        # augmented-matmul variant (bias folded into the score
        # contraction) — opt-in until on-chip parity + perf land
        return sam_window_attention_v2(q, k, v, rel_h, rel_w,
                                       interpret=interpret)
    bw, nh, n, d = q.shape
    win = rel_h.shape[-1]
    assert n == win * win, (n, win)
    scale = d ** -0.5
    return pl.pallas_call(
        functools.partial(_window_kernel, scale=scale, win=win, heads=nh),
        grid=(bw,),
        in_specs=[
            pl.BlockSpec((1, nh, n, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, n, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, n, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, n, win), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, n, win), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nh, n, d), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, nh, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


def _window_kernel_v2(qa_ref, ka_ref, v_ref, o_ref):
    """Batched augmented attention: NB = windows·heads per program.

    The decomposed rel-pos bias is folded into the score matmul by
    augmenting the contraction dim (see sam_window_attention_v2), so a
    program is ONE batched QK matmul + softmax + ONE batched PV matmul —
    the v1 kernel's per-head bias-spread matmul (K=14 padded to a full
    128 MXU tile, i.e. as expensive as the QK matmul itself) and the
    lane-repeat disappear entirely.
    """
    qa = qa_ref[...]                 # (NB, N, A)
    ka = ka_ref[...]                 # (NB, N, A)
    v = v_ref[...]                   # (NB, N, D)
    s = jax.lax.dot_general(qa, ka, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def sam_window_attention_v2(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            rel_h: jnp.ndarray, rel_w: jnp.ndarray,
                            interpret: bool = False,
                            windows_per_program: int = 1) -> jnp.ndarray:
    """Augmented-matmul variant of sam_window_attention (same signature).

    The bias bias[q, kh·win+kw] = rh[q, kh] + rw[q, kw] is a rank-2·win
    correction to the score matrix, so it folds exactly into the QK
    contraction by augmenting both operands:

        Qa = [q·scale | rh | rw]          (N, D + 2·win)
        Ka = [k | spreadᵀ | modᵀ]         (N, D + 2·win)
        s  = Qa @ Kaᵀ
           = scale·q@kᵀ + rh@spread + rw@mod

    where spreadᵀ[j, r] = 1 iff j//win == r and modᵀ[j, w] = 1 iff
    j%win == w are constants shared by every window/head.  The augment
    lives in HLO (cheap concats); the kernel is a pure batched
    attention over NB = windows_per_program·heads slices.

    Numerics: scale = D^-1/2 is a power of two for SAM's hd=64, so
    q·scale is exact in bf16; the only delta vs v1 is rh/rw rounded to
    the compute dtype before the (exact, one-hot) spread — parity vs
    the unfused path stays within the existing bf16 gate.
    """
    bw, nh, n, d = q.shape
    win = rel_h.shape[-1]
    assert n == win * win, (n, win)
    import os
    try:
        wpp = int(os.environ.get("LAMENESS_SAM_WPP", windows_per_program))
    except ValueError:
        wpp = windows_per_program
    wpp = max(1, min(wpp, bw))
    while bw % wpp:
        wpp -= 1
    scale = d ** -0.5
    jj = np.arange(n)
    const = np.concatenate(
        [(jj[:, None] // win) == np.arange(win)[None, :],
         (jj[:, None] % win) == np.arange(win)[None, :]],
        axis=1).astype(np.float32)                       # (N, 2·win)
    const = jnp.asarray(const, q.dtype)
    qa = jnp.concatenate(
        [q * scale, rel_h.astype(q.dtype), rel_w.astype(q.dtype)], axis=-1)
    ka = jnp.concatenate(
        [k, jnp.broadcast_to(const, (bw, nh, n, 2 * win))], axis=-1)
    a = d + 2 * win
    nb = wpp * nh
    qa = qa.reshape(bw * nh, n, a)
    ka = ka.reshape(bw * nh, n, a)
    vf = v.reshape(bw * nh, n, d)
    out = pl.pallas_call(
        _window_kernel_v2,
        grid=((bw * nh) // nb,),
        in_specs=[
            pl.BlockSpec((nb, n, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, n, a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw * nh, n, d), q.dtype),
        interpret=interpret,
    )(qa, ka, vf)
    return out.reshape(bw, nh, n, d)


def _global_kernel_v3(qa_ref, ka_ref, rw_ref, va_ref, o_ref, *,
                      gh: int, gw: int):
    """Head-last augmented global attention: one (image, head, row-block)
    per program; the head is selected by the grid's lane-block index, so
    the HLO side never transposes head-major."""
    qa = qa_ref[0]                       # (R·GW, 128)
    ka = ka_ref[0]                       # (N, 128)
    va = va_ref[0]                       # (N, 128) — hd + zero pad
    rw = rw_ref[0][:, :gw].astype(jnp.float32)           # (R·GW, GW)
    s = jax.lax.dot_general(qa, ka, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + pltpu.repeat(rw, gh, axis=1)                 # rw[t, j % GW]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(va.dtype), va, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def sam_global_attention_v3(q4: jnp.ndarray, k4: jnp.ndarray,
                            v4: jnp.ndarray, rh4: jnp.ndarray,
                            rw4: jnp.ndarray,
                            interpret: bool = False,
                            rows_per_program: int = 4) -> jnp.ndarray:
    """Transpose-free global attention over head-last layouts.

    q4/k4/v4: (B, N, nH, hd) qkv Dense slices (never transposed);
    rh4: (B, N, nH, GH), rw4: (B, N, nH, GW) head-last projected tables
    (project_rel_tables_hl).  Returns (B, N, nH·hd).

    Per head, [q·scale | rh | 0] / [k | spreadᵀ | 0] pack to one
    128-lane group (hd + GH ≤ 128 for SAM's 64-token grid — exactly
    full, zero pad only on rect canvases), so the augmented QK matmul
    contracts one full MXU K tile and bias_h is free; bias_w stays a
    lane-repeat.  The grid's third axis indexes the head's lane block —
    every slice the kernel sees is 128-aligned.
    """
    b, n, nh, hd = q4.shape
    gh, gw = rh4.shape[-1], rw4.shape[-1]
    assert n == gh * gw, (n, gh, gw)
    lane = 128
    aug = hd + gh
    assert aug <= lane and gw <= lane, (hd, gh, gw)
    import os
    try:
        r = int(os.environ.get("LAMENESS_SAM_ROWS_V3", rows_per_program))
    except ValueError:
        r = rows_per_program
    r = max(1, min(r, gh))
    while gh % r:
        r -= 1
    scale = hd ** -0.5
    jj = np.arange(n)
    spread_t = jnp.asarray(
        ((jj[:, None] // gw) == np.arange(gh)[None, :]).astype(np.float32),
        q4.dtype)                                         # (N, GH)
    zq = jnp.zeros((b, n, nh, lane - aug), q4.dtype)
    qa = jnp.concatenate(
        [q4 * scale, rh4.astype(q4.dtype), zq], axis=-1)
    ka = jnp.concatenate(
        [k4, jnp.broadcast_to(spread_t[:, None, :], (b, n, nh, gh)), zq],
        axis=-1)
    va = jnp.concatenate(
        [v4, jnp.zeros((b, n, nh, lane - hd), q4.dtype)], axis=-1)
    rwp = jnp.concatenate(
        [rw4.astype(q4.dtype),
         jnp.zeros((b, n, nh, lane - gw), q4.dtype)], axis=-1)
    c = nh * lane
    # grid order (b, h, i): the row-block axis i iterates FASTEST so the
    # full-grid ka/va blocks (index constant in i) stay resident instead
    # of refetching per program
    out = pl.pallas_call(
        functools.partial(_global_kernel_v3, gh=gh, gw=gw),
        grid=(b, nh, gh // r),
        in_specs=[
            pl.BlockSpec((1, r * gw, lane), lambda b_, h, i: (b_, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, lane), lambda b_, h, i: (b_, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r * gw, lane), lambda b_, h, i: (b_, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, lane), lambda b_, h, i: (b_, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * gw, lane), lambda b_, h, i: (b_, i, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q4.dtype),
        interpret=interpret,
    )(qa.reshape(b, n, c), ka.reshape(b, n, c),
      rwp.reshape(b, n, c), va.reshape(b, n, c))
    return out.reshape(b, n, nh, lane)[..., :hd].reshape(b, n, nh * hd)


def _window_kernel_v3(qa_ref, ka_ref, va_ref, o_ref, *, heads: int,
                      lane: int, wpp: int):
    """Head-interleaved augmented window attention.

    qa/ka/va/o refs: (wpp, N, heads·lane) with each head's slice 128-lane
    aligned (lane = 128), so every in-kernel slice is tile-aligned —
    no relayouts, no HLO transposes feeding the kernel.  Per head: one
    augmented QK matmul (bias folded, see sam_window_attention_v2) +
    softmax + one PV matmul against the zero-padded (N, 128) V tile
    (the pad lanes cost nothing: N=64 PV wasted the same half-tile).
    ``wpp`` windows per program (a plain unrolled loop — batched
    dot_generals crash the remote Mosaic toolchain) amortizes the
    per-program grid overhead across windows.
    """
    for w in range(wpp):
        for h in range(heads):
            sl = slice(h * lane, (h + 1) * lane)
            qa = qa_ref[w, :, sl]                # (N, 128)
            ka = ka_ref[w, :, sl]
            va = va_ref[w, :, sl]
            s = jax.lax.dot_general(qa, ka, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[w, :, sl] = jax.lax.dot_general(
                p.astype(va.dtype), va, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def sam_window_attention_v3(q4: jnp.ndarray, k4: jnp.ndarray,
                            v4: jnp.ndarray, rh4: jnp.ndarray,
                            rw4: jnp.ndarray,
                            interpret: bool = False,
                            windows_per_program: int = 2) -> jnp.ndarray:
    """Transpose-free windowed attention over head-last layouts.

    q4/k4/v4: (BW, N, nH, hd) — the qkv Dense output sliced, NOT
    transposed; rh4/rw4: (BW, N, nH, win) head-last projected rel
    tables (project_rel_tables_hl).  Returns (BW, N, nH·hd) ready for
    the out projection (feature index h·hd + d, the same order the
    transpose-based path produces).

    Packing: per head, [q·scale | rh | rw | 0] and [k | spreadᵀ | modᵀ
    | 0] fill exactly one 128-lane group (hd=64 + 2·win=28 + pad), so
    the kernel's per-head slices are tile-aligned and the augmented QK
    matmul contracts a single full MXU K tile.  V pads hd → 128 with
    zeros (same MXU passes as the half-wasted N=64 PV).

    windows_per_program default 2: measured 58.8 vs 60.8 ms module time
    at serving shape on a v5e, outputs exact vs wpp=1
    (docs/PROBES_r03.json attnmod_v3_wpp2); LAMENESS_SAM_WPP3 overrides.
    """
    bw, n, nh, hd = q4.shape
    win = rh4.shape[-1]
    assert n == win * win, (n, win)
    lane = 128
    aug = hd + 2 * win
    assert aug <= lane, (hd, win)
    import os
    try:
        wpp = int(os.environ.get("LAMENESS_SAM_WPP3", windows_per_program))
    except ValueError:
        wpp = windows_per_program
    wpp = max(1, min(wpp, bw))
    while bw % wpp:
        wpp -= 1
    scale = hd ** -0.5
    jj = np.arange(n)
    const = np.concatenate(
        [(jj[:, None] // win) == np.arange(win)[None, :],
         (jj[:, None] % win) == np.arange(win)[None, :]],
        axis=1).astype(np.float32)                       # (N, 2·win)
    const = jnp.broadcast_to(jnp.asarray(const, q4.dtype)[:, None, :],
                             (n, nh, 2 * win))
    zpad = jnp.zeros((bw, n, nh, lane - aug), q4.dtype)
    qa = jnp.concatenate(
        [q4 * scale, rh4.astype(q4.dtype), rw4.astype(q4.dtype), zpad], -1)
    ka = jnp.concatenate(
        [k4, jnp.broadcast_to(const, (bw, n, nh, 2 * win)), zpad], -1)
    va = jnp.concatenate(
        [v4, jnp.zeros((bw, n, nh, lane - hd), q4.dtype)], -1)
    c = nh * lane
    out = pl.pallas_call(
        functools.partial(_window_kernel_v3, heads=nh, lane=lane, wpp=wpp),
        grid=(bw // wpp,),
        in_specs=[
            pl.BlockSpec((wpp, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpp, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpp, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpp, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), q4.dtype),
        interpret=interpret,
    )(qa.reshape(bw, n, c), ka.reshape(bw, n, c), va.reshape(bw, n, c))
    return out.reshape(bw, n, nh, lane)[..., :hd].reshape(bw, n, nh * hd)


def _window_kernel_v5(qa_ref, ka_ref, va_ref, o_ref, *, heads: int,
                      lane: int, wpp: int):
    """v3's head loop, software-pipelined: head h's augmented QK (MXU)
    is emitted before head h-1's softmax+PV, so the VLIW scheduler can
    pack the VPU softmax against the next head's matmul; the softmax
    denominator folds into the PV output scale (divide the (N, 128)
    tile, not the (N, 256) scores)."""
    def qk(w, h):
        sl = slice(h * lane, (h + 1) * lane)
        return jax.lax.dot_general(
            qa_ref[w, :, sl], ka_ref[w, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def finish(w, h, s):
        sl = slice(h * lane, (h + 1) * lane)
        va = va_ref[w, :, sl]
        p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        inv = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(va.dtype), va,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) * inv
        o_ref[w, :, sl] = o.astype(o_ref.dtype)

    prev = None
    for w in range(wpp):
        for h in range(heads):
            s = qk(w, h)
            if prev is not None:
                finish(*prev)
            prev = (w, h, s)
    finish(*prev)


def sam_window_attention_v5(q4: jnp.ndarray, k4: jnp.ndarray,
                            v4: jnp.ndarray, rh4: jnp.ndarray,
                            rw4: jnp.ndarray,
                            interpret: bool = False,
                            windows_per_program: int = 2) -> jnp.ndarray:
    """sam_window_attention_v3 with the software-pipelined head loop
    (same layout/packing; see _window_kernel_v5).  Numerics: folded
    softmax denominator ⇒ ≤1 bf16 ulp vs v3 on the weights."""
    bw, n, nh, hd = q4.shape
    win = rh4.shape[-1]
    assert n == win * win, (n, win)
    lane = 128
    aug = hd + 2 * win
    assert aug <= lane, (hd, win)
    import os
    try:
        wpp = int(os.environ.get("LAMENESS_SAM_WPP5", windows_per_program))
    except ValueError:
        wpp = windows_per_program
    wpp = max(1, min(wpp, bw))
    while bw % wpp:
        wpp -= 1
    scale = hd ** -0.5
    jj = np.arange(n)
    const = np.concatenate(
        [(jj[:, None] // win) == np.arange(win)[None, :],
         (jj[:, None] % win) == np.arange(win)[None, :]],
        axis=1).astype(np.float32)                       # (N, 2·win)
    const = jnp.broadcast_to(jnp.asarray(const, q4.dtype)[:, None, :],
                             (n, nh, 2 * win))
    zpad = jnp.zeros((bw, n, nh, lane - aug), q4.dtype)
    qa = jnp.concatenate(
        [q4 * scale, rh4.astype(q4.dtype), rw4.astype(q4.dtype), zpad], -1)
    ka = jnp.concatenate(
        [k4, jnp.broadcast_to(const, (bw, n, nh, 2 * win)), zpad], -1)
    va = jnp.concatenate(
        [v4, jnp.zeros((bw, n, nh, lane - hd), q4.dtype)], -1)
    c = nh * lane
    out = pl.pallas_call(
        functools.partial(_window_kernel_v5, heads=nh, lane=lane, wpp=wpp),
        grid=(bw // wpp,),
        in_specs=[
            pl.BlockSpec((wpp, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpp, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wpp, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wpp, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), q4.dtype),
        interpret=interpret,
    )(qa.reshape(bw, n, c), ka.reshape(bw, n, c), va.reshape(bw, n, c))
    return out.reshape(bw, n, nh, lane)[..., :hd].reshape(bw, n, nh * hd)


def project_rel_tables_hl(q4: jnp.ndarray, rel_pos_h: jnp.ndarray,
                          rel_pos_w: jnp.ndarray, gh: int,
                          gw: int = None):
    """Head-last rel-table projection: q4 (BW, N, nH, hd) ->
    rh4 (BW, N, nH, GH), rw4 (BW, N, nH, GW) — the transpose-free
    counterpart of project_rel_tables (token index t = qh·GW + qw)."""
    gw = gh if gw is None else gw
    idx_h = (np.arange(gh)[:, None] - np.arange(gh)[None, :]) + (gh - 1)
    idx_w = (np.arange(gw)[:, None] - np.arange(gw)[None, :]) + (gw - 1)
    rh_tok = rel_pos_h[idx_h]            # (GH, GH, D) [qh, kh, d]
    rw_tok = rel_pos_w[idx_w]            # (GW, GW, D) [qw, kw, d]
    # expand to token-major: token t -> row t//GW / col t%GW
    rh_tok = jnp.repeat(rh_tok, gw, axis=0)              # (N, GH, D)
    rw_tok = jnp.tile(rw_tok, (gh, 1, 1))                # (N, GW, D)
    rh4 = jnp.einsum("bthd,tkd->bthk", q4, rh_tok)
    rw4 = jnp.einsum("bthd,tkd->bthk", q4, rw_tok)
    return rh4, rw4


def project_rel_tables(q: jnp.ndarray, rel_pos_h: jnp.ndarray,
                       rel_pos_w: jnp.ndarray, g: int, gw: int = None):
    """q: (BH, GH*GW, D); rel tables (2GH-1, D) / (2GW-1, D) ->
    projected (BH, GH, GW, GH) and (BH, GH, GW, GW).

    rel_h[bh, qh, qw, kh] = Σ_d q[bh, qh·GW+qw, d] · Rh[(qh−kh)+GH−1, d]

    ``g`` is GH; ``gw`` defaults to it (the reference's square canvas).
    """
    gh = g
    gw = gh if gw is None else gw
    idx_h = (np.arange(gh)[:, None] - np.arange(gh)[None, :]) + (gh - 1)
    idx_w = (np.arange(gw)[:, None] - np.arange(gw)[None, :]) + (gw - 1)
    rh = rel_pos_h[idx_h]           # (GH, GH, D) [qh, kh, d]
    rw = rel_pos_w[idx_w]           # (GW, GW, D) [qw, kw, d]
    qg = q.reshape(q.shape[0], gh, gw, -1)
    rel_h = jnp.einsum("bhwd,hkd->bhwk", qg, rh)
    rel_w = jnp.einsum("bhwd,wkd->bhwk", qg, rw)
    # rel_w is [qh, qw, kw] after moving qw axis: einsum gives [b, qh, qw, kw]
    return rel_h, rel_w


def sam_attention_reference(q, k, v, rel_h, rel_w):
    """Unfused reference (materialises the full bias) for parity tests."""
    bh, n, d = q.shape
    g = rel_h.shape[1]
    s = jnp.einsum("bqd,bkd->bqk", q, k) * (d ** -0.5)
    bias = (rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
            ).reshape(bh, n, n)
    p = jax.nn.softmax(s + bias, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)

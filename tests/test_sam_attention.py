"""Fused SAM rel-pos attention kernel: parity vs unfused reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lameness_tpu.ops.sam_attention import (project_rel_tables,
                                            sam_attention_reference,
                                            sam_global_attention)


def test_fused_kernel_matches_reference(rng):
    g, d, bh = 8, 16, 3
    n = g * g
    q = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
    rel_pos_h = jnp.asarray(rng.standard_normal((2 * g - 1, d)).astype(np.float32)) * 0.2
    rel_pos_w = jnp.asarray(rng.standard_normal((2 * g - 1, d)).astype(np.float32)) * 0.2
    rh, rw = project_rel_tables(q, rel_pos_h, rel_pos_w, g)
    ref = sam_attention_reference(q, k, v, rh, rw)
    got = sam_global_attention(q, k, v, rh, rw, interpret=True)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 2e-5


def test_fused_path_matches_module_reference_path(rng):
    """VisionAttention(fused=True interp) == VisionAttention(fused=False)."""
    from lameness_tpu.models.sam import VisionAttention
    g, dim, heads = 8, 32, 4
    x = jnp.asarray(rng.standard_normal((2, g, g, dim)).astype(np.float32))
    ref_mod = VisionAttention(dim, heads, (g, g), fused=False)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    # seed nonzero rel tables (init is zeros)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(1).standard_normal(a.shape
                                                                     ).astype(a.dtype)
        if a.ndim == 2 else a, params)
    ref = ref_mod.apply(params, x)
    fused_mod = VisionAttention(dim, heads, (g, g), fused=True)
    got = fused_mod.apply(params, x)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 2e-5


def test_window_kernel_matches_reference(rng):
    """sam_window_attention == dense bias + softmax reference."""
    from lameness_tpu.ops.sam_attention import sam_window_attention
    win, d, bw, nh = 4, 16, 3, 2
    n = win * win
    q = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    rh = jnp.asarray(rng.standard_normal((bw, nh, n, win)).astype(np.float32))
    rw = jnp.asarray(rng.standard_normal((bw, nh, n, win)).astype(np.float32))
    # dense reference: bias[q, kh*win+kw] = rh[q, kh] + rw[q, kw]
    bias = (rh[..., :, None] + rw[..., None, :]).reshape(bw, nh, n, n)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5) + bias
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    got = sam_window_attention(q, k, v, rh, rw, interpret=True)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 2e-5


def test_window_layer_fused_parity_with_padding(rng):
    """VisionLayer(window) fused vs unfused — includes the zero-pad edge
    windows, so pad-token numerics match the reference path exactly."""
    from lameness_tpu.models.sam import VisionLayer
    dim, heads, win, g = 32, 4, 4, 6        # 6x6 grid pads to 8x8
    x = jnp.asarray(rng.standard_normal((2, g, g, dim)).astype(np.float32))
    ref_mod = VisionLayer(dim, heads, 2.0, win, (g, g), fused_global=False)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(1).standard_normal(
            a.shape).astype(a.dtype) if a.ndim == 2 else a, params)
    ref = ref_mod.apply(params, x)
    fused_mod = VisionLayer(dim, heads, 2.0, win, (g, g), fused_global=True)
    got = fused_mod.apply(params, x)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 2e-5


def test_project_rel_tables_shapes(rng):
    g, d, bh = 4, 8, 2
    q = jnp.asarray(rng.standard_normal((bh, g * g, d)).astype(np.float32))
    rph = jnp.asarray(rng.standard_normal((2 * g - 1, d)).astype(np.float32))
    rpw = jnp.asarray(rng.standard_normal((2 * g - 1, d)).astype(np.float32))
    rh, rw = project_rel_tables(q, rph, rpw, g)
    assert rh.shape == (bh, g, g, g) and rw.shape == (bh, g, g, g)
    # spot check one element: rel_h[b, qh, qw, kh] = q[b, qh*g+qw] . Rh[qh-kh+g-1]
    b_, qh, qw, kh = 1, 2, 3, 0
    expect = float(q[b_, qh * g + qw] @ rph[(qh - kh) + g - 1])
    assert float(rh[b_, qh, qw, kh]) == pytest.approx(expect, rel=1e-5)


def test_window_kernel_v2_matches_reference(rng):
    """Augmented-matmul window kernel == dense bias + softmax reference."""
    from lameness_tpu.ops.sam_attention import sam_window_attention_v2
    win, d, bw, nh = 4, 16, 3, 2
    n = win * win
    q = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    rh = jnp.asarray(rng.standard_normal((bw, nh, n, win)).astype(np.float32))
    rw = jnp.asarray(rng.standard_normal((bw, nh, n, win)).astype(np.float32))
    bias = (rh[..., :, None] + rw[..., None, :]).reshape(bw, nh, n, n)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d ** -0.5) + bias
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)
    for wpp in (1, 3):          # 3 covers the multi-window block path
        got = sam_window_attention_v2(q, k, v, rh, rw, interpret=True,
                                      windows_per_program=wpp)
        assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 2e-5, wpp


def test_window_kernel_v2_env_dispatch(rng, monkeypatch):
    """LAMENESS_WIN_KERNEL=v2 routes sam_window_attention through v2."""
    from lameness_tpu.ops.sam_attention import sam_window_attention
    win, d, bw, nh = 4, 8, 2, 2
    n = win * win
    q = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bw, nh, n, d)).astype(np.float32))
    rh = jnp.asarray(rng.standard_normal((bw, nh, n, win)).astype(np.float32))
    rw = jnp.asarray(rng.standard_normal((bw, nh, n, win)).astype(np.float32))
    monkeypatch.setenv("LAMENESS_WIN_KERNEL", "v1")
    v1 = sam_window_attention(q, k, v, rh, rw, interpret=True)
    monkeypatch.setenv("LAMENESS_WIN_KERNEL", "v2")
    v2 = sam_window_attention(q, k, v, rh, rw, interpret=True)
    assert np.max(np.abs(np.asarray(v1) - np.asarray(v2))) < 2e-5


def test_global_kernel_v2_matches_reference(rng):
    """Augmented-matmul global kernel == unfused dense reference,
    square and rect grids, R=1 and R=2."""
    from lameness_tpu.ops.sam_attention import sam_global_attention_v2
    d, bh = 16, 3
    for gh, gw in ((8, 8), (4, 8)):
        n = gh * gw
        q = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
        rh = jnp.asarray(
            rng.standard_normal((bh, gh, gw, gh)).astype(np.float32)) * 0.2
        rw = jnp.asarray(
            rng.standard_normal((bh, gh, gw, gw)).astype(np.float32)) * 0.2
        ref = sam_attention_reference(q, k, v, rh, rw)
        for r in (1, 2):
            got = sam_global_attention_v2(q, k, v, rh, rw, interpret=True,
                                          rows_per_program=r)
            err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
            assert err < 2e-5, (gh, gw, r, err)


def test_global_kernel_v4_matches_reference(rng):
    """Software-pipelined two-half global kernel == dense reference
    (square and rect grids, both block sizes).  v4 folds 1/sum into the
    PV output, so tolerance covers the divide-after-accumulate delta."""
    from lameness_tpu.ops.sam_attention import sam_global_attention_v4
    d, bh = 16, 3
    for gh, gw in ((8, 8), (4, 8)):
        n = gh * gw
        q = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((bh, n, d)).astype(np.float32))
        rh = jnp.asarray(
            rng.standard_normal((bh, gh, gw, gh)).astype(np.float32)) * 0.2
        rw = jnp.asarray(
            rng.standard_normal((bh, gh, gw, gw)).astype(np.float32)) * 0.2
        ref = sam_attention_reference(q, k, v, rh, rw)
        for r in (1, 2):
            got = sam_global_attention_v4(q, k, v, rh, rw, interpret=True,
                                          rows_per_block=r)
            err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
            assert err < 2e-5, (gh, gw, r, err)


def test_window_kernel_v3_matches_reference(rng):
    """Head-interleaved transpose-free window kernel == dense reference,
    including the head-last rel-table projection."""
    from lameness_tpu.ops.sam_attention import (project_rel_tables,
                                                project_rel_tables_hl,
                                                sam_window_attention_v3)
    win, hd, bw, nh = 4, 16, 3, 2
    n = win * win
    q4 = jnp.asarray(rng.standard_normal((bw, n, nh, hd)).astype(np.float32))
    k4 = jnp.asarray(rng.standard_normal((bw, n, nh, hd)).astype(np.float32))
    v4 = jnp.asarray(rng.standard_normal((bw, n, nh, hd)).astype(np.float32))
    rel_h = jnp.asarray(
        rng.standard_normal((2 * win - 1, hd)).astype(np.float32)) * 0.2
    rel_w = jnp.asarray(
        rng.standard_normal((2 * win - 1, hd)).astype(np.float32)) * 0.2

    # head-last projection must match the head-major one
    rh4, rw4 = project_rel_tables_hl(q4, rel_h, rel_w, win)
    qf = q4.transpose(0, 2, 1, 3).reshape(bw * nh, n, hd)
    rh_ref, rw_ref = project_rel_tables(qf, rel_h, rel_w, win)
    assert np.allclose(
        np.asarray(rh4.transpose(0, 2, 1, 3)),
        np.asarray(rh_ref.reshape(bw, nh, win, win, win)
                   ).reshape(bw, nh, n, win), atol=1e-5)
    assert np.allclose(
        np.asarray(rw4.transpose(0, 2, 1, 3)),
        np.asarray(rw_ref.reshape(bw, nh, win, win, win)
                   ).reshape(bw, nh, n, win), atol=1e-5)

    bias = (rh4[..., :, None] + rw4[..., None, :]
            ).transpose(0, 2, 1, 3, 4).reshape(bw, nh, n, n)
    s = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) * (hd ** -0.5) + bias
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), v4)
    ref = np.asarray(ref).reshape(bw, n, nh * hd)
    for wpp in (1, 3):
        got = sam_window_attention_v3(q4, k4, v4, rh4, rw4, interpret=True,
                                      windows_per_program=wpp)
        assert np.max(np.abs(np.asarray(got) - ref)) < 2e-5, wpp

    # v5 (software-pipelined head loop, folded denominator) == same ref
    from lameness_tpu.ops.sam_attention import sam_window_attention_v5
    for wpp in (1, 3):
        got = sam_window_attention_v5(q4, k4, v4, rh4, rw4, interpret=True,
                                      windows_per_program=wpp)
        assert np.max(np.abs(np.asarray(got) - ref)) < 2e-5, ("v5", wpp)


def test_vision_attention_v3_env_parity(rng, monkeypatch):
    """VisionAttention windowed path: v3 env routing == unfused module."""
    from lameness_tpu.models.sam import VisionAttention
    g, dim, heads = 4, 32, 4         # g == window grid (h == w == sh)
    x = jnp.asarray(rng.standard_normal((2, g, g, dim)).astype(np.float32))
    ref_mod = VisionAttention(dim, heads, (g, g), fused=False)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(1).standard_normal(
            a.shape).astype(a.dtype) if a.ndim == 2 else a, params)
    ref = ref_mod.apply(params, x)
    monkeypatch.setenv("LAMENESS_WIN_KERNEL", "v3")
    got_mod = VisionAttention(dim, heads, (g, g), fused=True)
    got = got_mod.apply(params, x)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 2e-5


def test_global_kernel_v3_matches_reference(rng):
    """Head-last transpose-free global kernel == dense reference,
    square and rect grids."""
    from lameness_tpu.ops.sam_attention import (project_rel_tables_hl,
                                                sam_global_attention_v3)
    hd, b, nh = 16, 2, 2
    for gh, gw in ((8, 8), (4, 8)):
        n = gh * gw
        q4 = jnp.asarray(
            rng.standard_normal((b, n, nh, hd)).astype(np.float32))
        k4 = jnp.asarray(
            rng.standard_normal((b, n, nh, hd)).astype(np.float32))
        v4 = jnp.asarray(
            rng.standard_normal((b, n, nh, hd)).astype(np.float32))
        rel_h = jnp.asarray(
            rng.standard_normal((2 * gh - 1, hd)).astype(np.float32)) * 0.2
        rel_w = jnp.asarray(
            rng.standard_normal((2 * gw - 1, hd)).astype(np.float32)) * 0.2
        rh4, rw4 = project_rel_tables_hl(q4, rel_h, rel_w, gh, gw)
        bias = (rh4[..., :, None] + rw4[..., None, :]
                ).transpose(0, 2, 1, 3, 4).reshape(b, nh, n, n)
        s = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) * (hd ** -0.5) + bias
        ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), v4)
        ref = np.asarray(ref).reshape(b, n, nh * hd)
        for r in (1, 2):
            got = sam_global_attention_v3(q4, k4, v4, rh4, rw4,
                                          interpret=True,
                                          rows_per_program=r)
            err = np.max(np.abs(np.asarray(got) - ref))
            assert err < 2e-5, (gh, gw, r, err)


def test_vision_attention_global_v3_env_parity(rng, monkeypatch):
    """VisionAttention global path: v3 env routing == unfused module."""
    from lameness_tpu.models.sam import VisionAttention
    g, dim, heads = 8, 32, 4
    x = jnp.asarray(rng.standard_normal((2, g, g, dim)).astype(np.float32))
    ref_mod = VisionAttention(dim, heads, (g, g), fused=False)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(1).standard_normal(
            a.shape).astype(a.dtype) if a.ndim == 2 else a, params)
    ref = ref_mod.apply(params, x)
    monkeypatch.setenv("LAMENESS_GLB_KERNEL", "v3")
    got = VisionAttention(dim, heads, (g, g), fused=True).apply(params, x)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 2e-5


# ---------------------------------------------------------------------------
# vit_h head_dim 80 (VERDICT r3 item 1): the kernels' packing assumptions
# outside their tuned d=64 shape
# ---------------------------------------------------------------------------
def test_window_kernel_v3_hd80_real_window(rng):
    """Head-last window kernel at vit_h geometry: hd=80, win=14 packs
    hd + 2*win = 108 <= 128 lanes — parity vs the dense reference at the
    REAL window size (196 tokens)."""
    from lameness_tpu.ops.sam_attention import (project_rel_tables_hl,
                                                sam_window_attention_v3,
                                                sam_window_attention_v5)
    win, hd, bw, nh = 14, 80, 2, 2
    n = win * win
    q4 = jnp.asarray(rng.standard_normal((bw, n, nh, hd)).astype(np.float32))
    k4 = jnp.asarray(rng.standard_normal((bw, n, nh, hd)).astype(np.float32))
    v4 = jnp.asarray(rng.standard_normal((bw, n, nh, hd)).astype(np.float32))
    rel_h = jnp.asarray(
        rng.standard_normal((2 * win - 1, hd)).astype(np.float32)) * 0.2
    rel_w = jnp.asarray(
        rng.standard_normal((2 * win - 1, hd)).astype(np.float32)) * 0.2
    rh4, rw4 = project_rel_tables_hl(q4, rel_h, rel_w, win)
    bias = (rh4[..., :, None] + rw4[..., None, :]
            ).transpose(0, 2, 1, 3, 4).reshape(bw, nh, n, n)
    s = jnp.einsum("bqhd,bkhd->bhqk", q4, k4) * (hd ** -0.5) + bias
    ref = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, -1), v4)
    ref = np.asarray(ref).reshape(bw, n, nh * hd)
    got = sam_window_attention_v3(q4, k4, v4, rh4, rw4, interpret=True)
    assert np.max(np.abs(np.asarray(got) - ref)) < 3e-5
    got5 = sam_window_attention_v5(q4, k4, v4, rh4, rw4, interpret=True)
    assert np.max(np.abs(np.asarray(got5) - ref)) < 3e-5


def test_global_kernels_hd80(rng):
    """v1/v2/v4 global kernels at head_dim 80 (augmented K = 80 + GH
    exceeds one MXU tile — functional parity must hold regardless)."""
    from lameness_tpu.ops.sam_attention import (
        project_rel_tables, sam_global_attention_v2,
        sam_global_attention_v4, sam_global_attention)
    gh = gw = 8
    hd, bh = 80, 3
    n = gh * gw
    q = jnp.asarray(rng.standard_normal((bh, n, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((bh, n, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((bh, n, hd)).astype(np.float32))
    rel_h = jnp.asarray(
        rng.standard_normal((2 * gh - 1, hd)).astype(np.float32)) * 0.2
    rel_w = jnp.asarray(
        rng.standard_normal((2 * gw - 1, hd)).astype(np.float32)) * 0.2
    rh, rw = project_rel_tables(q, rel_h, rel_w, gh, gw)
    ref = np.asarray(sam_attention_reference(q, k, v, rh, rw))
    for name, got in [
        ("v2", sam_global_attention_v2(q, k, v, rh, rw, interpret=True)),
        ("v4", sam_global_attention_v4(q, k, v, rh, rw, interpret=True)),
        ("dispatch", sam_global_attention(q, k, v, rh, rw, interpret=True)),
    ]:
        assert np.max(np.abs(np.asarray(got) - ref)) < 3e-5, name


def test_vision_attention_hd80_window_parity(rng, monkeypatch):
    """VisionAttention at head_dim 80 (vit_h): the default head-last v3
    window route == unfused module on the real 14x14 window."""
    from lameness_tpu.models.sam import VisionAttention
    g, heads = 14, 2
    dim = 80 * heads
    x = jnp.asarray(rng.standard_normal((2, g, g, dim)).astype(np.float32))
    ref_mod = VisionAttention(dim, heads, (g, g), fused=False)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(1).standard_normal(
            a.shape).astype(a.dtype) if a.ndim == 2 else a, params)
    ref = ref_mod.apply(params, x)
    monkeypatch.delenv("LAMENESS_WIN_KERNEL", raising=False)
    got = VisionAttention(dim, heads, (g, g), fused=True).apply(params, x)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 3e-5


def test_vision_attention_lane_overflow_falls_back(rng, monkeypatch):
    """head_dim so large the head-last packing can't fit a 128-lane
    group (hd + 2*win > 128) silently falls back to the generic fused
    window kernel — still parity, no assert trip."""
    from lameness_tpu.models.sam import VisionAttention
    g, heads = 14, 1
    dim = 112                           # hd=112: 112 + 28 = 140 > 128
    x = jnp.asarray(rng.standard_normal((1, g, g, dim)).astype(np.float32))
    ref_mod = VisionAttention(dim, heads, (g, g), fused=False)
    params = ref_mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 * np.random.default_rng(1).standard_normal(
            a.shape).astype(a.dtype) if a.ndim == 2 else a, params)
    ref = ref_mod.apply(params, x)
    monkeypatch.setenv("LAMENESS_WIN_KERNEL", "v3")
    got = VisionAttention(dim, heads, (g, g), fused=True).apply(params, x)
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 3e-5

#!/usr/bin/env python
"""On-chip micro-probes for the tunnelled TPU (round-3 probe queue).

Each probe answers one question the bench artifacts left open
(docs/ROUND3.md "On-chip probe queue"); results print as one JSON line
per probe and accumulate into ``.probe_results.json`` so a wedged tunnel
mid-run still leaves the finished probes on disk.

  overlap   does host->device ``device_put`` overlap an executing
            program on the axon tunnel, and what is the per-dispatch
            RTT of a chained-jit hop?
  samprof   per-op decomposition of one windowed SAM ViT layer at the
            serving shape (b = batch x det-frames images): LN, MLP,
            window partition round-trip, fused vs unfused attention.
  pairab    staged 4-dispatch vs paired 2-dispatch full pipeline on the
            headline split-ingest config (device-resident inputs, so the
            difference isolates dispatch overhead).

Usage:
  python scripts/onchip_probes.py [overlap] [samprof] [pairab] [--small]

With no probe names, runs all three.  --small uses test geometry on CPU
(self-test of the probe code itself, not a measurement).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / ".probe_results.json"


def _emit(name: str, payload: dict) -> None:
    payload = {"probe": name, "ts": time.strftime("%H:%M:%S"), **payload}
    print(json.dumps(payload), flush=True)
    try:
        acc = json.loads(OUT.read_text()) if OUT.exists() else {}
    except Exception:
        acc = {}
    acc[name] = payload
    OUT.write_text(json.dumps(acc, indent=1))


def _sync_scalar(x) -> float:
    """Scalar readback — block_until_ready under-syncs on the tunnel."""
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jax.device_get(leaf[(0,) * leaf.ndim])))


# ---------------------------------------------------------------------------
def probe_overlap(small: bool) -> None:
    """(a) per-dispatch RTT; (b) device_put during program execution."""
    import jax
    import jax.numpy as jnp

    n = 512 if small else 4096
    reps = 8

    @jax.jit
    def hop(x):
        return x + 1.0

    @jax.jit
    def heavy(x):               # ~0.2-0.5 s of MXU work at n=4096
        for _ in range(48 if not small else 2):
            x = jnp.tanh(x @ x) * 0.5
        return x

    x = jax.device_put(jnp.ones((n, n), jnp.bfloat16))
    _sync_scalar(hop(x)); _sync_scalar(heavy(x))        # compile

    # (a) chained-dispatch RTT: k sequential hops, each consuming the last
    for k in (1, 4, 16):
        t0 = time.perf_counter()
        y = x
        for _ in range(k):
            y = hop(y)
        _sync_scalar(y)
        dt = time.perf_counter() - t0
        _emit(f"rtt_chain_{k}", {"total_s": round(dt, 4),
                                 "per_hop_ms": round(1e3 * dt / k, 2)})

    # single-dispatch readback RTT baseline
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync_scalar(hop(x))
        ts.append(time.perf_counter() - t0)
    _emit("rtt_single", {"p50_ms": round(1e3 * float(np.median(ts)), 2)})

    # (b) transfer/compute overlap: time a 64 MB put on an idle device,
    # then the same put issued while `heavy` is executing
    buf = np.ones((64, 1024, 1024), np.uint8)           # 64 MB
    t0 = time.perf_counter()
    d = jax.device_put(buf); d.block_until_ready()
    idle_s = time.perf_counter() - t0

    t_heavy0 = time.perf_counter()
    out = heavy(x)                                      # dispatch, don't wait
    t0 = time.perf_counter()
    d2 = jax.device_put(buf); d2.block_until_ready()
    busy_s = time.perf_counter() - t0
    _sync_scalar(out)
    heavy_s = time.perf_counter() - t_heavy0
    _emit("put_overlap", {
        "put_idle_s": round(idle_s, 3), "put_busy_s": round(busy_s, 3),
        "heavy_total_s": round(heavy_s, 3),
        "overlaps": bool(busy_s < idle_s * 1.5 or busy_s < heavy_s * 0.5),
        "mb_s_idle": round(64 / idle_s, 1),
        "mb_s_busy": round(64 / busy_s, 1)})


# ---------------------------------------------------------------------------
def probe_samprof(small: bool) -> None:
    """Per-op decomposition of one windowed SAM layer at serving shape."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from lameness_tpu.models.sam import (MlpBlock, VisionAttention,
                                         VisionLayer, window_partition,
                                         window_unpartition)

    dim, heads, win = 768, 12, 14
    g = 16 if small else 64                  # token grid side
    b = 4 if small else 44                   # batch x det-frames images
    dtype = jnp.float32 if small else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, g, g, dim), dtype)

    def bench_mod(name, mod, inp, **kw):
        var = jax.jit(mod.init)(key, inp, **kw)
        var = jax.tree_util.tree_map(lambda a: a.astype(dtype), var)
        fn = jax.jit(lambda v, i: mod.apply(v, i, **kw))
        _sync_scalar(fn(var, inp))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync_scalar(fn(var, inp))
            ts.append(time.perf_counter() - t0)
        _emit(name, {"p50_ms": round(1e3 * float(np.median(ts)), 2),
                     "shape": list(inp.shape), "dtype": str(dtype.__name__)})

    # full layer, fused vs unfused window attention
    for fused, tag in ((None, "auto"), (False, "unfused")):
        bench_mod(f"layer_win_{tag}",
                  VisionLayer(dim, heads, 4.0, win, (g, g), fused), x)

    # pieces
    bench_mod("ln", nn.LayerNorm(epsilon=1e-6), x)
    bench_mod("mlp", MlpBlock(dim * 4, dim), x)

    xp, padded = window_partition(x, win)
    for fused, tag in ((None, "auto"), (False, "unfused")):
        bench_mod(f"attn_win_{tag}",
                  VisionAttention(dim, heads, (win, win), fused), xp)

    # partition round-trip alone
    rt = jax.jit(lambda t: window_unpartition(
        window_partition(t, win)[0], win, padded, (g, g)))
    _sync_scalar(rt(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync_scalar(rt(x))
        ts.append(time.perf_counter() - t0)
    _emit("partition_roundtrip",
          {"p50_ms": round(1e3 * float(np.median(ts)), 2)})


# ---------------------------------------------------------------------------
def probe_pairab(small: bool) -> None:
    """staged vs pair dispatch modes, device-resident inputs."""
    import jax

    from lameness_tpu.pipeline.engine import (LamenessEngine, EngineSpec,
                                              make_test_engine)

    if small:
        eng = make_test_engine()
    else:
        from lameness_tpu.pipeline.precision import apply_engine_policy
        eng = LamenessEngine(spec=EngineSpec(
            frame_height=576, frame_width=1024,
            lo_height=360, lo_width=640))
        apply_engine_policy(eng)
    spec = eng.spec
    batch = 1 if small else 4
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (batch, spec.clip_frames, spec.frame_height,
                                   spec.frame_width, 3), dtype=np.uint8)
    dev = eng.to_device(frames)
    key = jax.random.PRNGKey(0)

    for mode in ("staged", "pair"):
        eng.warmup(batch=batch, mode=mode)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = (eng.run_paired if mode == "pair"
                   else eng.run_staged)(dev, key)
            _sync_scalar(out["tcn_probability"])
            ts.append(time.perf_counter() - t0)
        _emit(f"e2e_{mode}", {
            "p50_s_per_batch": round(float(np.median(ts)), 4),
            "p50_s_per_clip": round(float(np.median(ts)) / batch, 4),
            "batch": batch})


# ---------------------------------------------------------------------------
def probe_samstage(small: bool) -> None:
    """Where does the SAM stage actually spend its 1.0 s? prep / patch
    embed / windowed layers / global layers / neck / decoder / post,
    at real serving geometry (b·td = 44 canvases, bf16, fused kernels)."""
    import jax
    import jax.numpy as jnp
    from lameness_tpu.models import sam as sam_mod

    from lameness_tpu.models.sam import Sam, VisionLayer

    b = 2 if small else 44
    size = 256 if small else 1024
    dtype = jnp.float32 if small else jnp.bfloat16
    key = jax.random.PRNGKey(0)

    model = Sam(img_size=size)
    x = jax.random.normal(key, (b, size, size, 3), dtype)
    params = jax.jit(model.init)(key, x[:1], jnp.ones((1, 4)))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)
    boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.9, 0.6], ], dtype) * size,
                     (b, 1))

    def timed(name, fn, *args, reps=3):
        try:
            jfn = jax.jit(fn)
            out = jfn(*args)
            _sync_scalar(out)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = jfn(*args)
                _sync_scalar(out)
                ts.append(time.perf_counter() - t0)
            _emit(name, {"p50_ms": round(1e3 * float(np.median(ts)), 1)})
            return out
        except Exception as e:
            _emit(name + "_error", {"error": repr(e)[:300]})
            return None

    emb = timed("enc_full", lambda p, i: model.apply(
        p, i, method=model.encode), params, x)
    if emb is not None:
        timed("decoder", lambda p, e, bx: model.apply(
            p, e, bx, method=model.decode_boxes), params, emb, boxes)

    # single layers on the embedded token grid, reusing the encoder's own
    # trained(-shape) params for layer 0 (windowed) and 2 (global)
    g = size // 16
    dim, heads = model.encoder_dim, model.encoder_heads
    tok = jax.random.normal(key, (b, g, g, dim), dtype)
    p_enc = params["params"]["vision_encoder"]
    win_mod = VisionLayer(dim, heads, 4.0, model.window_size, (g, g),
                          model.fused_global)
    glb_mod = VisionLayer(dim, heads, 4.0, 0, (g, g), model.fused_global)
    gi = model.global_attn_indexes[0]
    timed("layer_windowed", lambda p, t: win_mod.apply(p, t),
          {"params": p_enc["layer0"]}, tok)
    timed("layer_global", lambda p, t: glb_mod.apply(p, t),
          {"params": p_enc[f"layer{gi}"]}, tok)


def probe_winvar(small: bool) -> None:
    """Window-attention kernel variants at serving shape: v1 vs v2."""
    import jax
    import jax.numpy as jnp
    from lameness_tpu.ops.sam_attention import (sam_window_attention,
                                                sam_window_attention_v2)

    win, d, nh = 14, 64, 12
    bw = 12 if small else 1100          # frames·windows (44 imgs × 25)
    n = win * win
    dtype = jnp.float32 if small else jnp.bfloat16
    interp = small
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (bw, nh, n, d), dtype)
    k = jax.random.normal(ks[1], (bw, nh, n, d), dtype)
    v = jax.random.normal(ks[2], (bw, nh, n, d), dtype)
    rh = jax.random.normal(ks[3], (bw, nh, n, win), dtype) * 0.2
    rw = jax.random.normal(ks[4], (bw, nh, n, win), dtype) * 0.2

    outs = {}

    def run(name, fn):
        try:
            jfn = jax.jit(fn)
            out = jfn(q, k, v, rh, rw)
            _sync_scalar(out)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = jfn(q, k, v, rh, rw)
                _sync_scalar(out)
                ts.append(time.perf_counter() - t0)
            outs[name] = np.asarray(out[:2]).astype(np.float32)
            _emit(name, {"p50_ms": round(1e3 * float(np.median(ts)), 2),
                         "bw": bw, "dtype": str(np.dtype(dtype).name)})
        except Exception as e:
            _emit(name + "_error", {"error": repr(e)[:300]})

    run("win_v1", lambda *a: sam_window_attention(*a, interpret=interp))
    run("win_v2_wpp1",
        lambda *a: sam_window_attention_v2(*a, interpret=interp,
                                           windows_per_program=1))
    if "win_v1" in outs:
        for name, o in outs.items():
            if name == "win_v1":
                continue
            _emit(name + "_parity", {
                "max_abs_vs_v1": float(np.max(np.abs(o - outs["win_v1"])))})

    # module level (qkv dense + rel projection + kernel + out proj) —
    # where v3's transpose-free layout actually pays
    import os as _os
    from lameness_tpu.models.sam import VisionAttention
    x = jax.random.normal(ks[0], (bw, win, win, 768), dtype)
    mod = VisionAttention(768, 12, (win, win), fused=True)
    pinit = jax.jit(mod.init)(jax.random.PRNGKey(1), x[:1])
    pinit = jax.tree_util.tree_map(lambda a: a.astype(dtype), pinit)
    mouts = {}
    for ver, wpp in (("v1", None), ("v3", None), ("v3", 2), ("v3", 4),
                     ("v3", 10), ("v5", None), ("v5", 1), ("v5", 4)):
        _os.environ["LAMENESS_WIN_KERNEL"] = ver
        if wpp is not None:
            _os.environ["LAMENESS_SAM_WPP3" if ver == "v3"
                        else "LAMENESS_SAM_WPP5"] = str(wpp)
        tag = f"attnmod_{ver}" + (f"_wpp{wpp}" if wpp else "")
        try:
            jfn = jax.jit(lambda p, t: mod.apply(p, t))
            out = jfn(pinit, x)
            _sync_scalar(out)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = jfn(pinit, x)
                _sync_scalar(out)
                ts.append(time.perf_counter() - t0)
            mouts[tag] = np.asarray(out[:2]).astype(np.float32)
            _emit(tag, {"p50_ms": round(1e3 * float(np.median(ts)), 2)})
        except Exception as e:
            _emit(f"{tag}_error", {"error": repr(e)[:300]})
        _os.environ.pop("LAMENESS_SAM_WPP3", None)
        _os.environ.pop("LAMENESS_SAM_WPP5", None)
    _os.environ.pop("LAMENESS_WIN_KERNEL", None)
    base = mouts.get("attnmod_v1")
    if base is not None:
        for tag, o in mouts.items():
            if tag != "attnmod_v1":
                _emit(tag + "_parity", {
                    "max_abs_vs_v1": float(np.max(np.abs(o - base)))})


# ---------------------------------------------------------------------------
def probe_glbvar(small: bool) -> None:
    """Global-attention kernel variants at serving shape: v1 vs v2."""
    import jax
    import jax.numpy as jnp
    from lameness_tpu.ops.sam_attention import (sam_global_attention,
                                                sam_global_attention_v2)

    d = 64
    gh = gw = 8 if small else 64
    bh = 6 if small else 528            # 44 imgs × 12 heads
    n = gh * gw
    dtype = jnp.float32 if small else jnp.bfloat16
    interp = small
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (bh, n, d), dtype)
    k = jax.random.normal(ks[1], (bh, n, d), dtype)
    v = jax.random.normal(ks[2], (bh, n, d), dtype)
    rh = jax.random.normal(ks[3], (bh, gh, gw, gh), dtype) * 0.2
    rw = jax.random.normal(ks[4], (bh, gh, gw, gw), dtype) * 0.2

    outs = {}

    def run(name, fn):
        try:
            jfn = jax.jit(fn)
            out = jfn(q, k, v, rh, rw)
            _sync_scalar(out)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = jfn(q, k, v, rh, rw)
                _sync_scalar(out)
                ts.append(time.perf_counter() - t0)
            outs[name] = np.asarray(out[:2]).astype(np.float32)
            _emit(name, {"p50_ms": round(1e3 * float(np.median(ts)), 2),
                         "bh": bh, "dtype": str(np.dtype(dtype).name)})
        except Exception as e:
            _emit(name + "_error", {"error": repr(e)[:300]})

    from lameness_tpu.ops.sam_attention import sam_global_attention_v4
    run("glb_v1", lambda *a: sam_global_attention(*a, interpret=interp))
    for r in (1, 2, 4, 8):
        run(f"glb_v2_r{r}",
            lambda *a, rr=r: sam_global_attention_v2(
                *a, interpret=interp, rows_per_program=rr))
    for r in (2, 4):
        run(f"glb_v4_r{r}",
            lambda *a, rr=r: sam_global_attention_v4(
                *a, interpret=interp, rows_per_block=rr))
    if "glb_v1" in outs:
        for name, o in outs.items():
            if name != "glb_v1":
                _emit(name + "_parity", {
                    "max_abs_vs_v1": float(np.max(np.abs(o - outs["glb_v1"])))})

    # module level: transpose-based v2 default vs head-last v3 routing
    import os as _os
    from lameness_tpu.models.sam import VisionAttention
    bi = max(1, bh // 12)
    x = jax.random.normal(ks[0], (bi, gh, gw, 768), dtype)
    mod = VisionAttention(768, 12, (gh, gw), fused=True)
    pinit = jax.jit(mod.init)(jax.random.PRNGKey(1), x[:1])
    pinit = jax.tree_util.tree_map(lambda a: a.astype(dtype), pinit)
    mouts = {}
    for ver in ("v2", "v3"):
        _os.environ["LAMENESS_GLB_KERNEL"] = ver
        try:
            jfn = jax.jit(lambda p, t: mod.apply(p, t))
            out = jfn(pinit, x)
            _sync_scalar(out)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = jfn(pinit, x)
                _sync_scalar(out)
                ts.append(time.perf_counter() - t0)
            mouts[ver] = np.asarray(out[:1]).astype(np.float32)
            _emit(f"glbmod_{ver}",
                  {"p50_ms": round(1e3 * float(np.median(ts)), 2)})
        except Exception as e:
            _emit(f"glbmod_{ver}_error", {"error": repr(e)[:300]})
    _os.environ.pop("LAMENESS_GLB_KERNEL", None)
    if len(mouts) == 2:
        _emit("glbmod_v3_parity", {
            "max_abs_vs_v2": float(np.max(np.abs(mouts["v3"]
                                                 - mouts["v2"])))})


# ---------------------------------------------------------------------------
def probe_attnover(small: bool) -> None:
    """Decompose the ~29 ms/layer VisionAttention overhead around the
    Pallas kernels: qkv dense, rel-table projection, transposes, out
    proj — at windowed serving shape (b=1100 windows, 196 tokens)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from lameness_tpu.ops.sam_attention import project_rel_tables

    dim, heads, hd, win = 768, 12, 64, 14
    b = 8 if small else 1100
    n = win * win
    dtype = jnp.float32 if small else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, n, dim), dtype)
    qf = jax.random.normal(key, (b * heads, n, hd), dtype)
    rel_h = jax.random.normal(key, (2 * win - 1, hd), dtype) * 0.2
    rel_w = jax.random.normal(key, (2 * win - 1, hd), dtype) * 0.2
    q4 = jax.random.normal(key, (b, n, heads, hd), dtype)

    def timed(name, jfn, *args, reps=5):
        try:
            out = jfn(*args)
            _sync_scalar(out)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = jfn(*args)
                _sync_scalar(out)
                ts.append(time.perf_counter() - t0)
            _emit(name, {"p50_ms": round(1e3 * float(np.median(ts)), 2)})
        except Exception as e:
            _emit(name + "_error", {"error": repr(e)[:300]})

    qkv = nn.Dense(dim * 3)
    pq = jax.jit(qkv.init)(key, x)
    pq = jax.tree_util.tree_map(lambda a: a.astype(dtype), pq)
    timed("qkv_dense", jax.jit(lambda p, t: qkv.apply(p, t)), pq, x)

    proj = nn.Dense(dim)
    pp = jax.jit(proj.init)(key, x)
    pp = jax.tree_util.tree_map(lambda a: a.astype(dtype), pp)
    timed("out_dense", jax.jit(lambda p, t: proj.apply(p, t)), pp, x)

    timed("rel_project", jax.jit(
        lambda qq: project_rel_tables(qq, rel_h, rel_w, win)), qf)

    timed("transpose_0213", jax.jit(
        lambda t: t.transpose(0, 2, 1, 3) + 0), q4)

    # full qkv split exactly as VisionAttention does it
    def qkv_split(p, t):
        y = qkv.apply(p, t).reshape(b, n, 3, heads, hd)
        return (y[:, :, 0].transpose(0, 2, 1, 3),
                y[:, :, 1].transpose(0, 2, 1, 3),
                y[:, :, 2].transpose(0, 2, 1, 3))
    timed("qkv_split_transpose", jax.jit(qkv_split), pq, x)

    # --- global-layer shapes: 44 images x 4096 tokens --------------------
    bg, g = (2, 16) if small else (44, 64)
    ng = g * g
    xg = jax.random.normal(key, (bg, ng, dim), dtype)
    qg = jax.random.normal(key, (bg * heads, ng, hd), dtype)
    relg_h = jax.random.normal(key, (2 * g - 1, hd), dtype) * 0.2
    relg_w = jax.random.normal(key, (2 * g - 1, hd), dtype) * 0.2
    q4g = jax.random.normal(key, (bg, ng, heads, hd), dtype)

    timed("g_qkv_dense", jax.jit(lambda p, t: qkv.apply(p, t)), pq, xg)
    timed("g_rel_project", jax.jit(
        lambda qq: project_rel_tables(qq, relg_h, relg_w, g)), qg)
    timed("g_transpose_0213", jax.jit(
        lambda t: t.transpose(0, 2, 1, 3) + 0), q4g)

    def qkv_split_g(p, t):
        y = qkv.apply(p, t).reshape(bg, ng, 3, heads, hd)
        return (y[:, :, 0].transpose(0, 2, 1, 3),
                y[:, :, 1].transpose(0, 2, 1, 3),
                y[:, :, 2].transpose(0, 2, 1, 3))
    timed("g_qkv_split_transpose", jax.jit(qkv_split_g), pq, xg)

    # the kernel-facing reshape (B, nH, N, D) -> (B*nH, N, D) + augment
    def g_augment(qq):
        from lameness_tpu.ops.sam_attention import project_rel_tables as prt
        rh, rw = prt(qq, relg_h, relg_w, g)
        qa = jnp.concatenate(
            [qq * 0.125, rh.reshape(qq.shape[0], ng, g).astype(qq.dtype)],
            axis=-1)
        return qa
    timed("g_augment_total", jax.jit(g_augment), qg)


# ---------------------------------------------------------------------------
def probe_streamgap(small: bool) -> None:
    """Attribute the overlap-e2e gap on the headline split config.

    The 17:08 r3 capture measured 1.93 s/batch yuv-overlap where the
    pipeline bound says max(transfer 0.78, compute 1.01) + eps — so
    ~0.9 s/batch is unattributed.  This probe times every component of
    one _e2e_yuv_overlap iteration in isolation AND the contended pair,
    so the gap is explained by recorded numbers:

      put            _yuv_put of the I420 batch, device idle
      yuv2rgb        on-device I420->RGB hop (dispatch + exec + sync)
      syncout        _sync_out on an ALREADY-complete tree (readback RTTs)
      compute        run_staged + _sync_out on resident RGB (baseline)
      compute_yuvin  same but on _jit_yuv OUTPUT arrays (dtype/layout
                     drift between the compute-only and e2e paths)
      serial_iter    put + yuv2rgb-dispatch + run_staged + _sync_out
      overlap_iter   the exact bench loop (reference measurement)
      put_contended  put in a thread while run_staged+_sync_out runs in
                     the main thread: wall + in-thread put duration —
                     if put_contended_put_s >> put_s, host->HBM bulk
                     transfer and scalar readbacks serialize on the
                     tunnel connection and 'overlap' doesn't overlap.
    """
    import threading as _th

    import jax

    sys.path.insert(0, str(REPO))
    import bench

    if small:
        jax.config.update("jax_platforms", "cpu")
        from lameness_tpu.pipeline.engine import make_test_engine
        eng = make_test_engine()
        s = eng.spec
        rng0 = np.random.default_rng(0)
        frames = rng0.integers(
            0, 255, (1, s.clip_frames, s.frame_height, s.frame_width, 3),
            dtype=np.uint8)
        batch = 2
        small_rgb = bench._pack_ingest(frames, batch, s, s.frame_width,
                                       s.frame_height)
        from lameness_tpu.video.yuv import rgb_to_i420
        yuv_np = rgb_to_i420(small_rgb)
    else:
        from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine
        from lameness_tpu.pipeline.precision import apply_engine_policy
        batch = 4
        t0 = time.time()
        spec = EngineSpec(frame_height=576, frame_width=1024)
        spec.lo_width, spec.lo_height = 640, 360
        eng = LamenessEngine(spec=spec)
        apply_engine_policy(eng)
        _emit("sg_build", {"s": round(time.time() - t0, 1)})
        frames_native = bench.load_clip_frames()
        tag, src = "1024x576+640x360", "720x1280"
        small_rgb = bench._prep_cache(
            f"ingest_{tag}_b{batch}_{src}",
            lambda: bench._pack_ingest(frames_native, batch, eng.spec,
                                       1024, 576))
        from lameness_tpu.video.yuv import rgb_to_i420
        yuv_np = bench._prep_cache(
            f"yuvingest_{tag}_b{batch}_{src}",
            lambda: ({k: rgb_to_i420(v) for k, v in small_rgb.items()}
                     if isinstance(small_rgb, dict)
                     else rgb_to_i420(small_rgb)))
    t0 = time.time()
    eng.warmup(batch=batch)
    _emit("sg_warmup", {"s": round(time.time() - t0, 1)})
    rng = jax.random.PRNGKey(0)

    _emit("sg_link", {"mb_s": bench._measure_link_mb_s()})
    nbytes = (sum(v.nbytes for v in yuv_np.values())
              if isinstance(yuv_np, dict) else yuv_np.nbytes)
    _emit("sg_batch_bytes", {"mb": round(nbytes / 2**20, 1)})

    def med(name, fn, reps=3, **extra):
        try:
            fn()                                     # warm
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            _emit(name, {"p50_s": round(float(np.median(ts)), 4), **extra})
            return float(np.median(ts))
        except Exception as e:
            _emit(name + "_error", {"error": repr(e)[:300]})
            return float("nan")

    med("sg_put", lambda: bench._yuv_put(eng, yuv_np))

    dev_yuv = bench._yuv_put(eng, yuv_np)

    def yuv2rgb():
        r = bench._yuv_to_rgb(eng, dev_yuv)
        _sync_scalar(r)
    med("sg_yuv2rgb", yuv2rgb)

    fd, _ = bench._put_tiled(small_rgb, batch)
    out = eng.run_staged(fd, rng)
    bench._sync_out(out)
    med("sg_syncout", lambda: bench._sync_out(out), reps=4)
    med("sg_compute",
        lambda: bench._sync_out(eng.run_staged(fd, rng)))
    fd_yuvin = bench._yuv_to_rgb(eng, dev_yuv)
    med("sg_compute_yuvin",
        lambda: bench._sync_out(eng.run_staged(fd_yuvin, rng)))

    def serial_iter():
        d = bench._yuv_put(eng, yuv_np)
        f = bench._yuv_to_rgb(eng, d)
        bench._sync_out(eng.run_staged(f, rng))
    med("sg_serial_iter", serial_iter)

    try:
        s_overlap = bench._e2e_yuv_overlap(eng, yuv_np, rng, 4)
        _emit("sg_overlap_iter", {"p50_s": round(s_overlap, 4)})
    except Exception as e:
        _emit("sg_overlap_iter_error", {"error": repr(e)[:300]})

    def contended():
        res = {}

        def _put():
            t0 = time.perf_counter()
            bench._yuv_put(eng, yuv_np)
            res["put_s"] = time.perf_counter() - t0
        th = _th.Thread(target=_put)
        t0 = time.perf_counter()
        th.start()
        bench._sync_out(eng.run_staged(fd, rng))
        res["compute_s"] = time.perf_counter() - t0
        th.join()
        res["wall_s"] = time.perf_counter() - t0
        return res
    try:
        contended()                                  # warm
        rs = [contended() for _ in range(3)]
        _emit("sg_put_contended", {
            k: round(float(np.median([r[k] for r in rs])), 4)
            for k in ("put_s", "compute_s", "wall_s")})
    except Exception as e:
        _emit("sg_put_contended_error", {"error": repr(e)[:300]})


def probe_loopdec(small: bool) -> None:
    """Decompose the single-thread overlap loop phase-by-phase.

    The single-thread pipelining landed (4fb76e5) on the streamgap
    conclusion, but the first on-chip capture measured 3.32 s/batch
    against a max(put 0.84, compute 0.91) + sync bound — so the
    "put streams while the previous dispatch executes" assumption
    fails somewhere on the REAL engine.  This probe times each phase
    of the exact steady-state loop per iteration:

      ld_iter      per-iteration {put, disp, sync, iter} on the real
                   split engine: put batch N+1, dispatch N+1, sync N
      ld_put_idle  _yuv_put with the device idle (baseline)
      ld_put_busy  _yuv_put issued right after an async run_staged
                   dispatch (same thread) — if busy >> idle, the
                   tunnel serializes bulk writes against execution
                   of the real program (the dummy-program overlap
                   probe was too small to show it)
      ld_sync_idle _sync_out on a complete tree (readback cost)
    """
    import jax

    sys.path.insert(0, str(REPO))
    import bench

    if small:
        jax.config.update("jax_platforms", "cpu")
        from lameness_tpu.pipeline.engine import make_test_engine
        eng = make_test_engine()
        s = eng.spec
        rng0 = np.random.default_rng(0)
        frames = rng0.integers(
            0, 255, (1, s.clip_frames, s.frame_height, s.frame_width, 3),
            dtype=np.uint8)
        batch = 2
        small_rgb = bench._pack_ingest(frames, batch, s, s.frame_width,
                                       s.frame_height)
        from lameness_tpu.video.yuv import rgb_to_i420
        yuv_np = rgb_to_i420(small_rgb)
    else:
        from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine
        from lameness_tpu.pipeline.precision import apply_engine_policy
        batch = 4
        t0 = time.time()
        spec = EngineSpec(frame_height=576, frame_width=1024)
        spec.lo_width, spec.lo_height = 640, 360
        eng = LamenessEngine(spec=spec)
        apply_engine_policy(eng)
        _emit("ld_build", {"s": round(time.time() - t0, 1)})
        frames_native = bench.load_clip_frames()
        tag, src = "1024x576+640x360", "720x1280"
        small_rgb = bench._prep_cache(
            f"ingest_{tag}_b{batch}_{src}",
            lambda: bench._pack_ingest(frames_native, batch, eng.spec,
                                       1024, 576))
        from lameness_tpu.video.yuv import rgb_to_i420
        yuv_np = bench._prep_cache(
            f"yuvingest_{tag}_b{batch}_{src}",
            lambda: ({k: rgb_to_i420(v) for k, v in small_rgb.items()}
                     if isinstance(small_rgb, dict)
                     else rgb_to_i420(small_rgb)))
    t0 = time.time()
    eng.warmup(batch=batch)
    _emit("ld_warmup", {"s": round(time.time() - t0, 1)})
    rng = jax.random.PRNGKey(0)
    _emit("ld_link", {"mb_s": bench._measure_link_mb_s()})

    # baselines, device idle
    def med(name, fn, reps=3, **extra):
        try:
            fn()
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            _emit(name, {"p50_s": round(float(np.median(ts)), 4), **extra})
            return float(np.median(ts))
        except Exception as e:
            _emit(name + "_error", {"error": repr(e)[:300]})
            return float("nan")

    med("ld_put_idle", lambda: bench._yuv_put(eng, yuv_np))
    fd0 = bench._yuv_to_rgb(eng, bench._yuv_put(eng, yuv_np))
    out0 = eng.run_staged(fd0, rng)
    bench._sync_out(out0)
    med("ld_sync_idle", lambda: bench._sync_out(out0), reps=4)
    med("ld_compute", lambda: bench._sync_out(eng.run_staged(fd0, rng)))

    # busy put: dispatch async, put from the same thread, then sync
    def busy():
        o = eng.run_staged(fd0, rng)
        t0 = time.perf_counter()
        bench._yuv_put(eng, yuv_np)
        put_s = time.perf_counter() - t0
        bench._sync_out(o)
        return put_s
    try:
        busy()
        ps = [busy() for _ in range(3)]
        _emit("ld_put_busy", {"p50_s": round(float(np.median(ps)), 4)})
    except Exception as e:
        _emit("ld_put_busy_error", {"error": repr(e)[:300]})

    # the exact steady-state loop, per-phase per-iteration
    try:
        cur = bench._yuv_to_rgb(eng, bench._yuv_put(eng, yuv_np))
        bench._sync_out(eng.run_staged(cur, rng))
        out = eng.run_staged(cur, rng)
        iters = []
        for i in range(5):
            t0 = time.perf_counter()
            d = bench._yuv_put(eng, yuv_np)
            t1 = time.perf_counter()
            out_next = eng.run_staged(bench._yuv_to_rgb(eng, d), rng)
            t2 = time.perf_counter()
            bench._sync_out(out)
            t3 = time.perf_counter()
            out = out_next
            iters.append({"put": round(t1 - t0, 3),
                          "disp": round(t2 - t1, 3),
                          "sync": round(t3 - t2, 3),
                          "iter": round(t3 - t0, 3)})
        bench._sync_out(out)
        _emit("ld_iter", {"iters": iters})
    except Exception as e:
        _emit("ld_iter_error", {"error": repr(e)[:300]})


def probe_samparts(small: bool) -> None:
    """Close the encoder accounting gap: per-layer times (v3 kernels,
    current defaults) sum to ~680 ms at b=44 but enc_full measured
    842 ms — find the missing ~160 ms.  Times patch embed, pos add,
    each distinct layer kind, neck, enc_full, and the full _sam_stage
    vs its parts (prep-normalize + encoder + decoder + unpad glue).
    """
    import jax
    import jax.numpy as jnp

    from lameness_tpu.models.sam import Sam, VisionLayer

    b = 2 if small else 44
    size = 256 if small else 1024
    dtype = jnp.float32 if small else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    model = Sam(img_size=size)
    x = jax.random.normal(key, (b, size, size, 3), dtype)
    params = jax.jit(model.init)(key, x[:1], jnp.ones((1, 4)))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, params)

    def timed(name, fn, *args, reps=3):
        try:
            jfn = jax.jit(fn)
            out = jfn(*args)
            _sync_scalar(out)
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = jfn(*args)
                _sync_scalar(out)
                ts.append(time.perf_counter() - t0)
            _emit(name, {"p50_ms": round(1e3 * float(np.median(ts)), 1)})
            return out
        except Exception as e:
            _emit(name + "_error", {"error": repr(e)[:300]})
            return None

    g = size // 16
    dim, heads = model.encoder_dim, model.encoder_heads
    p_enc = params["params"]["vision_encoder"]

    # patch embed conv alone (the 16x16/16 conv: 212 GFLOP at b=44)
    import flax.linen as nn
    conv = nn.Conv(dim, (16, 16), strides=(16, 16), padding="VALID")
    timed("sp_patch_embed", lambda p, i: conv.apply(p, i),
          {"params": p_enc["patch_embed"]}, x)

    tok = jax.random.normal(key, (b, g, g, dim), dtype)
    pos = p_enc["pos_embed"]
    timed("sp_pos_add", lambda t: t + pos, tok)

    # one layer of each kind with the CURRENT defaults (v3 kernels)
    win_mod = VisionLayer(dim, heads, 4.0, model.window_size, (g, g),
                          model.fused_global)
    glb_mod = VisionLayer(dim, heads, 4.0, 0, (g, g), model.fused_global)
    gi = model.global_attn_indexes[0]
    timed("sp_layer_windowed", lambda p, t: win_mod.apply(p, t),
          {"params": p_enc["layer0"]}, tok)
    timed("sp_layer_global", lambda p, t: glb_mod.apply(p, t),
          {"params": p_enc[f"layer{gi}"]}, tok)

    # neck alone (conv1x1 -> LN2d -> conv3x3 -> LN2d)
    from lameness_tpu.models.sam import LayerNorm2d
    c1 = nn.Conv(256, (1, 1), use_bias=False)
    ln1 = LayerNorm2d()
    c2 = nn.Conv(256, (3, 3), padding=1, use_bias=False)
    ln2 = LayerNorm2d()

    def neck(p, t):
        h = c1.apply({"params": p["neck_conv1"]}, t)
        h = ln1.apply({"params": p["neck_ln1"]}, h)
        h = c2.apply({"params": p["neck_conv2"]}, h)
        return ln2.apply({"params": p["neck_ln2"]}, h)
    timed("sp_neck", neck, p_enc, tok)

    emb = timed("sp_enc_full", lambda p, i: model.apply(
        p, i, method=model.encode), params, x)
    # pad-split path: bottom 44% of the canvas zeroed (16:9 content),
    # content_rows = 36 token rows — the serving configuration
    crows = max(1, (g * 9) // 16)
    xz = x.at[:, crows * 16:].set(0.0)
    timed("sp_enc_padsplit", lambda p, i: model.apply(
        p, i, crows, method=model.encode), params, xz)
    if emb is not None:
        boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.9, 0.6]], dtype) * size,
                         (b, 1))
        timed("sp_decoder", lambda p, e, bx: model.apply(
            p, e, bx, method=model.decode_boxes), params, emb, boxes)

    # the engine's full _sam_stage around the model (prep-normalize +
    # encode + decode + unpad + mask features): glue = stage - enc - dec
    try:
        if small:
            from lameness_tpu.pipeline.engine import make_test_engine
            eng = make_test_engine()
        else:
            from lameness_tpu.pipeline.engine import (EngineSpec,
                                                      LamenessEngine)
            from lameness_tpu.pipeline.precision import apply_engine_policy
            eng = LamenessEngine(spec=EngineSpec())
            apply_engine_policy(eng)
        s = eng.spec
        bb = 1 if small else 4
        frames = jnp.zeros(
            (bb, s.n_packed, s.frame_height, s.frame_width, 3), jnp.uint8)
        fd = jax.device_put(frames)
        boxes = eng._jit_detect(eng.params, fd)["primary_boxes"]
        timed("sp_sam_stage", lambda p, f, bx: eng._sam_stage(p, f, bx),
              eng.params, fd, boxes)
    except Exception as e:
        _emit("sp_stage_error", {"error": repr(e)[:300]})


def probe_curation(small: bool) -> None:
    """Chunked curation detector (VERDICT r3 item 4): per-frame device
    dispatch vs BatchedYoloDetector on the same frames — wall time and
    dispatch counts.  The reference curates one frame per detector call
    (clip-curation:133-167); the win here is ceil(F/chunk) dispatches.

    NOTE: yolo_detector is now jitted (one dispatch per frame), so
    dispatches_per_frame_path == n_frames is exact.  The archived
    docs/PROBE_curation_r04.txt (16.1x) predates that fix — its
    per-frame baseline ran EAGER (one remote dispatch per op), so part
    of that measured gap was eager overhead, not only batching."""
    import jax

    from lameness_tpu.models.yolo import YoloV8, init_params
    from lameness_tpu.video.curation import (BatchedYoloDetector,
                                             yolo_detector)

    size = 64 if small else 640
    n_frames = 8 if small else 60            # one curation pass per video
    h, w = (90, 160) if small else (576, 1024)
    model = YoloV8(variant="n", num_classes=80)
    params = init_params(model, jax.random.PRNGKey(0), size)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (n_frames, h, w, 3), dtype=np.uint8)

    per_frame = yolo_detector(model, params, size=size)
    batched = BatchedYoloDetector(model, params, size=size, chunk=16)

    per_frame(frames[0])                       # compile
    t0 = time.time()
    dets_pf = [per_frame(f) for f in frames]
    t_pf = time.time() - t0

    batched.detect_batch(frames[:2])           # compile the CHUNK signature
    batched.dispatches = 0                     # (n=1 compiles batch-1 only)
    t0 = time.time()
    dets_b = batched.detect_batch(frames)
    t_b = time.time() - t0

    agree = sum((a is None) == (b is None) for a, b in zip(dets_pf, dets_b))
    _emit("curation", {
        "small": small, "n_frames": n_frames,
        "per_frame_s": round(t_pf, 3), "batched_s": round(t_b, 3),
        "speedup": round(t_pf / max(t_b, 1e-9), 2),
        "dispatches_per_frame_path": n_frames,
        "dispatches_batched": batched.dispatches,
        "presence_agreement": f"{agree}/{n_frames}"})


PROBES = {"overlap": probe_overlap, "samprof": probe_samprof,
          "curation": probe_curation,
          "pairab": probe_pairab, "winvar": probe_winvar,
          "samstage": probe_samstage, "glbvar": probe_glbvar,
          "attnover": probe_attnover, "streamgap": probe_streamgap,
          "loopdec": probe_loopdec, "samparts": probe_samparts}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=[],
                    choices=[*PROBES, []], help="probes to run (default all)")
    ap.add_argument("--small", action="store_true",
                    help="CPU test geometry (validates probe code only)")
    args = ap.parse_args()
    if args.small:
        import jax
        jax.config.update("jax_platforms", "cpu")
    names = args.names or list(PROBES)
    for n in names:
        try:
            PROBES[n](args.small)
        except Exception as e:          # keep later probes alive
            _emit(n + "_error", {"error": repr(e)})


if __name__ == "__main__":
    main()

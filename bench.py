"""Benchmark harness: end-to-end fused clip pipeline on one chip.

Prints ONE JSON line:
  {"metric": "clips_per_min_per_chip", "value": N, "unit": "clips/min",
   "vs_baseline": R, ...detail...}

The reference publishes no measured numbers (BASELINE.md); the driver
target is < 1 s p50 per 5 s clip on v5e-4, i.e. 4 s/clip/chip = 15
clips/min/chip.  vs_baseline is measured clips/min/chip divided by 15, so
vs_baseline >= 1.0 meets the north-star rate on a single chip.
"""
import json
import sys
import time

import numpy as np

BASELINE_CLIPS_PER_MIN = 15.0       # 1 s p50 on 4 chips → 4 s/clip/chip


def load_clip_frames():
    """Golden canonical clip if available, else synthetic 720p frames.
    The decoded PACKED frames are cached to disk — decode of the 720p
    clip costs ~20 s of single-core CPU, which starves the bench's wall
    budget when the host is contended."""
    import pathlib
    from lameness_tpu.pipeline.engine import EngineSpec
    spec = EngineSpec()
    cache = pathlib.Path(__file__).parent / ".bench_frames.npy"
    if cache.exists():
        try:
            packed = np.load(cache)
            if packed.shape == (1, spec.n_packed, spec.frame_height,
                                spec.frame_width, 3):
                return packed
        except Exception:
            pass
    golden = pathlib.Path(
        "/root/reference/data/canonical/"
        "5c3864af-b292-43e7-a319-becb0e98c230_canonical.mp4")
    if golden.exists():
        try:
            from lameness_tpu.video.decode import VideoReader
            with VideoReader(golden) as vr:
                raw, _ = vr.read_sampled(interval=1)
            if raw.shape[0] >= 125:
                packed = np.ascontiguousarray(
                    raw[:125][None][:, spec.packed_idx])
                try:
                    # cache ONLY real footage — a cached synthetic fallback
                    # would silently poison every later bench
                    np.save(cache, packed)
                except Exception:
                    pass
                return packed
        except Exception:
            pass
    rng = np.random.default_rng(0)
    full = rng.integers(0, 255, (1, 125, 720, 1280, 3), dtype=np.uint8)
    return np.ascontiguousarray(full[:, spec.packed_idx])


def _device_watchdog(timeout_s: float = 150.0) -> None:
    """Fail fast if the accelerator can't run a trivial op (a wedged remote
    TPU tunnel otherwise hangs the whole bench)."""
    import threading
    result = {}

    def probe():
        import jax
        import jax.numpy as jnp
        x = jnp.ones((128, 128))
        result["ok"] = float((x @ x)[0, 0]) == 128.0

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not result.get("ok"):
        raise RuntimeError(
            f"device unresponsive: trivial matmul did not complete in "
            f"{timeout_s}s (backend tunnel wedged?)")


_START = time.time()
_WALL_BUDGET = 500.0


def _remaining() -> float:
    return _WALL_BUDGET - (time.time() - _START)


def _log(msg: str) -> None:
    """Timestamped progress to stderr (the tunnel wedges mid-run; the
    artifact's stderr must show where the budget went)."""
    print(f"[bench {time.time() - _START:5.0f}s] {msg}", file=sys.stderr,
          flush=True)


def _measure(engine, frames_np, batch, rng, n_runs=4):
    """Warm + time one (engine precision, batch) configuration."""
    import jax
    # pack on host first: only the 33 frames the stages consume cross the
    # host->device link (the driver path does the same)
    frames_np = engine.spec.pack_frames(frames_np)
    frames = np.repeat(frames_np, batch, axis=0) if batch > 1 else frames_np

    def run_once():
        # includes the host->HBM frame transfer (end-to-end per clip);
        # scalar readbacks from each heavy stage force real completion
        # (block_until_ready is unreliable on tunnelled backends)
        fd = jax.device_put(frames)
        out = engine.run_staged(fd, rng)
        _ = (float(out["tcn_probability"][0])
             + float(out["mask_area_frac"][0, 0])
             + float(out["embeddings"][0, 0, 0])
             + float(out["det_scores"][0, 0, 0]))
        return out

    t0 = time.time()
    _log(f"warmup start (batch={batch})")
    stage_compiles = engine.warmup(batch=batch)
    _log(f"warmup done {stage_compiles}; first run")
    out = run_once()
    compile_s = time.time() - t0
    _log(f"first run done ({compile_s:.1f}s incl warmup)")
    times = []
    for i in range(n_runs):
        t0 = time.time()
        out = run_once()
        times.append(time.time() - t0)
        _log(f"run {i + 1}/{n_runs}: {times[-1]:.2f}s")
    p50 = float(np.median(times))
    # compute-only: same runs on device-RESIDENT frames — separates TPU
    # capability from host-link bandwidth (which the tunnel throttles)
    fd = jax.device_put(frames)
    comp = []
    for i in range(n_runs):
        t0 = time.time()
        out = engine.run_staged(fd, rng)
        _ = float(out["tcn_probability"][0]) + float(out["embeddings"][0, 0, 0])
        comp.append(time.time() - t0)
    comp_p50 = float(np.median(comp))
    _log(f"compute-only p50 {comp_p50:.2f}s")
    # per-stage breakdown (one forced sync each; resident frames)
    stage_s = {}
    det = engine._jit_detect(engine.params, fd)
    for name, fn, args in (
            ("detect", engine._jit_detect, (engine.params, fd)),
            ("sam", engine._jit_sam, (engine.params, fd,
                                      det["primary_boxes"])),
            ("dino", engine._jit_dino, (engine.params, fd)),
            ("heads", engine._jit_heads, (engine.params, fd,
                                          det["primary_boxes"],
                                          det["primary_scores"], rng))):
        ts = []
        for _ in range(3):
            t0 = time.time()
            out_s = fn(*args)
            jax.tree_util.tree_leaves(out_s)[0].block_until_ready()
            ts.append(time.time() - t0)
        stage_s[name] = round(float(np.median(ts)), 3)
    _log(f"stage p50 {stage_s}")
    return {
        "p50_clip_latency_s": round(p50 / batch, 4),
        "p50_batch_latency_s": round(p50, 4),
        "clips_per_min": round(60.0 / p50 * batch, 2),
        "p50_compute_s_per_clip": round(comp_p50 / batch, 4),
        "compute_clips_per_min": round(60.0 / comp_p50 * batch, 2),
        "stage_run_p50_s": stage_s,
        "batch": batch,
        "compile_s": round(compile_s, 1),
        "stage_compiles_s": stage_compiles,
        "tcn_probability": float(out["tcn_probability"][0]),
    }


def main():
    import jax
    # persistent compilation cache: the ~3 min stage compiles amortise
    # across processes/runs
    try:
        import pathlib
        cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    _device_watchdog()
    _log("watchdog passed")
    from lameness_tpu.pipeline.engine import EngineSpec, LamenessEngine

    import os
    t0 = time.time()
    if os.environ.get("LAMENESS_BENCH_SMALL") == "1":
        # CI/self-test mode: tiny geometry exercises the identical sweep
        # code path in seconds (numbers are NOT comparable to the real
        # bench and vs_baseline is meaningless here)
        from lameness_tpu.pipeline.engine import make_test_engine
        engine = make_test_engine()
        s = engine.spec
        rng0 = np.random.default_rng(0)
        frames = rng0.integers(0, 255, (1, s.clip_frames, s.frame_height,
                                        s.frame_width, 3), dtype=np.uint8)
    else:
        frames = load_clip_frames()
        _log(f"frames loaded {frames.shape}")
        engine = LamenessEngine(spec=EngineSpec())
    build_s = time.time() - t0
    _log(f"engine built ({build_s:.1f}s)")
    # snapshot for precision restore: apply_engine_policy replaces dict
    # ENTRIES in place, so alias the entries, not the dict
    f32_params = dict(engine.params)
    f32_dtype = engine.spec.dtype
    rng = jax.random.PRNGKey(0)

    # sweep plan: env pins take precedence; otherwise measure the f32
    # batch-1 reference config first, then spend any remaining wall
    # budget on bf16 and larger batches, reporting the BEST as headline.
    env_batch = os.environ.get("LAMENESS_BENCH_BATCH")
    env_bf16 = os.environ.get("LAMENESS_BF16")
    if env_batch or env_bf16:
        plan = [(env_bf16 == "1", int(env_batch or "1"))]
    else:
        plan = [(False, 1), (True, 1), (True, 4), (False, 4)]

    def measure_driver_e2e():
        """True end-to-end through the driver on the golden clip: single
        run_feature_stages latency (decode serial before the engine), and
        process_stream amortized s/clip where background decode overlaps
        device compute (the serving batcher's default path)."""
        import pathlib
        import tempfile
        golden = pathlib.Path(
            "/root/reference/data/canonical/"
            "5c3864af-b292-43e7-a319-becb0e98c230_canonical.mp4")
        if not golden.exists():
            return None, None
        from lameness_tpu.core.config import Config
        from lameness_tpu.serve.driver import PipelineDriver
        cfg = Config.load(data_root=tempfile.mkdtemp() + "/data")
        cfg.dirs.ensure()
        drv = PipelineDriver(config=cfg, engine=engine)
        drv.run_feature_stages("warm", golden)   # warm the writers
        t0 = time.time()
        drv.run_feature_stages("bench", golden)
        single = round(time.time() - t0, 3)
        from lameness_tpu.utils.timing import TIMERS
        TIMERS.reset()
        t0 = time.time()
        drv.process_stream([(f"s{i}", golden) for i in range(2)],
                           batch_size=1)
        stream = round((time.time() - t0) / 2, 3)
        _log(f"stream timers {TIMERS.summary()}")
        return single, stream

    sweep = []
    driver_e2e = driver_stream = None
    bf16_applied = False
    for cfg_i, (bf16, batch) in enumerate(plan):
        # leave room for the runs themselves (compile ~40 s/stage cold)
        if sweep and _remaining() < 150:
            break
        try:
            if bf16 and not bf16_applied:
                from lameness_tpu.pipeline.precision import \
                    apply_engine_policy
                apply_engine_policy(engine)
                bf16_applied = True
            elif not bf16 and bf16_applied:
                engine.params = dict(f32_params)
                engine.spec.dtype = f32_dtype
                engine._build_jits()
                bf16_applied = False
            m = _measure(engine, frames, batch, rng)
            m["bf16"] = bf16
            sweep.append(m)
        except Exception as e:
            sweep.append({"bf16": bf16, "batch": batch,
                          "error": repr(e)[:200]})
        if cfg_i == 0 and "clips_per_min" in sweep[-1]:
            # capture the driver e2e secondary right after the reference
            # config — a tunnel wedge later must not cost this metric
            try:
                driver_e2e, driver_stream = measure_driver_e2e()
                _log(f"driver e2e {driver_e2e}s, stream {driver_stream}"
                     f"s/clip")
            except Exception:
                pass
    measured = [m for m in sweep if "clips_per_min" in m]
    if not measured:
        raise RuntimeError(f"no config measured: {sweep}")
    best = max(measured, key=lambda m: m["clips_per_min"])

    # 2-dispatch mode ([detect+dino] -> [sam+heads]): same computation,
    # half the per-clip dispatch round trips — measure compute-only in
    # whatever precision the sweep left installed
    pair_mode = None
    if _remaining() > 120:
        try:
            _log("pair-mode warmup")
            engine.warmup(batch=1, mode="pair")
            fdp = jax.device_put(engine.spec.pack_frames(frames))

            def pair_once():
                out = engine.run_paired(fdp, rng)
                return (float(out["tcn_probability"][0])
                        + float(out["embeddings"][0, 0, 0]))

            pair_once()
            ts = []
            for _ in range(5):
                t0 = time.time()
                pair_once()
                ts.append(time.time() - t0)
            pair_mode = {"p50_compute_s": round(float(np.median(ts)), 4),
                         "bf16": bf16_applied}
            _log(f"pair mode {pair_mode}")
        except Exception as e:
            pair_mode = {"error": repr(e)[:200]}

    result = {
        "metric": "clips_per_min_per_chip",
        "value": best["clips_per_min"],
        "unit": "clips/min",
        "vs_baseline": round(best["clips_per_min"] / BASELINE_CLIPS_PER_MIN,
                             3),
        "p50_clip_latency_s": best["p50_clip_latency_s"],
        "best_config": {"bf16": best["bf16"], "batch": best["batch"]},
        "sweep": sweep,
        "driver_e2e_s_incl_decode": driver_e2e,
        "driver_stream_s_per_clip": driver_stream,
        "pair_mode_2_dispatch": pair_mode,
        "build_s": round(build_s, 1),
        "backend": jax.default_backend(),
        "stages": "yolo+sam_vitb+dino_vitb+pose+tcn+gait "
                  "(4 staged jits, device-resident)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    # hard wall: if anything (compile RPC, device dispatch) wedges after the
    # watchdog passed, still emit a JSON line instead of hanging forever
    import signal

    def _alarm(signum, frame):
        raise TimeoutError("bench exceeded the 540s wall-clock budget")

    try:
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(540)
    except Exception:
        pass
    try:
        main()
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({"metric": "clips_per_min_per_chip", "value": 0.0,
                          "unit": "clips/min", "vs_baseline": 0.0,
                          "error": repr(e)[:300]}))
        sys.exit(1)

#!/usr/bin/env python
"""Per-stage latency profile of the fused engine (+ optional xprof trace).

Prints a table of p50/p90 wall-times per pipeline stage from the
process-wide ``StageTimers`` registry after N timed runs, and can wrap
the run in a ``jax.profiler`` trace for tensorboard/xprof (SURVEY §5.1
asks the rebuild to add exactly these hooks).

Usage:
  python scripts/profile_stages.py [--runs 5] [--trace DIR] [--small]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--trace", type=Path, help="write a jax.profiler trace")
    ap.add_argument("--small", action="store_true",
                    help="test-geometry engine (CPU-friendly)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from lameness_tpu.pipeline.engine import (LamenessEngine,
                                              make_test_engine)
    from lameness_tpu.utils.timing import TIMERS, device_trace

    engine = make_test_engine() if args.small else LamenessEngine()
    spec = engine.spec
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (1, spec.n_packed, spec.frame_height,
                                   spec.frame_width, 3), dtype=np.uint8)
    key = jax.random.PRNGKey(0)

    print("compiling...", flush=True)
    engine.warmup()
    engine.run_staged(jax.device_put(frames), key)

    for i in range(args.runs):
        t0 = time.perf_counter()
        if args.trace and i == args.runs - 1:
            with device_trace(args.trace):
                out = engine.run_staged(jax.device_put(frames), key)
                _ = float(out["tcn_probability"][0])
        else:
            with TIMERS.time("run_staged"):
                out = engine.run_staged(jax.device_put(frames), key)
                _ = float(out["tcn_probability"][0])
        print(f"run {i}: {time.perf_counter() - t0:.3f}s", flush=True)

    print(f"\n{'stage':<24}{'n':>4}{'p50 ms':>10}{'p95 ms':>10}")
    for stage, s in sorted(TIMERS.summary().items()):
        print(f"{stage:<24}{s['count']:>4}{s['p50_s'] * 1e3:>10.1f}"
              f"{s['p95_s'] * 1e3:>10.1f}")
    if args.trace:
        print(f"\nxprof trace written to {args.trace}")


if __name__ == "__main__":
    main()

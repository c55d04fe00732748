"""Stage timing + profiling hooks.

The reference's observability is print statements (SURVEY §5.1); here
every pipeline stage records wall-time into a process-wide registry that
the health API exposes, and a context manager wraps ``jax.profiler`` for
on-demand device traces.
"""
from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Any, Dict, Iterator, Optional


class StageTimers:
    """Thread-safe rolling stage timings (last N samples per stage)."""

    def __init__(self, window: int = 200):
        self._samples: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=window))
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def time(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._samples[stage].append(dt)

    def record(self, stage: str, seconds: float) -> None:
        with self._lock:
            self._samples[stage].append(seconds)

    def reset(self) -> None:
        with self._lock:
            self._samples.clear()

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np
        out = {}
        with self._lock:
            for stage, samples in self._samples.items():
                if not samples:
                    continue
                a = np.asarray(samples)
                out[stage] = {
                    "count": int(len(a)),
                    "mean_s": float(a.mean()),
                    "p50_s": float(np.median(a)),
                    "p95_s": float(np.percentile(a, 95)),
                    "last_s": float(a[-1]),
                }
        return out

    def dump(self, path: Path) -> None:
        json.dump(self.summary(), open(path, "w"), indent=2)


# process-wide registry the driver and health API share
TIMERS = StageTimers()


@contextlib.contextmanager
def device_trace(log_dir: Path) -> Iterator[None]:
    """jax.profiler trace for xprof/tensorboard (no-op if unavailable)."""
    import jax
    try:
        jax.profiler.start_trace(str(log_dir))
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

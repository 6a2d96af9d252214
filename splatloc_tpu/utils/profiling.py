"""Tracing / profiling / metrics — the auxiliary subsystem the reference
lacks entirely (SURVEY.md §5: only CUDA_LAUNCH_BLOCKING and tqdm).

- ``trace``: jax.profiler trace context manager -> Perfetto dumps
- ``Timer``: block_until_ready wall-clock timer with running stats
- ``throughput_mpix_s``: the BASELINE.json headline counter
- ``MetricsLogger``: structured jsonl metrics stream
"""
from __future__ import annotations

import contextlib
import json
import os
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in Perfetto/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device results."""

    def __init__(self, name: str = ""):
        self.name = name
        self.total = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.total += time.perf_counter() - self._t0
        self.count += 1
        return False

    def timed(self, fn, *args, **kw):
        """Run fn, block until device-ready, record the time."""
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        self.total += time.perf_counter() - t0
        self.count += 1
        return out

    @property
    def mean_ms(self) -> float:
        return 1000.0 * self.total / max(self.count, 1)

    def __repr__(self):
        return f"Timer({self.name}: {self.mean_ms:.2f} ms x {self.count})"


def throughput_mpix_s(width: int, height: int, iters: int,
                      seconds: float) -> float:
    return width * height * iters / seconds / 1e6


class MetricsLogger:
    """Append-only jsonl metrics (step, name, value, wall time)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read(self):
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

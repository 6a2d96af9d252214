"""Headline benchmark: differentiable rasterization fwd+bwd throughput.

Prints ONE json line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the full differentiable pipeline (project -> sort -> bin -> blend,
forward + backward to all Gaussian params) at 640x480 with 100k Gaussians on
whatever device JAX selects (the real TPU chip under the driver).

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md); we normalize against 100 Mpix/s fwd+bwd -- the order of
magnitude of the reference CUDA diff-gaussian-rasterization on the
consumer GPUs it ships for -- so vs_baseline=1.0 means CUDA-class speed.

Robustness: this environment's remote TPU compile takes 20s-6min and
occasionally hangs. The measurement runs in a child process; the parent
enforces a wall-clock budget (env BENCH_BUDGET_S, default 420s), kills a
hung attempt by exact PID and retries once, and always prints exactly one
JSON line (value 0.0 only if no attempt finished).
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

RESULT = "/tmp/splatloc_bench_result.json"
BASELINE_MPIXS = 100.0  # CUDA-class nominal fwd+bwd Mpix/s (see docstring)


def child(out_path: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.raster import rasterize, RasterConfig

    def log(msg):
        print(f"[bench child +{time.perf_counter() - T0:.1f}s] {msg}",
              file=sys.stderr, flush=True)

    T0 = time.perf_counter()
    H, W, N = 480, 640, 100_000
    rng = np.random.default_rng(0)
    means = np.stack([
        rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
        rng.uniform(1.0, 8.0, N)], -1).astype(np.float32)
    scales = np.exp(rng.uniform(-5.5, -3.5, (N, 3))).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.3, 0.95, N).astype(np.float32)
    colors = rng.uniform(0, 1, (N, 4)).astype(np.float32)
    target = rng.uniform(0, 1, (H, W, 4)).astype(np.float32)

    cam = Camera.create(np.eye(4, dtype=np.float32), 320.0, 320.0,
                        W / 2, H / 2, W, H)
    cfg = RasterConfig(tile_size=16, max_per_tile=1024, tile_chunk=64,
                       use_pallas=True)

    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))
    tgt = jnp.asarray(target)

    def loss_fn(means, scales, quats, opac, colors):
        out = rasterize(means, scales, quats, opac, colors, cam, cfg)
        return jnp.mean(jnp.abs(out.image - tgt)) + 0.1 * jnp.mean(out.depth)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def run(state, iters):  # iters traced -> one compile for warmup + timing
        # full fwd+bwd grad steps chained inside ONE program: an SGD-like
        # epsilon update consumes every gradient (nothing DCE-able) without
        # materially changing the scene, and the device never waits on the
        # host tunnel between iterations (as in a real jit-scanned trainer).
        def body(_, s):
            g = grad_fn(*s)
            return tuple(p - 1e-12 * gp for p, gp in zip(s, g))
        return jax.lax.fori_loop(0, iters, body, state)

    log(f"devices: {jax.devices()}; compiling fwd+bwd grad program")
    jax.block_until_ready(run(args, 1))
    log("compile done; warm")
    jax.block_until_ready(run(args, 1))

    iters = 10
    t0 = time.perf_counter()
    out = run(args, iters)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    mpix_s = H * W * iters / dt / 1e6
    log(f"{mpix_s:.2f} Mpix/s ({dt / iters * 1e3:.2f} ms/iter)")

    result = {
        "metric": "rasterize_fwd_bwd",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / BASELINE_MPIXS, 3),
    }
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f)
    os.replace(tmp, out_path)
    log("result written")


def read_result():
    try:
        with open(RESULT) as f:
            return json.load(f)
    except Exception:
        return None


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", "420"))
    deadline = time.time() + budget
    try:
        os.remove(RESULT)
    except OSError:
        pass

    result = None
    for attempt in (1, 2):
        remaining = deadline - time.time()
        if remaining < 45:
            break
        # leave room for one retry after a hung first attempt
        limit = remaining if attempt == 2 else max(remaining * 0.6, 150.0)
        print(f"[bench] attempt {attempt}, limit {limit:.0f}s",
              file=sys.stderr, flush=True)
        proc = subprocess.Popen([sys.executable, os.path.abspath(__file__),
                                 "--child", RESULT],
                                stdout=sys.stderr)
        t_start = time.time()
        while proc.poll() is None and time.time() - t_start < limit:
            if read_result() is not None:
                break
            time.sleep(2.0)
        result = read_result()
        if proc.poll() is None:
            # kill the exact child PID (never by pattern)
            try:
                proc.send_signal(signal.SIGKILL)
                proc.wait(timeout=10)
            except Exception:
                pass
        if result is not None:
            break
        print(f"[bench] attempt {attempt} produced no result "
              f"(rc={proc.poll()})", file=sys.stderr, flush=True)

    if result is None:
        result = {"metric": "rasterize_fwd_bwd", "value": 0.0,
                  "unit": "Mpix/s/chip", "vs_baseline": 0.0}
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        main()

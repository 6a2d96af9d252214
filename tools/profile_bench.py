"""Profile the headline bench program on the real chip and print the top
device ops (aggregated over several steady-state iterations).

Run: python tools/profile_bench.py  [iters]
"""
import collections
import glob
import gzip
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root
from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import rasterize, RasterConfig


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
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
    cfg = RasterConfig(use_pallas=True)
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))
    tgt = jnp.asarray(target)

    def loss_fn(means, scales, quats, opac, colors):
        out = rasterize(means, scales, quats, opac, colors, cam, cfg)
        return jnp.mean(jnp.abs(out.image - tgt)) + 0.1 * jnp.mean(out.depth)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    print("compiling...", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(step(*args))
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    jax.block_until_ready(step(*args))

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*args)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters
    print(f"steady {dt * 1e3:.2f} ms/iter -> {H * W / dt / 1e6:.2f} Mpix/s",
          flush=True)

    import shutil
    logdir = "/tmp/trace_bench_r2"
    shutil.rmtree(logdir, ignore_errors=True)   # never aggregate stale runs
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            g = step(*args)
        jax.block_until_ready(g)

    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    print("trace:", files, flush=True)
    if not files:
        return
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    events = t.get("traceEvents", [])
    # device-side complete events, aggregated by name
    durs = collections.Counter()
    counts = collections.Counter()
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    details = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            durs[e["name"]] += e.get("dur", 0)
            counts[e["name"]] += 1
            a = e.get("args", {})
            info = a.get("long_name") or a.get("hlo_op") or ""
            src_line = a.get("source_info") or ""
            if info or src_line:
                details[e["name"]] = (str(info)[:160], str(src_line)[:120])
    # drop whole-module rows (the jit_* region and per-core digit-named
    # duplicates) so the table holds real ops and `total` ~= device time
    for k in [k for k in durs if k.isdigit() or k.startswith("jit_")]:
        durs.pop(k)
        counts.pop(k, None)
    # gap analysis: sum of idle time between consecutive device ops (stalls
    # the per-op table cannot show: scalar-prefetch copy waits, scheduling)
    spans = sorted((e["ts"], e["ts"] + e.get("dur", 0)) for e in events
                   if e.get("ph") == "X" and e.get("pid") in dev_pids
                   and not (e["name"].isdigit() or e["name"].startswith("jit_")))
    gap_tot, biggest = 0.0, []
    for (s0, e0), (s1, _) in zip(spans, spans[1:]):
        g = s1 - e0
        if g > 0:
            gap_tot += g
            biggest.append((g, e0))
    biggest.sort(reverse=True)
    print(f"\n== device idle between ops: {gap_tot / 1e3 / iters:.2f} ms/iter"
          f"; top gaps (us): {[int(g) for g, _ in biggest[:8]]}")
    total = sum(durs.values())
    print(f"\n== device ops over {iters} iters "
          f"(total {total / 1e3 / iters:.2f} ms/iter)")
    for name, d in durs.most_common(70):
        det = details.get(name)
        extra = f"\n            {det[0]}  @{det[1]}" if det else ""
        print(f"{d / 1e3 / iters:9.3f} ms/iter  x{counts[name] // iters:4d}  "
              f"{name[:100]}{extra}")
    # machine-readable summary (backlog runner records the last stdout line)
    print(json.dumps({
        "tool": "profile_bench",
        "ms_per_iter": round(dt * 1e3, 2),
        "mpix_s": round(H * W / dt / 1e6, 2),
        "device_op_ms": round(total / 1e3 / iters, 2),
        "device_idle_ms": round(gap_tot / 1e3 / iters, 2),
    }), flush=True)


if __name__ == "__main__":
    main()

"""Profile the CHAINED bench program (fori_loop of fwd+bwd grad steps — the
exact shape bench.py times) and report per-iter device-op totals AND
timeline gaps. profile_bench.py dispatches one grad call per host step, so
program-boundary latency hides in the dispatch; this tool exposes what the
device does between ops INSIDE the loop — the round-2 "fusions + inter-op
gaps ~10 ms" bucket.

Run on the chip: python tools/profile_chain.py [iters]
"""
import collections
import glob
import gzip
import json
import os
import shutil
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
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
    cfg = RasterConfig(
        use_pallas=True,
        max_tiles=int(os.environ.get("PC_MAX_TILES", "6")),
        mid_k=int(os.environ.get("PC_MID_K", "4096")),
        mid_tiles=int(os.environ.get("PC_MID_TILES", "48")),
        big_k=int(os.environ.get("PC_BIG_K", "256")),
        big_tiles=int(os.environ.get("PC_BIG_TILES", "192")))
    args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))
    tgt = jnp.asarray(target)

    # mirror bench.py's probe-driven static pair cap
    import dataclasses
    from splatloc_tpu.raster import binning, pairs, project

    @jax.jit
    def probe(means, scales, quats, opac):
        proj = project.project_gaussians(means, scales, quats, cam, cfg,
                                         opacities=opac)
        order = binning.depth_sort(proj)
        return pairs.pair_need(jnp.take(proj.xy, order, axis=0),
                               jnp.take(proj.radius_xy, order, axis=0),
                               jnp.take(proj.visible, order),
                               cam.width, cam.height, cfg)

    need = int(jax.block_until_ready(probe(*args[:4])))
    T_tiles = (-(-W // cfg.tile_size)) * (-(-H // cfg.tile_size))
    cfg = dataclasses.replace(
        cfg, pair_cap_override=max(need - T_tiles * pairs.ALIGN, 128))
    print(f"probe need={need} -> pair array "
          f"{pairs.aligned_cap(cfg, N, W, H)}", flush=True)

    def loss_fn(*a):
        out = rasterize(*a, cam, cfg)
        return jnp.mean(jnp.abs(out.image - tgt)) + 0.1 * jnp.mean(out.depth)

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))

    @jax.jit
    def run(state, n):
        def body(_, s):
            g = grad_fn(*s)
            return tuple(p - 1e-12 * gp for p, gp in zip(s, g))
        return jax.lax.fori_loop(0, n, body, state)

    print("compiling...", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(run(args, 1))
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    nd = int(jax.block_until_ready(
        jax.jit(lambda *a: rasterize(*a, cam, cfg).n_dropped)(*args)))
    print(f"n_dropped={nd}", flush=True)
    assert nd == 0, f"cap experiment drops pairs: {nd}"
    jax.block_until_ready(run(args, 1))

    t0 = time.perf_counter()
    jax.block_until_ready(run(args, iters))
    dt = (time.perf_counter() - t0) / iters
    print(f"steady {dt * 1e3:.2f} ms/iter -> {H * W / dt / 1e6:.2f} Mpix/s",
          flush=True)

    logdir = "/tmp/trace_chain"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        jax.block_until_ready(run(args, iters))

    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print(json.dumps({"tool": "profile_chain",
                          "ms_per_iter": round(dt * 1e3, 2),
                          "mpix_s": round(H * W / dt / 1e6, 2)}), flush=True)
        return
    with gzip.open(files[-1]) as f:
        t = json.load(f)
    events = t.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    durs, counts, details = (collections.Counter(), collections.Counter(), {})
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e["name"]
            if (name.isdigit() or name.startswith("jit_")
                    or name.startswith("while")):
                continue
            durs[name] += e.get("dur", 0)
            counts[name] += 1
            a = e.get("args", {})
            info = a.get("long_name") or a.get("hlo_op") or ""
            if info:
                details[name] = str(info)[:150]
    spans = sorted((e["ts"], e["ts"] + e.get("dur", 0)) for e in events
                   if e.get("ph") == "X" and e.get("pid") in dev_pids
                   and not (e["name"].isdigit() or e["name"].startswith("jit_")
                            or e["name"].startswith("while")))
    # merge overlapping spans, then gaps = silence on the device timeline
    merged = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    gap_tot, biggest = 0.0, []
    for (s0, e0), (s1, _) in zip(merged, merged[1:]):
        g = s1 - e0
        gap_tot += g
        biggest.append((g, e0))
    biggest.sort(reverse=True)
    total = sum(durs.values())
    print(f"\n== device busy {total / 1e3 / iters:.2f} ms/iter; idle gaps "
          f"{gap_tot / 1e3 / iters:.2f} ms/iter; top gaps (us): "
          f"{[int(g) for g, _ in biggest[:10]]}", flush=True)
    # name the op just before each of the biggest gaps (what stalls on what)
    ends = sorted((e["ts"] + e.get("dur", 0), e["name"]) for e in events
                  if e.get("ph") == "X" and e.get("pid") in dev_pids
                  and not (e["name"].isdigit() or e["name"].startswith("jit_")
                           or e["name"].startswith("while")))
    import bisect
    for g, at in biggest[:6]:
        i = bisect.bisect_right([x for x, _ in ends], at) - 1
        prev = ends[i][1] if i >= 0 else "?"
        print(f"  gap {int(g)}us after {prev[:80]}")
    top_n = int(os.environ.get("PROFILE_TOP_N", "30"))
    print(f"\n== device ops over {iters} iters")
    for name, d in durs.most_common(top_n):
        det = details.get(name, "")
        extra = f"\n            {det}" if det else ""
        print(f"{d / 1e3 / iters:9.3f} ms/iter  x{counts[name] // iters:4d}  "
              f"{name[:100]}{extra}")
    print(json.dumps({
        "tool": "profile_chain",
        "ms_per_iter": round(dt * 1e3, 2),
        "mpix_s": round(H * W / dt / 1e6, 2),
        "device_busy_ms": round(total / 1e3 / iters, 2),
        "device_idle_ms": round(gap_tot / 1e3 / iters, 2),
    }), flush=True)


if __name__ == "__main__":
    main()

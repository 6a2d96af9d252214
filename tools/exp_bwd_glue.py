"""On-chip A/B of backward-glue variants on the headline bench program.

Variants (one process, sequential compiles — the tunnel compile dominates,
so only the most promising combinations run):
  base           current flags (RANK_GATHER=full, BWD_INIT=alias_zeros)
  undef_sliced   BWD_INIT=undef + RANK_GATHER=sliced (no 232 MB zeros init;
                 lane slice fused into the rank-sort gather)
  tight          pair budget from a pair_stats probe (trainer-style: the
                 smallest non-dropping cap), only if the probe says factor 2
                 fits the bench scene

Also measures per-call dispatch rate vs device time (the 20.1 ms wall vs
16.8 ms device-op gap) and cross-checks every variant's grads against base.

Run: python tools/exp_bwd_glue.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import rasterize, RasterConfig
from splatloc_tpu.raster import pallas_raster, pairs as pairs_mod

H, W, N = 480, 640, 100_000


def scene():
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
    return tuple(map(jnp.asarray, (means, scales, quats, opac, colors))), \
        jnp.asarray(target)


def build(cfg, tgt, cam):
    def loss_fn(means, scales, quats, opac, colors):
        out = rasterize(means, scales, quats, opac, colors, cam, cfg)
        return jnp.mean(jnp.abs(out.image - tgt)) + 0.1 * jnp.mean(out.depth)
    return jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))


def measure(step, args, iters=10):
    t0 = time.perf_counter()
    jax.block_until_ready(step(*args))
    compile_s = time.perf_counter() - t0
    jax.block_until_ready(step(*args))
    # dispatch rate: issue iters calls without blocking
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    t_dispatch = (time.perf_counter() - t0) / iters
    jax.block_until_ready(outs[-1])
    t_all = (time.perf_counter() - t0) / iters
    return compile_s, t_dispatch * 1e3, t_all * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    args, tgt = scene()
    cam = Camera.create(np.eye(4, dtype=np.float32), W / 2.0, W / 2.0,
                        W / 2, H / 2, W, H)
    cfg = RasterConfig(use_pallas=True)
    results = {}

    # pair_stats probe (tiny compile): what does the scene actually emit?
    from splatloc_tpu.raster import project, binning
    @jax.jit
    def probe(means, scales, quats, opac, colors):
        proj = project.project_gaussians(means, scales, quats, cam, cfg,
                                         opacities=opac)
        order = binning.depth_sort(proj)
        rect = jnp.take(jnp.stack([proj.xy[:, 0], proj.xy[:, 1],
                                   proj.radius_xy[:, 0],
                                   proj.radius_xy[:, 1],
                                   proj.visible.astype(jnp.float32)], -1),
                        order, axis=0)
        kept, ndrop, ntrunc = pairs_mod.pair_stats(
            rect[:, :2], rect[:, 2:4], rect[:, 4] > 0.5, W, H, cfg)
        return kept, ndrop, ntrunc, jnp.sum(proj.visible)
    kept, ndrop, ntrunc, nvis = map(int, jax.block_until_ready(
        probe(*args)))
    cap_al = pairs_mod.aligned_cap(cfg, N, W, H)
    print(f"probe: kept={kept} dropped={ndrop} trunc={ntrunc} "
          f"n_visible={nvis} cap_al={cap_al}", flush=True)
    results["probe"] = {"kept": kept, "dropped": ndrop, "trunc": ntrunc,
                        "n_visible": nvis, "cap_al": cap_al}

    # base
    step0 = build(cfg, tgt, cam)
    c, td, ta = measure(step0, args)
    g0 = jax.block_until_ready(step0(*args))
    print(f"base: compile {c:.0f}s dispatch {td:.2f} ms/iter "
          f"wall {ta:.2f} ms/iter -> {H*W/ta/1e3:.2f} Mpix/s", flush=True)
    results["base"] = {"compile_s": round(c, 1), "dispatch_ms": round(td, 2),
                       "ms_per_iter": round(ta, 2),
                       "mpix_s": round(H * W / ta / 1e3, 2)}

    def check(tag, g):
        worst = 0.0
        for a, b in zip(g0, g):
            na = float(jnp.linalg.norm(a))
            worst = max(worst, float(jnp.linalg.norm(a - b)) / (na + 1e-30))
        print(f"{tag}: grad rel-L2 vs base {worst:.2e}", flush=True)
        return worst

    # undef + sliced
    pallas_raster.BWD_INIT = "undef"
    pallas_raster.RANK_GATHER = "sliced"
    step1 = build(cfg, tgt, cam)
    c, td, ta = measure(step1, args)
    g1 = jax.block_until_ready(step1(*args))
    dev = check("undef_sliced", g1)
    print(f"undef_sliced: compile {c:.0f}s dispatch {td:.2f} wall {ta:.2f} "
          f"-> {H*W/ta/1e3:.2f} Mpix/s", flush=True)
    results["undef_sliced"] = {
        "compile_s": round(c, 1), "dispatch_ms": round(td, 2),
        "ms_per_iter": round(ta, 2), "mpix_s": round(H * W / ta / 1e3, 2),
        "grad_rel": dev}

    # tight pair budget (trainer-style probe pick), flags back to whichever
    # of the above won
    if results["undef_sliced"]["ms_per_iter"] > results["base"]["ms_per_iter"]:
        pallas_raster.BWD_INIT = "alias_zeros"
        pallas_raster.RANK_GATHER = "full"
    factor = max(2, int(np.ceil(kept / N)))
    if factor < cfg.pair_cap_factor:
        cfg2 = cfg.replace(pair_cap_factor=factor)
        step2 = build(cfg2, tgt, cam)
        c, td, ta = measure(step2, args)
        g2 = jax.block_until_ready(step2(*args))
        dev = check(f"tight(factor={factor})", g2)
        print(f"tight: compile {c:.0f}s dispatch {td:.2f} wall {ta:.2f} "
              f"-> {H*W/ta/1e3:.2f} Mpix/s "
              f"(cap_al {pairs_mod.aligned_cap(cfg2, N, W, H)})", flush=True)
        results["tight"] = {
            "factor": factor, "compile_s": round(c, 1),
            "dispatch_ms": round(td, 2), "ms_per_iter": round(ta, 2),
            "mpix_s": round(H * W / ta / 1e3, 2), "grad_rel": dev}

    print(json.dumps({"tool": "exp_bwd_glue", **results}), flush=True)


if __name__ == "__main__":
    main()

"""On-chip A/B: probe-driven static caps + sliced rank gather on the bench
program (follow-up to exp_bwd_glue: undef slab init REJECTED — garbage leaks
on real HBM; these variants keep the alias_zeros init).

  sliced   RANK_GATHER="sliced" only
  auto     pair_cap_override = probed exact need, visible_cap = tier above
           probed n_visible (both bit-identical by construction: no drops)
  both     the two combined (skipped unless both individually win)

Run: python tools/exp_auto_caps.py
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
from splatloc_tpu.raster import project, binning

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
    t0 = time.perf_counter()
    outs = [step(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    return compile_s, (time.perf_counter() - t0) / iters * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    args, tgt = scene()
    cam = Camera.create(np.eye(4, dtype=np.float32), W / 2.0, W / 2.0,
                        W / 2, H / 2, W, H)
    cfg = RasterConfig(use_pallas=True)
    results = {}

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
        need = pairs_mod.pair_need(rect[:, :2], rect[:, 2:4],
                                   rect[:, 4] > 0.5, W, H, cfg)
        return need, jnp.sum(proj.visible)
    need, nvis = map(int, jax.block_until_ready(probe(*args)))
    ts = cfg.tile_size
    T = (-(-W // ts)) * (-(-H // ts))
    vis_cap = min(((nvis + nvis // 8 + 127) // 128) * 128, N)
    if vis_cap % 1024 == 0:
        vis_cap += 640
    print(f"probe: need={need} n_visible={nvis} -> override={need - T*128} "
          f"visible_cap={vis_cap} (default cap_al "
          f"{pairs_mod.aligned_cap(cfg, N, W, H)})", flush=True)
    results["probe"] = {"need": need, "n_visible": nvis}

    def run(tag, cfg_v, g0=None):
        step = build(cfg_v, tgt, cam)
        c, ta = measure(step, args)
        g = jax.block_until_ready(step(*args))
        r = {"compile_s": round(c, 1), "ms_per_iter": round(ta, 2),
             "mpix_s": round(H * W / ta / 1e3, 2)}
        if g0 is not None:
            worst = max(float(jnp.linalg.norm(a - b))
                        / (float(jnp.linalg.norm(a)) + 1e-30)
                        for a, b in zip(g0, g))
            r["grad_rel"] = worst
        print(f"{tag}: {r}", flush=True)
        results[tag] = r
        return g, r

    g0, r0 = run("base", cfg)

    pallas_raster.RANK_GATHER = "sliced"
    _, r1 = run("sliced", cfg, g0)
    pallas_raster.RANK_GATHER = "full"

    cfg_auto = cfg.replace(pair_cap_override=need - T * 128,
                           visible_cap=vis_cap)
    _, r2 = run("auto", cfg_auto, g0)

    if (r1["ms_per_iter"] < r0["ms_per_iter"]
            and r2["ms_per_iter"] < r0["ms_per_iter"]):
        pallas_raster.RANK_GATHER = "sliced"
        run("both", cfg_auto, g0)
        pallas_raster.RANK_GATHER = "full"

    print(json.dumps({"tool": "exp_auto_caps", **results}), flush=True)


if __name__ == "__main__":
    main()

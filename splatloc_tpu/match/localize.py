"""Visual localization service — the reference LocalizeQuery (test.py:86-566)
rebuilt on TPU-native components.

Pipeline per query: NetVLAD retrieval (precomputed table or live) ->
SuperPoint query features (precomputed or JAX extractor) -> frustum gather of
key Gaussians in the retrieved db view + KD-snap to db keypoints -> descriptor
field decode -> Hungarian matching -> PnP+RANSAC -> optional render-loss
6-DoF pose refinement (new capability, uses the rasterizer's pose
gradients).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.core import transforms
from splatloc_tpu.core.camera import Camera
from splatloc_tpu.fields import FeatureFieldConfig, decode_jit
from splatloc_tpu.match import frustum, hungarian, pnp

REPLICA_EVAL_K = np.array([
    [640.0 / 2.0 / 0.9999999999999999, 0.0, (640 - 1.0) / 2.0],
    [0.0, 640.0 / 2.0 / 0.9999999999999999, (480 - 1.0) / 2.0],
    [0.0, 0.0, 1.0]])
SCENES12_EVAL_K = np.array([[572.0, 0, 320.0], [0, 572.0, 240.0], [0, 0, 1]])


def load_retrieval_table(path: str) -> dict:
    """netvlad_retrieval.txt: one line per query, 'query db1 db2 ...'
    (reference test.py:167-177)."""
    table = {}
    with open(path) as f:
        for line in f:
            tok = line.strip().split()
            if not tok:
                continue
            q = os.path.basename(tok[0]).split(".")[0]
            table[q] = [os.path.basename(t).split(".")[0] for t in tok[1:]]
    return table


class PrecomputedQueryFeatures:
    """Query SuperPoint features from files: {dir}/{name}.npz with
    keypoints [N,2] (u,v) and descriptors [256,N]."""

    def __init__(self, directory: str):
        self.directory = directory

    def __call__(self, name: str) -> dict:
        z = np.load(os.path.join(self.directory, f"{name}.npz"))
        return {"keypoints": z["keypoints"], "descriptors": z["descriptors"]}


class LiveQueryFeatures:
    """Query SuperPoint features extracted on the fly with the JAX
    extractor (reference extracts live via hloc, test.py:208-227)."""

    def __init__(self, sp_weights_path: str, dataset,
                 max_keypoints: int = 4096):
        from splatloc_tpu.match import superpoint
        self.params = superpoint.load_params(sp_weights_path)
        self.dataset = dataset
        self.max_keypoints = max_keypoints

    def __call__(self, name: str) -> dict:
        from splatloc_tpu.match import superpoint
        idx = self.dataset.name_to_index(name)
        rgb = self.dataset.load_image(idx)
        gray = jnp.asarray(0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                           + 0.114 * rgb[..., 2], jnp.float32)
        out = superpoint.extract(self.params, gray,
                                 max_keypoints=self.max_keypoints)
        valid = np.asarray(out["valid"])
        return {"keypoints": np.asarray(out["keypoints"])[valid],
                "descriptors": np.asarray(out["descriptors"])[:, valid]}


class Localizer:
    def __init__(self, scene, decoder_params, field_cfg: FeatureFieldConfig,
                 train_dataset, retrieval_table: dict,
                 query_features, eval_K: np.ndarray,
                 marker_thresh: float = 0.005, sim_thresh: float = 0.4,
                 subset_xyz: np.ndarray | None = None,
                 refine_with_render_loss: bool = False,
                 inlier_px: float = 12.0,
                 save_match_dir: str | None = None):
        self.scene = scene
        self.decoder_params = decoder_params
        self.field_cfg = field_cfg
        self.train_dataset = train_dataset
        self.retrieval_table = retrieval_table
        self.query_features = query_features
        self.eval_K = eval_K
        self.marker_thresh = marker_thresh
        self.sim_thresh = sim_thresh
        self.subset_xyz = subset_xyz
        self.refine_with_render_loss = refine_with_render_loss
        self.inlier_px = inlier_px
        self.save_match_dir = save_match_dir
        # host copies of the map
        alive = np.asarray(scene.alive)
        self.xyz = np.asarray(scene.xyz)[alive]
        self.marker = np.asarray(scene.marker)[alive, 0]

    # -- db-side 3D keypoints + descriptors ----------------------------

    def get_frustum_points(self, db_frame: dict):
        """Reference get_frusm_pts (test.py:247-285)."""
        ds = self.train_dataset
        if self.subset_xyz is not None:
            pts3d, pts2d = frustum.frustum_key_points(
                self.subset_xyz, None, db_frame["w2c"], ds.K,
                ds.width, ds.height, subset=True)
        else:
            pts3d, pts2d = frustum.frustum_key_points(
                self.xyz, self.marker, db_frame["w2c"], ds.K,
                ds.width, ds.height,
                db_mask=np.asarray(db_frame["sp_kp_mask"]) == 1,
                db_depth=np.asarray(db_frame["depth"]),
                c2w=db_frame["c2w"], marker_thresh=self.marker_thresh)
        if pts3d.shape[0] == 0:
            return pts3d, np.zeros((0, 256), np.float32), pts2d
        # power-of-two bucket: per-query point counts vary and every
        # distinct shape would recompile the decoder program. The
        # descriptors stay DEVICE-resident: their only consumer is the
        # device-side Hungarian similarity, and a host round-trip of the
        # [P, 256] block costs ~2 s per query on a tunnel-attached TPU.
        P = pts3d.shape[0]
        Pb = max(1024, 1 << int(np.ceil(np.log2(P))))
        pts_b = np.zeros((Pb, 3), np.float32)
        pts_b[:P] = pts3d
        feats = decode_jit(self.decoder_params, jnp.asarray(pts_b),
                           self.field_cfg)[:P]
        return pts3d, feats, pts2d

    # -- per-query ------------------------------------------------------

    def localize(self, query_frame: dict, query_name: str):
        """Returns (retrieval_result, match_result) dicts like the reference
        localize_image/match_feature (test.py:304-419)."""
        names = self.retrieval_table[query_name]
        db_index = self.train_dataset.name_to_index(names[0])
        db_frame = self.train_dataset.get_frame(db_index)

        retrieval_ret = {"r": db_frame["c2w"][:3, :3],
                         "t": db_frame["c2w"][:3, 3]}

        db_kps_3d, db_feats_3d, db_kps_2d = self.get_frustum_points(db_frame)
        if db_kps_3d.shape[0] < 5:
            return retrieval_ret, {**retrieval_ret, "success": False}

        qf = self.query_features(query_name)
        matches, sims = hungarian.hungarian_solve(
            qf["descriptors"], db_feats_3d.T, sim_thresh=self.sim_thresh)
        q2d = qf["keypoints"][matches[0]]
        p3d = db_kps_3d[matches[1]]

        ret = pnp.solve_pnp_ransac(q2d.astype(np.float32),
                                   p3d.astype(np.float32), self.eval_K,
                                   inlier_px=self.inlier_px)
        if self.save_match_dir is not None:
            # per-query 2D-3D match dump for visualization/debug
            # (reference test.py:358-368)
            match_info = {"success": bool(ret["success"]),
                          "2d": q2d, "3d": p3d}
            if ret["success"]:
                match_info["inliers"] = ret["inliers"]
            os.makedirs(self.save_match_dir, exist_ok=True)
            np.save(os.path.join(self.save_match_dir, f"{query_name}.npy"),
                    match_info)
        if not ret["success"]:
            return retrieval_ret, {**retrieval_ret, "success": False}
        match_ret = {"r": ret["r"], "t": ret["t"], "success": True,
                     "num_inliers": ret["num_inliers"]}

        if self.refine_with_render_loss and "rgb" in query_frame:
            match_ret = self.render_refine(match_ret, query_frame)
        return retrieval_ret, match_ret

    # -- render-loss 6-DoF refinement (north-star capability) -----------

    def render_refine(self, match_ret: dict, query_frame: dict,
                      iters: int = 64, lr: float = 2e-3,
                      rtol: float = 1e-4):
        """Polish the PnP pose by Adam descent of photometric render loss
        through the rasterizer's pose gradients. The whole optimization is
        ONE jitted lax.while_loop (no per-iter host round-trips) that stops
        early once the relative loss improvement falls below ``rtol``."""
        ds = self.train_dataset
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = match_ret["r"]
        c2w[:3, 3] = match_ret["t"]
        w2c0 = jnp.asarray(np.linalg.inv(c2w))
        cam0 = Camera.create(np.eye(4, dtype=np.float32), ds.fx, ds.fy,
                             ds.cx, ds.cy, ds.width, ds.height)
        gt = jnp.asarray(query_frame["rgb"], jnp.float32)
        xi, info = refine_pose(self.scene, cam0, w2c0, gt, iters=iters,
                               lr=lr, rtol=rtol)
        w2c = np.asarray(transforms.se3_exp(xi) @ w2c0)
        c2w = np.linalg.inv(w2c)
        return {**match_ret, "r": c2w[:3, :3], "t": c2w[:3, 3],
                "refined": True, "refine_iters": int(info["iters"]),
                "refine_seed_evals": int(info.get("seed_evals", 0)),
                "refine_loss": (float(info["loss0"]),
                                float(info["loss"]))}


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _pose_loss_jit(scene, camera, w2c, gt, use_pallas):
    from splatloc_tpu.raster import render
    from splatloc_tpu.raster.types import RasterConfig
    cfg = RasterConfig(use_pallas=use_pallas)
    out = render(scene, camera.replace_pose(w2c), cfg)
    return jnp.mean(jnp.abs(out["render"] - gt))


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _seed_losses_jit(scene, camera, xis, w2c0, gt, use_pallas):
    """Render loss for every seed pose in ONE dispatch: ``xis`` [S,6] se3
    perturbations of ``w2c0``, scored by a device-side lax.map (the old
    per-seed Python loop paid a ~120 ms host-tunnel sync per seed)."""
    from splatloc_tpu.raster import render
    from splatloc_tpu.raster.types import RasterConfig
    cfg = RasterConfig(use_pallas=use_pallas)

    def one(xi):
        cam = camera.replace_pose(transforms.se3_exp(xi) @ w2c0)
        out = render(scene, cam, cfg)
        return jnp.mean(jnp.abs(out["render"] - gt))

    return jax.lax.map(one, xis)


@functools.partial(jax.jit, static_argnames=("iters", "lr", "rtol",
                                             "patience", "use_pallas"))
def _refine_pose_jit(scene, camera, w2c0, gt, iters, lr, rtol, patience,
                     use_pallas):
    from splatloc_tpu.raster import render
    from splatloc_tpu.raster.types import RasterConfig
    cfg = RasterConfig(use_pallas=use_pallas)

    def loss_fn(xi):
        w2c = transforms.se3_exp(xi) @ w2c0
        out = render(scene, camera.replace_pose(w2c), cfg)
        return jnp.mean(jnp.abs(out["render"] - gt))

    vg = jax.value_and_grad(loss_fn)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def cond(state):
        i, _, _, _, _, _, _, stall = state
        return (i < iters) & (stall < patience)

    def body(state):
        i, xi, m, v, loss0, best, bxi, stall = state
        loss, g = vg(xi)                      # loss at the CURRENT xi
        loss0 = jnp.where(i == 0, loss, loss0)
        better = loss < best - rtol * jnp.abs(best)
        stall = jnp.where(better, 0.0, stall + 1.0)
        bxi = jnp.where(better, xi, bxi)
        best = jnp.where(better, loss, best)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (i + 1.0))
        vh = v / (1 - b2 ** (i + 1.0))
        xi = xi - lr * mh / (jnp.sqrt(vh) + eps)
        return i + 1, xi, m, v, loss0, best, bxi, stall

    z = jnp.zeros(6)
    # best starts LARGE-FINITE, not inf: inf - rtol*inf is nan and would
    # make the improvement test unconditionally false
    i, _, _, _, loss0, best, bxi, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0.0), z, z, z, jnp.inf, jnp.asarray(1e30), z,
         jnp.asarray(0.0)))
    return bxi, {"iters": i, "loss0": loss0, "loss": best}


def _level_cam_gt(camera, gt, s):
    """Camera + target at downscale factor s (pixel-center-correct principal
    point: centers sit at half-integers, so c' = (c + 0.5)/s - 0.5 — plain
    c/s biases the coarse objective by ~0.4 px at s=4)."""
    if s == 1:
        return camera, gt
    H, W = camera.height, camera.width
    cam_s = Camera.create(camera.w2c, camera.fx / s, camera.fy / s,
                          (camera.cx + 0.5) / s - 0.5,
                          (camera.cy + 0.5) / s - 0.5, W // s,
                          H // s, camera.znear, camera.zfar)
    gt_s = gt.reshape(H // s, s, W // s, s, gt.shape[-1]).mean((1, 3))
    return cam_s, gt_s


def refine_pose(scene, camera, w2c0, gt, iters: int = 64, lr: float = 2e-3,
                rtol: float = 1e-4, patience: int = 8,
                levels: tuple[int, ...] = (8, 4, 2, 1),
                multi_start_deg: tuple[float, ...] = (7.0, 14.0)):
    """Render-loss 6-DoF pose refinement: returns (xi [6] se3 update in the
    w2c frame, info dict with iters/loss0/loss/seed_evals — ``iters``
    counts optimizer iterations only; the one-dispatch multi-start seed
    scoring is reported separately as ``seed_evals``).

    Coarse-to-fine: each entry of ``levels`` is a downscale factor — the
    scene is re-rendered at camera/s resolution against an s x s
    average-pooled target, widening the photometric convergence basin
    (a 5deg start diverges at full resolution but converges through the
    pyramid), and the coarse iterations are ~s^2 cheaper. Per level, the
    whole optimization is one compiled lax.while_loop with Adam and
    best-so-far tracking that stops after ``patience`` consecutive
    iterations without a ``rtol`` relative improvement.

    ``multi_start_deg`` widens the ROTATIONAL basin beyond the pyramid's
    reach (~8 deg): before the pyramid, pure camera-frame pitch/yaw
    perturbations of the start pose (±deg about the camera x/y axes, which
    keep the camera center fixed) are scored by render loss at the coarsest
    level, and the pyramid starts from the best seed. The identity seed is
    always included, so a good start pose is never harmed; the
    full-resolution acceptance guard below bounds the worst case."""
    use_pallas = jax.default_backend() != "cpu"
    gt = jnp.asarray(gt, jnp.float32)
    w2c0 = jnp.asarray(w2c0, jnp.float32)
    w2c = w2c0
    H, W = camera.height, camera.width
    total_iters, loss0 = 0.0, None
    info = {}
    lvls = [s for s in levels if s == 1 or
            (W % s == 0 and H % s == 0 and min(W, H) // s >= 16)]
    degs = [d for d in multi_start_deg if d > 0]
    seed_evals = 0
    if degs and lvls:
        cam_c, gt_c = _level_cam_gt(camera, gt, lvls[0])
        seeds = np.zeros((1 + 8 * len(degs), 6), np.float32)
        for j, d in enumerate(degs):
            th = float(np.radians(d))
            for k in range(8):   # 8 compass directions in the (x, y) plane
                a = np.pi * k / 4.0
                seeds[1 + 8 * j + k, 3:5] = (th * np.cos(a),
                                             th * np.sin(a))
        losses = np.asarray(_seed_losses_jit(
            scene, cam_c, jnp.asarray(seeds), w2c0, gt_c, use_pallas))
        best = int(np.argmin(losses))
        if best != 0:
            w2c = transforms.se3_exp(jnp.asarray(seeds[best])) @ w2c0
        seed_evals = seeds.shape[0]
    for s in lvls:
        cam_s, gt_s = _level_cam_gt(camera, gt, s)
        xi, info = _refine_pose_jit(scene, cam_s, w2c, gt_s, iters, lr,
                                    rtol, patience, use_pallas)
        w2c = transforms.se3_exp(xi) @ w2c
        total_iters += float(info["iters"])
        if loss0 is None:
            loss0 = info["loss0"]
    # full-resolution acceptance guard: coarse levels optimize a slightly
    # different objective (downscale render vs pooled target) and can drift
    # when the start pose is already near-perfect — refinement must never
    # return a pose that scores worse than the start at full resolution
    l_ref = _pose_loss_jit(scene, camera, w2c, gt, use_pallas)
    l_start = _pose_loss_jit(scene, camera, w2c0, gt, use_pallas)
    if float(l_start) <= float(l_ref):
        return jnp.zeros(6), {"iters": total_iters, "loss0": l_start,
                              "loss": l_start, "seed_evals": seed_evals}
    xi_total = transforms.se3_log(w2c @ transforms.invert_se3(w2c0))
    return xi_total, {"iters": total_iters, "loss0": loss0,
                      "loss": l_ref, "seed_evals": seed_evals}

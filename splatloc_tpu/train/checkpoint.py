"""Mid-training checkpoint / resume for the mapping trainer.

The reference only persists final state (PLY + decoder ckpt, SURVEY.md §5 —
no mid-train resume anywhere). Here the FULL training state — Gaussian
pytree, Adam moments, densification stats, frame store, iteration counters,
RNG — round-trips through a single npz (host-portable, no orbax service
dependencies), giving true resume.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.scene import GaussianScene, densify, optim
from splatloc_tpu.train.mapping import FrameStore, MappingTrainer


def save(trainer: MappingTrainer, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    for k in GaussianScene.PARAM_FIELDS:
        flat[f"scene_{k}"] = np.asarray(getattr(trainer.scene, k))
    flat["scene_alive"] = np.asarray(trainer.scene.alive)
    flat["opt_step"] = np.asarray(trainer.opt_state.step)
    for k, v in trainer.opt_state.m.items():
        flat[f"m_{k}"] = np.asarray(v)
    for k, v in trainer.opt_state.v.items():
        flat[f"v_{k}"] = np.asarray(v)
    flat["stats_accum"] = np.asarray(trainer.stats.xyz_gradient_accum)
    flat["stats_denom"] = np.asarray(trainer.stats.denom)
    flat["stats_radii"] = np.asarray(trainer.stats.max_radii2d)
    fs = trainer.frames
    flat["frames_n"] = np.asarray(fs.n)
    flat["frames_rgb"] = np.asarray(fs.rgb[:fs.n])
    flat["frames_depth_mm"] = np.asarray(fs.depth_mm[:fs.n])
    flat["frames_score"] = np.asarray(fs.score[:fs.n])
    flat["frames_w2c"] = np.asarray(fs.w2c[:fs.n])
    flat["frames_exposure"] = np.asarray(fs.exposure[:fs.n])
    flat["iteration"] = np.asarray(trainer.iteration)
    # trainer.rng is a legacy uint32[2] PRNG key
    flat["rng"] = np.asarray(trainer.rng)
    np.savez_compressed(path, **flat)
    # host RNG state (bit_generator) as a side file
    import pickle
    with open(path + ".hostrng", "wb") as f:
        pickle.dump(trainer.host_rng.bit_generator.state, f)


def load(trainer: MappingTrainer, path: str) -> MappingTrainer:
    """Restore into an already-constructed trainer (same config/capacity)."""
    z = np.load(path, allow_pickle=False)
    cap = trainer.scene.capacity
    fields = {}
    for k in GaussianScene.PARAM_FIELDS:
        arr = z[f"scene_{k}"]
        assert arr.shape[0] == cap, (k, arr.shape, cap)
        fields[k] = jnp.asarray(arr)
    trainer.scene = trainer.scene.replace(
        alive=jnp.asarray(z["scene_alive"]), **fields)
    trainer.opt_state = optim.AdamState(
        step=jnp.asarray(z["opt_step"]),
        m={k: jnp.asarray(z[f"m_{k}"]) for k in GaussianScene.PARAM_FIELDS},
        v={k: jnp.asarray(z[f"v_{k}"]) for k in GaussianScene.PARAM_FIELDS})
    trainer.stats = densify.DensifyStats(
        xyz_gradient_accum=jnp.asarray(z["stats_accum"]),
        denom=jnp.asarray(z["stats_denom"]),
        max_radii2d=jnp.asarray(z["stats_radii"]))
    n = int(z["frames_n"])
    fs = trainer.frames
    fs.n = n
    fs.rgb = fs.rgb.at[:n].set(jnp.asarray(z["frames_rgb"]))
    fs.depth_mm = fs.depth_mm.at[:n].set(jnp.asarray(z["frames_depth_mm"]))
    fs.score = fs.score.at[:n].set(jnp.asarray(z["frames_score"]))
    fs.w2c = fs.w2c.at[:n].set(jnp.asarray(z["frames_w2c"]))
    fs.exposure = fs.exposure.at[:n].set(jnp.asarray(z["frames_exposure"]))
    trainer.iteration = int(z["iteration"])
    trainer.rng = jnp.asarray(z["rng"])
    import pickle
    host_path = path + ".hostrng"
    if os.path.exists(host_path):
        with open(host_path, "rb") as f:
            trainer.host_rng.bit_generator.state = pickle.load(f)
    return trainer

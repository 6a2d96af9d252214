"""Device-mesh sharding for multi-chip training and rendering.

The reference is strictly single-GPU (SURVEY.md §2.3) — this layer is new
architecture. Axes:

- ``data``  — keyframe views (data parallel): the per-view render/loss vmap
  shards across it; loss/grad reductions become psums over ICI.
- ``gauss`` — the Gaussian axis (the framework's "sequence" axis): per-
  Gaussian projection/culling/SH and the parameter/optimizer state shard
  across it; the blend stage's gathers trigger all_gathers of the (small)
  projected quantities, and the backward the matching reduce_scatters.

We express the distribution declaratively: params/frames carry NamedSharding
annotations and XLA's SPMD partitioner inserts the collectives — the
TPU-idiomatic replacement for hand-written NCCL calls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from splatloc_tpu.scene import GaussianScene, densify, optim


def make_mesh(data: int = 1, gauss: int = 1,
              devices: list | None = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * gauss
    assert len(devices) >= n, (len(devices), n)
    dev = np.asarray(devices[:n]).reshape(data, gauss)
    return Mesh(dev, axis_names=("data", "gauss"))


def scene_sharding(mesh: Mesh, scene: GaussianScene):
    """Shard every per-Gaussian leading axis over 'gauss'."""
    def spec(leaf):
        return NamedSharding(mesh, P("gauss", *([None] * (leaf.ndim - 1))))
    return jax.tree.map(spec, scene)


def frames_sharding(mesh: Mesh, frames: dict):
    def spec(leaf):
        return NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1))))
    return jax.tree.map(spec, frames)


def _put(tree, shardings):
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)


def shard_scene(mesh: Mesh, scene: GaussianScene) -> GaussianScene:
    return _put(scene, scene_sharding(mesh, scene))


def make_sharded_mapping_step(cfg, mesh: Mesh):
    """The mapping train step with mesh shardings applied.

    Scene/optimizer-state/stats shard over 'gauss'; the window of frames over
    'data'. The returned function has donate/sharding annotations baked in;
    inputs are constrained (not required) to be placed correctly.
    """
    from splatloc_tpu.train.mapping import make_mapping_step

    base = make_mapping_step(cfg).__wrapped__   # un-jitted body

    def spec_gauss(leaf):
        return NamedSharding(mesh, P("gauss", *([None] * (max(leaf.ndim, 1) - 1))))

    def spec_data(leaf):
        return NamedSharding(mesh, P("data", *([None] * (max(leaf.ndim, 1) - 1))))

    repl = NamedSharding(mesh, P())

    def step(scene, opt_state, stats, frames, it):
        scene = jax.lax.with_sharding_constraint(
            scene, jax.tree.map(spec_gauss, scene))
        frames = jax.lax.with_sharding_constraint(
            frames, jax.tree.map(spec_data, frames))
        return base(scene, opt_state, stats, frames, it)

    return jax.jit(step, out_shardings=None)

"""Adaptive density control as pure jittable programs on padded buffers.

Functional re-design of the reference densify/clone/split/prune pipeline
(gaussian_model.py:590-679) and opacity resets (:384-392). All operations have
static shapes: candidate selection uses fixed budgets (cumsum-compaction), new
Gaussians go into free slots, pruning just clears the alive mask. The
reference's Adam tensor surgery becomes optim.zero_slots on the touched rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from splatloc_tpu.core import transforms
from splatloc_tpu.scene import optim
from splatloc_tpu.scene.gaussians import GaussianScene


@struct.dataclass
class DensifyStats:
    """Running densification statistics (reference gaussian_model.py:251-253,
    677-679): accumulated screen-space gradient norm and visit counts, plus
    max screen radius."""
    xyz_gradient_accum: jax.Array   # [M]
    denom: jax.Array                # [M]
    max_radii2d: jax.Array          # [M] float (pixels)

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        z = jnp.zeros((capacity,), jnp.float32)
        return cls(xyz_gradient_accum=z, denom=z, max_radii2d=z)


def add_stats(stats: DensifyStats, means2d_grad: jax.Array, radii: jax.Array,
              width: int, height: int) -> DensifyStats:
    """Accumulate ||grad_means2D|| for visible Gaussians.

    means2d_grad is in *pixel* units; the reference accumulates the gradient
    in NDC units (pixel grad x W/2, H/2) against threshold 0.0002
    (gaussian_model.py:677-679 + CUDA backward's ndc2Pix scaling), so we
    rescale to match the calibrated threshold.
    """
    visible = radii > 0
    g = means2d_grad * jnp.array([0.5 * width, 0.5 * height])[None, :]
    norm = jnp.linalg.norm(g, axis=-1)
    return stats.replace(
        xyz_gradient_accum=stats.xyz_gradient_accum + jnp.where(visible, norm, 0.0),
        denom=stats.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(stats.max_radii2d,
                                jnp.where(visible, radii.astype(jnp.float32), 0.0)),
    )


def _select(mask: jax.Array, budget: int) -> jax.Array:
    """First ``budget`` indices where mask (in index order, like the reference
    boolean indexing); OOB sentinel = len(mask)."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask) - 1
    dst = jnp.where(mask & (pos < budget), pos, budget)
    out = jnp.full((budget + 1,), n, jnp.int32)
    out = out.at[dst].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    return out[:budget]


def _gather_params(scene: GaussianScene, idx: jax.Array) -> dict:
    """Gather param rows at idx (OOB rows give garbage but are masked by the
    caller's valid flags)."""
    cap = scene.capacity
    safe = jnp.minimum(idx, cap - 1)
    return {k: getattr(scene, k)[safe] for k in scene.PARAM_FIELDS}


def densify_and_prune(
    scene: GaussianScene,
    stats: DensifyStats,
    opt_state: optim.AdamState,
    rng: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float,
    primitive_reg: bool,
    marker_thresh: float = 0.005,
    clone_budget: int = 4096,
    split_budget: int = 4096,
):
    """Clone + split + prune (reference gaussian_model.py:657-675 order:
    clone, split(N=2, prune originals), then opacity/size prune with
    key-primitive protection). Returns (scene, stats, opt_state, info)."""
    grads = jnp.where(stats.denom > 0, stats.xyz_gradient_accum / stats.denom, 0.0)
    max_scale = jnp.max(scene.scaling_activated(), axis=-1)
    hi_grad = (grads >= max_grad) & scene.alive

    # --- clone: small gaussians copied verbatim (gaussian_model.py:632-655)
    clone_mask = hi_grad & (max_scale <= percent_dense * extent)
    clone_idx = _select(clone_mask, clone_budget)
    clone_valid = clone_idx < scene.capacity
    clone_vals = _gather_params(scene, clone_idx)

    # --- split: large gaussians -> 2 children sampled from N(0, scale),
    # rotated into world, scale shrunk by 0.8*N (gaussian_model.py:590-630)
    split_mask = hi_grad & (max_scale > percent_dense * extent)
    split_idx = _select(split_mask, split_budget)
    split_valid = split_idx < scene.capacity
    parent = _gather_params(scene, split_idx)
    std = jnp.exp(parent["scaling"])                       # [B,3]
    eps = jax.random.normal(rng, (2, split_budget, 3))
    R = transforms.quat_to_matrix(parent["rotation"])      # [B,3,3]
    child_vals = []
    for i in range(2):
        offs = jnp.einsum("bij,bj->bi", R, eps[i] * std)
        vals = dict(parent)
        vals["xyz"] = parent["xyz"] + offs
        vals["scaling"] = jnp.log(jnp.maximum(std / (0.8 * 2), 1e-12))
        child_vals.append(vals)

    # Insert clones then children; zero Adam state at the new slots.
    def insert_with_state(scene, opt_state, vals, valid):
        dst, ok = scene.slots_for(valid)
        new = {k: getattr(scene, k).at[dst].set(vals[k], mode="drop")
               for k in scene.PARAM_FIELDS}
        scene = scene.replace(alive=scene.alive.at[dst].set(True, mode="drop"),
                              **new)
        opt_state = optim.zero_slots(opt_state, dst)
        return scene, opt_state, ok

    scene, opt_state, clone_ok = insert_with_state(scene, opt_state,
                                                   clone_vals, clone_valid)
    scene, opt_state, s0_ok = insert_with_state(scene, opt_state,
                                                child_vals[0], split_valid)
    scene, opt_state, s1_ok = insert_with_state(scene, opt_state,
                                                child_vals[1], split_valid)

    # Split originals are pruned — but only parents whose children actually
    # fit (if capacity dropped the children, keep the parent).
    parents_split = jnp.zeros_like(split_mask).at[
        jnp.where(s0_ok & s1_ok, split_idx, scene.capacity)
    ].set(True, mode="drop")

    # --- prune (on the post-insert state, like the reference)
    prune = (scene.opacity_activated() < min_opacity)
    if max_screen_size is not None:
        # new slots have max_radii2d 0 in stats (stats arrays are untouched by
        # insertion; fresh slots were zeroed when previously pruned/virgin)
        big_vs = stats.max_radii2d > max_screen_size
        big_ws = jnp.max(scene.scaling_activated(), -1) > 0.1 * extent
        prune = prune | big_vs | big_ws
    if primitive_reg:
        prune = prune & (scene.marker[:, 0] <= marker_thresh)
    prune = (prune | parents_split) & scene.alive

    scene = scene.replace(alive=scene.alive & ~prune)

    # Reset running stats (reference densification_postfix zeroes them).
    stats = DensifyStats.zeros(scene.capacity)
    info = {"n_cloned": jnp.sum(clone_ok),
            "n_split": jnp.sum(s0_ok) + jnp.sum(s1_ok),
            "n_pruned": jnp.sum(prune)}
    return scene, stats, opt_state, info


def reset_opacity_nonvisible(scene: GaussianScene, opt_state: optim.AdamState,
                             visible_union: jax.Array, value: float = 0.4):
    """Reset opacity of non-visible Gaussians to ``value`` (reference
    gaussian_model.py:384-392) and clear the opacity Adam state (the
    replace_tensor_to_optimizer side effect)."""
    logit = jnp.log(value / (1.0 - value))
    new_op = jnp.where((~visible_union & scene.alive)[:, None],
                       jnp.full_like(scene.opacity, logit), scene.opacity)
    return (scene.replace(opacity=new_op), optim.zero_field(opt_state, "opacity"))

"""GaussianScene: the scene state as a padded-capacity pytree.

TPU-native redesign of the reference ``GaussianModel``
(gaussian_splatting/scene/gaussian_model.py:35-679). Instead of dynamically
sized torch Parameters plus Adam tensor surgery, the scene is a fixed-capacity
struct-of-arrays with an ``alive`` mask: densify/clone/split/prune become pure
jittable index/scatter programs with zero recompiles, and the optimizer state
keeps the same (static) shapes throughout.

Parameter semantics match the reference exactly:
- xyz [M,3]; f_dc [M,1,3], f_rest [M,R,3] SH coefficients (R=(deg+1)^2-1)
- scaling [M,3] log-scale (activation exp); rotation [M,4] quat wxyz
- opacity [M,1] logit (activation sigmoid)
- marker [M,1]: SuperPoint saliency lifted at init, carried but never receives
  gradient (detached at all uses — train_gaussians.py:224,233)
- kp_score [M,1]: learned raw logit rasterized as the 4th channel
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from splatloc_tpu.core import sh as sh_mod
from splatloc_tpu.core import transforms


@struct.dataclass
class GaussianScene:
    xyz: jax.Array         # [M,3]
    f_dc: jax.Array        # [M,1,3]
    f_rest: jax.Array      # [M,R,3]
    scaling: jax.Array     # [M,3] (log)
    rotation: jax.Array    # [M,4]
    opacity: jax.Array     # [M,1] (logit)
    marker: jax.Array      # [M,1]
    kp_score: jax.Array    # [M,1]
    alive: jax.Array       # [M] bool
    sh_degree: int = struct.field(pytree_node=False, default=0)

    # ---- constructors -------------------------------------------------

    @classmethod
    def empty(cls, capacity: int, sh_degree: int = 0) -> "GaussianScene":
        r = (sh_degree + 1) ** 2 - 1
        f32 = jnp.float32
        return cls(
            xyz=jnp.zeros((capacity, 3), f32),
            f_dc=jnp.zeros((capacity, 1, 3), f32),
            f_rest=jnp.zeros((capacity, r, 3), f32),
            scaling=jnp.full((capacity, 3), -10.0, f32),
            rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]], f32), (capacity, 1)),
            opacity=jnp.full((capacity, 1), -10.0, f32),
            marker=jnp.zeros((capacity, 1), f32),
            kp_score=jnp.zeros((capacity, 1), f32),
            alive=jnp.zeros((capacity,), bool),
            sh_degree=sh_degree,
        )

    # ---- views --------------------------------------------------------

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    def scaling_activated(self) -> jax.Array:
        return jnp.exp(self.scaling)

    def opacity_activated(self) -> jax.Array:
        return jax.nn.sigmoid(self.opacity[:, 0])

    def rotation_activated(self) -> jax.Array:
        return transforms.quat_normalize(self.rotation)

    def features(self) -> jax.Array:
        """[M, 3, (deg+1)^2] SH coefficient layout for eval_sh (the
        reference's get_features transpose, gaussian_renderer/__init__.py:85)."""
        cat = jnp.concatenate([self.f_dc, self.f_rest], axis=1)  # [M, 1+R, 3]
        return cat.swapaxes(1, 2)

    def covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        """[M,3,3] world covariance (reference get_covariance returns the
        6-vector lower triangle of the same matrix, gaussian_model.py:112-113)."""
        from splatloc_tpu.raster.project import build_cov3d
        return build_cov3d(self.scaling_activated() * scaling_modifier,
                           self.rotation)

    # ---- params split for the optimizer ------------------------------

    PARAM_FIELDS = ("xyz", "f_dc", "f_rest", "opacity", "marker", "kp_score",
                    "scaling", "rotation")

    def params(self) -> dict:
        return {k: getattr(self, k) for k in self.PARAM_FIELDS}

    def with_params(self, params: dict) -> "GaussianScene":
        return self.replace(**params)

    # ---- slot management ---------------------------------------------

    def free_slots(self, budget: int) -> jax.Array:
        """Indices of up to ``budget`` free slots (filled with capacity as an
        out-of-range sentinel for scatter mode='drop')."""
        mask = ~self.alive
        pos = jnp.cumsum(mask) - 1
        dst = jnp.where(mask & (pos < budget), pos, budget)
        slots = jnp.full((budget + 1,), self.capacity, jnp.int32)
        slots = slots.at[dst].set(jnp.arange(self.capacity, dtype=jnp.int32),
                                  mode="drop")
        return slots[:budget]

    def slots_for(self, valid_new: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Compactly assign free slots to the VALID entries of a budget-B
        batch: the r-th valid entry gets the r-th free slot, so invalid
        entries never waste slots (correct even when B > free capacity).

        Returns (dst [B] with OOB sentinel for dropped, ok [B])."""
        B = valid_new.shape[0]
        slots = self.free_slots(B)                       # [B] free slot ids
        rank = jnp.cumsum(valid_new) - 1                 # rank among valid
        entry_slot = slots[jnp.clip(rank, 0, B - 1)]
        ok = valid_new & (entry_slot < self.capacity)
        dst = jnp.where(ok, entry_slot, self.capacity)   # OOB => dropped
        return dst, ok

    def insert(self, values: dict, valid_new: jax.Array) -> "GaussianScene":
        """Scatter new Gaussians into free slots.

        values: dict of PARAM_FIELDS arrays with leading dim B (budget);
        valid_new: [B] bool. Extra points beyond free capacity are dropped.
        """
        dst, ok = self.slots_for(valid_new)
        new = {}
        for k in self.PARAM_FIELDS:
            cur = getattr(self, k)
            new[k] = cur.at[dst].set(values[k], mode="drop")
        alive = self.alive.at[dst].set(True, mode="drop")
        return self.replace(alive=alive, **new)

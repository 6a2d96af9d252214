"""Unbiased 3D descriptor field: hash-grid encoding + bias-free MLP.

Replaces the reference FeatureDecoder/FeatureNet (models/decoders.py:7-67):
position normalized into the scene bound box, hash-encoded, passed through a
``num_layers`` bias-free ReLU MLP to ``final_dim`` (256) and L2-normalized —
trained with cosine loss against the TSDF-fused SuperPoint feature cloud
(train_decoder.py:23-25,64-78).

The MLP runs in bfloat16 on the MXU with float32 accumulation.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from splatloc_tpu.fields import hashgrid


@dataclass(frozen=True)
class FeatureFieldConfig:
    bound: tuple = (((-1.0, 1.0), (-1.0, 1.0), (-1.0, 1.0)))
    voxel_sdf: float = 0.06
    num_layers: int = 4
    hidden_dim: int = 128
    final_dim: int = 256
    grid: hashgrid.HashGridConfig = None  # derived in __post_init__ if None

    @property
    def grid_config(self) -> hashgrid.HashGridConfig:
        if self.grid is not None:
            return self.grid
        lo = np.array([b[0] for b in self.bound])
        hi = np.array([b[1] for b in self.bound])
        desired = int((hi - lo).max() / self.voxel_sdf)
        return hashgrid.HashGridConfig(desired_resolution=max(desired, 16))

    @classmethod
    def from_config(cls, config: dict) -> "FeatureFieldConfig":
        dec = config["decoder"]
        return cls(bound=tuple(tuple(b) for b in config["scene"]["bound"]),
                   voxel_sdf=config["scene"]["voxel_sdf"],
                   num_layers=dec["num_layers"],
                   hidden_dim=dec["hidden_dim"],
                   final_dim=dec["final_dim"])


def init_decoder(cfg: FeatureFieldConfig, key: jax.Array) -> dict:
    gcfg = cfg.grid_config
    keys = jax.random.split(key, cfg.num_layers + 1)
    table = hashgrid.init_hashgrid(gcfg, keys[0])
    layers = []
    in_dim = gcfg.out_dim
    for l in range(cfg.num_layers):
        out_dim = cfg.final_dim if l == cfg.num_layers - 1 else cfg.hidden_dim
        # Kaiming-uniform like torch Linear default
        bound = 1.0 / np.sqrt(in_dim)
        w = jax.random.uniform(keys[l + 1], (in_dim, out_dim),
                               minval=-bound, maxval=bound, dtype=jnp.float32)
        layers.append(w)
        in_dim = out_dim
    return {"table": table, "layers": layers}


def decode(params: dict, pos: jax.Array, cfg: FeatureFieldConfig) -> jax.Array:
    """pos [B,3] world -> [B, final_dim] L2-normalized descriptors."""
    gcfg = cfg.grid_config
    lo = jnp.asarray([b[0] for b in cfg.bound], jnp.float32)
    hi = jnp.asarray([b[1] for b in cfg.bound], jnp.float32)
    pos01 = (pos - lo) / (hi - lo)
    x = hashgrid.encode(params["table"], pos01, gcfg)
    for l, w in enumerate(params["layers"]):
        x = jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if l != len(params["layers"]) - 1:
            x = jax.nn.relu(x)
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, 1e-12)


_DECODE_JIT_CACHE: dict = {}


def decode_jit(params: dict, pos: jax.Array, cfg: FeatureFieldConfig):
    """jit-compiled :func:`decode` (cached per config): ONE device dispatch
    where the eager call pays one per op — ~50x the dispatch latency on a
    remote-attached TPU (measured ~6 s/query through the axon tunnel at
    4096 query points)."""
    key = (cfg.bound, cfg.voxel_sdf, cfg.num_layers, cfg.hidden_dim,
           cfg.final_dim, repr(cfg.grid))
    fn = _DECODE_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda p, x, c=cfg: decode(p, x, c))
        _DECODE_JIT_CACHE[key] = fn
    return fn(params, pos)


def cosine_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """1 - mean cosine similarity (train_decoder.py:23-25)."""
    pn = pred / jnp.maximum(jnp.linalg.norm(pred, axis=-1, keepdims=True), 1e-12)
    gn = gt / jnp.maximum(jnp.linalg.norm(gt, axis=-1, keepdims=True), 1e-12)
    return 1.0 - jnp.mean(jnp.sum(pn * gn, axis=-1))

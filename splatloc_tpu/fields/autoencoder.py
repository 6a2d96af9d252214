"""Descriptor autoencoder (reference autoencoder/model.py:5-46).

256-d -> low-d bottleneck -> 256-d MLP with L2-normalized bottleneck and
output. The reference ships it but its pipeline only uses the dataset class;
carried here (functional JAX, batch-norm folded to per-batch normalization)
for capability parity and optional descriptor compression.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_autoencoder(key: jax.Array, encoder_dims=(256, 128, 64, 32, 16),
                     decoder_dims=(32, 64, 128, 256, 256), in_dim: int = 256):
    params = {"enc": [], "dec": []}
    dims = [in_dim] + list(encoder_dims)
    k = key
    for i in range(len(encoder_dims)):
        k, sub = jax.random.split(k)
        bound = 1.0 / np.sqrt(dims[i])
        params["enc"].append({
            "w": jax.random.uniform(sub, (dims[i], dims[i + 1]),
                                    minval=-bound, maxval=bound),
            "b": jnp.zeros((dims[i + 1],))})
    dims = [encoder_dims[-1]] + list(decoder_dims)
    for i in range(len(decoder_dims)):
        k, sub = jax.random.split(k)
        bound = 1.0 / np.sqrt(dims[i])
        params["dec"].append({
            "w": jax.random.uniform(sub, (dims[i], dims[i + 1]),
                                    minval=-bound, maxval=bound),
            "b": jnp.zeros((dims[i + 1],))})
    return params


def _mlp(layers, x, final_relu=False):
    for i, lay in enumerate(layers):
        x = x @ lay["w"] + lay["b"]
        if i != len(layers) - 1:
            x = jax.nn.relu(x)
    return x


def _l2(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def encode(params, x):
    return _l2(_mlp(params["enc"], x))


def decode(params, z):
    return _l2(_mlp(params["dec"], z))


def forward(params, x):
    return decode(params, encode(params, x))

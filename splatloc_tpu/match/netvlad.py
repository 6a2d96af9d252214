"""NetVLAD global image descriptor in JAX.

Port of hloc's NetVLAD retrieval network (the reference generates its
retrieval table with it, pre_process/gen_netvlad_retrieval.py:15-42):
VGG16 conv5 backbone -> NetVLAD pooling (64 clusters, soft assignment,
intra-normalized residual aggregation) -> optional PCA whitening to 4096-d.

Weight conversion from the public Pitts30k checkpoint via
``tools/convert_netvlad.py``; random init provided for shape/architecture
tests. Retrieval itself (``top_k_retrieval``) is one cosine-similarity
matmul — MXU food.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layers up to conv5_3 (name, out_channels); pools after blocks
_VGG = [("conv1_1", 64), ("conv1_2", 64), ("pool", 0),
        ("conv2_1", 128), ("conv2_2", 128), ("pool", 0),
        ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("pool", 0),
        ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("pool", 0),
        ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)]


def init_params(key: jax.Array, n_clusters: int = 64,
                whiten_dim: int | None = 4096) -> dict:
    params = {}
    cin = 3
    k = key
    for name, cout in _VGG:
        if name == "pool":
            continue
        k, sub = jax.random.split(k)
        params[f"{name}_w"] = jax.random.normal(
            sub, (3, 3, cin, cout), jnp.float32) * np.sqrt(2.0 / (9 * cin))
        params[f"{name}_b"] = jnp.zeros((cout,), jnp.float32)
        cin = cout
    k, s1, s2, s3 = jax.random.split(k, 4)
    params["vlad_centers"] = jax.random.normal(s1, (n_clusters, 512))
    params["vlad_assign_w"] = jax.random.normal(s2, (1, 1, 512, n_clusters)) * 0.05
    params["vlad_assign_b"] = jnp.zeros((n_clusters,))
    if whiten_dim:
        params["whiten_w"] = jax.random.normal(
            s3, (n_clusters * 512, whiten_dim)) * 0.01
        params["whiten_b"] = jnp.zeros((whiten_dim,))
    return params


def _conv(x, w, b):
    pad = w.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


@jax.jit
def global_descriptor(params: dict, image: jax.Array) -> jax.Array:
    """image [H,W,3] in [0,1] -> L2-normalized global descriptor."""
    x = image[None]
    for name, _ in _VGG:
        if name == "pool":
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        else:
            x = _conv(x, params[f"{name}_w"], params[f"{name}_b"])
            if name != "conv5_3":
                x = jax.nn.relu(x)

    feat = x[0]                                       # [h, w, 512]
    # hloc NetVLAD L2-normalizes local features before pooling
    feat = feat / jnp.maximum(jnp.linalg.norm(feat, axis=-1, keepdims=True),
                              1e-10)
    assign = _conv(feat[None], params["vlad_assign_w"],
                   params["vlad_assign_b"])[0]        # [h, w, K]
    assign = jax.nn.softmax(assign, axis=-1)

    centers = params["vlad_centers"]                  # [K, 512]
    f = feat.reshape(-1, 512)                         # [M, 512]
    a = assign.reshape(-1, centers.shape[0])          # [M, K]
    # vlad[k] = sum_m a[m,k] * (f[m] - c[k])
    vlad = jnp.einsum("mk,md->kd", a, f) - a.sum(0)[:, None] * centers
    # intra-normalization then flatten + L2
    vlad = vlad / jnp.maximum(jnp.linalg.norm(vlad, axis=-1, keepdims=True),
                              1e-10)
    v = vlad.reshape(-1)
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-10)
    if "whiten_w" in params:
        v = v @ params["whiten_w"] + params["whiten_b"]
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-10)
    return v


def top_k_retrieval(query_descs: jax.Array, db_descs: jax.Array,
                    k: int = 10):
    """Cosine top-k (descriptors already L2-normalized).
    Returns (indices [Q,k], sims [Q,k])."""
    sims = query_descs @ db_descs.T
    vals, idx = jax.lax.top_k(sims, k)
    return idx, vals


def load_params(path: str) -> dict:
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}

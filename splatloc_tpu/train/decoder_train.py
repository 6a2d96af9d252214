"""Descriptor-field training (reference train_decoder.py:27-82).

Adam betas (0.9, 0.99); the MLP group carries weight decay 1e-6, the hash
table group eps 1e-15; lr 1e-3; batch 256; cosine loss. The epoch loop is a
single jitted lax.scan over pre-shuffled batches — the torch DataLoader with
16 workers becomes one device-resident gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from splatloc_tpu.fields import FeatureFieldConfig, cosine_loss, decode


def make_optimizer(lr: float = 1e-3):
    """Per-group optimizer matching the reference param groups."""
    net = optax.chain(optax.add_decayed_weights(1e-6),
                      optax.scale_by_adam(b1=0.9, b2=0.99),
                      optax.scale(-lr))
    table = optax.chain(optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
                        optax.scale(-lr))
    return optax.multi_transform(
        {"net": net, "table": table},
        param_labels={"table": "table", "layers": "net"})


def make_train_epoch(cfg: FeatureFieldConfig, optimizer):
    @jax.jit
    def epoch_fn(params, opt_state, xyz, feats, perm):
        """One epoch over shuffled batches. xyz [N,3], feats [N,D],
        perm [B, batch] precomputed batch indices."""

        def step(carry, idx):
            params, opt_state = carry
            x = xyz[idx]
            f = feats[idx]

            def loss_fn(p):
                return cosine_loss(decode(p, x, cfg), f)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                                   perm)
        return params, opt_state, jnp.mean(losses)

    return epoch_fn


def train_decoder(cfg: FeatureFieldConfig, xyz: np.ndarray, feats: np.ndarray,
                  num_epochs: int = 41, lr: float = 1e-3, batch: int = 256,
                  seed: int = 0, log_every: int = 10, params: dict | None = None):
    """Train the field on a fused cloud; returns (params, final_loss)."""
    from splatloc_tpu.fields import init_decoder

    key = jax.random.PRNGKey(seed)
    if params is None:
        key, k = jax.random.split(key)
        params = init_decoder(cfg, k)
    optimizer = make_optimizer(lr)
    opt_state = optimizer.init(params)
    epoch_fn = make_train_epoch(cfg, optimizer)

    n = xyz.shape[0]
    batch = min(batch, n)
    n_batches = max(n // batch, 1)
    xyz_d = jnp.asarray(xyz, jnp.float32)
    feats_d = jnp.asarray(feats, jnp.float32)
    rng = np.random.default_rng(seed)
    loss = None
    for ep in range(num_epochs):
        perm = rng.permutation(n)[: n_batches * batch].reshape(n_batches, batch)
        params, opt_state, loss = epoch_fn(params, opt_state, xyz_d, feats_d,
                                           jnp.asarray(perm))
        if log_every and (ep % log_every == 0 or ep == num_epochs - 1):
            print(f"decoder epoch {ep}: cos loss {float(loss):.4f}")
    return params, float(loss)


def save_params(params: dict, path: str):
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {"table": np.asarray(params["table"])}
    for i, w in enumerate(params["layers"]):
        flat[f"layer_{i}"] = np.asarray(w)
    np.savez(path, **flat)


def load_params(path: str) -> dict:
    z = np.load(path)
    layers = []
    i = 0
    while f"layer_{i}" in z:
        layers.append(jnp.asarray(z[f"layer_{i}"]))
        i += 1
    return {"table": jnp.asarray(z["table"]), "layers": layers}

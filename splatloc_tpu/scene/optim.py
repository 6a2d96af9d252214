"""Per-group Adam for the Gaussian scene (functional, surgery-free).

The reference uses torch.optim.Adam with one param-group per field
(gaussian_model.py:250-309, eps=1e-15) and performs *tensor surgery* on the
optimizer state at every densify/prune (cat/prune/replace,
gaussian_model.py:477-551). With padded-capacity buffers the state shapes
never change; "surgery" reduces to zeroing moment rows at (re)allocated slots
— matching torch semantics where new tensors start with zero state.

The xyz learning-rate follows the reference's log-lerp schedule
(general_utils.py:79-94 ``helper``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AdamState:
    step: jax.Array          # scalar int32 (shared across groups, like torch)
    m: dict                  # field -> array
    v: dict                  # field -> array


def init(params: dict) -> AdamState:
    zeros = {k: jnp.zeros_like(p) for k, p in params.items()}
    return AdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                     v={k: jnp.zeros_like(p) for k, p in params.items()})


def update(params: dict, grads: dict, state: AdamState, lrs: dict,
           b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """One Adam step with per-group learning rates.

    lrs: field -> scalar lr (dynamic; xyz follows the schedule).
    Returns (new_params, new_state).
    """
    t = state.step + 1
    tf = t.astype(jnp.float32)
    c1 = 1.0 - b1 ** tf
    c2 = 1.0 - b2 ** tf
    new_p, new_m, new_v = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        m = b1 * state.m[k] + (1 - b1) * g
        v = b2 * state.v[k] + (1 - b2) * (g * g)
        mhat = m / c1
        vhat = v / c2
        new_p[k] = p - lrs[k] * mhat / (jnp.sqrt(vhat) + eps)
        new_m[k] = m
        new_v[k] = v
    return new_p, AdamState(step=t, m=new_m, v=new_v)


def zero_slots(state: AdamState, idx: jax.Array) -> AdamState:
    """Zero the moment rows at the given slot indices for every field
    (fresh Adam state for newly inserted Gaussians; OOB indices dropped)."""
    m = {k: a.at[idx].set(jnp.zeros_like(a[:1]), mode="drop")
         for k, a in state.m.items()}
    v = {k: a.at[idx].set(jnp.zeros_like(a[:1]), mode="drop")
         for k, a in state.v.items()}
    return state.replace(m=m, v=v)


def zero_field(state: AdamState, field: str) -> AdamState:
    """Zero the full moment state of one field — the reference's
    replace_tensor_to_optimizer semantics used by opacity resets
    (gaussian_model.py:477-490,637-645)."""
    m = dict(state.m)
    v = dict(state.v)
    m[field] = jnp.zeros_like(m[field])
    v[field] = jnp.zeros_like(v[field])
    return state.replace(m=m, v=v)


def xyz_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
           max_steps=1000000):
    """Log-lerp LR schedule (reference general_utils.py ``helper``)."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    return delay_rate * log_lerp


def make_lrs(opt_params: dict, spatial_lr_scale: float, step) -> dict:
    """Per-field LRs mirroring the reference param groups
    (gaussian_model.py:255-299)."""
    return {
        "xyz": xyz_lr(step,
                      opt_params["position_lr_init"] * spatial_lr_scale,
                      opt_params["position_lr_final"] * spatial_lr_scale,
                      lr_delay_mult=opt_params["position_lr_delay_mult"],
                      max_steps=opt_params["position_lr_max_steps"]),
        "f_dc": opt_params["feature_lr"],
        "f_rest": opt_params["feature_lr"] / 20.0,
        "opacity": opt_params["opacity_lr"],
        "marker": opt_params["marker_lr"],
        "kp_score": opt_params["kp_score_lr"],
        "scaling": opt_params["scaling_lr"] * spatial_lr_scale,
        "rotation": opt_params["rotation_lr"],
    }

"""Descriptor matching by optimal assignment (reference utils/match_utils.py).

The reference runs scipy ``linear_sum_assignment`` on the host. On TPU we use
the auction algorithm (Bertsekas) — the classic accelerator-friendly LAP
solver: each round, all unassigned rows bid for their best column in parallel
(two row-max reductions over the similarity matrix), columns take the highest
bidder. With eps-scaling it converges to an assignment within n*eps of
optimal; RANSAC downstream is insensitive to eps-level ties.

``hungarian_solve`` mirrors the reference pre/post-processing exactly:
L2-normalize both descriptor sets along the feature axis, cosine similarity,
zero out sims < 0.4, assign on cost 1 - sim.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


@functools.partial(jax.jit, static_argnames=("n_iters",))
def auction_assignment(sim: jax.Array, eps: float = 1e-3,
                       n_iters: int = 2000):
    """Maximize total similarity. sim [R, C] with R <= C.

    Returns col_of_row [R] int32 (the assigned column per row; always a full
    assignment for finite sim). Masked/forbidden pairs should carry a large
    negative value.
    """
    R, C = sim.shape
    assert R <= C

    def body(state):
        _, prices, owner_of_col, col_of_row = state
        unassigned = col_of_row < 0                       # [R]
        value = sim - prices[None, :]                     # [R, C]
        best_col = jnp.argmax(value, axis=1)              # [R]
        best_val = jnp.max(value, axis=1)
        value2 = value.at[jnp.arange(R), best_col].set(NEG)
        second_val = jnp.max(value2, axis=1)
        bid = best_val - second_val + eps                 # [R]

        # each column takes its highest bidder among unassigned rows
        bids = jnp.where(unassigned[:, None]
                         & (best_col[:, None] == jnp.arange(C)[None, :]),
                         bid[:, None], NEG)               # [R, C]
        top_bid = jnp.max(bids, axis=0)                   # [C]
        top_row = jnp.argmax(bids, axis=0)
        won = top_bid > NEG / 2

        prices = jnp.where(won, prices + top_bid, prices)
        # evict previous owners of columns just won
        evicted_rows = jnp.where(won, owner_of_col, -1)             # [C]
        is_evicted = jnp.any(
            jnp.arange(R)[:, None] == evicted_rows[None, :], axis=1)
        col_of_row = jnp.where(is_evicted, -1, col_of_row)
        # assign winners (a row bids one column, so no write conflicts)
        col_of_row = col_of_row.at[jnp.where(won, top_row, R)].set(
            jnp.where(won, jnp.arange(C), -1), mode="drop")
        owner_of_col = jnp.where(won, top_row, owner_of_col)
        n_unassigned = jnp.sum(col_of_row < 0)
        return n_unassigned, prices, owner_of_col, col_of_row

    def cond(state):
        n_unassigned = state[0]
        return n_unassigned > 0

    state = (jnp.asarray(R, jnp.int32),
             jnp.zeros((C,), sim.dtype),
             jnp.full((C,), -1, jnp.int32),
             jnp.full((R,), -1, jnp.int32))
    # bounded while loop: auction terminates, bound iterations defensively
    def bounded_body(i, state):
        return jax.lax.cond(cond(state), body, lambda s: s, state)

    state = jax.lax.fori_loop(0, n_iters, bounded_body, state)
    return state[3]


def hungarian_solve(desc1, desc2, sim_thresh: float = 0.4, eps: float = 1e-4,
                    use_scipy: bool = False):
    """desc1 [D, N1] (query), desc2 [D, N2] (train) -> (matches [2, K], sims [K]).

    Reference semantics (utils/match_utils.py:5-22): normalize along D,
    similarity = desc1^T desc2, zero below 0.4, solve assignment on 1 - sim.
    K = min(N1, N2). ``use_scipy`` switches to the host solver for diffing.
    """
    if desc1.shape[1] == 0 or desc2.shape[1] == 0:
        return np.zeros((2, 0), np.int64), np.zeros((0,), np.float32)

    if use_scipy:
        d1 = np.asarray(desc1, np.float32)
        d2 = np.asarray(desc2, np.float32)
        d1 = d1 / np.maximum(np.linalg.norm(d1, axis=0, keepdims=True),
                             1e-12)
        d2 = d2 / np.maximum(np.linalg.norm(d2, axis=0, keepdims=True),
                             1e-12)
        sim = d1.T @ d2
        sim[sim < sim_thresh] = 0.0
        from scipy.optimize import linear_sum_assignment
        row, col = linear_sum_assignment(1.0 - sim)
        matches = np.stack([row, col], axis=0)
        return matches, sim[row, col]

    # device path: the normalize + [N1, N2] similarity matmul runs on the
    # accelerator (a host-numpy 4096 x 4096 x 256 matmul measured ~3 s per
    # query at reference scale) and only the assignment + its sims come
    # back to the host
    sim_j = _sim_matrix(jnp.asarray(desc1, jnp.float32),
                        jnp.asarray(desc2, jnp.float32),
                        jnp.float32(sim_thresh))
    if sim_j.shape[0] <= sim_j.shape[1]:
        col_j = auction_assignment(sim_j, eps=eps)
        sims_j = jnp.take_along_axis(sim_j, col_j[:, None], axis=1)[:, 0]
        col = np.asarray(col_j)
        row = np.arange(sim_j.shape[0])
        sims = np.asarray(sims_j)
    else:
        simT = sim_j.T
        row_j = auction_assignment(simT, eps=eps)
        sims_j = jnp.take_along_axis(simT, row_j[:, None], axis=1)[:, 0]
        row = np.asarray(row_j)
        col = np.arange(sim_j.shape[1])
        sims = np.asarray(sims_j)
    matches = np.stack([row, col], axis=0)
    return matches, sims


@jax.jit
def _sim_matrix(d1, d2, thresh):
    """L2-normalize along D, cosine similarity, zero below threshold
    (utils/match_utils.py:5-16) — one fused device program."""
    d1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=0, keepdims=True), 1e-12)
    d2 = d2 / jnp.maximum(jnp.linalg.norm(d2, axis=0, keepdims=True), 1e-12)
    # HIGHEST: the 0.4 threshold is calibrated in f32 descriptor space;
    # default-precision bf16 operand rounding (~0.4%) would flip marginal
    # matches (the matmul is ~1 ms on the MXU either way)
    sim = jnp.dot(d1.T, d2, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    return jnp.where(sim < thresh, 0.0, sim)

"""Linear assignment on TPU: batched epsilon-scaling auction algorithm.

The reference computes its assignment loss with scipy Hungarian solves fanned
out over a multiprocessing pool every `assign_gap` iterations
(run_robot.py:164-187, utils/model_utils.py:85-89) — a device->host->process
round trip that costs ~0.5 s per recompute at pipeline sizes. The auction
algorithm (Bertsekas) is the assignment method that actually maps to SIMD
hardware: every sweep is a batched top-2 reduction + scatter-max, so the
whole solve stays on the TPU and the entire optimization phase compiles into
one XLA program with no host synchronization.

Guarantee: the final assignment is within N * eps_min of optimal (exact for
cost matrices whose optimal-assignment gaps exceed eps). The exact
Jonker-Volgenant solver in reart_tpu/native is the host-side alternative for
strict-parity runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _auction_phase(benefit, price, eps, max_sweeps):
    """One epsilon phase of the Jacobi (all-rows-bid) auction with unseating.

    benefit: (B, N, M); price: (B, M). Returns (row_to_col (B, N), price).
    """
    b, n, m = benefit.shape

    def cond(state):
        row_to_col, price, sweep = state
        return jnp.logical_and(jnp.any(row_to_col < 0), sweep < max_sweeps)

    def body(state):
        row_to_col, price, sweep = state
        unassigned = row_to_col < 0  # (B, N)
        values = benefit - price[:, None, :]  # (B, N, M)
        top2, idx2 = jax.lax.top_k(values, 2)
        best_j = idx2[..., 0]  # (B, N)
        bid = top2[..., 0] - top2[..., 1] + eps  # price increment
        # only unassigned rows bid
        bid = jnp.where(unassigned, bid, -jnp.inf)

        # per-column max bid (scatter-max over the bid-target columns)
        col_bid = jnp.full((b, m), -jnp.inf, dtype=benefit.dtype)
        batch_ix = jnp.arange(b)[:, None].repeat(n, 1)
        col_bid = col_bid.at[batch_ix, best_j].max(bid)
        got_bid = col_bid > -jnp.inf  # (B, M)

        # winning row per column: smallest row index among max bidders
        is_winner = jnp.logical_and(
            unassigned, bid == col_bid[batch_ix, best_j]
        )  # (B, N)
        row_ids = jnp.arange(n)[None, :].repeat(b, 0)
        col_winner = jnp.full((b, m), n, dtype=jnp.int32)
        col_winner = col_winner.at[batch_ix, best_j].min(
            jnp.where(is_winner, row_ids, n).astype(jnp.int32)
        )

        # columns with a bid: raise price, unseat previous row, seat winner
        price = jnp.where(got_bid, price + col_bid, price)

        # unseat: rows currently holding a column that got re-bid
        prev_col = row_to_col  # (B, N)
        col_rebid_for_row = jnp.where(
            prev_col >= 0,
            jnp.take_along_axis(got_bid, jnp.maximum(prev_col, 0), axis=1),
            False,
        )
        # the winner of that column (may be the same row; then it keeps it)
        winner_of_prev = jnp.where(
            prev_col >= 0,
            jnp.take_along_axis(col_winner, jnp.maximum(prev_col, 0), axis=1),
            n,
        )
        row_to_col = jnp.where(
            jnp.logical_and(col_rebid_for_row, winner_of_prev != row_ids),
            -1,
            row_to_col,
        )
        # seat winners
        won_col = jnp.take_along_axis(col_winner, best_j, axis=1) == row_ids
        seat = jnp.logical_and(is_winner, won_col)
        row_to_col = jnp.where(seat, best_j, row_to_col)
        return row_to_col, price, sweep + 1

    row_to_col0 = jnp.full((b, n), -1, dtype=jnp.int32)
    state = (row_to_col0, price, jnp.asarray(0, jnp.int32))
    row_to_col, price, _ = jax.lax.while_loop(cond, body, state)
    return row_to_col, price


@functools.partial(
    jax.jit, static_argnames=("num_scales", "scale_factor", "max_sweeps")
)
def auction_lap(
    cost: jnp.ndarray,
    eps_min: float = 1e-4,
    num_scales: int = 5,
    scale_factor: float = 8.0,
    max_sweeps: int = 2000,
) -> jnp.ndarray:
    """Minimize sum of cost over a perfect matching. cost (B, N, M), N <= M.

    Returns row_to_col (B, N) int32. Epsilon-scaling: phases with
    eps = eps_min * scale_factor**k down to eps_min, prices warm-started
    across phases (assignments reset — the standard scaling schedule).
    """
    if cost.ndim == 2:
        return auction_lap(cost[None], eps_min, num_scales, scale_factor,
                           max_sweeps)[0]
    benefit = -cost.astype(jnp.float32)
    b, n, m = benefit.shape
    price = jnp.zeros((b, m), dtype=jnp.float32)
    row_to_col = jnp.full((b, n), -1, dtype=jnp.int32)
    for k in range(num_scales - 1, -1, -1):
        eps = eps_min * (scale_factor ** k)
        row_to_col, price = _auction_phase(benefit, price, eps, max_sweeps)
    return row_to_col


def assignment_cost(cost: jnp.ndarray, row_to_col: jnp.ndarray) -> jnp.ndarray:
    """Total matched cost per batch element."""
    picked = jnp.take_along_axis(cost, row_to_col[..., None].astype(jnp.int32), axis=-1)
    return jnp.sum(picked[..., 0], axis=-1)

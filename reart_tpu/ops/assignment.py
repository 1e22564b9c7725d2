"""Linear assignment on TPU: batched epsilon-scaling auction algorithm.

The reference computes its assignment loss with scipy Hungarian solves fanned
out over a multiprocessing pool every `assign_gap` iterations
(run_robot.py:164-187, utils/model_utils.py:85-89) — a device->host->process
round trip per recompute. The auction algorithm (Bertsekas) is the assignment
method that actually maps to SIMD hardware: every sweep is a batched top-2
reduction + per-column max, so the whole solve stays on the TPU and the
entire optimization phase compiles into one XLA program with no host sync.

TPU formulation notes:
  * sweeps are SCATTER-FREE — the per-column max-bid/winner selection is a
    masked (B, N, M) reduction (VPU-friendly) instead of `.at[].max/.min`
    scatters, which lower to serialized updates on TPU (~300x slower,
    measured 60 ms vs sub-ms per sweep at B=9, N=M=1024);
  * prices can be WARM-STARTED across solves (`price` in/out): inside a fit
    the point clouds barely move between LAP recomputes, so warm-started
    solves converge in a handful of sweeps;
  * sweep counts are bounded (`max_sweeps`); rows still unassigned at the
    bound are greedily completed (may duplicate a column). Training-loss
    callers tolerate that; exact metrics use the host JV solver
    (reart_tpu.native.lap_solve_batch).

Guarantee at convergence: total cost within N * eps_min of optimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _auction_phase(benefit, price, eps, max_sweeps, use_kernels=None):
    """One epsilon phase of the Jacobi (all-rows-bid) auction with unseating.

    benefit: (B, N, M); price: (B, M). Returns (row_to_col (B, N), price).
    With `use_kernels` (auto-detected: TPU + aligned shapes) the sweep's two
    (B, N, M)-shaped passes run as fused Pallas kernels reading the benefit
    matrix from HBM once per sweep (ops/pallas_auction.py); the jnp
    formulation below is the fallback and the semantic reference.
    """
    from reart_tpu.ops.pallas_auction import (
        col_winner_max_pallas,
        row_top2_pallas,
        sweep_kernels_available,
    )

    b, n, m = benefit.shape
    if use_kernels is None:
        use_kernels = sweep_kernels_available(n, m)
    col_ids = jnp.arange(m)[None, None, :]  # (1, 1, M)
    row_ids = jnp.arange(n)[None, :]        # (1, N)
    neg_inf = jnp.asarray(-jnp.inf, benefit.dtype)

    def cond(state):
        row_to_col, price, sweep = state
        return jnp.logical_and(jnp.any(row_to_col < 0), sweep < max_sweeps)

    def body(state):
        row_to_col, price, sweep = state
        unassigned = row_to_col < 0  # (B, N)
        if use_kernels:
            best_v, second_v, best_j = row_top2_pallas(benefit, price)
        else:
            values = benefit - price[:, None, :]  # (B, N, M)
            # top-2 via max/argmax passes — lax.top_k is a SORT on TPU and
            # dominated the whole assignment phase (measured 267 ms/iter)
            best_v = jnp.max(values, axis=-1)
            best_j = jnp.argmax(values, axis=-1)  # (B, N), first max = low idx
            masked = jnp.where(best_j[..., None] == col_ids, neg_inf, values)
            second_v = jnp.max(masked, axis=-1)
        bid = best_v - second_v + eps
        bid = jnp.where(unassigned, bid, -jnp.inf)  # only unassigned rows bid

        # column-wise max bid + winning row
        if use_kernels:
            col_bid, col_winner = col_winner_max_pallas(bid, best_j, m)
            got_bid = col_bid > -jnp.inf
        else:
            # masked reductions (no scatter)
            bid_matrix = jnp.where(best_j[..., None] == col_ids,
                                   bid[..., None], neg_inf)  # (B, N, M)
            col_bid = jnp.max(bid_matrix, axis=1)  # (B, M)
            got_bid = col_bid > -jnp.inf
            is_win = jnp.logical_and(bid_matrix == col_bid[:, None, :],
                                     bid_matrix > -jnp.inf)
            col_winner = jnp.argmax(is_win, axis=1).astype(jnp.int32)  # min row

        price = jnp.where(got_bid, price + col_bid, price)

        # unseat rows whose held column was re-bid by a different winner
        prev_col = jnp.maximum(row_to_col, 0)
        held = row_to_col >= 0
        col_rebid = jnp.take_along_axis(got_bid, prev_col, axis=1) & held
        winner_of_prev = jnp.take_along_axis(col_winner, prev_col, axis=1)
        row_to_col = jnp.where(col_rebid & (winner_of_prev != row_ids), -1,
                               row_to_col)
        # seat the winning bidders
        won = jnp.take_along_axis(col_winner, best_j, axis=1) == row_ids
        seat = jnp.logical_and(unassigned, won)
        seat = jnp.logical_and(
            seat, jnp.take_along_axis(got_bid, best_j, axis=1))
        row_to_col = jnp.where(seat, best_j, row_to_col)
        return row_to_col, price, sweep + 1

    row_to_col0 = jnp.full((b, n), -1, dtype=jnp.int32)
    state = (row_to_col0, price, jnp.asarray(0, jnp.int32))
    row_to_col, price, _ = jax.lax.while_loop(cond, body, state)
    return row_to_col, price


@functools.partial(
    jax.jit,
    static_argnames=("eps_min", "num_scales", "scale_factor", "max_sweeps",
                     "return_price", "use_resident"),
)
def auction_lap(
    cost: jnp.ndarray,
    eps_min: float = 1e-4,
    num_scales: int = 5,
    scale_factor: float = 8.0,
    max_sweeps: int = 500,
    price: jnp.ndarray | None = None,
    return_price: bool = False,
    use_resident: bool | None = None,
):
    """Minimize sum of cost over a matching. cost (B, N, M), N <= M.

    Returns row_to_col (B, N) int32 (plus final prices if `return_price`).
    Epsilon-scaling phases from eps_min * scale_factor**(num_scales-1) down
    to eps_min, prices warm-started across phases; pass `price` to also warm-
    start across calls. Rows unassigned at the sweep bound are completed
    greedily (argmax value) — callers needing exact permutations should use
    the native JV solver.
    """
    if cost.ndim == 2:
        out = auction_lap(cost[None], eps_min, num_scales, scale_factor,
                          max_sweeps, None if price is None else price[None],
                          return_price)
        if return_price:
            return out[0][0], out[1][0]
        return out[0]
    benefit = -cost.astype(jnp.float32)
    b, n, m = benefit.shape
    if price is None:
        price = jnp.zeros((b, m), dtype=jnp.float32)
    from reart_tpu.ops.pallas_auction import (
        auction_solve_resident,
        auction_solve_resident_hbm,
        resident_available,
        resident_hbm_available,
    )

    if use_resident is None:
        use_resident = resident_available(n, m)
        use_resident_hbm = not use_resident and resident_hbm_available(n, m)
    else:
        # explicit False means NO resident kernels at all — the debug/oracle
        # escape hatch must reach the plain multi-kernel sweep path
        use_resident_hbm = False
    if use_resident or use_resident_hbm:
        # entire epsilon-scaled solve in ONE kernel launch per call, with
        # per-batch-element early exit on convergence (pallas_auction.py);
        # large problems stream the benefit matrix from HBM per sweep
        eps_list = tuple(float(eps_min * scale_factor ** k)
                         for k in range(num_scales - 1, -1, -1))
        solve = (auction_solve_resident if use_resident
                 else auction_solve_resident_hbm)
        row_to_col, price = solve(benefit, price, eps_list, max_sweeps)
    else:
        row_to_col = jnp.full((b, n), -1, dtype=jnp.int32)
        for k in range(num_scales - 1, -1, -1):
            eps = eps_min * (scale_factor ** k)
            row_to_col, price = _auction_phase(benefit, price, eps, max_sweeps)
    # greedy completion of any rows left by the sweep bound
    values = benefit - price[:, None, :]
    fallback = jnp.argmax(values, axis=-1).astype(jnp.int32)
    row_to_col = jnp.where(row_to_col < 0, fallback, row_to_col)
    if return_price:
        return row_to_col, price
    return row_to_col


def assignment_cost(cost: jnp.ndarray, row_to_col: jnp.ndarray) -> jnp.ndarray:
    """Total matched cost per batch element."""
    picked = jnp.take_along_axis(cost, row_to_col[..., None].astype(jnp.int32), axis=-1)
    return jnp.sum(picked[..., 0], axis=-1)


# ---------------------------------------------------------------------------
# banded points-level solver (giant problems: 2048^2, 4096^2)
# ---------------------------------------------------------------------------

def _spread_bits(x):  # interleave each 10-bit coord into every 3rd bit
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _quantize(pts, lo, hi, bits=10):
    top = float(2 ** bits - 1)
    return jnp.clip((pts - lo) / jnp.maximum(hi - lo, 1e-9) * top,
                    0.0, top).astype(jnp.uint32)


def _morton_keys(pts: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray):
    """30-bit Morton codes of (B, N, 3) points, bbox (B, 1, 3) lo/hi."""
    q = _quantize(pts, lo, hi)
    return (_spread_bits(q[..., 0]) | (_spread_bits(q[..., 1]) << 1)
            | (_spread_bits(q[..., 2]) << 2))


def _hilbert_keys(pts: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                  bits: int = 10):
    """30-bit Hilbert indices of (B, N, 3) points (branchless Skilling
    axes-to-transpose). Unlike Morton, CONSECUTIVE curve positions are
    always face-adjacent cells — no large spatial jumps mid-curve — so
    sorted order preserves geometric locality strictly better (pinned by
    tests/test_assignment.py::TestCurveKeys)."""
    return _hilbert_index(_quantize(pts, lo, hi, bits), bits)


def _hilbert_index(q: jnp.ndarray, bits: int = 10):
    """Hilbert index of uint32 cell coords q (..., 3) in [0, 2^bits)."""
    X = [q[..., 0], q[..., 1], q[..., 2]]
    # inverse undo: per bit plane (high to low), per axis — the data-
    # dependent branch of the scalar algorithm becomes a jnp.where select
    Q = 1 << (bits - 1)
    while Q > 1:
        P = jnp.uint32(Q - 1)
        Qu = jnp.uint32(Q)
        for i in range(3):
            hit = (X[i] & Qu) != 0
            swap = (X[0] ^ X[i]) & P  # i == 0 -> 0: else-branch no-op
            X0_new = jnp.where(hit, X[0] ^ P, X[0] ^ swap)
            if i > 0:
                X[i] = jnp.where(hit, X[i], X[i] ^ swap)
            X[0] = X0_new
        Q >>= 1
    # Gray encode
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[2])
    Q = 1 << (bits - 1)
    while Q > 1:
        t = jnp.where((X[2] & jnp.uint32(Q)) != 0, t ^ jnp.uint32(Q - 1), t)
        Q >>= 1
    X = [xi ^ t for xi in X]
    # transpose: bit q of X[0] is the MSB of the q-th 3-bit index group
    return (_spread_bits(X[2]) | (_spread_bits(X[1]) << 1)
            | (_spread_bits(X[0]) << 2))


def resolve_band(band: int, n: int) -> int:
    """-1 = auto: scale the column window with the problem, n//4 clamped to
    [512, 1024] (multiples of 128 by construction). Measured on real
    end-of-fit sapien clouds at 4096^2: the 1024-wide band costs the same
    wall-clock as 512 and cuts matched cost / duplicate columns ~10/18%;
    at 2048^2 (robot faithful) auto keeps the validated 512. Auto also
    respects the kernel's 16 MB per-element band-scratch gate
    (pallas_auction.banded_available) — at 8192^2 it steps 1024 back down
    to 512 rather than silently losing the banded path to the dense
    fallback."""
    if band != -1:
        return band
    w = min(1024, max(512, n // 4))
    while w > 512 and n * w * 4 > 16 * 1024 * 1024:
        w //= 2
    return w


def banded_points_available(n: int, m: int, band: int) -> bool:
    from reart_tpu.ops.pallas_auction import banded_available

    return band > 0 and banded_available(n, m, band)


def _curve_sort(pc_src, pc_tgt, band: int, curve: str | None):
    """Space-filling-curve sort shared by the banded solve and its guard.

    Returns (src_sorted, tgt_sorted, rperm, cperm); shared per-element bbox.
    """
    both = jnp.concatenate([pc_src, pc_tgt], axis=1)
    lo = jnp.min(both, axis=1, keepdims=True)
    hi = jnp.max(both, axis=1, keepdims=True)
    if curve is None:
        # measured on real problems (PARITY, one session): Hilbert's
        # strict curve adjacency wins at wide bands (1024: -1.5% matched
        # cost on end-of-fit 4096^2, -5%/-16% dup on raw), Morton edges it
        # at 512 (faithful 2048^2: 247 vs 253) — default follows the band
        curve = "hilbert" if band >= 1024 else "morton"
    keys = {"hilbert": _hilbert_keys, "morton": _morton_keys}[curve]
    rperm = jnp.argsort(keys(pc_src, lo, hi), axis=1)
    cperm = jnp.argsort(keys(pc_tgt, lo, hi), axis=1)
    src_s = jnp.take_along_axis(pc_src, rperm[..., None], axis=1)
    tgt_s = jnp.take_along_axis(pc_tgt, cperm[..., None], axis=1)
    return src_s, tgt_s, rperm, cperm


@functools.partial(jax.jit, static_argnames=("band", "curve"))
def band_overflow_fraction(pc_src, pc_tgt, band: int = 512,
                           curve: str | None = None):
    """Fraction of rows whose NEAREST target point falls outside their banded
    column window — the direct measure of whether the banded solve can even
    represent the geometric matching.

    The banded kernel restricts each `tile`-row block to a static
    diagonal-centred window of `band` sorted columns
    (pallas_auction._band_offsets). On model-aligned clouds a row's match
    sits near its own curve position and the window covers it; on badly
    unaligned clouds (e.g. raw camera-rotated scans) the two clouds' curve
    orders disagree and matches land far off the diagonal — matched cost
    degrades 9-21% vs the dense solve there (PARITY.md). One fused 1-NN
    pass, no (B, N, M) cost matrix: cheap enough to probe once per fit
    (train.engine gates the banded path on it — FitConfig.assign_band_guard).
    """
    from reart_tpu.ops.pallas_auction import _band_offsets, band_tile
    from reart_tpu.ops.pallas_nn import nn_topk

    n, m = pc_src.shape[1], pc_tgt.shape[1]
    src_s, tgt_s, _, _ = _curve_sort(pc_src, pc_tgt, band, curve)
    nn_col = nn_topk(src_s, tgt_s, 1)[1][..., 0].astype(jnp.int32)  # (B, N)
    tile = band_tile(n)
    offs = jnp.asarray(_band_offsets(n, m, band, tile), jnp.int32)
    off = offs[jnp.arange(n) // tile][None]  # (1, N)
    inside = jnp.logical_and(nn_col >= off, nn_col < off + band)
    return 1.0 - jnp.mean(inside.astype(jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("band", "eps_min", "num_scales", "scale_factor",
                     "max_sweeps", "return_price", "nn_recenter", "curve"),
)
def auction_lap_points(
    pc_src: jnp.ndarray,
    pc_tgt: jnp.ndarray,
    band: int = 512,
    eps_min: float = 1e-4,
    num_scales: int = 2,
    scale_factor: float = 50.0,
    max_sweeps: int = 100,
    price: jnp.ndarray | None = None,
    return_price: bool = False,
    nn_recenter: bool = False,
    curve: str | None = None,
):
    """Approximate euclidean-cost LAP straight from point clouds.

    pc_src (B, N, 3), pc_tgt (B, M, 3), N == M. Sorts both clouds along a
    space-filling curve (`curve`: "hilbert" / "morton" / None = by band
    width, see below; shared per-element bbox), runs the banded resident
    auction
    (pallas_auction.auction_solve_banded) on diagonal-centred column windows
    of width `band`, and maps the matching back to original indices. The
    dense (B, N, M) cost matrix is never built. `price` warm-starts in
    ORIGINAL column order. Every row comes back assigned (band-best
    fallback at the sweep bound; may duplicate columns, like auction_lap's
    greedy completion).

    `nn_recenter=True` instead sorts ROWS by the sorted column position of
    each row's nearest target point (stable, curve-order tie-break), putting a
    row's likely match on the band diagonal even when the two clouds' own
    space-filling orders disagree. Measured on real problems (one session,
    2026-08-17): ~2-7% better matched cost on model-ALIGNED clouds
    (end-of-fit sapien 4096^2: 1056 vs 1131; robot mid-fit 2048^2: 243 vs
    247) at equal wall-clock, but WORSE on badly unaligned clouds (raw
    camera-rotated 4096^2: 3980 vs 3296 — the NN map is far from injective
    there, so rows crowd the same diagonal stretch and overflow windows).
    Off by default; enable for refinement-style workloads known to start
    near-aligned.
    """
    from reart_tpu.ops.pallas_auction import auction_solve_banded

    b, n, _ = pc_src.shape
    m = pc_tgt.shape[1]
    src_s, tgt_s, rperm, cperm = _curve_sort(pc_src, pc_tgt, band, curve)

    if nn_recenter:
        from reart_tpu.ops.pallas_nn import nn_topk

        # one fused 1-NN pass (non-differentiable by contract, fine here);
        # stable argsort keeps Morton-local row order within an nn-col tie
        nn_col = nn_topk(src_s, tgt_s, 1)[1][..., 0].astype(jnp.int32)
        reorder = jnp.argsort(nn_col, axis=1, stable=True)
        rperm = jnp.take_along_axis(rperm, reorder, axis=1)
        src_s = jnp.take_along_axis(src_s, reorder[..., None], axis=1)
    if price is None:
        price_s = jnp.zeros((b, m), jnp.float32)
    else:
        price_s = jnp.take_along_axis(price, cperm, axis=1)

    eps_list = tuple(float(eps_min * scale_factor ** k)
                     for k in range(num_scales - 1, -1, -1))
    r2c_s, price_s = auction_solve_banded(
        src_s, jnp.transpose(tgt_s, (0, 2, 1)),
        price_s, eps_list, max_sweeps, band)

    # back to original indices: sorted row i is original row rperm[i] and
    # its column r2c_s[i] is original column cperm[r2c_s[i]]
    col_orig = jnp.take_along_axis(cperm, r2c_s.astype(jnp.int32), axis=1)
    inv_r = jnp.argsort(rperm, axis=1)
    row_to_col = jnp.take_along_axis(col_orig, inv_r, axis=1).astype(jnp.int32)
    if return_price:
        inv_c = jnp.argsort(cperm, axis=1)
        return row_to_col, jnp.take_along_axis(price_s, inv_c, axis=1)
    return row_to_col

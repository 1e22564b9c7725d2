"""Fused k-nearest-neighbor Pallas kernel.

Why this exists: every hot loss in the pipeline (Chamfer, 1-NN transfer,
3-NN flow blending) is "pairwise squared distances -> (arg)min/top-k".
Expressed in jnp, the (B, N, M) distance matrix is produced by a dot and XLA
materializes it in HBM before reducing (dots don't fuse into reductions on
TPU) — at nao scale that is ~600 MB written + read per matrix per iteration,
and the fit is purely HBM-bandwidth-bound. This kernel tiles the distance
computation in VMEM and keeps only a running (N, k) top-k, so HBM traffic
drops from O(N*M) to O((N + M) * 3 + N * k) per call.

Semantics match ops/distance.knn: ascending squared distances + indices,
ties resolved to the lower index (the CUDA knn convention the reference
relies on).

Dispatch: `nn_topk` auto-selects the kernel on TPU for large aligned-enough
shapes and falls back to the jnp path otherwise (CPU tests, tiny part-level
calls). Inputs are padded to tile multiples with FAR coordinates; padded ref
rows can never win a top-k slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FAR = 1e15  # padding coordinate: squared distances overflow to +inf

TILE_N = 256
# TILE_N=512 looked better in a sequential sweep (scripts/ab_nn_tiles.py) but
# an interleaved old/new A/B (scripts/ab_nn_oldnew.py) showed it is a wash at
# best (nn_bidir 0.81x) — sequential sweeps drift with the chip window; only
# interleaved same-session numbers are trusted. 256 measured 1.35x total.
TILE_M = 1024
# one-tile M when affordable: a (TILE_N, 4096) f32 distance tile is 4 MB of
# VMEM and removes every cross-tile top-k merge pass — measured 1.6/2.3 ms
# vs 2.8/4.8 ms per (9, 4096, 4096) k=1/k=3 call with 1024-wide tiles
MAX_TILE_M = 4096


def _pick_tile_m(m: int) -> int:
    return min(MAX_TILE_M, -(-m // TILE_M) * TILE_M)


# A/B + debugging valve for the distance-tile formulation (scripts/ab_nn.py
# measures both inside one chip session). Round-3 on-chip findings at
# (9, 4096, 4096): the MXU cross term ||q||^2+||r||^2-2q.r is 0.9x (SLOWER —
# the K=3 contraction pads to the MXU's 128-deep feed and its operand
# staging costs more than the 9 VPU passes it replaces; the round-2 blend3
# win came from fusing the gather matmul, not the distance); what IS fast
# is keeping the ref CHANNEL-MAJOR so each r[c] is a natural (1, TM) lane
# vector — row-major (TM, 3) puts channels on lanes and every r[:, c]
# extraction is a relayout (dist+min 1.93 -> 1.34 ms, one session).
SQDIST_CROSS_TERM = False


def _sqdist_tile(q, r_cm):
    """q (TN, 3) row-major x r_cm (3, TM) CHANNEL-MAJOR -> (TN, TM) squared
    distances inside a kernel. Channel-wise diff^2: exact, tie-stable, and
    measured faster than the MXU cross term at K=3 (see flag note above).
    q's (TN, 1) channel slices broadcast along lanes, r_cm's (1, TM) slices
    along sublanes — no relayouts on either operand."""
    if SQDIST_CROSS_TERM:
        q2 = jnp.sum(q * q, axis=1, keepdims=True)     # (TN, 1)
        r2 = jnp.sum(r_cm * r_cm, axis=0).reshape(1, -1)
        xy = jax.lax.dot_general(q, r_cm, (((1,), (0,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        return q2 + r2 - 2.0 * xy
    d = None
    for c in range(3):
        diff = q[:, c:c + 1] - r_cm[c].reshape(1, -1)
        d = diff * diff if d is None else d + diff * diff
    return d


def _ksmallest(vals, idxs, k: int):
    """k smallest of each row, ascending, ties to the lowest POSITION (which
    callers arrange to mean lowest original index). Pure min-reductions —
    lax.top_k has no Pallas TPU lowering, and Mosaic's native argmin does
    NOT honor the first-min tie rule on hardware (measured: all-ties
    returns lane 127), so the position is a masked min over an iota.

    vals (R, W) float32, idxs (R, W) int32 -> ((R, k), (R, k))."""
    r, w = vals.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)
    int_max = jnp.iinfo(jnp.int32).max
    out_v, out_i = [], []
    v = vals
    for _ in range(k):
        m = jnp.min(v, axis=1)                        # (R,)
        first = jnp.min(
            jnp.where(v == m[:, None], pos, int_max), axis=1)  # low pos wins
        sel = pos == first[:, None]
        out_v.append(m)
        out_i.append(jnp.sum(jnp.where(sel, idxs, 0), axis=1))
        v = jnp.where(sel, jnp.inf, v)
    return jnp.stack(out_v, axis=1), jnp.stack(out_i, axis=1)


def _nn_kernel(k: int, q_ref, r_ref, d_ref, i_ref):
    """Grid (B, N/TN, M/TM); M innermost so the (1, k, TN) output blocks are
    revisited and act as running top-k accumulators. Ref block is
    channel-major (3, TM) — see _sqdist_tile."""
    j = pl.program_id(2)
    q = q_ref[0]  # (TN, 3)
    r = r_ref[0]  # (3, TM) channel-major
    tn, tm = q.shape[0], r.shape[1]

    d = _sqdist_tile(q, r)

    if k == 1:
        # fast path: the index IS the first-min position (+ tile offset) —
        # skips _ksmallest's select/where-sum/set-inf passes (~0.9 ms of
        # the 2.7 ms k=1 kernel at (9, 4096, 4096), one-session A/B)
        pos = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
        mn = jnp.min(d, axis=1)
        first = jnp.min(
            jnp.where(d == mn[:, None], pos, jnp.iinfo(jnp.int32).max),
            axis=1)
        tile_d = mn[:, None]
        tile_i = (first + j * tm)[:, None]
    else:
        # position == column index -> lowest-index ties
        cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + j * tm
        tile_d, tile_i = _ksmallest(d, cols, k)  # (TN, k)

    @pl.when(j == 0)
    def _():
        d_ref[0] = tile_d.T  # (k, TN)
        i_ref[0] = tile_i.T.astype(jnp.int32)

    @pl.when(j > 0)
    def _():
        # merge running top-k with tile top-k: 2k candidates -> k. Running
        # entries come first, so position tie-break keeps lower indices.
        cand_d = jnp.concatenate([d_ref[0].T, tile_d], axis=1)  # (TN, 2k)
        cand_i = jnp.concatenate([i_ref[0].T, tile_i], axis=1)
        best_d, best_i = _ksmallest(cand_d, cand_i, k)
        d_ref[0] = best_d.T
        i_ref[0] = best_i.T.astype(jnp.int32)


def _pad_points(x, tile):
    b, n, c = x.shape
    pad = (-n) % tile
    if pad == 0:
        return x, n
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)), constant_values=FAR), n


@functools.partial(jax.jit, static_argnames=("k",))
def nn_topk_pallas(query: jnp.ndarray, ref: jnp.ndarray, k: int):
    """query (B, N, 3), ref (B, M, 3) -> (sqdists (B, N, k) ascending,
    idx (B, N, k))."""
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    b, _, _ = query.shape
    tile_m = _pick_tile_m(ref.shape[1])
    qp, n = _pad_points(query, TILE_N)
    rp, m = _pad_points(ref, tile_m)
    np_, mp = qp.shape[1], rp.shape[1]

    grid = (b, np_ // TILE_N, mp // tile_m)
    d_t, i_t = pl.pallas_call(
        functools.partial(_nn_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, 3), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_m), lambda bi, i, j: (bi, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, TILE_N), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, TILE_N), lambda bi, i, j: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, k, np_), jnp.int32),
        ],
    )(qp, jnp.transpose(rp, (0, 2, 1)))
    d_out = jnp.moveaxis(d_t, 1, 2)[:, :n]  # (B, N, k)
    i_out = jnp.moveaxis(i_t, 1, 2)[:, :n]
    return jnp.clip(d_out, min=0.0), i_out


def _bq_kernel(k: int, r2: float, mp: int, q_ref, r_ref, v_ref, i_ref):
    """Ball-query as a k-smallest over the MONOTONE KEY
    key = (in_radius ? col : col + mp) — in-radius points in index order
    come first, exactly the CUDA kernel's first-K-in-order contract
    (src/ball_query_gpu.cu:9-67). Keys are distinct small ints (exact in
    f32), so no tie handling is needed; padded FAR ref points can never be
    in radius. ONE M tile per query block (gated by
    ball_query_kernel_available), so the k extraction is a fori_loop of
    min-passes writing each slot straight to the output ref via pl.ds —
    an unrolled _ksmallest at k=128 blew the scoped-VMEM stack (48 MB of
    live select chains).

    MEASURED AND REJECTED as the ball_query dispatch (round 5, one-session
    op A/B at (8, 512, 1024)): index-exact at every tested shape, but the
    K sequential min passes cost ~4 lane-ops over the whole (TN, N) tile
    per slot — total work K*S*N overtakes lax.top_k's N log N sort by
    K~64 (K=128: 3.9 vs 2.0 ms; K=32: a wash). Kept for reference and for
    potential small-K callers; ops/sampling.ball_query stays on the sort."""
    q = q_ref[0]          # (TN, 3)
    r = r_ref[0]          # (3, M) channel-major
    tn, tm = q.shape[0], r.shape[1]

    d = _sqdist_tile(q, r)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    key0 = jnp.where(d < r2, cols.astype(jnp.float32),
                     cols.astype(jnp.float32) + float(mp))

    def body(kk, key):
        m = jnp.min(key, axis=1)                       # (TN,)
        # keys are distinct -> the min's column is unique; recover it as a
        # masked min over cols (hardware argmin tie rule is unusable)
        first = jnp.min(jnp.where(key == m[:, None], cols,
                                  jnp.iinfo(jnp.int32).max), axis=1)
        v_ref[0, pl.ds(kk, 1)] = m[None, :]
        i_ref[0, pl.ds(kk, 1)] = first[None, :]
        return jnp.where(cols == first[:, None], jnp.inf, key)

    jax.lax.fori_loop(0, k, body, key0)


def ball_query_kernel_available(s: int, n: int) -> bool:
    """Single-M-tile contract: the whole ref cloud must fit one kernel tile
    (no cross-tile top-k merge in the fori_loop formulation)."""
    return n <= MAX_TILE_M


@functools.partial(jax.jit, static_argnames=("radius", "k"))
def ball_query_pallas(radius: float, k: int, xyz: jnp.ndarray,
                      new_xyz: jnp.ndarray):
    """Fused ball query. xyz (B, N, 3) points, new_xyz (B, S, 3) centroids
    -> idx (B, S, k) with the reference's first-in-radius padding."""
    xyz = xyz.astype(jnp.float32)
    new_xyz = new_xyz.astype(jnp.float32)
    b = xyz.shape[0]
    tile_m = _pick_tile_m(xyz.shape[1])
    qp, s = _pad_points(new_xyz, TILE_N)
    rp, _ = _pad_points(xyz, tile_m)
    sp, mp = qp.shape[1], rp.shape[1]
    assert mp == tile_m, "ball_query_pallas requires a single M tile"

    grid = (b, sp // TILE_N)
    v_t, i_t = pl.pallas_call(
        functools.partial(_bq_kernel, k, float(radius) * float(radius), mp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, 3), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_m), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, TILE_N), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, TILE_N), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k, sp), jnp.float32),
            jax.ShapeDtypeStruct((b, k, sp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(qp, jnp.transpose(rp, (0, 2, 1)))
    key_out = jnp.moveaxis(v_t, 1, 2)[:, :s]  # (B, S, k)
    idx = jnp.moveaxis(i_t, 1, 2)[:, :s]
    valid = key_out < mp  # in-radius
    first = idx[..., :1]  # first in-radius point (or point 0 if none)
    return jnp.where(valid, idx, first)


def _bidir_kernel(q_ref, r_ref, fd_ref, fi_ref, bd_ref, bi_ref,
                  sd_ref, si_ref):
    """Fused bidirectional 1-NN: each (TN, TM) distance tile is computed ONCE
    and reduced along BOTH axes. Grid (B, N/TN, M/TM), j innermost.

    NOTE: measured SLOWER than two single-direction kernels end-to-end on
    v5e (27 vs 40 iters/sec on the nao fit) — the scratch dynamic-slice
    accumulation and extra masked index reductions cost more than the saved
    distance recompute, so chamfer does NOT dispatch here. Kept as tested
    infrastructure for future tuning.

    Forward (src->tgt) accumulates in the revisited (1, 1, TN) output block
    (index ignores only the innermost dim). Reverse (tgt->src) accumulates in
    a persistent (1, Mp) VMEM scratch — its column slice j is final once
    i == nI-1, at which point it is flushed into the (1, 1, Mp) output block.
    """
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_i = pl.num_programs(1)
    q = q_ref[0]  # (TN, 3)
    r = r_ref[0]  # (3, TM) channel-major
    tn, tm = q.shape[0], r.shape[1]

    d = _sqdist_tile(q, r)

    # ---- forward: row minima, accumulated over j in the output block ----
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1) + j * tm
    row_min = jnp.min(d, axis=1)  # (TN,)
    row_arg = jnp.min(
        jnp.where(d == row_min[:, None], cols, jnp.iinfo(jnp.int32).max),
        axis=1)

    @pl.when(j == 0)
    def _():
        fd_ref[0, 0] = row_min
        fi_ref[0, 0] = row_arg

    @pl.when(j > 0)
    def _():
        better = row_min < fd_ref[0, 0]
        fd_ref[0, 0] = jnp.where(better, row_min, fd_ref[0, 0])
        fi_ref[0, 0] = jnp.where(better, row_arg, fi_ref[0, 0])

    # ---- reverse: column minima, accumulated over i in VMEM scratch ------
    rows = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 0) + i * tn
    col_min = jnp.min(d, axis=0)  # (TM,)
    col_arg = jnp.min(
        jnp.where(d == col_min[None, :], rows, jnp.iinfo(jnp.int32).max),
        axis=0)

    @pl.when(i == 0)
    def _():
        sd_ref[0, pl.ds(j * tm, tm)] = col_min
        si_ref[0, pl.ds(j * tm, tm)] = col_arg

    @pl.when(i > 0)
    def _():
        prev_d = sd_ref[0, pl.ds(j * tm, tm)]
        prev_i = si_ref[0, pl.ds(j * tm, tm)]
        better = col_min < prev_d
        sd_ref[0, pl.ds(j * tm, tm)] = jnp.where(better, col_min, prev_d)
        si_ref[0, pl.ds(j * tm, tm)] = jnp.where(better, col_arg, prev_i)

    @pl.when(i == n_i - 1)
    def _():
        bd_ref[0, 0, pl.ds(j * tm, tm)] = sd_ref[0, pl.ds(j * tm, tm)]
        bi_ref[0, 0, pl.ds(j * tm, tm)] = si_ref[0, pl.ds(j * tm, tm)]


@jax.jit
def nn_bidir_pallas(src: jnp.ndarray, tgt: jnp.ndarray):
    """Fused bidirectional 1-NN. src (B, N, 3), tgt (B, M, 3) ->
    (fwd_sqdist (B, N), fwd_idx (B, N), bwd_sqdist (B, M), bwd_idx (B, M))."""
    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    b = src.shape[0]
    qp, n = _pad_points(src, TILE_N)
    rp, m = _pad_points(tgt, TILE_M)
    np_, mp = qp.shape[1], rp.shape[1]

    grid = (b, np_ // TILE_N, mp // TILE_M)
    fd, fi, bd, bi = pl.pallas_call(
        _bidir_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, 3), lambda bi_, i, j: (bi_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_M), lambda bi_, i, j: (bi_, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TILE_N), lambda bi_, i, j: (bi_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_N), lambda bi_, i, j: (bi_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mp), lambda bi_, i, j: (bi_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mp), lambda bi_, i, j: (bi_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, mp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, mp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, mp), jnp.float32),
            pltpu.VMEM((1, mp), jnp.int32),
        ],
    )(qp, jnp.transpose(rp, (0, 2, 1)))
    return (jnp.clip(fd[:, 0, :n], min=0.0), fi[:, 0, :n],
            jnp.clip(bd[:, 0, :m], min=0.0), bi[:, 0, :m])


def nn_bidir(src: jnp.ndarray, tgt: jnp.ndarray):
    """Bidirectional 1-NN with automatic kernel dispatch (non-differentiable;
    consumers recompute distances by gathering). src (..., N, 3),
    tgt (..., M, 3)."""
    if not use_pallas(src.shape, tgt.shape):
        from reart_tpu.ops.distance import pairwise_sqdist

        sq = pairwise_sqdist(src, tgt)
        fi = jnp.argmin(sq, axis=-1)
        fd = jnp.take_along_axis(sq, fi[..., None], axis=-1)[..., 0]
        bi = jnp.argmin(sq, axis=-2)
        bd = jnp.take_along_axis(sq, bi[..., None, :], axis=-2)[..., 0, :]
        return fd, fi, bd, bi
    batch = src.shape[:-2]
    s = jax.lax.stop_gradient(src).reshape((-1,) + src.shape[-2:])
    t = jax.lax.stop_gradient(
        jnp.broadcast_to(tgt, batch + tgt.shape[-2:])
    ).reshape((-1,) + tgt.shape[-2:])
    fd, fi, bd, bi = nn_bidir_pallas(s, t)
    rs = lambda x: x.reshape(batch + x.shape[-1:])
    return rs(fd), rs(fi), rs(bd), rs(bi)


def _nn1c_kernel(q_ref, r_ref, d_ref, i_ref, c_ref):
    """1-NN with gathered neighbor COORDS: the winning row of each distance
    tile is extracted as a one-hot matmul against the VMEM-resident ref tile,
    so consumers (Chamfer) never issue an XLA row-gather (measured 1.16
    ms/iter per gather at nao scale). Grid (B, N/TN, M/TM), M innermost;
    outputs are revisited running-min accumulators."""
    j = pl.program_id(2)
    q = q_ref[0]  # (TN, 3)
    r = r_ref[0]  # (3, TM) channel-major
    tn, tm = q.shape[0], r.shape[1]

    d = _sqdist_tile(q, r)

    pos = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    row_min = jnp.min(d, axis=1)                       # (TN,)
    # first-min position via masked min (Mosaic argmin breaks the tie rule)
    arg_local = jnp.min(
        jnp.where(d == row_min[:, None], pos, jnp.iinfo(jnp.int32).max),
        axis=1)
    sel = pos == arg_local[:, None]
    # winner's coords via channel-wise masked sums: measured 31% faster
    # than the one-hot MXU dot at this shape (the f32 cast + K=4096 feed
    # costs more than three VPU reduction passes)
    coords = jnp.stack(
        [jnp.sum(jnp.where(sel, r[c].reshape(1, -1), 0.0), axis=1)
         for c in range(3)], axis=1)                   # (TN, 3)
    row_arg = arg_local + j * tm

    @pl.when(j == 0)
    def _():
        d_ref[0, 0] = row_min
        i_ref[0, 0] = row_arg
        c_ref[0] = coords

    @pl.when(j > 0)
    def _():
        better = row_min < d_ref[0, 0]
        d_ref[0, 0] = jnp.where(better, row_min, d_ref[0, 0])
        i_ref[0, 0] = jnp.where(better, row_arg, i_ref[0, 0])
        c_ref[0] = jnp.where(better[:, None], coords, c_ref[0])


@jax.jit
def nn1_coords_pallas(query: jnp.ndarray, ref: jnp.ndarray):
    """query (B, N, 3), ref (B, M, 3) -> (sqdist (B, N), idx (B, N),
    nn_coords (B, N, 3)). Ties to the lowest ref index."""
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    b = query.shape[0]
    tile_m = _pick_tile_m(ref.shape[1])
    qp, n = _pad_points(query, TILE_N)
    rp, _ = _pad_points(ref, tile_m)
    np_, mp = qp.shape[1], rp.shape[1]

    grid = (b, np_ // TILE_N, mp // tile_m)
    d, i, c = pl.pallas_call(
        _nn1c_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, 3), lambda bi, ii, j: (bi, ii, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile_m), lambda bi, ii, j: (bi, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TILE_N), lambda bi, ii, j: (bi, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_N), lambda bi, ii, j: (bi, 0, ii),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, 3), lambda bi, ii, j: (bi, ii, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),
            jax.ShapeDtypeStruct((b, np_, 3), jnp.float32),
        ],
    )(qp, jnp.transpose(rp, (0, 2, 1)))
    return (jnp.clip(d[:, 0, :n], min=0.0), i[:, 0, :n], c[:, :n])


def _nn1c_bidir_kernel(q_ref, r_ref, fd_ref, fi_ref, fc_ref,
                       bd_ref, bi_ref, bc_ref):
    """Fused bidirectional 1-NN with gathered COORDS both ways: each
    (TN, M) distance tile is computed once and reduced along BOTH axes.

    One-tile-M design (grid (B, N/TN), the whole ref cloud resident in
    VMEM): the earlier TILE_M=1024 bidirectional kernel (_bidir_kernel)
    LOST to two single-direction kernels because its reverse accumulation
    ran through pl.ds scratch slices every (i, j) step; with M in one tile
    the reverse outputs are whole-block where-merges across i only — the
    same revisited-accumulator pattern the fast forward kernels use.

    Forward (1, 1, TN)/(1, TN, 3) blocks are per-i. Reverse (1, 1, M)/
    (1, M, 3) blocks ignore i and accumulate a running min across row
    tiles; ties go to the lower src row (strict < keeps earlier tiles)."""
    i = pl.program_id(1)
    q = q_ref[0]  # (TN, 3)
    r = r_ref[0]  # (3, M) channel-major
    tn, tm = q.shape[0], r.shape[1]

    d = _sqdist_tile(q, r)

    int_max = jnp.iinfo(jnp.int32).max

    # ---- forward: row minima + tgt winner coords (per-i output block) ----
    cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    row_min = jnp.min(d, axis=1)                       # (TN,)
    row_arg = jnp.min(
        jnp.where(d == row_min[:, None], cols, int_max), axis=1)
    fsel = cols == row_arg[:, None]
    fd_ref[0, 0] = row_min
    fi_ref[0, 0] = row_arg
    fc_ref[0] = jnp.stack(
        [jnp.sum(jnp.where(fsel, r[c].reshape(1, -1), 0.0), axis=1)
         for c in range(3)], axis=1)                   # (TN, 3)

    # ---- reverse: column minima + src winner coords, merged across i -----
    # coords are CHANNEL-MAJOR (3, M): a (M, 3) block would pad its 3-wide
    # lane dim to 128 (42x the lanes) and this block is rewritten every
    # row-tile step
    rows = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 0)
    col_min = jnp.min(d, axis=0)                       # (M,)
    col_arg_local = jnp.min(
        jnp.where(d == col_min[None, :], rows, int_max), axis=0)
    bsel = rows == col_arg_local[None, :]
    col_coords = jnp.stack(
        [jnp.sum(jnp.where(bsel, q[:, c:c + 1], 0.0), axis=0)
         for c in range(3)], axis=0)                   # (3, M)
    col_arg = col_arg_local + i * tn

    @pl.when(i == 0)
    def _():
        bd_ref[0, 0] = col_min
        bi_ref[0, 0] = col_arg
        bc_ref[0] = col_coords

    @pl.when(i > 0)
    def _():
        better = col_min < bd_ref[0, 0]
        bd_ref[0, 0] = jnp.where(better, col_min, bd_ref[0, 0])
        bi_ref[0, 0] = jnp.where(better, col_arg, bi_ref[0, 0])
        bc_ref[0] = jnp.where(better[None, :], col_coords, bc_ref[0])


@jax.jit
def nn1_bidir_coords_pallas(src: jnp.ndarray, tgt: jnp.ndarray):
    """Fused bidirectional 1-NN with neighbor coords.

    src (B, N, 3), tgt (B, M, 3), M <= MAX_TILE_M ->
    (fwd_sqdist (B, N), fwd_idx, fwd_coords (B, N, 3),
     bwd_sqdist (B, M), bwd_idx, bwd_coords (B, M, 3)).
    Ties to the lowest index in both directions."""
    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    b = src.shape[0]
    tile_m = _pick_tile_m(tgt.shape[1])
    qp, n = _pad_points(src, TILE_N)
    rp, m = _pad_points(tgt, tile_m)
    np_, mp = qp.shape[1], rp.shape[1]

    grid = (b, np_ // TILE_N)
    fd, fi, fc, bd, bi, bc = pl.pallas_call(
        _nn1c_bidir_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, 3), lambda bi_, i: (bi_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mp), lambda bi_, i: (bi_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TILE_N), lambda bi_, i: (bi_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_N), lambda bi_, i: (bi_, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N, 3), lambda bi_, i: (bi_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mp), lambda bi_, i: (bi_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, mp), lambda bi_, i: (bi_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, mp), lambda bi_, i: (bi_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.int32),
            jax.ShapeDtypeStruct((b, np_, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, mp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, mp), jnp.int32),
            jax.ShapeDtypeStruct((b, 3, mp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=BLEND_VMEM_LIMIT),
    )(qp, jnp.transpose(rp, (0, 2, 1)))
    return (jnp.clip(fd[:, 0, :n], min=0.0), fi[:, 0, :n], fc[:, :n],
            jnp.clip(bd[:, 0, :m], min=0.0), bi[:, 0, :m],
            jnp.moveaxis(bc, 1, 2)[:, :m])


def _blend3_kernel(q_ref, r_ref, f_ref, out_ref, md_ref, fd_ref):
    """Fused 3-NN inverse-distance flow blending: distance tile + 3-smallest
    + weighted one-hot gather as ONE MXU matmul, all in VMEM.

    Why: expressed in jnp, the (B, N, 3)-row gather of anchor flows is an
    XLA gather fusion measured at 4.2 ms/iter on the nao fit — more than
    every neighbor kernel combined (TPU gathers are row-at-a-time; the
    masked-reduction/matmul form is the idiomatic replacement). Single
    M-tile grid (B, N/TILE_N): anchors and flows stay VMEM-resident.

    Outputs: blended flow (TN, 3); min euclidean anchor distance (TN,);
    max squared flow norm of the 3 selected anchors (TN,) — the two
    ingredients of blend_anchor_motion's validity mask."""
    q = q_ref[0]  # (TN, 3)
    r = r_ref[0]  # (TM, 3)
    f = f_ref[0]  # (TM, 3)
    tn, tm = q.shape[0], r.shape[0]

    # |q|^2 + |r|^2 - 2 q.r with the cross term on the MXU: this kernel is
    # the most VPU-pass-heavy of the neighbor kernels (3-round selection +
    # weight build), so offloading the 3-channel diff^2 passes wins 1.56x
    # (measured back-to-back; the chamfer kernels measured only 1.09x and
    # keep the diff^2 form for tie-exactness with nn_topk). Same formula as
    # the jnp fallback's pairwise_sqdist.
    q2 = jnp.sum(q * q, axis=1)
    r2 = jnp.sum(r * r, axis=1)
    cross = jax.lax.dot_general(q, r, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    d = jnp.clip(q2[:, None] + r2[None, :] - 2.0 * cross, min=0.0)

    # 3-smallest extraction with the weight matrix built IN the extraction
    # loop (selection masks are reused, not rebuilt): weights accumulate
    # UNnormalized and the blend divides by their sum after the matmul —
    # same math as normalize-then-blend, ~25% fewer (TN, TM) passes
    pos = jax.lax.broadcasted_iota(jnp.int32, (tn, tm), 1)
    int_max = jnp.iinfo(jnp.int32).max
    fsq = jnp.sum(f * f, axis=1).reshape(1, -1)        # (1, TM)
    w_mat = jnp.zeros((tn, tm), jnp.float32)
    inv_sum = jnp.zeros((tn,), jnp.float32)
    min_d = flow_d = None
    v = d
    for j in range(3):
        m = jnp.min(v, axis=1)                         # (TN,)
        first = jnp.min(jnp.where(v == m[:, None], pos, int_max), axis=1)
        sel = pos == first[:, None]                    # one True per row
        dist_j = jnp.maximum(jnp.sqrt(jnp.clip(m, min=0.0)), 1e-10)
        wj = 1.0 / dist_j
        w_mat = w_mat + jnp.where(sel, wj[:, None], 0.0)
        inv_sum = inv_sum + wj
        fdj = jnp.sum(jnp.where(sel, fsq, 0.0), axis=1)
        flow_d = fdj if j == 0 else jnp.maximum(flow_d, fdj)
        if j == 0:
            min_d = dist_j
        if j < 2:
            v = jnp.where(sel, jnp.inf, v)

    # weighted anchor-flow sum on the MXU. NOTE: channel-wise VPU masked
    # sums (the _nn1c_kernel trick) measured NEUTRAL-to-slower here — W is
    # already f32 (no cast saved) and the weighted sum needs 2 passes per
    # channel, so the dot stays
    blended = jax.lax.dot_general(
        w_mat, f, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TN, 3)
    out_ref[0] = blended / inv_sum[:, None]
    md_ref[0, 0] = min_d
    fd_ref[0, 0] = flow_d


# the blend kernel keeps ~4 (TN, TM) f32 buffers live (distance matrix,
# weight matrix, selection temporaries): at TN=256/TM=4096 that exceeds the
# default 16 MB scoped-VMEM budget, so the kernel raises its own limit
BLEND_TILE_N = 256
BLEND_VMEM_LIMIT = 64 * 1024 * 1024


@jax.jit
def blend3_pallas(query: jnp.ndarray, ref: jnp.ndarray, flow: jnp.ndarray):
    """query (B, N, 3), ref/flow (B, M, 3), M <= MAX_TILE_M ->
    (blended (B, N, 3), min_dist (B, N), flow_sqnorm_max (B, N)).
    Requires >= 3 real anchors per batch row (engine contract)."""
    query = query.astype(jnp.float32)
    b, _, _ = query.shape
    TILE_N = BLEND_TILE_N
    tile_m = _pick_tile_m(ref.shape[1])
    qp, n = _pad_points(query, TILE_N)
    rp, _ = _pad_points(ref.astype(jnp.float32), tile_m)
    fp = jnp.pad(flow.astype(jnp.float32),
                 ((0, 0), (0, rp.shape[1] - flow.shape[1]), (0, 0)))
    np_ = qp.shape[1]

    grid = (b, np_ // TILE_N)
    out, md, fd = pl.pallas_call(
        _blend3_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, 3), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_N, 3), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_N), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_N), lambda bi, i: (bi, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, np_, 3), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, np_), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=BLEND_VMEM_LIMIT),
    )(qp, rp, fp)
    return out[:, :n], md[:, 0, :n], fd[:, 0, :n]


def use_pallas(query_shape, ref_shape) -> bool:
    """Kernel pays off when the distance matrix is big enough that HBM
    traffic dominates, and we are actually on TPU. Set
    REART_TPU_DISABLE_PALLAS=1 to force the jnp path (debugging valve)."""
    import os

    if os.environ.get("REART_TPU_DISABLE_PALLAS"):
        return False
    dev = jax.config.jax_default_device
    if dev is not None and dev.platform != "tpu":
        return False  # inside an on_host()/default_device(cpu) region
    if jax.default_backend() != "tpu":
        return False
    n, m = query_shape[-2], ref_shape[-2]
    return n * m >= 512 * 512


def nn_topk(query: jnp.ndarray, ref: jnp.ndarray, k: int):
    """Batched k-NN with automatic kernel dispatch.

    query (..., N, 3), ref (..., M, 3) -> (sqdists (..., N, k), idx).
    Leading batch dims are flattened for the kernel.
    """
    if not use_pallas(query.shape, ref.shape):
        from reart_tpu.ops.distance import pairwise_sqdist

        sq = pairwise_sqdist(query, ref)
        if k == 1:  # argmin reduction, not a top_k sort
            idx = jnp.argmin(sq, axis=-1)[..., None]
            d = jnp.take_along_axis(sq, idx, axis=-1)
            return jnp.clip(d, min=0.0), idx
        neg_d, idx = jax.lax.top_k(-sq, k)
        return jnp.clip(-neg_d, min=0.0), idx

    batch = query.shape[:-2]
    # Neighbor search is NON-DIFFERENTIABLE by design (indices are integers;
    # every differentiable consumer recomputes distances by gathering): cut
    # tangents here so pallas_call is never asked for a JVP rule.
    q = jax.lax.stop_gradient(query).reshape((-1,) + query.shape[-2:])
    r = jax.lax.stop_gradient(
        jnp.broadcast_to(ref, batch + ref.shape[-2:])
    ).reshape((-1,) + ref.shape[-2:])
    d, i = nn_topk_pallas(q, r, k)
    return d.reshape(batch + d.shape[-2:]), i.reshape(batch + i.shape[-2:])

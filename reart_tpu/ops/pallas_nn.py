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
TILE_M = 1024


def _nn_kernel(k: int, q_ref, r_ref, d_ref, i_ref):
    """Grid (B, N/TN, M/TM); M innermost so the (1, k, TN) output blocks are
    revisited and act as running top-k accumulators."""
    j = pl.program_id(2)
    q = q_ref[0]  # (TN, 3)
    r = r_ref[0]  # (TM, 3)

    # squared distances without a K=3 matmul: 3 broadcasted VPU passes
    d = jnp.zeros((q.shape[0], r.shape[0]), jnp.float32)
    for c in range(3):
        diff = q[:, c:c + 1] - r[:, c].reshape(1, -1)
        d = d + diff * diff

    # tile-local top-k (ascending distance). lax.top_k is on negated values;
    # ties then prefer the lower index, matching the jnp path.
    neg_d, idx = jax.lax.top_k(-d, k)  # (TN, k)
    idx = idx + j * r.shape[0]

    @pl.when(j == 0)
    def _():
        d_ref[0] = -neg_d.T  # (k, TN)
        i_ref[0] = idx.T.astype(jnp.int32)

    @pl.when(j > 0)
    def _():
        # merge running top-k with tile top-k: 2k candidates -> k
        run_d = d_ref[0].T  # (TN, k)
        run_i = i_ref[0].T
        cand_d = jnp.concatenate([run_d, -neg_d], axis=1)  # (TN, 2k)
        cand_i = jnp.concatenate([run_i, idx], axis=1)
        # stable ascending selection with index tiebreak: top_k on negated
        # distances breaks ties by position, and running entries (lower
        # original indices) come first in the concatenation.
        neg_best, pos = jax.lax.top_k(-cand_d, k)
        d_ref[0] = (-neg_best).T
        i_ref[0] = jnp.take_along_axis(cand_i, pos, axis=1).T.astype(jnp.int32)


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
    qp, n = _pad_points(query, TILE_N)
    rp, m = _pad_points(ref, TILE_M)
    np_, mp = qp.shape[1], rp.shape[1]

    grid = (b, np_ // TILE_N, mp // TILE_M)
    d_t, i_t = pl.pallas_call(
        functools.partial(_nn_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, 3), lambda bi, i, j: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, 3), lambda bi, i, j: (bi, j, 0),
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
    )(qp, rp)
    d_out = jnp.moveaxis(d_t, 1, 2)[:, :n]  # (B, N, k)
    i_out = jnp.moveaxis(i_t, 1, 2)[:, :n]
    return jnp.clip(d_out, min=0.0), i_out


def use_pallas(query_shape, ref_shape) -> bool:
    """Kernel pays off when the distance matrix is big enough that HBM
    traffic dominates, and we are actually on TPU."""
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
        neg_d, idx = jax.lax.top_k(-sq, k)
        return jnp.clip(-neg_d, min=0.0), idx

    batch = query.shape[:-2]
    q = query.reshape((-1,) + query.shape[-2:])
    r = jnp.broadcast_to(ref, batch + ref.shape[-2:]).reshape(
        (-1,) + ref.shape[-2:])
    d, i = nn_topk_pallas(q, r, k)
    return d.reshape(batch + d.shape[-2:]), i.reshape(batch + i.shape[-2:])

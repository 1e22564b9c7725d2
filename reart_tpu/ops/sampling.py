"""Farthest-point sampling, ball query, gathering — compiled control flow.

Replaces the reference's CUDA kernels (networks/pointnet_lib/src/
sampling_gpu.cu, ball_query_gpu.cu, group_points_gpu.cu) with
`lax.fori_loop` / top-k formulations that XLA compiles onto the TPU without
dynamic shapes.

Determinism contract preserved from the CUDA kernels:
  * FPS always starts at index 0 (sampling_gpu.cu:113-115), not at a random
    index like the reference's python fallback;
  * ball query returns the first `nsample` in-radius indices in point order,
    padding with the first in-radius point (ball_query_gpu.cu:9-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reart_tpu.ops.distance import pairwise_sqdist


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather: points (B, N, C), idx (B, ...) -> (B, ..., C).
    (reference networks/pointnet2_utils.py:54-71)

    Formulated as a FLAT 1-D row take (batch offsets folded into the
    indices) rather than take_along_axis: measured 1.5-1.9x faster on TPU
    at the corr backbone's grouping shapes (scripts/ab_gather_fwd.py,
    (8, 65k, 3): 2.6 vs 4.9 ms; (8, 16k, 320): 1.9 vs 2.9 ms) — XLA lowers
    the flat take to a plain row gather where the batched take_along_axis
    pays a composite-index path. Same values, same autodiff class."""
    b, n = points.shape[0], points.shape[1]
    flat = idx.reshape(b, -1)
    offs = (jnp.arange(b, dtype=flat.dtype) * n)[:, None]
    out = jnp.take(points.reshape(b * n, points.shape[-1]),
                   (flat + offs).reshape(-1), axis=0)
    return out.reshape(idx.shape + (points.shape[-1],))


# XLA differentiates take_along_axis with a scatter-add, which TPUs can
# execute as a serialized update loop (see CLAUDE.md: ~300x vs masked
# reductions at fit-engine shapes). This variant keeps the fast gather
# forward but expresses the cotangent as a chunked one-hot matmul:
# grad_points[b] = onehot(idx[b])^T @ g[b], a (M, N)x(M, C) contraction
# that rides the MXU. Chunked over M so the one-hot block stays ~32 MB.
# Honest measurement at the corr trainer's shapes: step-level NEUTRAL
# (scripts/ab_gather_grad.py, one session: 41.0 vs 40.9 ms f32 — the step
# is dominated by the CE tail, and XLA's scatter handles the backbone's
# gathers fine there). Kept wired into models/pointnet2.py because it is
# never slower, the backward cost is shape-predictable (no scatter
# serialization cliff), and the grads are tested identical
# (tests/test_ops.py). Index cotangent is float0 (not differentiable).
_ONEHOT_BLOCK_BYTES = 32 * 1024 * 1024


@jax.custom_vjp
def index_points_mm(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """index_points with a matmul (not scatter) backward. Same contract."""
    return index_points(points, idx)


def _ip_mm_fwd(points, idx):
    return index_points(points, idx), (idx, points.shape)


def _ip_mm_bwd(res, g):
    import numpy as np

    idx, pshape = res
    b, n, c = pshape
    pdtype = g.dtype  # gather preserves dtype: cotangent dtype == points'
    gf = g.reshape(b, -1, c).astype(jnp.float32)
    fi = idx.reshape(b, -1).astype(jnp.int32)
    m = fi.shape[1]
    chunk = max(128, min(m, _ONEHOT_BLOCK_BYTES // (4 * b * n)))
    pad = (-m) % chunk
    if pad:
        # zero cotangents contribute nothing, any index is safe padding
        fi = jnp.concatenate([fi, jnp.zeros((b, pad), jnp.int32)], 1)
        gf = jnp.concatenate([gf, jnp.zeros((b, pad, c), gf.dtype)], 1)
    nch = fi.shape[1] // chunk
    cols = jnp.arange(n, dtype=jnp.int32)

    def body(acc, inp):
        ic, gc = inp  # (B, chunk), (B, chunk, C)
        oh = (ic[..., None] == cols).astype(gf.dtype)  # (B, chunk, N)
        return acc + jnp.einsum("bmn,bmc->bnc", oh, gc,
                                preferred_element_type=jnp.float32), None

    if nch == 1:
        acc, _ = body(jnp.zeros((b, n, c), gf.dtype), (fi, gf))
    else:
        fi_s = jnp.moveaxis(fi.reshape(b, nch, chunk), 1, 0)
        gf_s = jnp.moveaxis(gf.reshape(b, nch, chunk, c), 1, 0)
        acc, _ = jax.lax.scan(body, jnp.zeros((b, n, c), gf.dtype),
                              (fi_s, gf_s))
    return acc.astype(pdtype), np.zeros(idx.shape, jax.dtypes.float0)


index_points_mm.defvjp(_ip_mm_fwd, _ip_mm_bwd)


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative FPS. xyz: (B, N, 3) -> indices (B, npoint), starting at 0.

    The loop is inherently sequential over npoint; each step is a masked
    distance update + argmax over N — pure VPU work under `lax.fori_loop`.
    """
    b, n, _ = xyz.shape
    mask = jnp.ones((b, n), dtype=bool)
    if _use_fps_kernel(xyz, npoint):
        return fps_pallas_dispatch(xyz, mask, npoint)
    start = jnp.zeros((b,), dtype=jnp.int32)
    return _fps_loop(xyz, mask, start, npoint)


def masked_farthest_point_sample(
    xyz: jnp.ndarray, mask: jnp.ndarray, npoint: int
) -> jnp.ndarray:
    """FPS restricted to `mask`-selected points, static shapes.

    Equivalent to running FPS on the compacted subset (what the reference
    does per part in graph_utils.fps_sample_cano:39-54): the start point is
    the first masked index, and unmasked points can never be selected.
    Returns indices into the ORIGINAL point array.

    xyz: (B, N, 3); mask: (B, N) bool. Caller guarantees >= npoint true
    entries per row (the reference raises otherwise; we cannot under jit).
    """
    if _use_fps_kernel(xyz, npoint):
        return fps_pallas_dispatch(xyz, mask, npoint)
    start = jnp.argmax(mask, axis=-1).astype(jnp.int32)
    return _fps_loop(xyz, mask, start, npoint)


def _use_fps_kernel(xyz, npoint: int) -> bool:
    from reart_tpu.ops.pallas_fps import fps_kernel_available

    # the kernel computes distances in f32; wider inputs fall back to the
    # loop so the bit-identical-selection contract holds on near-ties
    if xyz.dtype != jnp.float32:
        return False
    return fps_kernel_available(xyz.shape[1], npoint, batch=xyz.shape[0])


def fps_pallas_dispatch(xyz, mask, npoint: int):
    """Resident-kernel FPS: the whole sequential loop in one launch (the
    fori_loop path pays ~0.3 ms/step of XLA op overhead for microseconds of
    math); bit-identical selection order. The kernel derives the start point
    as the first masked index — exactly the two public entry points'
    conventions (index 0 unmasked / first masked index), which is why the
    dispatch lives HERE and not in `_fps_loop` (whose `start` argument is
    free)."""
    from reart_tpu.ops.pallas_fps import fps_pallas

    return fps_pallas(jax.lax.stop_gradient(xyz), mask, npoint)


def _fps_loop(xyz, mask, start, npoint):
    b, n, _ = xyz.shape
    neg_inf = jnp.asarray(-jnp.inf, dtype=xyz.dtype)

    def body(i, state):
        dist, farthest, out = state
        out = out.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None].repeat(3, -1), axis=1)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)  # (B, N)
        dist = jnp.minimum(dist, d)
        score = jnp.where(mask, dist, neg_inf)
        farthest = jnp.argmax(score, axis=-1).astype(jnp.int32)
        return dist, farthest, out

    dist0 = jnp.full((b, n), jnp.inf, dtype=xyz.dtype)
    out0 = jnp.zeros((b, npoint), dtype=jnp.int32)
    _, _, out = jax.lax.fori_loop(0, npoint, body, (dist0, start, out0))
    return out


def ball_query(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    """For each query centroid, indices of up to `nsample` points within
    `radius`, in point order, padded with the first in-radius point.

    xyz: (B, N, 3) points; new_xyz: (B, S, 3) centroids -> (B, S, nsample).

    Formulation: rank points by the key (out_of_radius * N + index) and take
    the `nsample` smallest — in-radius points in index order come first. A
    top-k over a monotone int key replaces the CUDA kernel's sequential scan.

    MEASURED AND REJECTED (round 5): a Pallas formulation
    (ops/pallas_nn.ball_query_pallas, kept for reference) replacing the
    top_k sort with K sequential masked-min passes in-kernel — index-exact
    at every shape, but SLOWER at the corr backbone's K=128 (3.9 vs 2.0 ms
    at (8, 512, 1024); a wash at K=32): the per-slot min+mask pass costs
    ~4 lane-ops over the whole (TN, N) tile, so total work scales with
    K*S*N and overtakes the sort's N log N by K~64. The sort is the right
    tool here.
    """
    b, n, _ = xyz.shape
    sq = pairwise_sqdist(new_xyz, xyz)  # (B, S, N)
    in_radius = sq < (radius * radius)
    arange = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(in_radius, arange, arange + n)  # (B, S, N)
    neg_topk, _ = jax.lax.top_k(-key, nsample)
    sel = -neg_topk  # ascending keys
    idx = jnp.where(sel < n, sel, sel - n)  # candidate indices
    valid = sel < n
    first = idx[..., :1]  # first in-radius point (or index of point 0)
    return jnp.where(valid, idx, first)

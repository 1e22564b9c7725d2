"""Pairwise distances, k-NN, Chamfer — MXU-shaped (pure jnp).

Replaces the reference's external CUDA wheels:
  * knn_cuda.KNN (1-NN label transfer, 3-NN flow blending; reference
    run_robot.py:65-66, utils/model_utils.py:41-51, utils/flow_utils.py:147)
  * chamferdist._C.knn_points_idx (bidirectional Chamfer; utils/chamfer.py)

Differentiability: distances to argmin neighbors are recomputed from gathered
points, so gradients flow through a cheap gather instead of the O(N^2)
distance matrix (the argmin indices themselves are integer, non-diff — same
semantics as the reference's autograd.Function backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances. x: (..., N, C), y: (..., M, C) -> (..., N, M).

    ||x||^2 + ||y||^2 - 2 x.y^T: one batched matmul (MXU) + rank-1 updates.
    Clamped at 0 against cancellation noise.
    """
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("...nc,...mc->...nm", x, y)
    return jnp.clip(x2 + y2 - 2.0 * xy, min=0.0)


def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int):
    """k nearest neighbors of `query` in `ref`.

    query: (..., N, C), ref: (..., M, C).
    Returns (dists, idx): euclidean (NOT squared) distances (..., N, k) in
    ascending order and neighbor indices — the knn_cuda.KNN contract the
    reference relies on for inverse-distance weighting (flow_utils.py:158-163).

    3-D point sets route through the fused Pallas kernel on TPU (large
    shapes); everything else takes the materialized-matrix jnp path.
    """
    if query.shape[-1] == 3 and ref.shape[-1] == 3:
        from reart_tpu.ops.pallas_nn import nn_topk

        sq, idx = nn_topk(query, ref, k)
        return jnp.sqrt(sq), idx
    sq = pairwise_sqdist(query, ref)
    neg_d, idx = jax.lax.top_k(-sq, k)
    return jnp.sqrt(jnp.clip(-neg_d, min=0.0)), idx


def nearest_neighbor(query: jnp.ndarray, ref: jnp.ndarray):
    """1-NN: returns (sq_dists (..., N), idx (..., N))."""
    if query.shape[-1] == 3 and ref.shape[-1] == 3:
        from reart_tpu.ops.pallas_nn import nn_topk

        sq, idx = nn_topk(query, ref, 1)
        return sq[..., 0], idx[..., 0]
    sq = pairwise_sqdist(query, ref)
    idx = jnp.argmin(sq, axis=-1)
    d = jnp.take_along_axis(sq, idx[..., None], axis=-1)[..., 0]
    return d, idx


def _gathered_sqdist(src: jnp.ndarray, tgt: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Differentiable squared distance of src[i] to tgt[idx[i]]."""
    nn = jnp.take_along_axis(tgt, idx[..., None].repeat(tgt.shape[-1], -1), axis=-2)
    return jnp.sum((src - nn) ** 2, axis=-1)


@jax.custom_vjp
def _nn_points_pallas(query: jnp.ndarray, ref: jnp.ndarray):
    """Per-point NN squared distance + (non-diff) index, kernel-gathered.

    query/ref (B, N|M, 3) -> (d (B, N), idx (B, N)). The kernel extracts the
    winning neighbor's coords in VMEM (one-hot matmul), so neither the
    forward value nor the query gradient needs an XLA row-gather — at nao
    scale each such gather fusion costs more than the neighbor kernel
    itself. Gradients flow to BOTH args: d/dquery = 2(query - nn) directly;
    d/dref = the matching scatter-add (DCE'd by XLA when ref is a constant,
    e.g. the observed clouds in recon_loss's forward direction)."""
    from reart_tpu.ops.pallas_nn import nn1_coords_pallas

    d, idx, _ = nn1_coords_pallas(query, ref)
    return d, idx


def _nn_points_pallas_fwd(query, ref):
    from reart_tpu.ops.pallas_nn import nn1_coords_pallas

    d, idx, coords = nn1_coords_pallas(query, ref)
    return (d, idx), (query, coords, idx, ref.shape[-2])


def _nn_points_pallas_bwd(res, cts):
    query, coords, idx, m = res
    g = cts[0]  # cotangent of d; idx cotangent is float0
    resid = 2.0 * g[..., None] * (query - coords)  # (B, N, 3)
    grad_ref = jax.vmap(
        lambda i, r: jnp.zeros((m, 3), r.dtype).at[i].add(r)
    )(idx, -resid)
    return resid, grad_ref


_nn_points_pallas.defvjp(_nn_points_pallas_fwd, _nn_points_pallas_bwd)


@jax.custom_vjp
def _nn_points_bidir_pallas(src: jnp.ndarray, tgt: jnp.ndarray):
    """Bidirectional per-point NN squared distances + (non-diff) indices in
    ONE fused kernel pass: the (TN, M) distance tile is computed once and
    reduced along both axes (pallas_nn.nn1_bidir_coords_pallas), where the
    two-call path recomputes it per direction.

    src/tgt (B, N|M, 3) -> (d_fwd (B, N), idx_fwd, d_bwd (B, M), idx_bwd).
    Gradients flow to both clouds exactly as in the two-call path: direct
    residuals for the query side of each direction, matching scatter-adds
    for the ref side (DCE'd by XLA when that cloud is a constant)."""
    from reart_tpu.ops.pallas_nn import nn1_bidir_coords_pallas

    fd, fi, _, bd, bi, _ = nn1_bidir_coords_pallas(src, tgt)
    return fd, fi, bd, bi


def _nn_points_bidir_fwd(src, tgt):
    from reart_tpu.ops.pallas_nn import nn1_bidir_coords_pallas

    fd, fi, fc, bd, bi, bc = nn1_bidir_coords_pallas(src, tgt)
    return (fd, fi, bd, bi), (src, tgt, fc, bc, fi, bi)


def _nn_points_bidir_bwd(res, cts):
    src, tgt, fc, bc, fi, bi = res
    gf, _, gb, _ = cts  # index cotangents are float0
    resid_f = 2.0 * gf[..., None] * (src - fc)  # (B, N, 3)
    resid_b = 2.0 * gb[..., None] * (tgt - bc)  # (B, M, 3)
    grad_src = resid_f + jax.vmap(
        lambda i, r, n: jnp.zeros((n, 3), r.dtype).at[i].add(r),
        in_axes=(0, 0, None),
    )(bi, -resid_b, src.shape[-2])
    grad_tgt = resid_b + jax.vmap(
        lambda i, r, n: jnp.zeros((n, 3), r.dtype).at[i].add(r),
        in_axes=(0, 0, None),
    )(fi, -resid_f, tgt.shape[-2])
    return grad_src, grad_tgt


_nn_points_bidir_pallas.defvjp(_nn_points_bidir_fwd, _nn_points_bidir_bwd)


def _nn_bidir_sqdist_with_idx(src: jnp.ndarray, tgt: jnp.ndarray):
    """((d_fwd, idx_fwd), (d_bwd, idx_bwd)) of the bidirectional NN,
    differentiable in both clouds; fused single-pass kernel on TPU."""
    from reart_tpu.ops.pallas_nn import use_pallas

    if (src.shape[-1] == 3 and tgt.shape[-1] == 3
            and src.shape[:-2] == tgt.shape[:-2]
            and use_pallas(src.shape, tgt.shape)
            and use_pallas(tgt.shape, src.shape)):
        batch = src.shape[:-2]
        fd, fi, bd, bi = _nn_points_bidir_pallas(
            src.reshape((-1,) + src.shape[-2:]),
            tgt.reshape((-1,) + tgt.shape[-2:]))
        rs = lambda x: x.reshape(batch + x.shape[-1:])
        return (rs(fd), rs(fi)), (rs(bd), rs(bi))
    return _nn_sqdist_with_idx(src, tgt), _nn_sqdist_with_idx(tgt, src)


def _nn_sqdist_with_idx(src: jnp.ndarray, tgt: jnp.ndarray):
    """(d (..., N), idx (..., N)) of each src point to its nearest tgt point,
    differentiable in both clouds; kernel path avoids gathers entirely."""
    from reart_tpu.ops.pallas_nn import use_pallas

    if (src.shape[-1] == 3 and tgt.shape[-1] == 3
            and src.shape[:-2] == tgt.shape[:-2]
            and use_pallas(src.shape, tgt.shape)):
        batch = src.shape[:-2]
        d, idx = _nn_points_pallas(src.reshape((-1,) + src.shape[-2:]),
                                   tgt.reshape((-1,) + tgt.shape[-2:]))
        return d.reshape(batch + d.shape[-1:]), idx.reshape(batch + idx.shape[-1:])
    _, idx = nearest_neighbor(jax.lax.stop_gradient(src),
                              jax.lax.stop_gradient(tgt))
    return _gathered_sqdist(src, tgt, idx), idx


def chamfer(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    bidirectional: bool = False,
    reverse: bool = False,
    return_index: bool = False,
):
    """Per-point squared-distance Chamfer (no reduction), matching the
    reference's ChamferDistance module contract (utils/chamfer.py:20-132,
    reduction deliberately disabled).

    src, tgt: (..., N, 3) / (..., M, 3).
    Returns (the reference contract, utils/chamfer.py:119-132):
      * default: dist_src2tgt (..., N)
      * reverse: dist_tgt2src (..., M)
      * bidirectional: dist_src2tgt + dist_tgt2src elementwise (requires
        N == M — true throughout the pipeline)
      * return_index: additionally the NN indices (fwd[, bwd]).
    """
    if bidirectional:
        (d_fwd, idx_fwd), (d_bwd, idx_bwd) = _nn_bidir_sqdist_with_idx(src, tgt)
    elif reverse:
        d_bwd, idx_bwd = _nn_sqdist_with_idx(tgt, src)
    else:
        d_fwd, idx_fwd = _nn_sqdist_with_idx(src, tgt)
    if bidirectional:
        if return_index:
            return d_fwd + d_bwd, idx_fwd, idx_bwd
        return d_fwd + d_bwd
    if reverse:
        return (d_bwd, idx_bwd) if return_index else d_bwd
    return (d_fwd, idx_fwd) if return_index else d_fwd


def chamfer_loss(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """Summed bidirectional Chamfer: the reference's recon_loss
    (networks/loss.py:24-29 — chamfer(bidirectional) then torch.sum).
    Summed form works for N != M too (sum(fwd + bwd) == sum(fwd) + sum(bwd));
    both directions come from ONE fused kernel pass on TPU."""
    (d_fwd, _), (d_bwd, _) = _nn_bidir_sqdist_with_idx(src, tgt)
    return jnp.sum(d_fwd) + jnp.sum(d_bwd)


def knn_transfer_labels(query_pc: jnp.ndarray, src_pc: jnp.ndarray,
                        src_labels: jnp.ndarray) -> jnp.ndarray:
    """1-NN label transfer (reference knn_query with integer labels,
    utils/model_utils.py:41-51 with k=1: mode of one element = the element)."""
    _, idx = nearest_neighbor(query_pc, src_pc)
    return jnp.take(src_labels, idx, axis=0) if src_labels.ndim == 1 else src_labels[idx]


def knn_transfer_features(query_pc: jnp.ndarray, src_pc: jnp.ndarray,
                          src_feat: jnp.ndarray) -> jnp.ndarray:
    """1-NN feature transfer (knn_query with 2-D input: mean over k=1)."""
    _, idx = nearest_neighbor(query_pc, src_pc)
    return src_feat[idx]

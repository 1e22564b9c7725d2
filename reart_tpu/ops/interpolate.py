"""Inverse-distance interpolation and anchor-flow blending (pure jnp).

Replaces the reference's three_nn / three_interpolate CUDA kernels
(networks/pointnet_lib/src/interpolate_gpu.cu) and the knn_cuda-based
`blend_anchor_motion` (utils/flow_utils.py:147-170).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reart_tpu.ops.distance import knn, pairwise_sqdist


def three_interpolate(
    xyz_query: jnp.ndarray,
    xyz_ref: jnp.ndarray,
    feat_ref: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-square-distance 3-NN feature interpolation.

    xyz_query: (..., N, 3); xyz_ref: (..., S, 3); feat_ref: (..., S, D).
    Matches the reference's feature-propagation weighting
    (networks/pointnet2_utils.py:329-336: 1 / (sqdist + 1e-8), normalized).
    """
    sq = pairwise_sqdist(xyz_query, xyz_ref)
    k = min(3, xyz_ref.shape[-2])
    neg_d, idx = jax.lax.top_k(-sq, k)
    d = jnp.clip(-neg_d, min=0.0)
    w = 1.0 / (d + eps)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = _gather_neighbors(feat_ref, idx)
    return jnp.sum(gathered * w[..., None], axis=-2)


def _gather_neighbors(feat_ref: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feat_ref (..., S, D), idx (..., N, k) -> (..., N, k, D)."""
    d = feat_ref.shape[-1]
    batch = idx.shape[:-2]
    n, k = idx.shape[-2], idx.shape[-1]
    flat_idx = idx.reshape(batch + (n * k,))
    out = jnp.take_along_axis(feat_ref, flat_idx[..., None].repeat(d, -1), axis=-2)
    return out.reshape(batch + (n, k, d))


def blend_anchor_motion(
    query_loc: jnp.ndarray,
    reference_loc: jnp.ndarray,
    reference_flow: jnp.ndarray,
    k: int = 3,
    return_mask: bool = False,
):
    """Approximate flow on query points from k anchor flows.

    (reference utils/flow_utils.py:147-170) Weights are inverse *euclidean*
    distance (knn_cuda returns sqrt distances), floored at 1e-10. The validity
    mask is min_dist <= max squared-flow-norm OR min_dist <= 0.05 — the
    reference's unit-mixing comparison, preserved verbatim.

    query_loc: (m, 3); reference_loc/flow: (n, 3).
    """
    dists, idx = knn(query_loc, reference_loc, k)  # euclidean, ascending
    dists = jnp.maximum(dists, 1e-10)
    weight = 1.0 / dists
    weight = weight / jnp.sum(weight, axis=-1, keepdims=True)
    flows = _gather_neighbors(reference_flow, idx)  # (m, k, 3)
    blended = jnp.sum(flows * weight[..., None], axis=-2)
    if not return_mask:
        return blended
    min_dists = jnp.min(dists, axis=-1)
    flow_dists = jnp.max(jnp.sum(flows ** 2, axis=-1), axis=-1)
    mask = jnp.logical_or(min_dists <= flow_dists, min_dists <= 0.05)
    return blended, mask


def blend_anchor_motion_batched(
    query_loc: jnp.ndarray,
    reference_loc: jnp.ndarray,
    reference_flow: jnp.ndarray,
):
    """Batched `blend_anchor_motion(k=3, return_mask=True)`.

    query_loc (B, N, 3), reference_loc/flow (B, M, 3) ->
    (blended (B, N, 3), mask (B, N)).

    On TPU (large shapes, single-tile M) this runs the fused Pallas blend
    kernel — the jnp path's (B, N, 3, 3) anchor-flow gather is an XLA gather
    fusion that costs more than every neighbor kernel combined (4.2 ms/iter
    at nao scale); the kernel replaces it with a weighted one-hot matmul in
    VMEM. Non-differentiable (callers blend under stop_gradient)."""
    from reart_tpu.ops.pallas_nn import MAX_TILE_M, blend3_pallas, use_pallas

    if (use_pallas(query_loc.shape, reference_loc.shape)
            and reference_loc.shape[-2] <= MAX_TILE_M
            and reference_loc.shape[-2] >= 3):
        blended, min_d, flow_d = blend3_pallas(
            jax.lax.stop_gradient(query_loc),
            jax.lax.stop_gradient(reference_loc),
            jax.lax.stop_gradient(reference_flow))
        mask = jnp.logical_or(min_d <= flow_d, min_d <= 0.05)
        return blended, mask
    return jax.vmap(
        lambda q, r, f: blend_anchor_motion(q, r, f, return_mask=True)
    )(query_loc, reference_loc, reference_flow)

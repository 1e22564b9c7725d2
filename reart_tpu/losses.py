"""Training losses for both model stages.

Parity targets: networks/loss.py (flow / recon / structure / connection) and
the inline assignment loss in the drivers (run_robot.py:164-187).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reart_tpu.ops import chamfer_loss


def recon_loss(pc_trans_list: jnp.ndarray, pc_list: jnp.ndarray) -> jnp.ndarray:
    """Summed bidirectional Chamfer. (loss.py:24-29)"""
    return chamfer_loss(pc_trans_list, pc_list)


def _huber(x: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    absx = jnp.abs(x)
    return jnp.where(absx < delta, 0.5 * x * x, delta * (absx - 0.5 * delta))


def flow_loss(
    gt_flow_list: jnp.ndarray,
    pred_flow_list: jnp.ndarray,
    flow_mask_list: jnp.ndarray | None = None,
    robust: bool = False,
    smooth_weight: float = 1e-2,
) -> jnp.ndarray:
    """Masked per-point flow loss + smoothness on unmasked points.
    (loss.py:10-21; note the reference passes (pairwise_flow, pred_flow) in
    (gt, pred) order at run_robot.py:208 — argument names follow loss.py.)"""
    if flow_mask_list is None:
        flow_mask_list = jnp.ones(pred_flow_list.shape[:2], dtype=pred_flow_list.dtype)
    else:
        flow_mask_list = flow_mask_list.astype(pred_flow_list.dtype)
    diff = pred_flow_list - gt_flow_list
    f = jnp.sum(_huber(diff) if robust else diff * diff, axis=2)
    smooth = jnp.sum(pred_flow_list ** 2, axis=2)
    return jnp.sum(flow_mask_list * f + smooth_weight * (1.0 - flow_mask_list) * smooth)


def assignment_loss(
    pc_src: jnp.ndarray,
    pc_tgt: jnp.ndarray,
    perm: jnp.ndarray,
) -> jnp.ndarray:
    """Squared error over Hungarian-matched pairs.

    pc_src, pc_tgt: (T, M, 3); perm: (T, M) int — for row i of frame t the
    matched target is perm[t, i] (the reference stores (src_idx, tgt_idx)
    pairs from scipy.linear_sum_assignment; src rows are always 0..M-1 for
    square costs, so a single permutation array is the same information).
    (run_robot.py:182-184)
    """
    matched = jnp.take_along_axis(pc_tgt, perm[..., None].repeat(3, -1), axis=1)
    return jnp.sum((pc_src - matched) ** 2)


def structure_loss(rel_trans_list, axis, moment, theta, distance, edge_list):
    """Screw-consistency loss: per-edge relative transforms vs the transform
    reconstructed from the (no-grad) time-mean screw with hard joint typing
    by mean |theta| vs mean |d|. (loss.py:30-56 — defined in the reference
    but not called by its drivers; kept for capability parity.)

    rel_trans_list (T, P, P, 4, 4); axis/moment (T, P, P, 3); theta/distance
    (T, P, P); edge_list (E, 2).
    """
    from reart_tpu.geometry import (
        screw_param_to_exponential_coordinates,
        transform_from_exponential_coordinates,
    )
    from reart_tpu.graph.costs import compute_mean_screw_param, frobenius_cost

    edge_list = jnp.asarray(edge_list)
    e0, e1 = edge_list[:, 0], edge_list[:, 1]
    sel_rel = rel_trans_list[:, e0, e1]
    sel_axis = axis[:, e0, e1]
    sel_moment = moment[:, e0, e1]
    sel_theta = theta[:, e0, e1]
    sel_dist = distance[:, e0, e1]
    t, e = sel_theta.shape

    mean_axis, mean_moment = compute_mean_screw_param(
        sel_axis, sel_moment, sel_theta, sel_dist
    )
    mean_axis = jnp.broadcast_to(mean_axis[None], (t, e, 3))
    mean_moment = jnp.broadcast_to(mean_moment[None], (t, e, 3))
    pris = (jnp.mean(jnp.abs(sel_dist), 0) > jnp.mean(jnp.abs(sel_theta), 0))[None]
    theta_eff = jnp.where(pris, 1e-6, sel_theta)
    dist_eff = jnp.where(pris, sel_dist, 1e-6)
    log_t = screw_param_to_exponential_coordinates(
        mean_axis, mean_moment, theta_eff, dist_eff
    )
    target = jax.lax.stop_gradient(transform_from_exponential_coordinates(log_t))
    return jnp.sum(frobenius_cost(sel_rel, target))


def compute_connection_loss(cano_pc, seg_part, joint_connection,
                            pc_trans_list, k: int = 10):
    """Joint-contact consistency: the k closest cross-part point pairs (in
    the canonical frame) must stay together over time. (loss.py:59-79 —
    unused by the reference drivers; host-level loop over edges since part
    sizes are data-dependent.)"""
    from reart_tpu.ops.distance import chamfer

    seg_part = jnp.asarray(seg_part)
    loss = jnp.zeros((), pc_trans_list.dtype)
    import numpy as np

    seg_np = np.asarray(seg_part)
    for edge in np.asarray(joint_connection):
        src_idx_all = np.nonzero(seg_np == edge[0])[0]
        tgt_idx_all = np.nonzero(seg_np == edge[1])[0]
        src_pc = cano_pc[src_idx_all]
        tgt_pc = cano_pc[tgt_idx_all]
        d_s2t, nn_tgt = chamfer(src_pc, tgt_pc, return_index=True)
        neg_top, src_sel = jax.lax.top_k(-d_s2t, k)
        tgt_sel = nn_tgt[src_sel]
        raw_src = jnp.asarray(src_idx_all)[src_sel]
        raw_tgt = jnp.asarray(tgt_idx_all)[tgt_sel]
        d = jnp.sum(
            (pc_trans_list[:, raw_src] - pc_trans_list[:, raw_tgt]) ** 2, axis=2
        ).mean(axis=1)
        loss = loss + jnp.sum(d)
    return loss


def group_temporal_err(pc_list: jnp.ndarray, seg_part: jnp.ndarray,
                       num_parts: int) -> jnp.ndarray:
    """Max-over-parts mean squared spread of part points around the part
    centroid across time. (utils/model_utils.py:106-118)

    pc_list: (T, N, 3); seg_part: (N,). Parts absent from seg get -inf spread
    and never win the max. Matches the reference's per-part mean over
    (T * N_part) entries.
    """
    w = jax.nn.one_hot(seg_part, num_parts, dtype=pc_list.dtype)  # (N, P)
    cnt = jnp.sum(w, axis=0)  # (P,)
    safe_cnt = jnp.maximum(cnt, 1.0)
    centroid = jnp.einsum("tnc,np->tpc", pc_list, w) / safe_cnt[None, :, None]
    # squared distance of each point to its part centroid, per frame
    cent_per_point = jnp.einsum("tpc,np->tnc", centroid, w)
    d = jnp.sum((pc_list - cent_per_point) ** 2, axis=2)  # (T, N)
    per_part = jnp.einsum("tn,np->p", d, w) / (safe_cnt * pc_list.shape[0])
    return jnp.max(jnp.where(cnt > 0, per_part, -jnp.inf))

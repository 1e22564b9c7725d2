"""Relaxation ("base") model: soft segmentation + free per-part SE(3) proposals.

Capability-equivalent to the reference's BaseModel (networks/model.py:11-70):
  * a per-point seg MLP 3 -> 128 -> P (no norm, no bias on the last layer);
  * learnable `proposal_6d` (T-1, P, 6) initialized to the identity 6d rep
    and `proposal_t` (T-1, P, 3) zeros;
  * forward: Gumbel-softmax(hard) part weights, per-part rigid transform of
    the canonical cloud, weight-blended sum.

TPU-native formulation: because the blend is linear, we blend the 3x4
transform matrices per point first (sum_p w[n,p] M[t,p]) and then apply one
(3x4) @ homogeneous-point product — avoids materializing the (T-1, P, N, 3)
intermediate the reference creates (model.py:63-69), cutting HBM traffic by
P/4x. Identical math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reart_tpu.geometry import rotation_6d_to_matrix, rt_to_transform
from reart_tpu.models.blocks import init_mlp, apply_mlp

IDENTITY_6D = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


def init_base_params(key, num_parts: int, pose_len: int, hidden: int = 128):
    """Returns the trainable pytree of the relaxation stage."""
    seg = init_mlp(key, (3, hidden, num_parts))
    proposal_6d = jnp.tile(
        jnp.asarray(IDENTITY_6D, dtype=jnp.float32)[None, None, :],
        (pose_len, num_parts, 1),
    )
    proposal_t = jnp.zeros((pose_len, num_parts, 3), dtype=jnp.float32)
    return {"seg": seg, "proposal_6d": proposal_6d, "proposal_t": proposal_t}


def gumbel_softmax(key, logits: jnp.ndarray, tau: float, hard: bool = True) -> jnp.ndarray:
    """Straight-through Gumbel-softmax over the last axis (protocol identical
    to torch.nn.functional.gumbel_softmax(hard=True); RNG stream differs)."""
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if not hard:
        return y
    one_hot = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits.shape[-1], dtype=y.dtype)
    return one_hot + y - jax.lax.stop_gradient(y)


def base_seg_logits(params, cano_pc: jnp.ndarray) -> jnp.ndarray:
    """Per-point segmentation logits (N, P)."""
    return apply_mlp(params["seg"], cano_pc)


def transform_points_blend(weight: jnp.ndarray, trans_list: jnp.ndarray,
                           pc: jnp.ndarray) -> jnp.ndarray:
    """Blend per-part rigid transforms per point, then apply.

    weight: (N, P); trans_list: (T, P, 4, 4); pc: (N, 3) -> (T, N, 3).
    sum_p w[n,p] (R_tp x_n + t_tp) == (sum_p w[n,p] M_tp) x_n (linearity).
    """
    m34 = trans_list[..., :3, :]  # (T, P, 3, 4)
    blended = jnp.einsum("np,tpij->tnij", weight, m34)  # (T, N, 3, 4)
    xh = jnp.concatenate([pc, jnp.ones_like(pc[:, :1])], axis=-1)  # (N, 4)
    return jnp.einsum("tnij,nj->tni", blended, xh)


def base_forward(
    params,
    cano_pc: jnp.ndarray,
    key,
    tau: float = 1.0,
    proposal_6d: jnp.ndarray | None = None,
    proposal_t: jnp.ndarray | None = None,
):
    """Forward pass of the relaxation stage.

    Returns (pc_trans_list (T-1, N, 3), seg_argmax (N,), trans_list
    (T-1, P, 4, 4)) — the reference BaseModel.forward contract
    (networks/model.py:39-70).
    """
    logits = base_seg_logits(params, cano_pc)  # (N, P)
    weight = gumbel_softmax(key, logits, tau, hard=True)  # (N, P)
    p6d = params["proposal_6d"] if proposal_6d is None else proposal_6d
    pt = params["proposal_t"] if proposal_t is None else proposal_t
    rotation = rotation_6d_to_matrix(p6d)  # (T-1, P, 3, 3)
    trans_list = rt_to_transform(rotation, pt)  # (T-1, P, 4, 4)
    pc_trans_list = transform_points_blend(weight, trans_list, cano_pc)
    return pc_trans_list, jnp.argmax(logits, axis=-1), trans_list


def compute_pc_transform(cano_pc: jnp.ndarray, pose_list: jnp.ndarray,
                         cano_part: jnp.ndarray) -> jnp.ndarray:
    """Apply per-part poses to the canonical cloud with hard labels.

    (reference utils/model_utils.py:54-67) cano_pc (N, 3),
    pose_list (T, P, 4, 4), cano_part (N,) int -> (T, N, 3).
    """
    num_parts = pose_list.shape[1]
    weight = jax.nn.one_hot(cano_part, num_parts, dtype=cano_pc.dtype)
    return transform_points_blend(weight, pose_list, cano_pc)


def refine_seg_motion(cano_pc, pc_list, trans_list, seg_part,
                      smooth_k: int = 8, smooth_alpha: float = 0.5,
                      rel_margin: float = 0.8, floor_mult: float = 4.0,
                      n_it: int = 1):
    """Motion-consistency segmentation E-step over FIXED fitted poses.

    For each canonical point and each surviving part label, score the mean
    (over frames) 1-NN squared distance from the point CARRIED BY THAT
    PART'S fitted trajectory to the observed cloud — the reconstruction
    error the point would contribute under that label — smooth the score
    field over each point's smooth_k nearest canonical neighbors, and
    relabel a point only when the best alternative beats its CURRENT label's
    score by the relative margin (new < rel_margin * current) AND by an
    absolute floor (current - new > floor_mult * the cloud's median score).
    The relative margin keeps motion-ambiguous points (e.g. between two
    near-static parts, where every label reconstructs equally) on their
    spatially-coherent seg-head label; the absolute floor keeps the E-step
    inert on poorly-converged fits whose per-point scores are all noise of
    the same magnitude (measured on a 400-iter toy fit: margin alone moved
    26 points and LOWERED RI 0.772 -> 0.732; with the floor it moves only
    points whose current label clearly fails to explain their motion, the
    regime where the reference-scale measurement shows the 9x win).

    Why: the reference-scale projection ablation (round 5) attributes the
    sapien full-flow EPE residual to CANONICAL SEGMENTATION error, not
    topology — with GT seg the kinematic projection scores 0.672 EPE where
    the fitted seg scores 3.9, topology held fixed. The seg head is a
    smooth MLP of position; boundary points between parts with different
    motions are exactly the points this motion-consistency test can fix.
    The reference has no counterpart (its seg is the argmax of the same
    kind of MLP, run_robot.py:159).

    cano_pc (N, 3), pc_list (T, N', 3), trans_list (T, P_raw, 4, 4),
    seg_part (N,) int — labels index trans_list columns. Returns the
    refined (N,) labels (same label space).
    """
    from reart_tpu.ops.pallas_nn import nn_topk

    cano = jnp.asarray(cano_pc, jnp.float32)
    pcs = jnp.asarray(pc_list, jnp.float32)
    trans = jnp.asarray(trans_list, jnp.float32)
    seg = jnp.asarray(seg_part)
    n = cano.shape[0]
    t = pcs.shape[0]
    labels = np.unique(np.asarray(seg_part))
    p = len(labels)
    if p < 2:
        return seg
    # pad the candidate-part axis to a bucket of 4 with FAR-away sentinel
    # poses (their reconstruction score is astronomically high, so argmin
    # never selects them): the kernel batch dim is T*P and P varies run to
    # run, which would otherwise cost a fresh ~35 s remote compile per new
    # part count (measured).
    p_pad = -(-p // 4) * 4
    lab = jnp.asarray(np.concatenate([labels] + [labels[:1]]
                                     * (p_pad - p))) if p_pad != p \
        else jnp.asarray(labels)

    # spatial smoothing neighborhood (computed once on the cano cloud)
    _, nbr = nn_topk(cano, cano, smooth_k)  # (N, K) incl. self

    inv = np.zeros(int(labels.max()) + 1, np.int64)
    inv[labels] = np.arange(p)
    seg_c = jnp.asarray(inv)[seg]  # compact current labels (N,)

    for _ in range(n_it):
        # (T, P_pad, N, 3): every point carried by every candidate pose
        sub = trans[:, lab]  # (T, P_pad, 4, 4)
        moved = jnp.einsum("tpij,nj->tpni", sub[:, :, :3, :3], cano) \
            + sub[:, :, None, :3, 3]
        d, _ = nn_topk(moved.reshape(t * p_pad, n, 3),
                       jnp.repeat(pcs, p_pad, axis=0), 1)  # (T*P_pad, N, 1)
        cost = d[..., 0].reshape(t, p_pad, n).mean(0).T  # (N, P_pad)
        # smooth the score field over spatial neighbors
        cost = ((1.0 - smooth_alpha) * cost
                + smooth_alpha * cost[nbr].mean(axis=1))
        cur = jnp.take_along_axis(cost, seg_c[:, None], axis=1)[:, 0]
        best = jnp.argmin(cost, axis=1)
        best_cost = jnp.min(cost, axis=1)
        floor = floor_mult * jnp.median(cur)
        move = (best_cost < rel_margin * cur) & (cur - best_cost > floor)
        seg_c = jnp.where(move, best, seg_c)
    return lab[seg_c]

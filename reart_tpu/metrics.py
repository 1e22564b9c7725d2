"""Evaluation metrics: flow EPE/accuracy/angle, segmentation Rand Index,
Chamfer errors, and the model-selection energy.

Parity targets: utils/eval_utils.py, utils/model_utils.py:92-118 and the
driver-side energy assembly (run_robot.py:306-314). All metrics are batched
jnp (the Rand Index's N x N co-membership product and the Chamfer 1-NN are
MXU work); callers get python floats.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from reart_tpu.losses import group_temporal_err
from reart_tpu.ops.distance import nearest_neighbor, pairwise_sqdist


def eval_flow(pred_flow_list, gt_flow_list, acc1_thre=0.05, acc2_thre=0.1):
    """EPE, Acc@acc1, Acc@acc2 (absolute-or-relative), mean angle error.
    (utils/eval_utils.py:6-22; NaN dot products count as angle 0.)"""
    pred = np.asarray(pred_flow_list, np.float64)
    gt = np.asarray(gt_flow_list, np.float64)
    error = np.sqrt(np.sum((pred - gt) ** 2, 2) + 1e-20)
    gt_len = np.sqrt(np.sum(gt * gt, 2) + 1e-20)
    acc1 = np.mean(np.mean(np.logical_or(error <= acc1_thre, error / gt_len <= acc1_thre), axis=1))
    acc2 = np.mean(np.mean(np.logical_or(error <= acc2_thre, error / gt_len <= acc2_thre), axis=1))
    epe = np.mean(error)
    with np.errstate(invalid="ignore"):
        unit_gt = gt / np.linalg.norm(gt, axis=-1, keepdims=True)
        unit_pred = pred / np.linalg.norm(pred, axis=-1, keepdims=True)
        dot = (unit_gt * unit_pred).sum(2).clip(-1 + 1e-7, 1 - 1e-7)
    dot[np.isnan(dot)] = 1.0
    angle_error = np.mean(np.arccos(dot).mean(axis=1))
    return float(epe), float(acc1), float(acc2), float(angle_error)


def eval_seg(gt_segm, pd_segm) -> float:
    """Rand Index over ordered point pairs incl. self-pairs
    (utils/eval_utils.py:25-36: mean over the N x N co-membership agreement
    matrix), computed in closed form from the S x S contingency table:

        agree = N^2 - (same_gt + same_pd - 2 * same_both)

    where same_both = sum C[a,b]^2, same_gt/same_pd are the squared
    row/column marginals — identical integer counts to the reference's
    dense matrix (a pair disagrees iff exactly one labeling co-groups it),
    at O(N + S^2) instead of O(N^2) memory/compute. The sapien multi-scan
    RI concatenates all views (N = T*4096 = 32k): the dense form built two
    4.3 GB co-membership matrices and took 223 s of the reference-scale
    finalize on one core; this form is exact and instant."""
    gt = np.asarray(gt_segm).astype(np.int64).ravel()
    pd = np.asarray(pd_segm).astype(np.int64).ravel()
    n = gt.shape[0]
    assert pd.shape[0] == n
    assert gt.min() >= 0 and pd.min() >= 0, (
        "eval_seg requires non-negative labels (bincount of gt*s+pd); "
        f"got min gt={gt.min()}, pd={pd.min()}")
    s = int(max(gt.max(), pd.max())) + 1
    c = np.bincount(gt * s + pd, minlength=s * s).reshape(s, s)
    c = c.astype(np.float64)
    same_both = float((c ** 2).sum())
    same_gt = float((c.sum(axis=1) ** 2).sum())
    same_pd = float((c.sum(axis=0) ** 2).sum())
    return float((n * n - (same_gt + same_pd - 2.0 * same_both)) / (n * n))


def compute_chamfer(points_1, points_2, reduction: str = "sum") -> float:
    """Bidirectional squared-distance Chamfer of two clouds
    (utils/eval_utils.py:39-55 — the reference uses a CPU KDTree; 1-NN over a
    pairwise matrix is identical and device-friendly)."""
    p1 = jnp.asarray(points_1, jnp.float32)
    p2 = jnp.asarray(points_2, jnp.float32)
    d12, _ = nearest_neighbor(p1, p2)
    d21, _ = nearest_neighbor(p2, p1)
    red = jnp.mean if reduction == "mean" else jnp.sum
    return float(red(d12) + red(d21))


def compute_chamfer_list(points_set1, points_set2, reduction: str = "sum"):
    """Per-frame Chamfer, reduced (utils/eval_utils.py:58-66).

    Homogeneous frame stacks run as ONE batched 1-NN dispatch on the
    accelerator (hostops.on_device — the finalize calls this inside an
    on_host region, where the per-frame python loop cost 4.4 s of the
    profiled reference-scale sapien finalize on one core; the fused
    neighbor kernel does the same work in milliseconds). Ragged inputs
    keep the per-frame loop."""
    try:
        p1 = np.asarray(points_set1, np.float32)
        p2 = np.asarray(points_set2, np.float32)
        homogeneous = p1.ndim == 3 and p2.ndim == 3
    except ValueError:
        homogeneous = False
    if homogeneous:
        from reart_tpu.hostops import on_device

        with on_device():
            d12, _ = nearest_neighbor(jnp.asarray(p1), jnp.asarray(p2))
            d21, _ = nearest_neighbor(jnp.asarray(p2), jnp.asarray(p1))
            if reduction == "mean":
                per_frame = jnp.mean(d12, -1) + jnp.mean(d21, -1)
            else:
                per_frame = jnp.sum(d12, -1) + jnp.sum(d21, -1)
            cd = np.asarray(per_frame)
    else:
        cd = np.asarray([
            compute_chamfer(p1_, p2_, reduction=reduction)
            for p1_, p2_ in zip(points_set1, points_set2)
        ])
    if reduction == "mean":
        return float(cd.mean())
    if reduction == "sum":
        return float(cd.sum())
    return cd


def compute_ass_err(pc_src_list, pc_tgt_list) -> float:
    """Mean optimal-assignment point error (utils/model_utils.py:92-103):
    per frame, Hungarian on the EUCLIDEAN cdist, then the mean SQUARED
    distance over matched pairs. EXACT, but structured for the hardware:
    the TPU auction presolves near-optimal column duals (one kernel
    launch), and the host JV (native C++, replacing the reference's
    multiprocessing pool) finishes from that warm start with lazily
    materialized cost rows — the (T, N, N) cost matrix never exists on
    either side of the tunnel."""
    from reart_tpu.native import lap_solve_points

    src = np.asarray(pc_src_list, np.float32)
    tgt = np.asarray(pc_tgt_list, np.float32)
    v_init = _auction_duals(src, tgt)
    perm = lap_solve_points(src, tgt, v_init=v_init)
    matched = np.take_along_axis(tgt, perm[..., None].astype(np.int64), axis=1)
    sq_matched = ((src - matched) ** 2).sum(-1).sum(-1)  # (T,)
    return float(sq_matched.mean() / src.shape[1])


def _auction_duals(src: np.ndarray, tgt: np.ndarray):
    """Near-optimal column duals from the TPU auction, or None on CPU-only
    hosts / small problems (where the cold JV is already fast)."""
    from reart_tpu.hostops import on_device
    from reart_tpu.native import get_lib
    from reart_tpu.ops.assignment import auction_lap

    if src.shape[-2] * tgt.shape[-2] < 1024 * 1024:
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "lap_points_batch"):
        return None  # fallback JV ignores duals; don't waste the presolve
    with on_device() as dev:
        if dev is None:
            return None
        cost = jnp.sqrt(pairwise_sqdist(jnp.asarray(src), jnp.asarray(tgt)))
        # Schedule chosen by one-session A/B on the real flagship energy
        # problem (scripts/ab_energy_assign.py, 9 x 4096^2): deeper duals
        # (1e-6, 4 scales) nearly eliminate the host JV's augmentation work
        # — total 10.9 s vs 17.9 s at the previous 1e-5/3 schedule and
        # 34.5 s cold, identical exact assignments in every arm.
        _, price = auction_lap(cost, eps_min=1e-6, num_scales=4,
                               scale_factor=30.0, max_sweeps=400,
                               return_price=True)
        return -np.asarray(price)


def energy(pred_pc_list, pc_list, trans_list, joint_connection, seg_part,
           complete_pred_pc_list=None, include_group: bool = True,
           ass_scale: float | None = None):
    """Model-selection energy (reference conventions, per domain):
    robot = 100 * ass_err + screw_err + group_err (run_robot.py:306-314);
    sapien/real = RAW ass_err + screw_err, no group term
    (run_sapien.py:323-326, run_real.py:297-300 — the x100 is robot-only).
    ass_scale=None follows that convention via include_group (True on the
    robot domain at every call site); pass it explicitly to override."""
    from reart_tpu.graph import compute_screw_cost

    if ass_scale is None:
        ass_scale = 100.0 if include_group else 1.0
    ass_err = ass_scale * compute_ass_err(pred_pc_list, pc_list)
    screw_err = (0.0 if np.asarray(joint_connection).shape[0] == 0 else
                 float(compute_screw_cost(trans_list, joint_connection)))
    total = ass_err + screw_err
    parts = {"ass_err": ass_err, "screw_err": screw_err}
    if include_group:
        assert complete_pred_pc_list is not None
        num_parts = int(jnp.max(jnp.asarray(seg_part))) + 1
        group_err = float(group_temporal_err(
            jnp.asarray(complete_pred_pc_list, jnp.float32),
            jnp.asarray(seg_part, jnp.int32), num_parts,
        ))
        parts["group_err"] = group_err
        total += group_err
    parts["total_err"] = total
    return parts

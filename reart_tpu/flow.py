"""Descriptor matching and flow supervision setup.

Parity targets: utils/flow_utils.py (match_snn / match_smnn / mutual-NN
filtering / compute_corr_list_filter) and the driver's one-time flow-reference
construction (run_robot.py:64-84).

TPU-native formulation: the reference returns variable-length match lists;
under jit we compute fixed-shape per-point indices + validity masks (one
top-2 over an MXU distance matrix per pair), and only compact to ragged lists
on the host when packing the FlowContext — the setup runs once per fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reart_tpu.ops.distance import pairwise_sqdist
from reart_tpu.train.engine import FlowContext


def match_snn(desc1: jnp.ndarray, desc2: jnp.ndarray, th: float = 0.9,
              dm: jnp.ndarray | None = None):
    """First-to-second nearest-neighbor ratio test (flow_utils.py:7-46).

    desc1: (N1, D), desc2: (N2, D). Static-shape result:
    (ratio (N1,), idx_in_2 (N1,), valid (N1,) bool).
    """
    if dm is None:
        dm = jnp.sqrt(pairwise_sqdist(desc1, desc2))
    vals, idxs = jax.lax.top_k(-dm, 2)
    ratio = vals[:, 0] / vals[:, 1]  # == d0/d1 (signs cancel)
    return ratio, idxs[:, 0], ratio <= th


def match_smnn(desc1: jnp.ndarray, desc2: jnp.ndarray, th: float = 0.9,
               dm: jnp.ndarray | None = None):
    """Symmetric (mutual) SNN matching (flow_utils.py:48-100).

    Returns (dists (N1,), tgt_idx (N1,), valid (N1,)): point i of desc1
    matches tgt_idx[i] of desc2 iff valid[i]; dists is the max of the two
    directional ratios (the reference's match_dists), defined where valid.
    """
    if dm is None:
        dm = jnp.sqrt(pairwise_sqdist(desc1, desc2))
    r12, nn12, m12 = match_snn(desc1, desc2, th, dm)
    r21, nn21, m21 = match_snn(desc2, desc1, th, dm.T)
    j = nn12  # (N1,)
    mutual = m12 & m21[j] & (nn21[j] == jnp.arange(desc1.shape[0]))
    dists = jnp.maximum(r12, r21[j])
    return dists, j, mutual


def find_mutual_correspondences(nns01: jnp.ndarray, nns10: jnp.ndarray):
    """Plain mutual-NN filter (flow_utils.py:103-113), static-shape:
    returns (tgt_idx (N0,), valid (N0,))."""
    idx0 = jnp.arange(nns01.shape[0])
    return nns01, nns10[nns01] == idx0


def normalize_pc_list(pc_list, centroid, scale):
    """(flow_utils.py:173-175)"""
    return (pc_list - centroid) * scale


def compute_corr_masks(norm_pc_list, extract_fn, matching: str = "smnn",
                       th: float = 0.9):
    """Correspondences for every consecutive frame pair (flow_utils.py:116-143).

    norm_pc_list: (T, N, 3) normalized clouds. extract_fn: (T', N, 3) ->
    (T', N, D) per-point descriptors (the frozen correspondence backbone).
    Returns (tgt_idx (T-1, N), valid (T-1, N)): frame-pair t matches source
    point i to target point tgt_idx[t, i] where valid.
    """
    norm_pc_list = jnp.asarray(norm_pc_list, jnp.float32)
    src_feat = extract_fn(norm_pc_list[:-1])  # (T-1, N, D)
    tgt_feat = extract_fn(norm_pc_list[1:])
    src_feat = jax.lax.stop_gradient(src_feat)
    tgt_feat = jax.lax.stop_gradient(tgt_feat)
    if matching == "mnn":
        def per_pair(s, t):
            nns01 = jnp.argmin(pairwise_sqdist(s, t), axis=-1)
            nns10 = jnp.argmin(pairwise_sqdist(t, s), axis=-1)
            return find_mutual_correspondences(nns01, nns10)
    elif matching == "smnn":
        def per_pair(s, t):
            _, j, valid = match_smnn(s, t, th)
            return j, valid
    else:
        raise ValueError(f"unknown matching {matching}")
    return jax.vmap(per_pair)(src_feat, tgt_feat)


def gate_matches_by_displacement(pcs, tgt_idx, valid, k_mad: float = 6.0):
    """Robust displacement-outlier filter over per-pair matches.

    A wrong feature match between consecutive frames typically jumps across
    the object (a displacement far outside the motion distribution), while
    articulated motion between adjacent frames is bounded. Per frame pair,
    drop matches whose displacement norm exceeds median + k_mad * MAD of the
    valid matches (MAD floored at 1% of the pair's median so an all-static
    pair doesn't zero the gate). Beyond-reference capability (the reference
    passes every SMNN survivor through, flow_utils.py:116-143) — off by
    default, enabled with --match_disp_gate.

    pcs (T, N, 3) un-normalized clouds; tgt_idx/valid (T-1, N).
    Returns the tightened valid mask.
    """
    pcs = np.asarray(pcs, np.float32)
    tgt_idx = np.asarray(tgt_idx)
    valid = np.asarray(valid).copy()
    for t in range(pcs.shape[0] - 1):
        v = valid[t]
        if v.sum() < 8:
            continue
        disp = np.linalg.norm(
            pcs[t + 1][tgt_idx[t]] - pcs[t], axis=-1)  # (N,)
        med = np.median(disp[v])
        mad = np.median(np.abs(disp[v] - med))
        cut = med + k_mad * max(mad, 0.01 * max(med, 1e-12))
        valid[t] = v & (disp <= cut)
    return valid


def build_flow_context(complete_pc_list, extract_fn=None, centroid=None,
                       scale=None, matching: str = "smnn", th: float = 0.9,
                       corr: tuple | None = None,
                       disp_gate: float = 0.0) -> FlowContext:
    """One-time flow-supervision setup (run_robot.py:76-84): match every
    consecutive pair, then anchor flows at the matched source points.

    complete_pc_list: (T, N, 3) UN-normalized clouds (cano frame included at
    its original position). Matching runs on normalized clouds when
    centroid/scale are given. Pass `corr=(tgt_idx, valid)` to reuse
    precomputed correspondences (e.g. an external flow provider).
    disp_gate > 0 additionally drops displacement outliers (k_mad = the
    value) — see gate_matches_by_displacement.
    """
    pcs = np.asarray(complete_pc_list, np.float32)
    if corr is None:
        assert extract_fn is not None, "need a feature extractor or corr"
        norm = pcs if centroid is None else np.asarray(
            normalize_pc_list(jnp.asarray(pcs), jnp.asarray(centroid), scale)
        )
        tgt_idx, valid = compute_corr_masks(norm, extract_fn, matching, th)
    else:
        tgt_idx, valid = corr
    tgt_idx = np.asarray(tgt_idx)
    valid = np.asarray(valid)
    if disp_gate > 0.0:
        valid = gate_matches_by_displacement(pcs, tgt_idx, valid, disp_gate)

    pc_refs, flow_refs = [], []
    for t in range(pcs.shape[0] - 1):
        src_pts = pcs[t][valid[t]]
        tgt_pts = pcs[t + 1][tgt_idx[t][valid[t]]]
        pc_refs.append(src_pts)
        flow_refs.append(tgt_pts - src_pts)
    return FlowContext.from_lists(pc_refs, flow_refs)

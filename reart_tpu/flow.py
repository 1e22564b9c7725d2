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
    per_pair = _per_pair_matcher(matching, th)
    return jax.vmap(per_pair)(src_feat, tgt_feat)


def _per_pair_matcher(matching: str, th: float):
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
    return per_pair


def cycle_chain_matches(norm_pcs, feats, tgt_idx, valid, th: float = 0.9,
                        close_r: float = 0.04, drop_broken: bool = True):
    """Cycle-consistent match chaining over frame triples (t, t+1, t+2).

    Two independent paths lead from frame t to frame t+2: the COMPOSITION of
    the consecutive matches (i -> j1_t[i] -> j1_{t+1}[j1_t[i]]) and the
    direct skip match (i -> j2_t[i], SMNN on the same features). Where both
    exist they vote on each other:

      * a chain whose two endpoints land within `close_r` CLOSES — both
        consecutive matches on it are confirmed;
      * a chain that lands far BREAKS — a consecutive match that breaks
        chains and closes none is dropped (some hop is wrong, and a match
        with zero independent confirmation is not worth the anchor risk);
      * a skip match whose target has an inverse under the adjacent
        consecutive pair DENSIFIES: i unmatched at (t, t+1) but skip-matched
        to j2, with x -> j2 a mutual match of (t+1, t+2), yields the inferred
        match i -> x (the composition closes EXACTLY by construction — it is
        doubly mutual); symmetrically for a hole at (t+1, t+2).

    Beyond-reference capability (the reference matches each consecutive pair
    independently, flow_utils.py:116-143). One-time host-side setup; only
    the T-2 skip-pair SMNN solves run on device.

    norm_pcs: (T, N, 3) the SAME normalized clouds the features were
    extracted from (`close_r` is in these units). feats: (T, N, D)
    descriptors. tgt_idx/valid: (T-1, N) consecutive matches to tighten.
    Returns (tgt_idx, valid) copies.
    """
    pcs = np.asarray(norm_pcs, np.float32)
    t_frames, n = pcs.shape[0], pcs.shape[1]
    j1 = np.asarray(tgt_idx).copy()
    v1 = np.asarray(valid).astype(bool).copy()
    if t_frames < 3:
        return j1, v1

    def skip_pair(s, t):
        _, j, v = match_smnn(s, t, th)
        return j, v

    j2, v2 = jax.vmap(skip_pair)(jnp.asarray(feats[:-2]),
                                 jnp.asarray(feats[2:]))
    j2, v2 = np.asarray(j2), np.asarray(v2).astype(bool)

    closed = np.zeros((t_frames - 1, n), np.int32)
    broken = np.zeros((t_frames - 1, n), np.int32)
    adds: list[tuple[int, np.ndarray, np.ndarray]] = []
    for t in range(t_frames - 2):
        a_j, a_v = j1[t], v1[t]
        b_j, b_v = j1[t + 1], v1[t + 1]
        s_j, s_v = j2[t], v2[t]
        comp = b_j[a_j]                      # composed target in frame t+2
        both = a_v & b_v[a_j] & s_v
        dist = np.linalg.norm(pcs[t + 2][comp] - pcs[t + 2][s_j], axis=-1)
        ok = both & (dist <= close_r)
        bad = both & ~ok
        np.add.at(closed[t], np.flatnonzero(ok), 1)
        np.add.at(closed[t + 1], a_j[ok], 1)
        np.add.at(broken[t], np.flatnonzero(bad), 1)
        np.add.at(broken[t + 1], a_j[bad], 1)

        # densify pair t: hole i, skip i->j2, inverse of (t+1, t+2) at j2
        inv_b = np.full(n, -1, np.int64)
        inv_b[b_j[b_v]] = np.flatnonzero(b_v)
        cand = ~a_v & s_v & (inv_b[s_j] >= 0)
        adds.append((t, np.flatnonzero(cand), inv_b[s_j[cand]]))
        # densify pair t+1: i -> x matched, i skip-matched, x unmatched
        cand2 = a_v & s_v & ~b_v[a_j]
        adds.append((t + 1, a_j[cand2], s_j[cand2]))

    if drop_broken:
        v1 &= ~((broken > 0) & (closed == 0))
    for t, rows, targets in adds:
        fresh = ~v1[t][rows]  # never overwrite a surviving direct match
        j1[t][rows[fresh]] = targets[fresh]
        v1[t][rows[fresh]] = True
    return j1, v1


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


def refine_targets_local_rigid(src, tgt, k: int = 16, rounds: int = 2,
                               keep_frac: float = 0.5):
    """Continuous match targets from local rigid fits (trimmed Procrustes).

    src/tgt: (M, 3) matched anchor pairs of one frame pair. A raw matched
    target is a point of the NEXT frame's discrete sample, so even a
    feature-perfect match carries ~the surface point spacing as irreducible
    error (measured ~0.9 cm at nao's 4096-point sampling — the dominant
    term of the corr-flow EPE gap to GT flow, whose targets are CONTINUOUS
    pose-transformed positions). Articulated motion is locally rigid, so
    fitting R, t over each anchor's k nearest matched neighbours and
    predicting `R @ src_i + t` averages the sampling noise the way GT flow's
    part poses do. Trimming (keep_frac best-residual neighbours per round)
    rejects neighbours from across part boundaries; anchors whose own
    residual under their neighbourhood fit stays large (> 3x the inlier RMS)
    keep their discrete target. Beyond-reference capability (the reference
    consumes raw SMNN targets, flow_utils.py:116-143).

    Returns refined targets (M, 3). Pure numpy, one-time host-side setup.
    """
    m = src.shape[0]
    if m < 5:
        return tgt
    k = int(min(k, m - 1))
    d2 = ((src[:, None] - src[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)  # a fit must not lean on its own match
    nbr = np.argpartition(d2, k - 1, axis=1)[:, :k]  # (M, k)
    p = src[nbr]  # (M, k, 3)
    q = tgt[nbr]

    def fit(w):
        """Batched weighted Kabsch: H = sum_k w_k (p_k-cp)(q_k-cq)^T,
        R = V S U^T; returns (R, t, per-neighbour residuals)."""
        ws = w.sum(1, keepdims=True)[..., None]  # (M, 1, 1)
        cp = (w[..., None] * p).sum(1, keepdims=True) / ws
        cq = (w[..., None] * q).sum(1, keepdims=True) / ws
        h = np.einsum("mk,mki,mkj->mij", w, p - cp, q - cq)
        u, _, vt = np.linalg.svd(h)
        v, ut = vt.transpose(0, 2, 1), u.transpose(0, 2, 1)
        s = np.repeat(np.eye(3)[None], m, 0)
        s[:, 2, 2] = np.sign(np.linalg.det(v @ ut))
        r = v @ s @ ut  # (M, 3, 3), maps p onto q
        tvec = cq[:, 0] - (r @ cp[:, 0, :, None])[:, :, 0]
        resid = np.linalg.norm(
            (r[:, None] @ p[..., None])[..., 0] + tvec[:, None] - q, axis=-1)
        return r, tvec, resid

    # 1. trim geometrically down to a 4-neighbour core: residual-ordered
    # halving under successive refits forces mixed (part-boundary)
    # neighbourhoods to commit to one part — soft scale rules (MAD / LTS
    # multipliers) keep bimodal compromise fits alive instead
    w = np.ones((m, k), np.float32)
    keep = k
    while keep > 4:
        r, tvec, resid = fit(w)
        keep = max(4, keep // 2)
        cut = np.partition(resid, keep - 1, axis=1)[:, keep - 1:keep]
        w = (resid <= cut).astype(np.float32)
    r, tvec, resid = fit(w)
    # 2. global sampling-noise scale: a 4-point rigid fit has 6 DOF and
    # near-interpolates, so its OWN residuals cannot estimate the noise;
    # the best-half residuals of all anchors under their core fits can
    # (pure-part majorities dominate the median)
    half = np.sort(resid, axis=1)[:, :max(4, int(np.ceil(k * keep_frac)))]
    sigma = max(float(np.median(half)), 1e-9)
    # 3. expand back to every neighbour consistent with the core fit at the
    # noise scale and refit once — this is where the averaging happens
    rms4 = np.sqrt((w * resid ** 2).sum(1) / w.sum(1))
    thr = np.maximum(3.0 * rms4, 3.0 * sigma)[:, None]
    w = np.maximum((resid <= thr).astype(np.float32), w)
    r, tvec, resid = fit(w)
    refined = (r @ src[..., None])[..., 0] + tvec
    # 4. keep the raw discrete target where the local-rigid premise failed:
    # an anchor far (vs the noise scale) from its own neighbourhood fit
    # either has an outlier match or sits on the wrong side of a boundary —
    # exactly where "averaging" would import another part's motion
    own_resid = np.linalg.norm(refined - tgt, axis=-1)
    bad = own_resid > 4.0 * sigma
    refined[bad] = tgt[bad]
    return refined.astype(np.float32)


def build_flow_context(complete_pc_list, extract_fn=None, centroid=None,
                       scale=None, matching: str = "smnn", th: float = 0.9,
                       corr: tuple | None = None,
                       disp_gate: float = 0.0,
                       rigid_refine_k: int = 0,
                       chain_r: float = 0.0) -> FlowContext:
    """One-time flow-supervision setup (run_robot.py:76-84): match every
    consecutive pair, then anchor flows at the matched source points.

    complete_pc_list: (T, N, 3) UN-normalized clouds (cano frame included at
    its original position). Matching runs on normalized clouds when
    centroid/scale are given. Pass `corr=(tgt_idx, valid)` to reuse
    precomputed correspondences (e.g. an external flow provider).
    disp_gate > 0 additionally drops displacement outliers (k_mad = the
    value) — see gate_matches_by_displacement. chain_r > 0 enables
    cycle-consistent chaining over frame triples with that closure radius
    (normalized units) — see cycle_chain_matches.
    """
    pcs = np.asarray(complete_pc_list, np.float32)
    if corr is None:
        assert extract_fn is not None, "need a feature extractor or corr"
        norm = pcs if centroid is None else np.asarray(
            normalize_pc_list(jnp.asarray(pcs), jnp.asarray(centroid), scale)
        )
        if chain_r > 0.0:
            # extract once (T passes instead of 2(T-1)), reuse the features
            # for both the consecutive matches and the skip-pair chains
            feats = jax.lax.stop_gradient(extract_fn(jnp.asarray(norm)))
            per_pair = _per_pair_matcher(matching, th)
            tgt_idx, valid = jax.vmap(per_pair)(feats[:-1], feats[1:])
            tgt_idx, valid = cycle_chain_matches(norm, np.asarray(feats),
                                                 tgt_idx, valid, th=th,
                                                 close_r=chain_r)
        else:
            tgt_idx, valid = compute_corr_masks(norm, extract_fn, matching,
                                                th)
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
        if rigid_refine_k > 0:
            tgt_pts = refine_targets_local_rigid(src_pts, tgt_pts,
                                                 k=rigid_refine_k)
        pc_refs.append(src_pts)
        flow_refs.append(tgt_pts - src_pts)
    return FlowContext.from_lists(pc_refs, flow_refs)

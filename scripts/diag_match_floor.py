#!/usr/bin/env python
"""Decompose the nao blended-EPE floor (VERDICT r3 #3 follow-up).

Round-4 A/B (scripts/ab_corr_chain.py): chaining +24% match rate, EM on
refined targets — blended EPE flat at ~0.40 with anchor err ~0.37 for every
arm. This script asks WHY the local-rigid refinement, which is 2.4x on
synthetic iid noise, barely moves nao (0.379 -> 0.372): per GT part, fit the
ORACLE rigid transform over that part's matched pairs (no neighborhoods, no
trimming — the best any local-rigid method could do given these matches) and
compare:

  raw        — matched target vs true target (the sampling-floor number)
  oracle     — per-GT-part Procrustes on ALL matched pairs of the part
  oracle-km  — same but predictions evaluated per point (k = whole part)
  refine64   — the shipping refine_targets_local_rigid at k=64

If oracle ~= raw, the match errors are BIASED/CORRELATED (systematic
nearest-sample or descriptor bias) and no rigid consensus can remove them —
the lever closes with that argument. If oracle << raw but refine64 ~= raw,
the gap is neighborhood selection/trimming and the refine has headroom.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/diag_match_floor.py \
    --model /tmp/ab_corr_chain_r4/ref-ft.pkl [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def procrustes(src, tgt):
    """Least-squares rigid (R, t): tgt ~= src @ R.T + t."""
    cs, ct = src.mean(0), tgt.mean(0)
    h = (src - cs).T @ (tgt - ct)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    return r, ct - r @ cs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="/tmp/ab_corr_chain_r4/ref-ft.pkl")
    ap.add_argument("--seq_path", default="/root/reference/demo_data/data/nao")
    ap.add_argument("--th", default=0.98, type=float)
    ap.add_argument("--num_points", default=4096, type=int)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from reart_tpu.data.common import get_rel_pose
    from reart_tpu.data.robot import RobotSequence
    from reart_tpu.flow import (match_smnn, normalize_pc_list,
                                refine_targets_local_rigid)
    from reart_tpu.hostops import on_host
    from reart_tpu.models.pointnet2 import apply_pointnet2msg2, load_corr_model

    seq = RobotSequence(args.seq_path, num_points=args.num_points, cano_idx=0)
    sample = seq[0]
    pcs = np.asarray(sample["complete_pc_list"], np.float32)
    parts = np.asarray(sample["complete_gt_part_list"])
    T, N = pcs.shape[:2]

    flat = pcs.reshape(-1, 3)
    centroid = flat.mean(0)
    scale = 1.0 / float(np.linalg.norm(flat - centroid, axis=-1).max())
    norm = np.asarray(normalize_pc_list(jnp.asarray(pcs),
                                        jnp.asarray(centroid), scale))

    true_tgt = np.empty((T - 1, N, 3), np.float32)
    for t in range(T - 1):
        rel = get_rel_pose(seq.pose_list[t], seq.pose_list[t + 1])
        for pid in np.unique(parts[t]):
            m = parts[t] == pid
            homo = np.concatenate([pcs[t][m], np.ones((m.sum(), 1))], 1)
            true_tgt[t, m] = (homo @ np.asarray(rel[pid]).T)[:, :3]

    params = load_corr_model(args.model)
    feats = np.asarray(apply_pointnet2msg2(params, jnp.asarray(norm)))

    rows = {"raw": [], "oracle": [], "refine64": []}
    # also: per-part oracle translation-only (isolates rotational misfit)
    rows["oracle_t"] = []
    nn_dist = []     # source point -> nearest target SAMPLE (sampling floor)
    with on_host():
        for t in range(T - 1):
            _, j, v = match_smnn(jnp.asarray(feats[t]),
                                 jnp.asarray(feats[t + 1]), args.th)
            j, v = np.asarray(j), np.asarray(v).astype(bool)
            src = pcs[t][v]
            tgt = pcs[t + 1][j[v]]
            tt = true_tgt[t][v]
            pid = parts[t][v]
            rows["raw"].append(np.linalg.norm(tgt - tt, axis=-1))

            # pure sampling floor: distance from the TRUE target position to
            # the nearest sample of the target frame cloud
            d2 = ((tt[:, None] - pcs[t + 1][None]) ** 2).sum(-1)
            nn_dist.append(np.sqrt(d2.min(1)))

            oracle = np.empty_like(tgt)
            oracle_t = np.empty_like(tgt)
            for p in np.unique(pid):
                m = pid == p
                if m.sum() >= 3:
                    r, tr = procrustes(src[m], tgt[m])
                    oracle[m] = src[m] @ r.T + tr
                    oracle_t[m] = src[m] + (tgt[m] - src[m]).mean(0)
                else:
                    oracle[m] = tgt[m]
                    oracle_t[m] = tgt[m]
            rows["oracle"].append(np.linalg.norm(oracle - tt, axis=-1))
            rows["oracle_t"].append(np.linalg.norm(oracle_t - tt, axis=-1))

            ref = np.asarray(refine_targets_local_rigid(src, tgt, k=64))
            rows["refine64"].append(np.linalg.norm(ref - tt, axis=-1))

    print(f"{'metric':>12}{'mean_cm':>9}{'med_cm':>8}{'p90_cm':>8}")
    for k in ("raw", "refine64", "oracle", "oracle_t"):
        e = np.concatenate(rows[k]) * 100
        print(f"{k:>12}{e.mean():>9.3f}{np.median(e):>8.3f}"
              f"{np.percentile(e, 90):>8.3f}", flush=True)
    e = np.concatenate(nn_dist) * 100
    print(f"{'nn_floor':>12}{e.mean():>9.3f}{np.median(e):>8.3f}"
          f"{np.percentile(e, 90):>8.3f}  "
          "(true target -> nearest target sample)", flush=True)


if __name__ == "__main__":
    main()

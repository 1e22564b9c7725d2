#!/usr/bin/env python
"""ONE-session A/B: raw discrete match targets vs local-rigid-refined
targets (flow.refine_targets_local_rigid) on nao's REAL consecutive pairs.

Loads an already-trained corr backbone (default: the round-3 flagship's
finetuned model), matches each consecutive pair at --th, then measures
anchor error and blended EPE against the dataset's GT part poses for
refine_k in {0 (raw), 8, 16, 32}.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_match_refine.py \
           --ckpt /tmp/nao_corr_r3/corr_model.pkl --th 0.98
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq_path", default="/root/reference/demo_data/data/nao")
    ap.add_argument("--ckpt", default="/tmp/nao_corr_r3/corr_model.pkl")
    ap.add_argument("--th", default=0.98, type=float)
    ap.add_argument("--ks", default=[0, 8, 16, 32], type=int, nargs="+")
    args = ap.parse_args()

    import jax.numpy as jnp

    from reart_tpu.data.common import get_rel_pose
    from reart_tpu.data.robot import RobotSequence
    from reart_tpu.flow import (match_smnn, normalize_pc_list,
                                refine_targets_local_rigid)
    from reart_tpu.hostops import on_host
    from reart_tpu.models.pointnet2 import (apply_pointnet2msg2,
                                            load_corr_model)
    from reart_tpu.ops.interpolate import blend_anchor_motion

    seq = RobotSequence(args.seq_path, num_points=4096, cano_idx=0)
    sample = seq[0]
    pcs = np.asarray(sample["complete_pc_list"], np.float32)
    parts = np.asarray(sample["complete_gt_part_list"])
    T, N = pcs.shape[:2]

    flat = pcs[0].reshape(-1, 3)
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
    gt_flow = true_tgt - pcs[:-1]

    params = load_corr_model(args.ckpt)
    feats = np.asarray(apply_pointnet2msg2(params, jnp.asarray(norm)))

    print(f"{'refine_k':>9}{'rate':>7}{'err_cm':>8}{'epe_cm':>8}{'cov':>6}")
    with on_host():
        matches = []
        for t in range(T - 1):
            _, j, valid = match_smnn(jnp.asarray(feats[t]),
                                     jnp.asarray(feats[t + 1]), args.th)
            matches.append((np.asarray(j), np.asarray(valid)))
        for rk in args.ks:
            errs, epes, covs, rates = [], [], [], []
            for t in range(T - 1):
                j, valid = matches[t]
                rates.append(valid.mean())
                src_pts = pcs[t][valid]
                tgt_pts = pcs[t + 1][j[valid]]
                if rk:
                    tgt_pts = refine_targets_local_rigid(src_pts, tgt_pts,
                                                         k=rk)
                errs.append(np.linalg.norm(
                    tgt_pts - true_tgt[t][valid], axis=-1).mean())
                anchors = np.full((N, 3), 1e6, np.float32)
                aflow = np.zeros((N, 3), np.float32)
                v = int(valid.sum())
                anchors[:v] = src_pts
                aflow[:v] = tgt_pts - src_pts
                blended, mask = blend_anchor_motion(
                    jnp.asarray(pcs[t]), jnp.asarray(anchors),
                    jnp.asarray(aflow), k=3, return_mask=True)
                blended, mask = np.asarray(blended), np.asarray(mask)
                epe = np.linalg.norm(blended - gt_flow[t], axis=-1)
                epes.append(epe[mask].mean() if mask.any() else np.nan)
                covs.append(mask.mean())
            print(f"{rk:>9}{np.mean(rates):>7.3f}"
                  f"{100 * np.mean(errs):>8.3f}"
                  f"{100 * np.nanmean(epes):>8.3f}{np.mean(covs):>6.2f}",
                  flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the corr-trainer recipes on nao's REAL frames, back-to-back in ONE
chip session (CLAUDE.md: never compare across sessions).

A = identity recipe (src/tgt share a point set; diagonal InfoNCE labels).
B = resampled recipe (src/tgt are independent subsets; radius-gated NN
    positives + near-positive negative masking — train/corr.py).

Both train the same steps/seed on nao's own 10 frames, then both are scored
on the signal the fit actually consumes: SMNN matching between consecutive
REAL frames (independent 4096-point samplings), with correctness and EPE
measured against the dataset's GT per-part poses (reference
dataset_robot.py:50-100 provides per-frame part labels + poses).

Run: PYTHONPATH=/root/.axon_site python scripts/ab_corr_recipe.py [steps]
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAO = os.environ.get("NAO", "/root/reference/demo_data/data/nao")
STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 800


def main():
    import jax
    import jax.numpy as jnp

    from reart_tpu.data.common import get_rel_pose
    from reart_tpu.data.robot import RobotSequence
    from reart_tpu.flow import match_smnn, normalize_pc_list
    from reart_tpu.models.pointnet2 import apply_pointnet2msg2
    from reart_tpu.train.corr import (
        CorrTrainConfig, match_precision, synth_pair, train_corr)

    print("devices:", jax.devices(), flush=True)
    seq = RobotSequence(NAO, num_points=4096, cano_idx=0)
    sample = seq[0]
    complete = np.asarray(sample["complete_pc_list"], np.float32)
    parts = np.asarray(sample["complete_gt_part_list"])
    t_frames, n = complete.shape[:2]

    pc = complete.reshape(-1, 3)
    centroid = pc.mean(0)
    scale = 1.0 / float(np.linalg.norm(pc - centroid, axis=-1).max())
    frames = np.asarray(normalize_pc_list(
        jnp.asarray(complete), jnp.asarray(centroid), scale))

    # typical sampling spacing (normalized units): sanity for the radii
    d = np.linalg.norm(frames[0][:, None, :] - frames[1][None, :512, :],
                       axis=-1)
    print(f"median cross-frame NN spacing: {np.median(d.min(0)):.4f}")

    def gt_next(t):
        """GT position (normalized) of frame t's points in frame t+1."""
        rel = get_rel_pose(seq.pose_list[t], seq.pose_list[t + 1])
        out = np.empty((n, 3), np.float32)
        for pid in np.unique(parts[t]):
            m = parts[t] == pid
            pose = np.asarray(rel[pid], np.float32)
            out[m] = complete[t][m] @ pose[:3, :3].T + pose[:3, 3]
        return (out - centroid) * scale

    gt_pos_pairs = np.stack([gt_next(t) for t in range(t_frames - 1)])

    def real_pair_stats(params, th=0.9):
        feats = apply_pointnet2msg2(params, jnp.asarray(frames))
        rates, precs2, precs5, epes = [], [], [], []
        for t in range(t_frames - 1):
            _, j, valid = match_smnn(feats[t], feats[t + 1], th)
            j, valid = np.asarray(j), np.asarray(valid)
            err = np.linalg.norm(frames[t + 1][j] - gt_pos_pairs[t], axis=-1)
            nv = max(valid.sum(), 1)
            rates.append(valid.mean())
            precs2.append((err[valid] < 0.02).sum() / nv)
            precs5.append((err[valid] < 0.05).sum() / nv)
            epes.append(err[valid].mean() if valid.any() else np.nan)
        return (float(np.mean(rates)), float(np.mean(precs2)),
                float(np.mean(precs5)), float(np.nanmean(epes)))

    base = CorrTrainConfig(steps=STEPS, batch=4, n_points=1024,
                           resample=False)
    cfgs = {
        "A identity ": base,
        "B resampled": dataclasses.replace(base, resample=True),
    }
    frames_j = jnp.asarray(frames)
    for name, cfg in cfgs.items():
        t0 = time.time()
        params, losses = train_corr(jax.random.PRNGKey(2), frames_j, cfg)
        dt = time.time() - t0
        held = synth_pair(jax.random.PRNGKey(10_007), frames_j,
                          dataclasses.replace(cfg, resample=True))
        hp, hr = match_precision(params, held[0], held[1], th=1.0,
                                 gt_pos=held[2],
                                 pos_radius=0.02 * float(held[3]))
        rate, p2, p5, epe = real_pair_stats(params)
        print(f"{name}: {STEPS} steps in {dt:.0f}s, final loss "
              f"{float(losses[-1]):.3f}\n"
              f"  held-out RESAMPLED synthetic pair: mutual-NN prec {hp:.3f} "
              f"(rate {hr:.3f})\n"
              f"  REAL consecutive pairs: SMNN rate {rate:.3f}, "
              f"prec@0.02 {p2:.3f}, prec@0.05 {p5:.3f}, matched-EPE "
              f"{epe:.4f}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ONE-session A/B for the round-4 matcher levers (VERDICT r3 #3).

Levers measured, all against nao's GT part poses on REAL consecutive pairs
(same protocol as scripts/ab_match_refine.py):
  * EM self-finetune on REFINED continuous targets instead of raw SMNN
    pseudo-labels (`--self_finetune_refine_k`, train/corr.py)
  * cycle-consistent chaining over frame triples at inference
    (`--match_chain_r`, flow.cycle_chain_matches)

Arms (shared trained base model; the two finetunes and every evaluation run
in THIS session so chip-window variance cannot contaminate the comparison):
  raw-ft             round-3 recipe: finetune on raw pseudo-labels
  raw-ft  + chain    + cycle chaining at match time
  ref-ft             finetune on locally-rigid-REFINED pseudo-labels
  ref-ft  + chain    both levers

Per arm: match rate, anchor err (cm), blended EPE (cm) at refine_k 64 —
the round-3 baseline measured 0.258 / 0.379 / 0.405; the round-4 target is
blended EPE <= 0.30.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_corr_chain.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq_path", default="/root/reference/demo_data/data/nao")
    ap.add_argument("--th", default=0.98, type=float)
    ap.add_argument("--refine_k", default=64, type=int)
    ap.add_argument("--chain_r", default=0.04, type=float)
    ap.add_argument("--steps", default=2000, type=int)
    ap.add_argument("--ft_steps", default=600, type=int)
    ap.add_argument("--seed", default=0, type=int)
    ap.add_argument("--out_dir", default="/tmp/ab_corr_chain")
    ap.add_argument("--num_points", default=4096, type=int)
    ap.add_argument("--train_points", default=1024, type=int,
                    help="points per cloud during training (CPU smoke: 256)")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on the local CPU backend")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from reart_tpu.data.common import get_rel_pose
    from reart_tpu.data.robot import RobotSequence
    from reart_tpu.flow import (cycle_chain_matches, match_smnn,
                                normalize_pc_list, refine_targets_local_rigid)
    from reart_tpu.hostops import on_host
    from reart_tpu.models.pointnet2 import apply_pointnet2msg2
    from reart_tpu.ops.interpolate import blend_anchor_motion
    from reart_tpu.train.corr import (CorrTrainConfig, finetune_real_pairs,
                                      train_corr)

    seq = RobotSequence(args.seq_path, num_points=args.num_points,
                        cano_idx=0)
    sample = seq[0]
    pcs = np.asarray(sample["complete_pc_list"], np.float32)
    parts = np.asarray(sample["complete_gt_part_list"])
    T, N = pcs.shape[:2]

    flat = pcs.reshape(-1, 3)
    centroid = flat.mean(0)
    scale = 1.0 / float(np.linalg.norm(flat - centroid, axis=-1).max())
    norm = np.asarray(normalize_pc_list(jnp.asarray(pcs),
                                        jnp.asarray(centroid), scale))

    # GT continuous targets from the dataset part poses
    true_tgt = np.empty((T - 1, N, 3), np.float32)
    for t in range(T - 1):
        rel = get_rel_pose(seq.pose_list[t], seq.pose_list[t + 1])
        for pid in np.unique(parts[t]):
            m = parts[t] == pid
            homo = np.concatenate([pcs[t][m], np.ones((m.sum(), 1))], 1)
            true_tgt[t, m] = (homo @ np.asarray(rel[pid]).T)[:, :3]
    gt_flow = true_tgt - pcs[:-1]

    # ---- shared base training, then the two finetune arms -----------------
    cfg = CorrTrainConfig(steps=args.steps, n_points=args.train_points)
    key = jax.random.PRNGKey(args.seed)

    base_path = os.path.join(args.out_dir, "base.npz")
    print(f"== base training ({args.steps} steps) ==", flush=True)
    base_params, losses = train_corr(
        key, jnp.asarray(norm), cfg,
        log_fn=lambda s, l: print(f"  step {s}: loss {l:.4f}", flush=True),
        checkpoint_path=os.path.join(args.out_dir, "base_ckpt.pkl"))
    print(f"base done, final loss {float(losses[-1]):.4f}", flush=True)

    models = {}
    for name, rk in (("raw-ft", 0), ("ref-ft", args.refine_k)):
        print(f"== finetune {name} ({args.ft_steps} steps, refine_k={rk}) ==",
              flush=True)
        ft_params, _ = finetune_real_pairs(
            jax.random.PRNGKey(args.seed + 1), base_params,
            jnp.asarray(norm), cfg, steps=args.ft_steps,
            mine_th=0.9, rounds=3, refine_k=rk,
            log_fn=lambda r, m: print(f"  round {r}: match {m:.3f}",
                                      flush=True))
        models[name] = ft_params

    # ---- evaluation --------------------------------------------------------
    def evaluate(params, chain: bool):
        feats = np.asarray(apply_pointnet2msg2(params, jnp.asarray(norm)))
        js, vs = [], []
        for t in range(T - 1):
            _, j, v = match_smnn(jnp.asarray(feats[t]),
                                 jnp.asarray(feats[t + 1]), args.th)
            js.append(np.asarray(j))
            vs.append(np.asarray(v))
        j_all, v_all = np.stack(js), np.stack(vs)
        if chain:
            j_all, v_all = cycle_chain_matches(norm, feats, j_all, v_all,
                                               th=args.th,
                                               close_r=args.chain_r)
        errs, epes, covs, rates, precs = [], [], [], [], []
        for t in range(T - 1):
            j, valid = j_all[t], v_all[t]
            rates.append(valid.mean())
            src_pts = pcs[t][valid]
            tgt_pts = pcs[t + 1][j[valid]]
            # precision@2cm of the RAW matches (before refinement)
            raw_err = np.linalg.norm(tgt_pts - true_tgt[t][valid], axis=-1)
            precs.append(float((raw_err < 0.02).mean()))
            if args.refine_k:
                tgt_pts = refine_targets_local_rigid(src_pts, tgt_pts,
                                                     k=args.refine_k)
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
        return (np.mean(rates), np.mean(precs), 100 * np.mean(errs),
                100 * np.nanmean(epes), np.mean(covs))

    print(f"\n{'arm':>16}{'rate':>7}{'prec@2cm':>9}{'err_cm':>8}"
          f"{'epe_cm':>8}{'cov':>6}", flush=True)
    with on_host():
        for name in ("raw-ft", "ref-ft"):
            for chain in (False, True):
                r, p, e, epe, c = evaluate(models[name], chain)
                label = name + ("+chain" if chain else "")
                print(f"{label:>16}{r:>7.3f}{p:>9.3f}{e:>8.3f}"
                      f"{epe:>8.3f}{c:>6.2f}", flush=True)

    # persist both models for the flagship re-run
    from reart_tpu.models.pointnet2 import save_corr_model

    for name, params in models.items():
        save_corr_model(os.path.join(args.out_dir, f"{name}.pkl"), params)
    print(f"models saved under {args.out_dir}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ONE-session A/B: match density/precision of the self-trained corr
backbone on nao's REAL consecutive frame pairs (VERDICT round-3 item #1).

The round-2 diagnosis: the matcher is precise but sparse (7.7% SMNN match
rate at th=0.9). This script measures, for each (params, match_th,
disp_gate) config, against the dataset's GT part poses:

  * match rate        — fraction of src points with a valid SMNN match
  * precision@1cm/2cm — fraction of matches whose tgt point lies within
                        1/2 cm of the src point's TRUE transformed position
  * anchor err (cm)   — mean distance from matched tgt to true position
  * blended EPE (cm)  + coverage — flow densified onto the full cloud via
                        blend_anchor_motion (exactly what the fit consumes)
                        vs GT flow

Params variants: base (synthetic-only training) and self-finetuned on the
sequence's own pairs (train.corr.finetune_real_pairs). All numbers come
from one process = one chip session (CLAUDE.md: never A/B across sessions).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_corr_density.py
       [--steps 2000] [--ft_steps 600] [--base_ckpt /tmp/nao_corr/corr_model.pkl]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq_path", default="/root/reference/demo_data/data/nao")
    ap.add_argument("--steps", default=2000, type=int)
    ap.add_argument("--ft_steps", default=600, type=int)
    ap.add_argument("--ft_rounds", default=3, type=int)
    ap.add_argument("--ft_th", default=0.9, type=float)
    ap.add_argument("--ft_real_frac", default=0.5, type=float)
    ap.add_argument("--ft_refine_k", default=0, type=int,
                    help="> 0 adds a THIRD arm: finetune with local-rigid-"
                         "refined pseudo-targets (continuous supervision)")
    ap.add_argument("--eval_refine_k", default=0, type=int,
                    help="> 0 also local-rigid-refines matched targets at "
                         "EVALUATION time (the flagship inference path, "
                         "--match_refine_k) before anchoring/blending")
    ap.add_argument("--ths", default="0.9,0.95,0.98,1.0")
    ap.add_argument("--base_ckpt", default=None,
                    help="reuse a trained backbone instead of retraining")
    ap.add_argument("--save_dir", default="/tmp/corr_density")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from reart_tpu.data.common import get_rel_pose
    from reart_tpu.data.robot import RobotSequence
    from reart_tpu.flow import (gate_matches_by_displacement, match_smnn,
                                normalize_pc_list)
    from reart_tpu.models.pointnet2 import (apply_pointnet2msg2,
                                            load_corr_model, save_corr_model)
    from reart_tpu.ops.interpolate import blend_anchor_motion
    from reart_tpu.train.corr import (CorrTrainConfig, finetune_real_pairs,
                                      train_corr)

    os.makedirs(args.save_dir, exist_ok=True)
    seq = RobotSequence(args.seq_path, num_points=4096, cano_idx=0)
    sample = seq[0]
    pcs = np.asarray(sample["complete_pc_list"], np.float32)     # (T, N, 3)
    parts = np.asarray(sample["complete_gt_part_list"])          # (T, N)
    T, N = pcs.shape[:2]

    # normalization shared by training and matching (corr_nao.sh convention)
    flat = pcs[0].reshape(-1, 3)
    centroid = flat.mean(0)
    scale = 1.0 / float(np.linalg.norm(flat - centroid, axis=-1).max())
    norm = np.asarray(normalize_pc_list(jnp.asarray(pcs),
                                        jnp.asarray(centroid), scale))

    # GT: true position of every src point in the next frame (part poses)
    true_tgt = np.empty((T - 1, N, 3), np.float32)
    for t in range(T - 1):
        rel = get_rel_pose(seq.pose_list[t], seq.pose_list[t + 1])
        for pid in np.unique(parts[t]):
            m = parts[t] == pid
            homo = np.concatenate([pcs[t][m], np.ones((m.sum(), 1))], 1)
            true_tgt[t, m] = (homo @ np.asarray(rel[pid]).T)[:, :3]
    gt_flow = true_tgt - pcs[:-1]

    cfg = CorrTrainConfig(steps=args.steps, batch=4, n_points=1024)
    key = jax.random.PRNGKey(2)
    if args.base_ckpt and os.path.exists(args.base_ckpt):
        base_params = load_corr_model(args.base_ckpt)
        print(f"loaded base backbone from {args.base_ckpt}")
    else:
        t0 = time.time()
        base_params, losses = train_corr(
            key, jnp.asarray(norm), cfg,
            log_fn=lambda s, l: print(f"  step {s} loss {l:.3f}", flush=True))
        print(f"base training: {args.steps} steps in {time.time()-t0:.0f}s, "
              f"final loss {float(losses[-1]):.3f}")
        save_corr_model(os.path.join(args.save_dir, "base.pkl"), base_params)

    t0 = time.time()
    ft_params, ft_losses = finetune_real_pairs(
        jax.random.fold_in(key, 777), base_params, jnp.asarray(norm), cfg,
        steps=args.ft_steps, mine_th=args.ft_th, rounds=args.ft_rounds,
        real_frac=args.ft_real_frac,
        log_fn=lambda r, m: print(f"  mining round {r}: {m:.3f} labeled",
                                  flush=True))
    print(f"self-finetune: {args.ft_steps} steps in {time.time()-t0:.0f}s, "
          f"final loss {float(ft_losses[-1]):.3f}")
    save_corr_model(os.path.join(args.save_dir, "finetuned.pkl"), ft_params)

    ftr_params = None
    if args.ft_refine_k > 0:
        t0 = time.time()
        ftr_params, ftr_losses = finetune_real_pairs(
            jax.random.fold_in(key, 777), base_params, jnp.asarray(norm),
            cfg, steps=args.ft_steps, mine_th=args.ft_th,
            rounds=args.ft_rounds, real_frac=args.ft_real_frac,
            refine_k=args.ft_refine_k,
            log_fn=lambda r, m: print(f"  mining round {r}: {m:.3f} labeled",
                                      flush=True))
        print(f"self-finetune (refine_k={args.ft_refine_k}): "
              f"{args.ft_steps} steps in {time.time()-t0:.0f}s, "
              f"final loss {float(ftr_losses[-1]):.3f}")
        save_corr_model(os.path.join(args.save_dir, "finetuned_refined.pkl"),
                        ftr_params)

    norm_j = jnp.asarray(norm)

    # feature extraction on the accelerator (one program, reused); ALL
    # downstream matching/blending on the host backend — anchor counts vary
    # per (pair, config) and every fresh shape would cost a 30s+ remote
    # compile on the tunnel (CLAUDE.md)
    from reart_tpu.hostops import on_host

    def evaluate(feats, th, disp_gate):
        rates, p1, p2, errs, epes, covs = [], [], [], [], [], []
        for t in range(T - 1):
            _, j, valid = match_smnn(jnp.asarray(feats[t]),
                                     jnp.asarray(feats[t + 1]), th)
            j = np.asarray(j)
            valid = np.asarray(valid)
            if disp_gate > 0:
                valid = gate_matches_by_displacement(
                    pcs[t:t + 2], j[None], valid[None], disp_gate)[0]
            rates.append(valid.mean())
            if valid.sum() < 3:
                continue
            src_m = pcs[t][valid]
            tgt_m = pcs[t + 1][j[valid]]
            if args.eval_refine_k > 0:
                from reart_tpu.flow import refine_targets_local_rigid
                tgt_m = refine_targets_local_rigid(src_m, tgt_m,
                                                   k=args.eval_refine_k)
            err_m = np.linalg.norm(tgt_m - true_tgt[t][valid], axis=-1)
            p1.append((err_m < 0.01).mean())
            p2.append((err_m < 0.02).mean())
            errs.append(err_m.mean())
            # densified flow, the fit's actual supervision signal; anchors
            # padded to the fixed size N with FAR coords (never selected by
            # the 3-NN) so every pair reuses ONE compiled program
            anchors = np.full((N, 3), 1e6, np.float32)
            aflow = np.zeros((N, 3), np.float32)
            v = int(valid.sum())
            anchors[:v] = src_m
            aflow[:v] = tgt_m - src_m
            blended, mask = blend_anchor_motion(
                jnp.asarray(pcs[t]), jnp.asarray(anchors),
                jnp.asarray(aflow), k=3, return_mask=True)
            blended, mask = np.asarray(blended), np.asarray(mask)
            epe = np.linalg.norm(blended - gt_flow[t], axis=-1)
            epes.append(epe[mask].mean() if mask.any() else np.nan)
            covs.append(mask.mean())
        return {
            "rate": float(np.mean(rates)),
            "prec@1cm": float(np.mean(p1)) if p1 else float("nan"),
            "prec@2cm": float(np.mean(p2)) if p2 else float("nan"),
            "anchor_err_cm": 100 * float(np.mean(errs)) if errs else float("nan"),
            "blend_epe_cm": 100 * float(np.nanmean(epes)) if epes else float("nan"),
            "blend_cov": float(np.mean(covs)) if covs else 0.0,
        }

    print(f"\n{'config':<34}{'rate':>7}{'p@1cm':>7}{'p@2cm':>7}"
          f"{'err_cm':>8}{'epe_cm':>8}{'cov':>6}")
    variants = [("base", base_params), ("finetuned", ft_params)]
    if ftr_params is not None:
        variants.append((f"ft_ref{args.ft_refine_k}", ftr_params))
    ths = [float(x) for x in args.ths.split(",") if x]
    for pname, params in variants:
        feats = np.asarray(apply_pointnet2msg2(params, norm_j))
        with on_host():
            for th in ths:
                for dg in (0.0, 6.0):
                    r = evaluate(feats, th, dg)
                    print(f"{pname:<10} th={th:<5} gate={dg:<8}"
                          f"{r['rate']:>7.3f}{r['prec@1cm']:>7.3f}"
                          f"{r['prec@2cm']:>7.3f}{r['anchor_err_cm']:>8.3f}"
                          f"{r['blend_epe_cm']:>8.3f}{r['blend_cov']:>6.2f}",
                          flush=True)


if __name__ == "__main__":
    main()

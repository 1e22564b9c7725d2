#!/usr/bin/env python
"""Projection-stage flow-degradation ablation (VERDICT r2 #9).

The sapien flagship measured full-flow EPE 0.523 after the base stage but
1.577 after the kinematic projection. Three hypotheses: (a) merge/MST
topology error, (b) base segmentation/pose quality amplified by the screw
projection, (c) screw-projection modeling error itself. This script fits
one scene once, then projects it four ways in ONE session:

  A fitted seg+poses, FITTED graph   (the flagship path)
  B fitted seg+poses, GT topology    (isolates the MST's contribution)
  C GT seg+poses,     GT topology    (upper bound: projection modeling
                                      error only — the existing
                                      test_kinematic_joint_types_recovered
                                      case)
  D GT seg, fitted poses, GT topology (isolates segmentation vs poses)

EPE_B << EPE_A attributes the gap to topology; EPE_A ~= EPE_B >> EPE_C
attributes it to base-fit quality through the projection; EPE_C high
would implicate the screw model itself.

CPU-friendly (the flagship itself ran on the virtual mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python scripts/ablate_projection.py
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def epe_of(save_dir):
    txt = open(os.path.join(save_dir, "0", "result.txt")).read()
    vals = {l.split(":")[0]: float(l.split(":")[1])
            for l in txt.splitlines() if ":" in l}
    return vals["full_flow_epe"], vals.get("per_scan_ri", float("nan"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ablate_projection")
    ap.add_argument("--n_points", default=512, type=int)
    ap.add_argument("--n_views", default=6, type=int)
    ap.add_argument("--cano_idx", default=3, type=int,
                    help="middle frame halves the max relative motion (the "
                         "flagship's auto_cano picked the middle too)")
    ap.add_argument("--n_iter", default=1500, type=int)
    ap.add_argument("--kin_iter", default=100, type=int)
    ap.add_argument("--num_parts", default=8, type=int)
    ap.add_argument("--downsample", default=4, type=int,
                    help="1 reproduces the reference-scale drive's "
                         "giant-LAP path (scripts/sapien_fullscale.sh)")
    args = ap.parse_args()

    from reart_tpu.cli import main as cli_main
    from reart_tpu.data.sapien import SapienDataset
    from reart_tpu.data.synth import make_sapien_scene

    os.makedirs(args.out, exist_ok=True)
    scene = make_sapien_scene(os.path.join(args.out, "scene"),
                              n_views=args.n_views, n_points=args.n_points)
    flow = os.path.join(scene, "flow.npz")

    base_dir = os.path.join(args.out, "base")
    if not os.path.exists(os.path.join(base_dir, "0", "result.pkl")):
        cli_main([
            "sapien", "--sapien_base_folder", scene, "--sapien_idx", "0",
            "--cano_idx", str(args.cano_idx),
            "--save_root", base_dir, "--n_iter", str(args.n_iter),
            "--assign_iter", str(args.n_iter // 2), "--use_assign_loss",
            "--use_flow_loss", "--flow_file", flow,
            "--num_parts", str(args.num_parts),
            "--downsample", str(args.downsample),
            "--start_tau", "1", "--end_tau", "0.5", "--snapshot_gap", "2000",
        ])
    base_epe, base_ri = epe_of(base_dir)

    with open(os.path.join(base_dir, "0", "result.pkl"), "rb") as f:
        fitted = pickle.load(f)
    sample = SapienDataset(scene, cano_idx=args.cano_idx)[0]
    gt_seg = np.asarray(sample["gt_cano_part"])
    gt_poses = np.asarray(sample["gt_pose_list"], np.float32)
    fit_seg = np.asarray(fitted["pred_cano_part"])

    # GT topology mapped onto a segmentation's part ids: every non-root part
    # is a child of the root (body) — the generator's kinematic tree
    def star_tree(seg):
        root = int(np.bincount(seg).argmax())
        return np.asarray([[p, root] for p in np.unique(seg) if p != root])

    def project(name, result, save_dir, extra=()):
        res_path = os.path.join(args.out, f"{name}.pkl")
        with open(res_path, "wb") as f:
            pickle.dump(result, f)
        cli_main([
            "sapien", "--sapien_base_folder", scene, "--sapien_idx", "0",
            "--cano_idx", str(args.cano_idx),
            "--save_root", save_dir, "--model", "kinematic",
            "--base_result_path", res_path, "--n_iter", str(args.kin_iter),
            "--start_tau", "1", "--end_tau", "1", "--snapshot_gap", "2000",
        ] + list(extra))
        return epe_of(save_dir)

    rows = [("base (relaxation)", base_epe, base_ri)]

    # A0: plain greedy MST, tree search explicitly OFF — separates what the
    # MST alone does from what the auto sweep then does to it
    a0 = project("A0_nosearch", dict(fitted), os.path.join(args.out, "A0"),
                 extra=["--tree_search", "0"])
    rows.append(("A0 fitted graph, tree_search OFF", *a0))

    # A: the flagship path (fitted graph + the product's default auto
    # tree search; REART_TREE_SEARCH_DEBUG=1 in the env prints per-candidate
    # energies/vetoes for attribution)
    a = project("A_fitted", dict(fitted), os.path.join(args.out, "A"))
    rows.append(("A fitted seg+poses, fitted graph (auto)", *a))

    # B: fitted seg+poses, GT star topology on the fitted part ids
    res_b = dict(fitted)
    res_b["joint_connection"] = star_tree(fit_seg)
    b = project("B_gt_tree", res_b, os.path.join(args.out, "B"))
    rows.append(("B fitted seg+poses, GT topology", *b))

    # C: GT everything (projection modeling error only)
    res_c = dict(sample)
    res_c.update(pred_cano_part=gt_seg,
                 pred_pose_list=np.delete(gt_poses, args.cano_idx, axis=0),
                 cano_idx=args.cano_idx, joint_connection=star_tree(gt_seg))
    c = project("C_gt_all", res_c, os.path.join(args.out, "C"))
    rows.append(("C GT seg+poses, GT topology", *c))

    # D: GT seg, fitted poses (pose quality in isolation). Fitted poses are
    # per FITTED part; give each GT part the pose of the fitted part that
    # majority-overlaps it.
    fit_poses = np.asarray(fitted["pred_pose_list"], np.float32)
    gt_to_fit = np.asarray(
        [np.bincount(fit_seg[gt_seg == g]).argmax()
         for g in range(int(gt_seg.max()) + 1)])
    res_d = dict(fitted)
    res_d.update(pred_cano_part=gt_seg,
                 pred_pose_list=fit_poses[:, gt_to_fit],
                 joint_connection=star_tree(gt_seg))
    d = project("D_gt_seg", res_d, os.path.join(args.out, "D"))
    rows.append(("D GT seg, fitted poses, GT topology", *d))

    # E: the flagship path + --tree_search (energy-scored MST edge-swap
    # sweep): the fix implied by A vs B, measured on the same base fit
    e = project("E_tree_search", dict(fitted), os.path.join(args.out, "E"),
                extra=["--tree_search", "18", "--tree_search_iter",
                       str(args.kin_iter)])
    rows.append(("E fitted seg+poses, tree_search 18", *e))

    print(f"\n{'config':<42}{'full_flow_epe':>14}{'per_scan_ri':>12}")
    for name, epe, ri in rows:
        print(f"{name:<42}{epe:>14.3f}{ri:>12.3f}")


if __name__ == "__main__":
    main()

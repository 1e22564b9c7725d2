#!/usr/bin/env python
"""Motion-consistency seg-refinement A/B at reference scale (round 5).

The fullscale projection ablation attributes the sapien full-flow EPE
residual to canonical segmentation error (GT-seg arm: 0.672 vs fitted-seg
3.9, topology fixed). This script loads a finished fullscale base result,
applies models.base_model.refine_seg_motion over the fitted poses, reports
cano-seg RI before/after vs GT, and drives the projection stage on both
segs through the product CLI for the end metric.

Run (chip): PYTHONPATH=/root/.axon_site:/root/repo python \
    scripts/ab_seg_refine.py --base /tmp/ablate_fullscale/base/0 \
    --scene /tmp/ablate_fullscale/scene --cano_idx 0
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True,
                    help="fitted base save dir (holds result.pkl)")
    ap.add_argument("--scene", required=True)
    ap.add_argument("--cano_idx", default=0, type=int)
    ap.add_argument("--out", default="/tmp/ab_seg_refine")
    ap.add_argument("--kin_iter", default=200, type=int)
    ap.add_argument("--n_it", default=2, type=int)
    args = ap.parse_args()

    import jax.numpy as jnp

    from reart_tpu import metrics as M
    from reart_tpu.cli import main as cli_main
    from reart_tpu.data.sapien import SapienDataset
    from reart_tpu.models.base_model import refine_seg_motion

    with open(os.path.join(args.base, "result.pkl"), "rb") as f:
        result = pickle.load(f)
    sample = SapienDataset(args.scene, cano_idx=args.cano_idx)[0]
    gt_seg = np.asarray(sample["gt_cano_part"])
    seg = np.asarray(result["pred_cano_part"])
    trans = np.asarray(result["pred_pose_list"], np.float32)
    cano = np.asarray(sample["cano_pc"], np.float32)
    pcs = np.asarray(sample["pc_list"], np.float32)

    print(f"cano RI before: {M.eval_seg(gt_seg, seg):.4f} "
          f"({len(np.unique(seg))} parts)", flush=True)
    t0 = time.perf_counter()
    refined = np.asarray(refine_seg_motion(cano, pcs, trans, seg,
                                           n_it=args.n_it))
    print(f"refine_seg_motion: {time.perf_counter() - t0:.1f}s; "
          f"moved {(refined != seg).sum()}/{len(seg)} points", flush=True)
    print(f"cano RI after:  {M.eval_seg(gt_seg, refined):.4f} "
          f"({len(np.unique(refined))} parts)", flush=True)

    os.makedirs(args.out, exist_ok=True)

    def project(name, seg_used):
        res = dict(result)
        res["pred_cano_part"] = seg_used
        res.pop("joint_connection", None)  # rebuild the tree for this seg
        path = os.path.join(args.out, f"{name}.pkl")
        with open(path, "wb") as f:
            pickle.dump(res, f)
        save = os.path.join(args.out, name)
        cli_main([
            "sapien", "--sapien_base_folder", args.scene, "--sapien_idx",
            "0", "--cano_idx", str(args.cano_idx), "--save_root", save,
            "--model", "kinematic", "--base_result_path", path,
            "--n_iter", str(args.kin_iter),
            "--start_tau", "1", "--end_tau", "1", "--snapshot_gap", "5000",
        ])
        txt = open(os.path.join(save, "0", "result.txt")).read()
        vals = {l.split(":")[0]: float(l.split(":")[1])
                for l in txt.splitlines() if ":" in l}
        return vals

    rows = []
    for name, s in (("fitted_seg", seg), ("refined_seg", refined)):
        v = project(name, s)
        rows.append((name, v["full_flow_epe"], v.get("per_scan_ri"),
                     v.get("multi_scan_ri"), v.get("seg_ri")))

    print(f"\n{'arm':<14}{'full_flow_epe':>14}{'per_scan_ri':>12}"
          f"{'multi_scan_ri':>14}{'seg_ri':>8}")
    for r in rows:
        print(f"{r[0]:<14}{r[1]:>14.3f}{r[2]:>12.3f}{r[3]:>14.3f}"
              f"{r[4]:>8.3f}")


if __name__ == "__main__":
    main()

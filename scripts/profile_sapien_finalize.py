#!/usr/bin/env python
"""Host-side profile of the sapien finalize blocks at reference scale.

The reference-scale sapien drive recorded ~375-430 s of host finalize
(PARITY round 4) with no sub-block attribution. Every block here runs
under on_host in production, so a CPU-only profile is faithful. Uses the
synthetic generator's GT as the "fitted" result (shapes and code paths
identical to a real finalize).

  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/profile_sapien_finalize.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/profile_sapien_finalize")
    ap.add_argument("--n_views", default=8, type=int)
    ap.add_argument("--n_points", default=4096, type=int)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from reart_tpu.data.sapien import SapienDataset
    from reart_tpu.data.synth import make_sapien_scene
    from reart_tpu import metrics as M
    from reart_tpu.models.base_model import compute_pc_transform
    from reart_tpu.sapien_eval import (
        compute_full_flow, eval_full_flow, seg_propagation_list)

    scene = make_sapien_scene(os.path.join(args.out, "scene"),
                              n_views=args.n_views, n_points=args.n_points)
    cano_idx = args.n_views // 2
    sample = SapienDataset(scene, cano_idx=cano_idx)[0]
    seg_part = np.asarray(sample["gt_cano_part"])
    gt_poses = np.asarray(sample["gt_pose_list"], np.float32)  # (T, P, 4, 4)
    trans_list = jnp.asarray(np.delete(gt_poses, cano_idx, axis=0))
    cano_pc = jnp.asarray(sample["cano_pc"], jnp.float32)
    n_parts = gt_poses.shape[1]

    def tic(name, fn):
        t0 = time.perf_counter()
        out = fn()
        jax.tree.map(lambda x: np.asarray(x)
                     if hasattr(x, "dtype") else x, out)
        print(f"{name:<28}{time.perf_counter() - t0:>8.1f}s", flush=True)
        return out

    # mirror cli.finalize's sapien path shapes (cli.py:1073-1081)
    eye = jnp.eye(4)[None, None].repeat(n_parts, 1)
    complete_trans = jnp.concatenate(
        [trans_list[:cano_idx], eye, trans_list[cano_idx:]], 0)
    pred_pc = tic("forward (pc_transform)", lambda: compute_pc_transform(
        cano_pc, trans_list, jnp.asarray(seg_part)))
    pred_np = np.asarray(pred_pc)

    seg_list = tic("seg_propagation_list", lambda: seg_propagation_list(
        sample["pc_list"], pred_np, seg_part))
    complete_seg = jnp.concatenate(
        [seg_list[:cano_idx], jnp.asarray(seg_part)[None],
         seg_list[cano_idx:]], 0)
    full_flow = tic("compute_full_flow", lambda: compute_full_flow(
        sample["complete_pc_list"], complete_seg, complete_trans))
    tic("eval_full_flow", lambda: eval_full_flow(
        full_flow, sample["gt_full_flow"]))
    tic("per/multi-scan RI", lambda: [
        [M.eval_seg(g, p) for g, p in
         zip(jnp.asarray(sample["complete_gt_part_list"]), complete_seg)],
        M.eval_seg(jnp.asarray(sample["complete_gt_part_list"]).reshape(-1),
                   complete_seg.reshape(-1))])
    tic("chamfer_list", lambda: M.compute_chamfer_list(
        pred_np, sample["pc_list"], reduction="mean"))
    conn = np.asarray([[p, 0] for p in range(1, seg_part.max() + 1)])
    tic("energy (ass+screw)", lambda: M.energy(
        jnp.asarray(pred_np), jnp.asarray(sample["pc_list"], jnp.float32),
        trans_list, jnp.asarray(conn), seg_part, include_group=False))


if __name__ == "__main__":
    main()

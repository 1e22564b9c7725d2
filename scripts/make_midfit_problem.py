"""Rebuild the engine's exact mid-fit assignment problems (WITH points) from
a fitted base result + kinematic checkpoint, at downsample 2 and 1. These are
the giant-LAP workloads (reference run_robot.py:164-187 cost construction)
that scripts/ab_lap.py benchmarks.

Usage:
  python scripts/make_midfit_problem.py \
      [--base_result /tmp/nao_corr_r3/fit_base/nao/result.pkl] \
      [--kin_ckpt /tmp/nao_corr_r3/fit_kinematic/nao/model.ckpt.pkl] \
      [--seq_path /root/reference/demo_data/data/nao] \
      [--out /tmp/vr/midfit_points.pkl] [--cano_idx 4]
"""
import argparse
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
import reart_tpu  # noqa: F401
from reart_tpu.cli import build_kinematic_from_result
from reart_tpu.train.engine import build_assign_context
from reart_tpu.checkpoint import load_checkpoint

ap = argparse.ArgumentParser()
ap.add_argument("--base_result",
                default="/tmp/nao_corr_r3/fit_base/nao/result.pkl")
ap.add_argument("--kin_ckpt",
                default="/tmp/nao_corr_r3/fit_kinematic/nao/model.ckpt.pkl")
ap.add_argument("--seq_path", default="/root/reference/demo_data/data/nao")
ap.add_argument("--out", default="/tmp/vr/midfit_points.pkl")
ap.add_argument("--cano_idx", type=int, default=4)
args = ap.parse_args()


class A:
    cano_idx = args.cano_idx
    merge_thr = 3e-2
    merge_it = 2
    lambda_joint = 100.0
    cano_dist_thr = 1e-2
    num_points = 4096
    seq_path = args.seq_path


with open(args.base_result, "rb") as f:
    result = pickle.load(f)
ck = load_checkpoint(args.kin_ckpt)
from reart_tpu.data.robot import RobotSequence

ds = RobotSequence(A.seq_path, 4096, A.cano_idx)
sample = ds[0]
params, state = build_kinematic_from_result(
    A, "robot", jnp.asarray(sample["cano_pc"]), result)
params = jax.tree.map(jnp.asarray, ck["state_dict"])
from reart_tpu.models.kinematic import kinematic_forward

pc_trans, _, _ = kinematic_forward(params, state, state.cano_pc,
                                   seg_part=state.seg_part)
pc_list = jnp.asarray(sample["pc_list"], jnp.float32)
out = {}
for dsamp in (2, 1):
    actx = build_assign_context(state.cano_pc, pc_list, dsamp)
    pc_src = pc_trans[:, actx.src_idx]
    out[dsamp] = {"pc_src": np.asarray(pc_src),
                  "pc_tgt": np.asarray(actx.pc_tgt)}
    print("downsample", dsamp, out[dsamp]["pc_src"].shape,
          out[dsamp]["pc_tgt"].shape)
os.makedirs(os.path.dirname(args.out), exist_ok=True)
with open(args.out, "wb") as f:
    pickle.dump(out, f)
print("saved", args.out)

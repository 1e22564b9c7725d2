"""Rebuild the engine's exact mid-fit assignment problems (WITH points) from
the round-1 faithful-protocol checkpoint, at downsample 2 and 1."""
import pickle
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import reart_tpu
from reart_tpu.cli import build_kinematic_from_result
from reart_tpu.train.engine import build_assign_context
from reart_tpu.checkpoint import load_checkpoint

class A:
    cano_idx = 2; merge_thr = 3e-2; merge_it = 2; lambda_joint = 100.0
    cano_dist_thr = 1e-2; num_points = 4096
    seq_path = "/root/reference/demo_data/data/nao"

with open("/tmp/reart_refresh/fit_base/nao/result.pkl", "rb") as f:
    result = pickle.load(f)
ck = load_checkpoint("/tmp/reart_refresh/fit_kin_faithful/nao/model.ckpt.pkl")
from reart_tpu.data.robot import RobotSequence
ds = RobotSequence(A.seq_path, 4096, 2)
sample = ds[0]
params, state = build_kinematic_from_result(A, "robot", jnp.asarray(sample["cano_pc"]), result)
params = jax.tree.map(jnp.asarray, ck["state_dict"])
from reart_tpu.models.kinematic import kinematic_forward
pc_trans, _, _ = kinematic_forward(params, state, state.cano_pc, seg_part=state.seg_part)
pc_list = jnp.asarray(sample["pc_list"], jnp.float32)
out = {}
for dsamp in (2, 1):
    actx = build_assign_context(state.cano_pc, pc_list, dsamp)
    pc_src = pc_trans[:, actx.src_idx]
    out[dsamp] = {"pc_src": np.asarray(pc_src), "pc_tgt": np.asarray(actx.pc_tgt)}
    print("downsample", dsamp, out[dsamp]["pc_src"].shape, out[dsamp]["pc_tgt"].shape)
with open("/tmp/vr/midfit_points.pkl", "wb") as f:
    pickle.dump(out, f)
print("saved")

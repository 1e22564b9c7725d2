"""Data layer: per-domain sequence loaders producing one dict-of-numpy sample
for the whole point-cloud sequence (the reference's dataset contract)."""

from reart_tpu.data.robot import RobotSequence
from reart_tpu.data.common import (
    load_state,
    load_pose,
    get_rel_pose,
    pose_identity_like,
    sparse_sample_novel_state,
    load_gt_graph,
    load_normalize_dict,
    pc_normalize,
)

"""End-to-end driver test: a synthetic nao-style robot sequence written to
disk as reference-format pickles, run through `python run.py robot` (via
cli.main), checking the full artifact set and result metrics."""

import os
import pickle

import networkx as nx
import numpy as np
import pytest

from reart_tpu.cli import main as cli_main
from reart_tpu.data.common import Node  # pickle-compatible GT graph node


def rotz(a):
    return np.array([
        [np.cos(a), -np.sin(a), 0, 0],
        [np.sin(a), np.cos(a), 0, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
    ])


@pytest.fixture(scope="module")
def robot_dir(tmp_path_factory):
    """3-part robot (base + 2 hinged arms), 4 frames, 360 points, GT graph."""
    root = tmp_path_factory.mktemp("toyrobot")
    rng = np.random.RandomState(0)
    n_per = 120
    base = rng.uniform([-0.3, -0.5, -0.2], [0.3, 0.5, 0.2], (n_per, 3))
    arm_l = rng.uniform([-1.0, 0.2, -0.1], [-0.3, 0.45, 0.1], (n_per, 3))
    arm_r = rng.uniform([0.3, 0.2, -0.1], [1.0, 0.45, 0.1], (n_per, 3))
    cano = np.concatenate([base, arm_l, arm_r])
    part_id = np.repeat([0, 1, 2], n_per)

    def pose_dict(i):
        # part 0 static; parts 1/2 rotate about z hinges
        return {
            0: np.eye(4),
            1: rotz(0.25 * i),
            2: rotz(-0.2 * i),
        }

    def apply(pose, pts):
        homo = np.concatenate([pts, np.ones((len(pts), 1))], 1)
        return (homo @ pose.T)[:, :3]

    for i in range(4):
        poses = pose_dict(i)
        pc = cano.copy()
        for pid in (0, 1, 2):
            sel = part_id == pid
            pc[sel] = apply(poses[pid], pc[sel])
        with open(root / f"state_{i}.pkl", "wb") as f:
            pickle.dump({"pc": pc, "part_id": part_id}, f)
        if i > 0:
            with open(root / f"pose_{i}.pkl", "wb") as f:
                pickle.dump(poses, f)
    # one novel pose for IK retargeting
    with open(root / "novel_pose_0.pkl", "wb") as f:
        pickle.dump(pose_dict(5), f)

    # GT graph: arms are children of the base
    nodes = {pid: Node([f"link_{pid}"]) for pid in (0, 1, 2)}
    g = nx.DiGraph()
    g.add_edge(nodes[1], nodes[0])
    g.add_edge(nodes[2], nodes[0])
    with open(root / "graph.gpickle", "wb") as f:
        pickle.dump(g, f)
    with open(root / "part_mapping.pkl", "wb") as f:
        pickle.dump({
            "face_part_mapping": {},
            "node_part_mapping": {pid: [f"link_{pid}"] for pid in (0, 1, 2)},
        }, f)
    return str(root)


@pytest.mark.slow
def test_robot_base_then_kinematic(robot_dir, tmp_path):
    save_root = str(tmp_path / "exp")
    # stage 1: relaxation
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root,
        "--n_iter", "400", "--assign_iter", "200", "--use_assign_loss",
        "--num_parts", "5", "--start_tau", "2", "--end_tau", "0.5",
        "--num_points", "360", "--snapshot_gap", "1000",
    ])
    seq_dir = os.path.join(save_root, os.path.basename(robot_dir))
    for artifact in ("result.pkl", "result.txt", "model.ckpt.pkl",
                     "recon.gif", "gt.gif", "seg.html", "structure.html",
                     "input.gif"):
        assert os.path.exists(os.path.join(seq_dir, artifact)), artifact

    with open(os.path.join(seq_dir, "result.pkl"), "rb") as f:
        result = pickle.load(f)
    assert result["pred_pose_list"].shape[0] == 3  # T-1 frames
    n_parts = result["pred_cano_part"].max() + 1
    assert len(result["joint_connection"]) == n_parts - 1

    txt = open(os.path.join(seq_dir, "result.txt")).read()
    assert "seg_ri" in txt and "ted" in txt and "total_err" in txt
    ri = float([l for l in txt.splitlines() if l.startswith("seg_ri")][0].split(":")[1])
    assert ri > 0.75, txt

    # stage 2: projection from the stage-1 result
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root + "_kin",
        "--model", "kinematic",
        "--base_result_path", os.path.join(seq_dir, "result.pkl"),
        "--n_iter", "60", "--num_points", "360",
        "--start_tau", "1", "--end_tau", "1",
    ])
    kin_dir = os.path.join(save_root + "_kin", os.path.basename(robot_dir))
    txt = open(os.path.join(kin_dir, "result.txt")).read()
    assert "retarget_err" in txt
    retarget = float([l for l in txt.splitlines()
                      if l.startswith("retarget_err")][0].split(":")[1])
    assert retarget < 9999.0, txt  # IK actually ran
    # kinematic checkpoint restores
    from reart_tpu import checkpoint as ckpt

    payload = ckpt.load_checkpoint(os.path.join(kin_dir, "model.ckpt.pkl"))
    state = ckpt.restore_kinematic_state(payload)
    assert state.num_parts >= 2


@pytest.mark.slow
def test_robot_gt_flow_provider(robot_dir, tmp_path):
    """--flow_provider gt trains with GT-correspondence flow supervision."""
    save_root = str(tmp_path / "exp_flow")
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root,
        "--n_iter", "150", "--use_flow_loss", "--flow_provider", "gt",
        "--num_parts", "4", "--start_tau", "2", "--end_tau", "0.5",
        "--num_points", "360", "--snapshot_gap", "1000",
    ])
    txt = open(os.path.join(save_root, os.path.basename(robot_dir),
                            "result.txt")).read()
    ri = float([l for l in txt.splitlines()
                if l.startswith("seg_ri")][0].split(":")[1])
    assert ri > 0.6, txt


@pytest.mark.slow
def test_robot_corr_flow_provider_e2e(robot_dir, tmp_path):
    """The reference protocol's flow path end-to-end: a (random-weight)
    corr checkpoint in the released format -> load_corr_model ->
    PointNet2Msg2 features -> SMNN matching -> FlowContext -> fit."""
    import torch

    from ref_oracle import setup_reference_path

    setup_reference_path()
    import networks.pointnet2_utils as pn2

    pn2.CUDA = False
    from networks.feature_extractor import PointNet2Msg2

    torch.manual_seed(1)
    ckpt_path = str(tmp_path / "corr_model.pth.tar")
    torch.save({"state_dict": PointNet2Msg2(out_dim=64).state_dict()},
               ckpt_path)
    cat = os.path.basename(robot_dir.rstrip("/"))
    norm_path = str(tmp_path / "normalize.pkl")
    with open(norm_path, "wb") as f:
        pickle.dump({cat: {"centroid": np.zeros(3, np.float32),
                           "scale": 1.0}}, f)

    save_root = str(tmp_path / "exp")
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root,
        "--n_iter", "60", "--assign_iter", "1000", "--use_flow_loss",
        "--flow_provider", "corr", "--corr_model_path", ckpt_path,
        "--normalize_file", norm_path, "--num_parts", "4",
        "--num_points", "360", "--start_tau", "1", "--end_tau", "0.5",
        "--snapshot_gap", "1000",
    ])
    seq_dir = os.path.join(save_root, cat)
    txt = open(os.path.join(seq_dir, "result.txt")).read()
    assert "flow_epe" in txt  # flow supervision was wired in


@pytest.mark.slow
def test_train_corr_cli_then_fit(robot_dir, tmp_path):
    """`run.py corr` (the trainer the reference lacks) end-to-end: self-train
    a correspondence backbone on the sequence's own frames, save it natively,
    then run the robot fit with --flow_provider corr on the result — the
    complete zero-external-checkpoint pipeline."""
    cat = os.path.basename(robot_dir.rstrip("/"))
    norm_path = str(tmp_path / "normalize.pkl")
    with open(norm_path, "wb") as f:
        pickle.dump({cat: {"centroid": np.zeros(3, np.float32),
                           "scale": 1.0}}, f)
    ckpt_path = str(tmp_path / "corr_model.pkl")

    out = cli_main([
        "corr", "--data_domain", "robot", "--seq_path", robot_dir,
        "--normalize_file", norm_path, "--num_points", "360",
        "--steps", "4", "--batch", "2", "--train_points", "360",
        "--dispatch_chunk", "2", "--save_path", ckpt_path,
    ])
    assert os.path.exists(ckpt_path)
    assert np.isfinite(out["loss"])

    save_root = str(tmp_path / "exp")
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root,
        "--n_iter", "40", "--assign_iter", "1000", "--use_flow_loss",
        "--flow_provider", "corr", "--corr_model_path", ckpt_path,
        "--normalize_file", norm_path, "--num_parts", "4",
        "--num_points", "360", "--start_tau", "1", "--end_tau", "0.5",
        "--snapshot_gap", "1000",
    ])
    txt = open(os.path.join(save_root, cat, "result.txt")).read()
    assert "flow_epe" in txt

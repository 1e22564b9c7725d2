"""End-to-end driver test: a synthetic nao-style robot sequence written to
disk as reference-format pickles, run through `python run.py robot` (via
cli.main), checking the full artifact set and result metrics."""

import os
import pickle

import numpy as np
import pytest

from reart_tpu.cli import main as cli_main

# the shared `robot_dir` fixture (toy 3-part robot sequence on disk) lives in
# conftest.py — also consumed by tests/test_reverse_parity.py


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
    # IK over the novel pose (arms swing 1.25/-1.0 rad, ~100 cm-equivalent
    # motion at this cloud scale): the fitted kinematic model must recover
    # most of it. Measured 24.6 on this seeded fixture (2026-08-19); 50 is
    # a loose-but-real bound — an unfit/identity model scores far above it.
    assert retarget < 50.0, txt
    # predicted tree vs the 3-part GT graph: measured TED 1 on this seeded
    # fixture (one edit from GT; 0 would be an exact topology match)
    ted = float([l for l in txt.splitlines()
                 if l.startswith("ted")][0].split(":")[1])
    assert ted <= 1.0, txt
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


@pytest.mark.slow
def test_robot_snapshot_metrics(robot_dir, tmp_path):
    """--snapshot_metrics: the reference's mid-fit snapshot block
    (run_robot.py:224-269) — intermediate metric rows must land in
    result.txt and show the raw-seg metrics improving toward the final."""
    save_root = str(tmp_path / "exp_snap")
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root,
        "--n_iter", "150", "--use_flow_loss", "--flow_provider", "gt",
        "--num_parts", "4", "--start_tau", "2", "--end_tau", "0.5",
        "--num_points", "360", "--snapshot_gap", "50", "--snapshot_metrics",
        "--dispatch_chunk", "50",
    ])
    txt = open(os.path.join(save_root, os.path.basename(robot_dir),
                            "result.txt")).read()
    rows = [l for l in txt.splitlines() if l.startswith("snapshot ")]
    # 150 iters at gap 50 -> snapshots at 50 and 100 (the final iteration is
    # the finalize block itself, reference semantics)
    assert len(rows) >= 2, txt
    for row in rows:
        assert "seg_ri" in row and "recon_err" in row, row
        # every metric in the row parses as a finite float
        for part in row.split("|")[1:]:
            v = float(part.split(":")[1])
            assert np.isfinite(v), row


@pytest.mark.slow
def test_robot_snapshot_graph(robot_dir, tmp_path):
    """--snapshot_graph (round-4, VERDICT r3 #5): mid-fit snapshot rows at
    the reference's FULL depth — the host graph stage (denoise/merge/MST,
    run_robot.py:232-240) and the selection energy (:306-314) run per
    snapshot, so a kinematic tree appears mid-fit in result.txt."""
    save_root = str(tmp_path / "exp_snapg")
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root,
        "--n_iter", "100", "--use_flow_loss", "--flow_provider", "gt",
        "--num_parts", "4", "--start_tau", "2", "--end_tau", "0.5",
        "--num_points", "360", "--snapshot_gap", "50", "--snapshot_graph",
        "--dispatch_chunk", "50",
    ])
    txt = open(os.path.join(save_root, os.path.basename(robot_dir),
                            "result.txt")).read()
    rows = [l for l in txt.splitlines() if l.startswith("snapshot ")]
    assert len(rows) >= 1, txt
    for row in rows:
        # the raw-seg metrics are still there (--snapshot_graph implies
        # --snapshot_metrics) ...
        assert "seg_ri" in row and "recon_err" in row, row
        # ... plus the graph stage: part count, a tree, and its energy
        assert "parts: " in row and "edges: [" in row, row
        assert "total_err: " in row and "ass_err: " in row, row
        n_parts = int(row.split("parts: ")[1].split(" |")[0])
        edges = row.split("edges: ")[1].split(" |")[0]
        assert n_parts >= 1
        # a P-part tree has P-1 edges
        assert edges.count("[") == max(n_parts - 1, 0) + 1 or n_parts == 1, \
            row

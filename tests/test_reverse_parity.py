"""Reverse-direction parity: the REFERENCE's own evaluator, run over OUR fit.

Forward parity (reference checkpoints through our evaluator) lives in
tests/test_reference_parity.py + PARITY.md. This closes the loop: fit the toy
robot with our CLI, export the kinematic result as a reference-format torch
checkpoint (checkpoint.save_torch_kinematic), and drive the unmodified
/root/reference/run_robot.py --evaluate on it (CPU, CUDA wheels stubbed by
scripts/refstubs). Every metric both sides compute must agree.

The runner executes in a SUBPROCESS so the refstubs (knn_cuda, chamferdist,
apted, plotly stand-ins) never enter this pytest process's module state.

Reference: run_robot.py:126-141 (resume), 285-338 (the evaluate block whose
result.txt we parse).
"""

import os
import re
import subprocess
import sys

import pytest

from conftest import requires_reference
from reart_tpu.cli import main as cli_main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_ours(path):
    out = {}
    for line in open(path):
        if ":" in line:
            k, v = line.split(":", 1)
            try:
                out[k.strip()] = float(v)
            except ValueError:
                pass
    return out


def parse_reference(path):
    """run_robot.py:333-338 format: `recon_err: X`, `retarget_err: X`,
    `tree edit distance: X`, `flow_epe: X | flow_acc5: X | ...`,
    `seg_ri: X`."""
    txt = open(path).read()
    out = {}
    for key in ("recon_err", "retarget_err", "seg_ri", "flow_epe",
                "flow_acc5", "flow_acc10", "flow_angle"):
        m = re.search(rf"{key}: ([-\d.]+)", txt)
        if m:
            out[key] = float(m.group(1))
    m = re.search(r"tree edit distance: ([-\d.]+)", txt)
    if m:
        out["ted"] = float(m.group(1))
    return out


@pytest.mark.slow
@requires_reference
def test_reference_evaluator_reproduces_our_metrics(robot_dir, tmp_path):
    # our fit: relaxation then projection (same recipe as test_cli, fewer
    # iterations — parity is between EVALUATORS on one checkpoint, not a
    # quality bar)
    save_root = str(tmp_path / "exp")
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root,
        "--n_iter", "200", "--assign_iter", "100", "--use_assign_loss",
        "--num_parts", "5", "--start_tau", "2", "--end_tau", "0.5",
        "--num_points", "360", "--snapshot_gap", "1000",
    ])
    seq = os.path.basename(robot_dir)
    cli_main([
        "robot", "--seq_path", robot_dir, "--save_root", save_root + "_kin",
        "--model", "kinematic",
        "--base_result_path", os.path.join(save_root, seq, "result.pkl"),
        "--n_iter", "60", "--num_points", "360",
        "--start_tau", "1", "--end_tau", "1",
    ])
    kin_dir = os.path.join(save_root + "_kin", seq)
    ours = parse_ours(os.path.join(kin_dir, "result.txt"))

    # the reference's evaluator over the exported checkpoint
    rev_root = str(tmp_path / "revparity")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "reverse_parity.py"),
         "--ckpt", os.path.join(kin_dir, "model.ckpt.pkl"),
         "--model", "kinematic", "--seq_path", robot_dir,
         "--save_root", rev_root, "--num_points", "360",
         "--num_parts", "5"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    theirs = parse_reference(os.path.join(rev_root, seq, "result.txt"))

    # deterministic metrics of the SAME fit must agree to float-print
    # precision (measured exact to 3 decimals on this fixture, 2026-08-19)
    for key in ("recon_err", "flow_epe", "seg_ri", "ted"):
        assert key in ours and key in theirs, (key, ours, theirs)
        assert theirs[key] == pytest.approx(ours[key], rel=2e-3, abs=2e-3), (
            key, ours, theirs)
    # retarget re-runs IK (an optimization, torch Adam on their side vs our
    # jitted Adam) — agreement is convergence-level, not bitwise
    assert theirs["retarget_err"] == pytest.approx(
        ours["retarget_err"], rel=0.05, abs=0.5), (ours, theirs)

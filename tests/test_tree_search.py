"""Energy-scored kinematic-tree search (--tree_search).

scripts/ablate_projection.py attributes the projection stage's flow
degradation entirely to merge/MST topology error; tree_search short-fits the
MST's 1-edge-swap neighborhood and keeps the lowest-energy tree. These tests
pin the candidate generator's invariants and show the search recovering the
true topology from a deliberately wrong stored tree on a scene where hinge
axes are displaced (so a wrong parent is NOT screw-expressible — unlike
coincident-axis toys where every tree fits exactly).
"""

import os
import pickle

import numpy as np
import networkx as nx
import pytest

from reart_tpu.cli import main as cli_main
from reart_tpu.graph.mst import mst, tree_candidates


def test_tree_candidates_invariants(rng):
    p = 7
    cost = rng.rand(p, p) * 2 + 1e4 * np.eye(p)
    cands = tree_candidates(cost, k=6)
    assert len(cands) <= 6
    assert np.array_equal(cands[0], mst(cost, keep_index=True))
    seen = set()
    for t in cands:
        g = nx.Graph()
        g.add_nodes_from(range(p))
        g.add_edges_from(map(tuple, t))
        assert nx.is_tree(g)
        key = frozenset(map(tuple, np.sort(t, axis=1)))
        assert key not in seen  # deduplicated
        seen.add(key)

    uni = np.arange(p) * 3 + 1
    relabeled = tree_candidates(cost, uni_label=uni, k=3)
    for t in relabeled:
        assert np.isin(t, uni).all()


def test_tree_candidates_deltas(rng):
    """return_deltas: the MST carries delta 0, swaps carry their local cost
    delta in ascending order (the CLI auto gate keys off these)."""
    p = 6
    cost = rng.rand(p, p) * 2 + 1e4 * np.eye(p)
    cands, deltas = tree_candidates(cost, k=5, return_deltas=True)
    assert len(deltas) == len(cands)
    assert deltas[0] == 0.0
    assert all(d >= 0.0 for d in deltas)
    assert deltas[1:] == sorted(deltas[1:])


def test_axis_excess_vetoes_translation_in_disguise():
    """cli._axis_excess: a fitted REVOLUTE axis far outside the object (the
    rotation-about-an-axis-at-infinity overfit that mimics a translation)
    scores > 0; sane in-object axes and prismatic edges score exactly 0.
    The detail records carry the per-edge (excess, theta amplitude) whose
    PRODUCT is the tree-search veto (fabricated displacement): a far axis
    with near-zero articulation is ill-conditioned noise, not an overfit."""
    from types import SimpleNamespace

    from reart_tpu.cli import _axis_excess

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)  # r_obj ~ 0.8
    seg = np.zeros(200, np.int64)
    seg[100:] = 1
    theta = np.array([[0.0], [0.4], [0.8]])  # 3 frames, amplitude 0.8

    def state(pris):
        return SimpleNamespace(edges=np.array([[1, 0]]),
                               prismatic_mask=np.asarray(pris))

    # z-axis through the origin: inside the object
    sane = {"axis_list": np.array([[0.0, 0.0, 1.0]]),
            "moment_list": np.array([[0.0, 0.0, 0.0]]),
            "theta_list": theta}
    assert _axis_excess(sane, state([False]), pts, seg) == 0.0

    # z-axis through (100, 0, 0): moment = p x l = (0, -100, 0)
    far = {"axis_list": np.array([[0.0, 0.0, 1.0]]),
           "moment_list": np.array([[0.0, -100.0, 0.0]]),
           "theta_list": theta}
    mean, detail = _axis_excess(far, state([False]), pts, seg,
                                return_detail=True)
    assert mean > 50.0
    [(e, child, exc, th_amp)] = detail
    assert (e, child) == (0, 1)
    assert exc == mean and abs(th_amp - 0.8) < 1e-12
    # fabricated displacement (the tree-search score term) is decisive for
    # an articulating far axis, ~zero when the same axis barely articulates
    assert exc * th_amp > 40.0
    still = dict(far, theta_list=np.array([[0.0], [1e-3], [2e-3]]))
    _, d2 = _axis_excess(still, state([False]), pts, seg, return_detail=True)
    assert d2[0][2] * d2[0][3] < 0.3
    # the same far axis on a PRISMATIC edge is exempt (axis = direction)
    assert _axis_excess(far, state([True]), pts, seg) == 0.0
    # theta amplitude must count the canonical frame's implicit theta=0:
    # a 2-frame sequence has ONE fitted theta (ptp alone would be 0 and
    # disable the veto), and one-sided motion spans down to 0, not to its
    # own minimum (ADVICE r4).
    two_frame = dict(far, theta_list=np.array([[0.7]]))
    _, d3 = _axis_excess(two_frame, state([False]), pts, seg,
                         return_detail=True)
    assert abs(d3[0][3] - 0.7) < 1e-12
    one_sided = dict(far, theta_list=np.array([[0.4], [0.8]]))
    _, d4 = _axis_excess(one_sided, state([False]), pts, seg,
                         return_detail=True)
    assert abs(d4[0][3] - 0.8) < 1e-12


def test_tree_candidates_degenerate():
    # P=2: exactly one spanning tree
    cost = np.array([[1e4, 1.0], [2.0, 1e4]])
    cands = tree_candidates(cost, k=8)
    assert len(cands) == 1 and cands[0].shape == (1, 2)


def _rot_about(angle, center):
    """Rotation about a z-axis through `center` (displaced hinge)."""
    c, s = np.cos(angle), np.sin(angle)
    r = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    t = np.asarray(center) - r @ np.asarray(center)
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = t
    return out


@pytest.fixture(scope="module")
def offset_hinge_dir(tmp_path_factory):
    """3-part robot whose arm hinges sit at x = -/+0.45 (NOT the origin): a
    chain tree (arm2 under arm1) must express arm2's motion through arm1's
    screw, which no fixed-axis screw can do — topology genuinely matters."""
    from reart_tpu.data.common import Node

    root = tmp_path_factory.mktemp("offsetrobot")
    rs = np.random.RandomState(3)
    n_per = 120
    body = rs.uniform([-0.3, -0.4, -0.15], [0.3, 0.4, 0.15], (n_per, 3))
    arm_l = rs.uniform([-1.0, 0.1, -0.1], [-0.45, 0.35, 0.1], (n_per, 3))
    arm_r = rs.uniform([0.45, 0.1, -0.1], [1.0, 0.35, 0.1], (n_per, 3))
    cano = np.concatenate([body, arm_l, arm_r])
    part_id = np.repeat([0, 1, 2], n_per)

    def pose_dict(i):
        return {
            0: np.eye(4),
            1: _rot_about(0.3 * i, (-0.45, 0.2, 0.0)),
            2: _rot_about(-0.25 * i, (0.45, 0.2, 0.0)),
        }

    for i in range(4):
        poses = pose_dict(i)
        pc = cano.copy()
        for pid in (0, 1, 2):
            sel = part_id == pid
            homo = np.concatenate([pc[sel], np.ones((sel.sum(), 1))], 1)
            pc[sel] = (homo @ poses[pid].T)[:, :3]
        with open(root / f"state_{i}.pkl", "wb") as f:
            pickle.dump({"pc": pc, "part_id": part_id}, f)
        if i > 0:
            with open(root / f"pose_{i}.pkl", "wb") as f:
                pickle.dump(poses, f)
    with open(root / "novel_pose_0.pkl", "wb") as f:
        pickle.dump(pose_dict(5), f)

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
def test_tree_search_recovers_topology(offset_hinge_dir, tmp_path):
    """Kinematic stage fed GT seg+poses but a WRONG stored chain tree: with
    --tree_search the energy sweep must select the true star topology (and
    without it the stored wrong tree is honored — reference behavior)."""
    from reart_tpu.data.robot import RobotSequence

    sample = RobotSequence(offset_hinge_dir, num_points=360, cano_idx=0)[0]
    result = {
        "pred_cano_part": np.asarray(sample["gt_cano_part"]),
        "pred_pose_list": np.asarray(sample["gt_pose_list"])[1:],
        "cano_idx": 0,
        "joint_connection": [[1, 0], [2, 1]],  # WRONG: arm_r under arm_l
    }
    res_path = str(tmp_path / "base_result.pkl")
    with open(res_path, "wb") as f:
        pickle.dump(result, f)

    def run(save_root, extra):
        cli_main([
            "robot", "--seq_path", offset_hinge_dir, "--save_root", save_root,
            "--model", "kinematic", "--base_result_path", res_path,
            "--n_iter", "60", "--num_points", "360",
            "--start_tau", "1", "--end_tau", "1", "--snapshot_gap", "1000",
        ] + extra)
        from reart_tpu import checkpoint as ckpt

        seq = os.path.basename(offset_hinge_dir)
        payload = ckpt.load_checkpoint(
            os.path.join(save_root, seq, "model.ckpt.pkl"))
        state = ckpt.restore_kinematic_state(payload)
        return {tuple(sorted(e)) for e in state.edges}

    plain = run(str(tmp_path / "plain"), ["--tree_search", "0"])
    assert plain == {(0, 1), (1, 2)}  # wrong stored tree honored

    # round 4: -1 (auto) is the product DEFAULT — no flag passed. The stored
    # tree is injected past the ambiguity gate, so the sweep must run and
    # recover the true star topology.
    searched = run(str(tmp_path / "searched"),
                   ["--tree_search_iter", "40"])
    assert searched == {(0, 1), (0, 2)}  # true star topology recovered

    # round 5 (VERDICT r4 #4): the held-out-frame generalization criterion —
    # fit screws on a frame subset, freeze axes, IK-solve the held frames,
    # score reconstruction there — must reject the wrong chain tree too,
    # with no energy term and no hand-built axis veto involved: a wrong
    # parent's screw axes cannot transfer to motion states the fit never saw.
    holdout = run(str(tmp_path / "holdout"),
                  ["--tree_select", "holdout", "--tree_search_iter", "40"])
    assert holdout == {(0, 1), (0, 2)}

"""Kinematic-tree construction: relabeling, DAG conversion, screw extraction,
joint typing (host-side; runs once between the two optimization stages).

Parity target: utils/kinematic_utils.py:19-148 of the reference. The
per-edge Python loop of the reference's build_graph is batched: screws for
ALL tree edges are extracted in one dq_to_screw call, and the
revolute-vs-prismatic classification is a vectorized cost comparison. The
reference's per-edge `compute_mean_screw_param` calls always see E = 1 and
therefore plain-mean over time (no identity masking) — we replicate exactly
that with a plain time-mean.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import networkx as nx

from reart_tpu.geometry import (
    inverse_transformation,
    transform_to_dq,
    dq_to_screw,
)
from reart_tpu.graph.costs import compute_root_cost


def extract_kinematic(seg_part, trans_list, joint_connection):
    """Relabel surviving parts to 0..P-1 in all three artifacts.
    (kinematic_utils.py:19-33)"""
    seg_part = np.asarray(seg_part)
    joint_connection = np.asarray(joint_connection).copy()
    uni = np.unique(seg_part)
    conn_uni = np.unique(joint_connection)
    assert np.array_equal(conn_uni, uni), "edges must cover exactly the labels"
    trans_list = np.asarray(trans_list)[:, uni]
    mapping = {int(old): new for new, old in enumerate(uni)}
    new_seg = np.vectorize(mapping.__getitem__)(seg_part)
    new_conn = np.vectorize(mapping.__getitem__)(joint_connection)
    return new_seg, trans_list, new_conn


def to_dag(g: nx.Graph, root_node: int) -> nx.DiGraph:
    """Undirected tree -> child-to-parent DAG via shortest paths to root.
    (kinematic_utils.py:36-51)"""
    paths_to_base = nx.shortest_path(g, target=root_node)
    new_edges = []
    for part_id in g.nodes:
        path = paths_to_base[part_id]
        for i in range(len(path) - 1):
            edge = (path[i], path[i + 1])
            if edge not in new_edges:
                new_edges.append(edge)
    assert len(new_edges) == g.number_of_nodes() - 1, "invalid tree structure"
    dag = nx.from_edgelist(new_edges, create_using=nx.DiGraph())
    assert len(nx.descendants(dag, root_node)) == 0
    return dag


def edge_index2edges(edge_index: dict):
    """{"child_parent": idx} -> [[child, parent], ...]. (kinematic_utils.py:142-148)"""
    out = []
    for name in edge_index.keys():
        c, p = name.split("_")
        out.append([int(c), int(p)])
    return out


def build_graph(
    edges_list,
    trans_list,
    verbose: bool = False,
    root_part=None,
    revolute_only: bool = True,
    return_joint_type: bool = False,
    cano_pc=None,
    seg_part=None,
    rot_amp_thr: float = 0.15,
):
    """Extract per-edge screws + joint types from part trajectories.

    edges_list: (E0, 2) candidate edges over parts 0..P-1 (tree).
    trans_list: (T, P, 4, 4).
    Returns (reference kinematic_utils.py:54-139 contract):
      revolute_only: (G, root, axis (E,3), moment (E,3), theta (T,E), edge_index)
      else:          (..., distance (T,E), edge_index[, joint_type_list])

    Joint typing improvements over the reference (measured at reference
    scale, round 5 — on noisy fitted poses the reference's
    reconstruction-cost comparison failed BOTH ways: the fullscale drawer,
    a 0.35-body-scale pure translation, typed REVOLUTE because ~3 deg of
    consistent pose-noise rotation lets a far-axis screw fit
    translation+noise exactly while the screw-derived prismatic hypothesis
    inherits the noise rotation's axis and explains none of the slide; and
    a genuinely rotating flap (0.8 rad) typed PRISMATIC when root-alignment
    noise made its mean-axis screw misfit):

      * typing is decided by the ROTATION-AMPLITUDE EVIDENCE (rot_amp_thr,
        radians): prismatic iff the relative motion's max rotation angle is
        below threshold — see the inline note for the measured separations;
      * the prismatic hypothesis is TRANSLATION-NATIVE — its axis is the
        principal direction of the relative translations themselves (for
        clean pure translations this equals the reference's no-rotation
        screw axis exactly), its per-frame distance the projection onto
        that axis.

    cano_pc/seg_part are accepted for call-site compatibility and future
    geometric diagnostics; typing itself no longer needs them.
    """
    edges_list = np.asarray(edges_list)
    trans_list = jnp.asarray(trans_list)
    t, p = trans_list.shape[:2]
    init_g = nx.from_edgelist(edges_list.tolist(), create_using=nx.Graph())
    uni = np.unique(edges_list)
    assert np.array_equal(uni, np.arange(p)), "edges must cover parts 0..P-1"

    if root_part is None:
        root_cost = np.asarray(compute_root_cost(trans_list))
        root_part = int(uni[root_cost.argmin()])
    if verbose:
        print("root part id", root_part)

    g = to_dag(init_g, root_node=root_part)
    edges = list(g.edges())  # (child, parent) in DAG order
    e = len(edges)
    child = jnp.asarray([c for c, _ in edges])
    parent = jnp.asarray([pp for _, pp in edges])

    # batched per-edge relative trajectories + screws
    parent_trans = trans_list[:, parent]  # (T, E, 4, 4)
    child_trans = trans_list[:, child]
    rel_trans = inverse_transformation(parent_trans) @ child_trans
    dq = transform_to_dq(rel_trans.reshape(-1, 4, 4))
    s_axis, moment, theta, distance = dq_to_screw(dq)
    s_axis = s_axis.reshape(t, e, 3)
    moment = moment.reshape(t, e, 3)
    theta = theta.reshape(t, e)
    distance = distance.reshape(t, e)

    # reference quirk: per-edge mean sees E=1 -> plain time-mean, no masking
    mean_axis = jnp.mean(s_axis, axis=0)   # (E, 3)
    mean_moment = jnp.mean(moment, axis=0)

    edge_index = {f"{c}_{pp}": i for i, (c, pp) in enumerate(edges)}

    if revolute_only:
        joint_type_list = ["revolute"] * e
        no_rot = np.logical_or(
            np.abs(np.asarray(theta)) < 1e-6,
            np.abs(np.asarray(theta) - np.pi) < 1e-6,
        )
        assert no_rot.sum() == 0, "revolute-only build hit a no-rotation frame"
        if verbose:
            print(f"joint types at each edge: {joint_type_list}")
        return g, root_part, mean_axis, mean_moment, theta, edge_index

    # translation-native prismatic hypothesis: axis = principal direction of
    # the relative translations (eigh of the per-edge second-moment matrix),
    # sign-canonicalized against (1,1,1) like dq_to_screw; distance = the
    # projection. For clean pure translations this is exactly the
    # reference's no-rotation screw (axis = unit translation, d = |t|).
    tvecs = np.asarray(rel_trans[..., :3, 3], np.float64)  # (T, E, 3)
    cov = np.einsum("tei,tej->eij", tvecs, tvecs)  # (E, 3, 3)
    _, vecs = np.linalg.eigh(cov)
    axis_p = vecs[:, :, -1]  # (E, 3) dominant direction
    sign = np.where(axis_p.sum(axis=-1) < 0, -1.0, 1.0)
    axis_p = axis_p * sign[:, None]
    axis_p_j = jnp.asarray(axis_p, rel_trans.dtype)
    distance_p = jnp.einsum("tei,ei->te", rel_trans[..., :3, 3], axis_p_j)

    # Typing by ROTATION-AMPLITUDE EVIDENCE: an edge is prismatic iff its
    # relative motion carries no real rotation (max relative rotation angle
    # below rot_amp_thr). The reference's reconstruction-cost comparison
    # (kinematic_utils.py:89-124) fails both ways on noisy fitted poses
    # (measured, round 5, reference-scale scene): a drawer with ~3 deg of
    # consistent pose-noise rotation types REVOLUTE (a far-axis screw fits
    # translation+noise exactly while the screw-derived prismatic hypothesis
    # inherits the noise axis), and a genuinely rotating flap (0.8 rad) can
    # type PRISMATIC when alignment noise makes its mean-axis screw misfit
    # (cost_r 0.14 > any prismatic cost). The rotation-angle data itself is
    # the robust discriminator: measured separations drawer/tray 0.03-0.06
    # rad (pure noise) vs lid/door/flap 0.56-0.80 rad. For clean inputs the
    # decision is identical to the reference's (zero rotation -> prismatic,
    # real rotation -> revolute; near-rigid ties -> prismatic either way).
    tr_rot = np.trace(np.asarray(rel_trans[..., :3, :3], np.float64),
                      axis1=-2, axis2=-1)
    ang = np.arccos(np.clip((tr_rot - 1.0) / 2.0, -1.0, 1.0))  # (T, E)
    pris = ang.max(axis=0) < rot_amp_thr  # (E,)
    joint_type_list = ["prismatic" if x else "revolute" for x in pris]
    pris_j = jnp.asarray(pris)[None, :]
    # prismatic edges carry the translation-native axis; revolute edges the
    # mean screw axis/moment
    mean_axis = jnp.where(jnp.asarray(pris)[:, None], axis_p_j, mean_axis)
    theta_out = jnp.where(pris_j, 1e-6, theta)
    distance_out = jnp.where(pris_j, distance_p, 1e-6)
    if verbose:
        print(f"joint types at each edge: {joint_type_list}")
    if return_joint_type:
        return (g, root_part, mean_axis, mean_moment, theta_out, distance_out,
                edge_index, joint_type_list)
    return g, root_part, mean_axis, mean_moment, theta_out, distance_out, edge_index

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
    screw_param_to_exponential_coordinates,
    transform_from_exponential_coordinates,
)
from reart_tpu.graph.costs import compute_root_cost, frobenius_cost


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
):
    """Extract per-edge screws + joint types from part trajectories.

    edges_list: (E0, 2) candidate edges over parts 0..P-1 (tree).
    trans_list: (T, P, 4, 4).
    Returns (reference kinematic_utils.py:54-139 contract):
      revolute_only: (G, root, axis (E,3), moment (E,3), theta (T,E), edge_index)
      else:          (..., distance (T,E), edge_index[, joint_type_list])
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

    # joint typing by reconstruction cost (kinematic_utils.py:89-124)
    ma = jnp.broadcast_to(mean_axis[None], (t, e, 3))
    mm = jnp.broadcast_to(mean_moment[None], (t, e, 3))

    log_r = screw_param_to_exponential_coordinates(
        ma, mm, theta, jnp.full_like(distance, 1e-6)
    )
    t_recon_r = transform_from_exponential_coordinates(log_r)
    cost_r = jnp.sum(frobenius_cost(t_recon_r, rel_trans), axis=0)  # (E,)

    rel_no_rot = rel_trans.at[..., :3, :3].set(jnp.eye(3, dtype=rel_trans.dtype))
    log_p = screw_param_to_exponential_coordinates(
        ma, mm, jnp.full_like(theta, 1e-6), distance
    )
    t_recon_p = transform_from_exponential_coordinates(log_p)
    cost_1 = jnp.sum(frobenius_cost(t_recon_p, rel_no_rot), axis=0)
    # per-edge scalar rotation MSE (reference computes it per edge inside the
    # loop, i.e. mean over that edge's T frames and 3x3 entries)
    cost_2 = jnp.mean(
        (t_recon_p[..., :3, :3] - rel_trans[..., :3, :3]) ** 2, axis=(0, 2, 3)
    )
    cost_p = cost_1 + cost_2

    pris = np.asarray(cost_p <= cost_r)  # (E,)
    joint_type_list = ["prismatic" if x else "revolute" for x in pris]
    pris_j = jnp.asarray(pris)[None, :]
    theta_out = jnp.where(pris_j, 1e-6, theta)
    distance_out = jnp.where(pris_j, distance, 1e-6)
    if verbose:
        print(f"joint types at each edge: {joint_type_list}")
    if return_joint_type:
        return (g, root_part, mean_axis, mean_moment, theta_out, distance_out,
                edge_index, joint_type_list)
    return g, root_part, mean_axis, mean_moment, theta_out, distance_out, edge_index

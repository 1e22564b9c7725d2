"""Greedy MST, part merging, segmentation cleanup (host-side).

Parity targets: utils/graph_utils.py:103-124, 276-422 of the reference. The
greedy MST preserves the reference's exact tie-breaking (row-major argmin of
the masked cost matrix) and connectivity-union bookkeeping, because the
produced edge ORDER feeds the downstream merge pass.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import networkx as nx

from reart_tpu.graph.costs import (
    compute_relative_trans,
    compute_geo_cost,
    frobenius_cost,
    fps_sample_cano,
    fps_index_list,
    compute_spatial_cost,
    compute_joint_cost,
)
from reart_tpu.geometry import inverse_transformation
from reart_tpu.models.base_model import compute_pc_transform
from reart_tpu.ops import knn_transfer_labels


def filter_seg_label(cano_part: np.ndarray, min_num: int = 10) -> np.ndarray:
    """Labels with at least `min_num` members. (graph_utils.py:103-113)"""
    uni, cnt = np.unique(np.asarray(cano_part), return_counts=True)
    return uni[cnt >= min_num]


def denoise_seg_label(cano_part, cano_pc, min_num: int = 10):
    """Reassign points of tiny parts to the 1-NN label among big-part points.
    (graph_utils.py:116-124)"""
    cano_part = np.asarray(cano_part).copy()
    cano_pc = np.asarray(cano_pc)
    uni, cnt = np.unique(cano_part, return_counts=True)
    small = set(uni[cnt < min_num].tolist())
    if not small:
        return cano_part
    mask = np.isin(cano_part, list(small))
    if mask.all():
        return cano_part
    new_labels = knn_transfer_labels(
        jnp.asarray(cano_pc[mask]), jnp.asarray(cano_pc[~mask]),
        jnp.asarray(cano_part[~mask]),
    )
    cano_part[mask] = np.asarray(new_labels)
    return cano_part


def mst(cost, uni_label=None, max_cost=None, keep_index: bool = False,
        verbose: bool = False) -> np.ndarray:
    """Greedy minimum spanning tree over a (P, P) cost matrix.

    Returns (P-1, 2) edges in selection order (labels from `uni_label` unless
    `keep_index`). (graph_utils.py:276-303) Pure numpy: this runs twice per
    fit on tiny P — no device pressure.
    """
    cost = np.asarray(cost, dtype=np.float64)
    num_parts = cost.shape[0]
    if uni_label is not None:
        uni_label = np.asarray(uni_label)
        assert num_parts == len(uni_label)
    connectivity = np.eye(num_parts, dtype=np.int64)
    edges = np.zeros((num_parts - 1, 2), dtype=np.int64)
    for j in range(num_parts - 1):
        cur = cost + connectivity * 1e10
        flat = int(np.argmin(cur))
        i0, i1 = flat // num_parts, flat % num_parts
        if max_cost is not None and cur[i0, i1] > max_cost:
            return edges[:j]
        if verbose:
            a = uni_label[i0] if uni_label is not None else i0
            b = uni_label[i1] if uni_label is not None else i1
            print(a, b, cur[i0, i1])
        connectivity[i0] = np.maximum(connectivity[i0], connectivity[i1])
        connectivity[connectivity[i0] == 1] = connectivity[i0]
        if uni_label is None or keep_index:
            edges[j] = (i0, i1)
        else:
            edges[j] = (uni_label[i0], uni_label[i1])
    return edges


def merge_graph(seg_part, joint_connection, trans_list, merge_thr: float,
                verbose: bool = False):
    """Contract near-rigid edges (relative motion ~ identity over time).
    (graph_utils.py:306-359)

    Returns (merged seg labels (N,), remaining edges (E', 2)).
    """
    seg_part = np.asarray(seg_part).copy()
    joint_connection = np.asarray(joint_connection)
    trans_list = jnp.asarray(trans_list)
    t, e = trans_list.shape[0], joint_connection.shape[0]

    g = nx.DiGraph()
    for pid in np.unique(joint_connection):
        g.add_node(int(pid))
    src = trans_list[:, joint_connection[:, 0]]
    tgt = trans_list[:, joint_connection[:, 1]]
    rel = inverse_transformation(src) @ tgt
    eye = jnp.eye(4, dtype=rel.dtype)
    vanilla = np.asarray(
        jnp.mean(jnp.sum((rel - eye) ** 2, axis=(-2, -1)), axis=0)
    )  # (E,) frobenius_cost vs identity, time-mean
    for idx, edge in enumerate(joint_connection):
        g.add_edge(int(edge[0]), int(edge[1]), cost=float(vanilla[idx]))
        if verbose:
            print(f"add edge {edge[0]}-{edge[1]}: cost {vanilla[idx]}")

    m = g.copy()
    topo = list(nx.topological_sort(g))
    for node in topo:
        if not m.has_node(node):
            continue
        for edge in list(nx.edges(m, node)):
            if m.has_node(edge[1]):
                c = m.get_edge_data(edge[0], edge[1])["cost"]
                if c < merge_thr:
                    m = nx.contracted_edge(m, edge, self_loops=False)
                    seg_part[seg_part == edge[1]] = edge[0]
                    if verbose:
                        print(f"merge edge {edge[1]}-{edge[0]}: cost {c}")

    if not nx.is_weakly_connected(m):
        raise ValueError("merge left the part graph disconnected")
    if not nx.is_directed_acyclic_graph(m):
        raise ValueError("merge produced a cyclic part graph")

    new_edges = np.array([[a, b] for a, b in m.edges], dtype=np.int64)
    return seg_part, new_edges


def merging_wrapper(seg_part, trans_list, cano_pc, merge_thr: float,
                    n_it: int = 2):
    """Iterated MST + near-rigid contraction. (graph_utils.py:362-388)"""
    seg_part = np.asarray(seg_part)
    cano_pc = jnp.asarray(cano_pc)
    trans_list = jnp.asarray(trans_list)
    pred_pc_list = compute_pc_transform(
        cano_pc, trans_list, jnp.asarray(seg_part)
    )
    for _ in range(n_it):
        uni_label = np.unique(seg_part)
        fps, fps_idx = fps_sample_cano(cano_pc, jnp.asarray(seg_part), uni_label, num_fps=20)
        part_fps_list = fps_index_list(pred_pc_list, fps_idx)
        cano_dist, pair_idx = compute_spatial_cost(fps, return_index=True)

        p = len(uni_label)
        grid = np.stack(np.meshgrid(np.arange(p), np.arange(p), indexing="ij"), -1)
        joint_connection = jnp.asarray(grid.reshape(-1, 2))
        dist = compute_joint_cost(part_fps_list, joint_connection,
                                  pair_idx.reshape(-1, 2))
        joint_cost = jnp.sum(dist.reshape(-1, p, p), axis=0)

        merge_cost = cano_dist + joint_cost + 1e4 * jnp.eye(p)
        candidates = mst(np.asarray(merge_cost), uni_label=uni_label)
        seg_part, _ = merge_graph(seg_part, candidates, trans_list, merge_thr)
        if not len(np.unique(seg_part)) > 1:
            break
    return seg_part


def mst_wrapper(seg_part, trans, cano_pc, verbose: bool = False,
                num_fps: int = 20, cano_dist_thr: float = 1e-2,
                joint_cost_weight: float = 100.0,
                return_cost: bool = False) -> np.ndarray:
    """Full kinematic-tree candidate selection:
    spatial gate + screw-geodesic + weighted temporal joint cost -> greedy MST.
    (graph_utils.py:391-422)

    With `return_cost`, also returns the (P, P) cost matrix and the label
    vector it is indexed by (for `tree_candidates`)."""
    seg_part = np.asarray(seg_part)
    cano_pc = jnp.asarray(cano_pc)
    trans = jnp.asarray(trans)
    pred_pc_list = compute_pc_transform(cano_pc, trans, jnp.asarray(seg_part))
    uni_label = np.unique(seg_part)
    uni = jnp.asarray(uni_label)

    axis, moment, theta, distance, rel_trans = compute_relative_trans(
        trans, return_trans=True
    )
    sel = lambda x: x[:, uni][:, :, uni]
    geo_cost = compute_geo_cost(sel(rel_trans), sel(axis), sel(moment),
                                sel(theta), sel(distance))

    fps, fps_idx = fps_sample_cano(cano_pc, jnp.asarray(seg_part), uni_label,
                                   num_fps=num_fps)
    part_fps_list = fps_index_list(pred_pc_list, fps_idx)
    cano_dist, pair_idx = compute_spatial_cost(fps, return_index=True)
    dist_cost = jnp.where(cano_dist < cano_dist_thr, 0.0, 1e4)

    p = len(uni_label)
    grid = np.stack(np.meshgrid(np.arange(p), np.arange(p), indexing="ij"), -1)
    joint_connection = jnp.asarray(grid.reshape(-1, 2))
    dist = compute_joint_cost(part_fps_list, joint_connection,
                              pair_idx.reshape(-1, 2))
    joint_cost = jnp.sum(dist.reshape(-1, p, p), axis=0)

    cost = dist_cost + geo_cost + joint_cost_weight * joint_cost
    cost = cost + 1e4 * jnp.eye(p)
    edges = mst(np.asarray(cost), uni_label=uni_label, verbose=verbose)
    if return_cost:
        return edges, np.asarray(cost), uni_label
    return edges


def tree_candidates(cost, uni_label=None, k: int = 8,
                    return_deltas: bool = False):
    """The greedy MST plus its cheapest 1-edge-swap spanning-tree neighbors.

    The MST minimizes the SUM of local edge costs; the kinematic projection's
    failure mode is a locally-cheap but globally wrong parent whose error FK
    composes down the whole chain (measured: scripts/ablate_projection.py —
    with the right tree the projection is lossless). This enumerates, for
    every non-tree pair (u, v), the swap that removes the most expensive tree
    edge on the u–v path and inserts (u, v); candidates are ranked by the
    cost delta of the swap. Each is a valid spanning tree; the caller scores
    them with the global fit energy (the same ass+screw energy the reference
    uses for canonical-frame selection, run_robot.py:305-321).

    Returns a list of (P-1, 2) int64 edge arrays (labels from `uni_label`),
    the greedy MST first, at most `k` entries, deduplicated. With
    `return_deltas` also returns the swap's local cost delta per candidate
    (0.0 for the MST itself) — the CLI's auto mode gates the energy sweep on
    it: a large delta means the MST is locally unambiguous and the swap
    cannot be a serious rival.
    """
    cost = np.asarray(cost, dtype=np.float64)
    p = cost.shape[0]
    base = mst(cost, uni_label=None, keep_index=True)
    deltas = [0.0]
    if p <= 2 or len(base) < p - 1:
        out = [base]
    else:
        sym = np.minimum(cost, cost.T)
        g = nx.Graph()
        g.add_nodes_from(range(p))
        for a, b in base:
            g.add_edge(int(a), int(b))
        swaps = []  # (delta, out_edge, in_pair): EVERY path edge is a valid
        # swap (not just the max-cost one — the energy scorer, not the local
        # cost delta, decides; P <= ~20 so P^3 enumeration is trivial)
        for u in range(p):
            for v in range(u + 1, p):
                if g.has_edge(u, v):
                    continue
                path = nx.shortest_path(g, u, v)
                for a, b in zip(path[:-1], path[1:]):
                    delta = sym[u, v] - sym[a, b]
                    swaps.append((delta, (a, b), (u, v)))
        swaps.sort(key=lambda s: s[0])

        out, seen = [base], {frozenset(map(tuple, np.sort(base, axis=1)))}
        for delta, (a, b), (u, v) in swaps:
            if len(out) >= k:
                break
            edges = [e for e in base.tolist()
                     if {int(e[0]), int(e[1])} != {a, b}]
            # keep the cheaper orientation of the inserted edge (the mst's
            # argmin scans both orders of the asymmetric matrix)
            edges.append([u, v] if cost[u, v] <= cost[v, u] else [v, u])
            arr = np.asarray(edges, dtype=np.int64)
            key = frozenset(map(tuple, np.sort(arr, axis=1)))
            if key in seen:
                continue
            seen.add(key)
            out.append(arr)
            deltas.append(float(delta))
    if uni_label is not None:
        uni_label = np.asarray(uni_label)
        out = [uni_label[t] for t in out]
    if return_deltas:
        return out, deltas
    return out

"""Projection ("kinematic") model: forward kinematics over a compiled tree.

Capability-equivalent to the reference's KinematicModel + fk
(networks/model.py:73-166, utils/kinematic_utils.py:151-198), redesigned for
XLA: the kinematic tree is compiled ONCE (host-side) into a padded
static-shape path matrix, so FK is a `lax.scan` over tree depth of batched
4x4 composes instead of a per-iteration Python walk over networkx paths.

Per part p, the reference computes
    pose_p = T_rel(e_{k-1}) @ ... @ T_rel(e_1) @ T_rel(e_0)
where e_0..e_{k-1} are the edges on the path from p up to the root,
child-side first (kinematic_utils.py:166-193; its ancestor caching is a CPU
optimization with identical results). We gather each part's edge transforms
through a (P, D) path matrix padded with an identity sentinel and left-fold
over depth D — identical math, O(D) batched matmuls for ALL parts at once.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from reart_tpu.geometry import rotation_6d_to_matrix, rt_to_transform
from reart_tpu.geometry.screw import screw_transform
from reart_tpu.models.base_model import IDENTITY_6D, transform_points_blend
from reart_tpu.ops import knn_transfer_labels

PIN = 1e-6  # inactive screw coordinate (numerical-stability pinning)


@dataclasses.dataclass(frozen=True)
class KinematicState:
    """Static (non-trainable) model state.

    The reference keeps the same payload as non-Parameter attributes and in
    checkpoints (run_robot.py:344-356): seg_part, cano_pc, edge_index,
    paths_to_base, reverse_topo, joint types. `path_edges` is our compiled
    form; `edges` / `edge_index` / `reverse_topo` are retained for artifact /
    checkpoint fidelity.
    """

    seg_part: jnp.ndarray          # (N,) int
    cano_pc: jnp.ndarray           # (N, 3)
    num_parts: int
    path_edges: jnp.ndarray        # (P, D) int; edge idx child-first, pad = E
    prismatic_mask: Any            # (E,) bool array or None (revolute-only)
    edges: tuple                   # ((child, parent), ...) in edge-index order
    reverse_topo: tuple            # root-to-leaf part order (metadata)
    has_root_trans: bool = False

    @property
    def num_edges(self) -> int:
        return len(self.edges)

    @property
    def edge_index(self) -> dict:
        """Reference-format edge_index: {"child_parent": idx}."""
        return {f"{c}_{p}": i for i, (c, p) in enumerate(self.edges)}


def _state_flatten(s: "KinematicState"):
    leaves = (s.seg_part, s.cano_pc, s.path_edges, s.prismatic_mask)
    aux = (s.num_parts, s.edges, s.reverse_topo, s.has_root_trans)
    return leaves, aux


def _state_unflatten(aux, leaves):
    seg_part, cano_pc, path_edges, prismatic_mask = leaves
    num_parts, edges, reverse_topo, has_root_trans = aux
    return KinematicState(
        seg_part=seg_part, cano_pc=cano_pc, num_parts=num_parts,
        path_edges=path_edges, prismatic_mask=prismatic_mask, edges=edges,
        reverse_topo=reverse_topo, has_root_trans=has_root_trans,
    )


# pytree registration: array state are leaves, tree topology is static —
# a KinematicState can be passed straight through jit/vmap/scan
jax.tree_util.register_pytree_node(
    KinematicState, _state_flatten, _state_unflatten
)


def compile_tree(edges, root: int, num_parts: int, pad_depth=None):
    """Host-side: child->parent edge list -> (path_edges, reverse_topo).

    edges: sequence of (child, parent) pairs covering parts 0..P-1 (a tree:
    E = P - 1). Returns a (P, D) int32 numpy array of edge indices along each
    part's path to the root (child-first, padded with E) and the root-to-leaf
    part order. `pad_depth` forces D (identity-padded) so trees of different
    natural depth share one compiled FK program (tree search fans K candidate
    trees through the same fit executable).
    """
    edges = [(int(c), int(p)) for c, p in edges]
    e = len(edges)
    assert e == num_parts - 1, "invalid tree: E must equal P-1"
    parent = {}
    edge_of = {}
    for idx, (c, p) in enumerate(edges):
        assert c not in parent, f"part {c} has two parents"
        parent[c] = p
        edge_of[c] = idx
    assert root not in parent, "root must have no parent"

    paths = []
    for part in range(num_parts):
        path = []
        cur = part
        seen = set()
        while cur != root:
            assert cur in parent, f"part {cur} disconnected from root {root}"
            assert cur not in seen, "cycle in kinematic tree"
            seen.add(cur)
            path.append(edge_of[cur])
            cur = parent[cur]
        paths.append(path)
    depth = max((len(p) for p in paths), default=1)
    depth = max(depth, 1)
    if pad_depth is not None:
        assert pad_depth >= depth, "pad_depth shallower than the tree"
        depth = pad_depth
    path_edges = np.full((num_parts, depth), e, dtype=np.int32)
    for part, path in enumerate(paths):
        path_edges[part, : len(path)] = path

    # root-to-leaf order (BFS) for checkpoint metadata parity
    children = {}
    for c, p in edges:
        children.setdefault(p, []).append(c)
    order, queue = [], [root]
    while queue:
        cur = queue.pop(0)
        order.append(cur)
        queue.extend(sorted(children.get(cur, [])))
    return path_edges, tuple(order)


def make_kinematic_state(
    seg_part,
    cano_pc,
    edges,
    root: int,
    joint_types=None,
    has_root_trans: bool = False,
    pad_depth=None,
) -> KinematicState:
    """Build the static state from graph-stage outputs.

    joint_types: optional sequence of "revolute"/"prismatic" per edge
    (reference kinematic_utils.py:84-124 build_graph output) or a bool array
    (True = prismatic).
    """
    seg_part = jnp.asarray(seg_part, dtype=jnp.int32)
    num_parts = int(jnp.max(seg_part)) + 1
    path_edges, reverse_topo = compile_tree(edges, root, num_parts,
                                            pad_depth=pad_depth)
    if joint_types is None:
        pris = None
    elif isinstance(joint_types, (list, tuple)) and joint_types and isinstance(joint_types[0], str):
        pris = jnp.asarray([t == "prismatic" for t in joint_types])
    else:
        pris = jnp.asarray(joint_types, dtype=bool)
    return KinematicState(
        seg_part=seg_part,
        cano_pc=jnp.asarray(cano_pc, dtype=jnp.float32),
        num_parts=num_parts,
        path_edges=jnp.asarray(path_edges),
        prismatic_mask=pris,
        edges=tuple((int(c), int(p)) for c, p in edges),
        reverse_topo=reverse_topo,
        has_root_trans=has_root_trans,
    )


def init_kinematic_params(
    pose_len: int,
    num_edges: int,
    axis_list=None,
    moment_list=None,
    theta_list=None,
    distance_list=None,
    root_trans=None,
    load_distance: bool = False,
    load_root_trans: bool = False,
):
    """Trainable pytree of the projection stage. (model.py:98-125)"""
    from reart_tpu.geometry import matrix_to_rotation_6d

    params = {
        "axis_list": jnp.zeros((num_edges, 3)) if axis_list is None else jnp.asarray(axis_list),
        "moment_list": jnp.zeros((num_edges, 3)) if moment_list is None else jnp.asarray(moment_list),
        "theta_list": jnp.zeros((pose_len, num_edges)) if theta_list is None else jnp.asarray(theta_list),
    }
    if distance_list is not None:
        params["distance_list"] = jnp.asarray(distance_list)
    elif load_distance:
        params["distance_list"] = jnp.zeros((pose_len, num_edges))
    if root_trans is not None:
        root_trans = jnp.asarray(root_trans)
        params["root_6d"] = matrix_to_rotation_6d(root_trans[:, :3, :3])
        params["root_t"] = root_trans[:, :3, 3]
    elif load_root_trans:
        params["root_6d"] = jnp.tile(jnp.asarray(IDENTITY_6D)[None], (pose_len, 1))
        params["root_t"] = jnp.zeros((pose_len, 3))
    return params


def fk(params, state: KinematicState, theta_list=None) -> jnp.ndarray:
    """Forward kinematics -> (T, P, 4, 4) part poses.

    theta_list override supports IK (reference model.py:139-142).
    """
    theta = params["theta_list"] if theta_list is None else theta_list  # (T, E)
    t_frames, e = theta.shape
    distance = params.get("distance_list")
    if state.prismatic_mask is not None:
        pris = state.prismatic_mask[None, :]
        assert distance is not None
        theta_eff = jnp.where(pris, PIN, theta)
        dist_eff = jnp.where(pris, distance, PIN)
    else:
        theta_eff = theta
        dist_eff = jnp.full_like(theta, PIN) if distance is None else distance

    axis = jnp.broadcast_to(params["axis_list"][None], (t_frames, e, 3))
    moment = jnp.broadcast_to(params["moment_list"][None], (t_frames, e, 3))
    edge_t = screw_transform(axis, moment, theta_eff, dist_eff)  # (T, E, 4, 4)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=edge_t.dtype), (t_frames, 1, 4, 4))
    edge_t = jnp.concatenate([edge_t, eye], axis=1)  # (T, E+1, 4, 4)

    gathered = edge_t[:, state.path_edges]  # (T, P, D, 4, 4)

    def compose(pose, m_d):
        return m_d @ pose, None

    # left-fold child-first: pose <- M_d @ pose for d = 0..D-1
    depth = state.path_edges.shape[1]
    pose0 = jnp.broadcast_to(
        jnp.eye(4, dtype=edge_t.dtype), (t_frames, state.num_parts, 4, 4)
    )
    pose, _ = jax.lax.scan(compose, pose0, jnp.moveaxis(gathered, 2, 0))
    return pose


def kinematic_forward(params, state: KinematicState, input_pc,
                      theta_list=None, seg_part=None):
    """Full forward: 1-NN seg transfer, FK, optional root premultiply, blend.

    Returns (pc_trans_list (T, N, 3), seg_part (N,), trans_list (T, P, 4, 4))
    — the reference KinematicModel.forward contract (model.py:137-166).
    Pass `seg_part` to skip the 1-NN transfer (training always forwards the
    canonical cloud itself, where the transfer is the identity — the
    reference pays a 4096^2 kNN per iteration for it, model.py:138).
    """
    if seg_part is None:
        seg_part = knn_transfer_labels(input_pc, state.cano_pc, state.seg_part)
    trans_list = fk(params, state, theta_list=theta_list)
    if "root_6d" in params:
        root_r = rotation_6d_to_matrix(params["root_6d"])  # (T, 3, 3)
        root = rt_to_transform(root_r, params["root_t"])  # (T, 4, 4)
        trans_list = root[:, None] @ trans_list
    weight = jax.nn.one_hot(seg_part, state.num_parts, dtype=input_pc.dtype)
    pc_trans_list = transform_points_blend(weight, trans_list, input_pc)
    return pc_trans_list, seg_part, trans_list

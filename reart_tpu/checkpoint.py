"""Checkpointing and stage hand-off artifacts.

Parity targets (SURVEY §5): the reference saves a torch dict at end of
training — {state_dict, tau, cano_idx} for base, plus {seg_part, cano_pc,
edge_index, paths_to_base, reverse_topo[, joint_type_list, ...]} for
kinematic (run_robot.py:340-356) — and hands off between stages via
`result.pkl` with schema {pred_cano_part, pred_pose_list, cano_idx,
joint_connection, **sample} (run_robot.py:323-331).

We persist the SAME logical payload. Format: a pickle of numpy-converted
pytrees (self-contained, no torch). `save_orbax`/`load_orbax` offer the
orbax-backed path for production multi-host checkpointing of big fits.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, (jnp.ndarray, np.ndarray)) else x,
        tree,
    )


def save_checkpoint(path: str, params, tau: float, cano_idx: int,
                    state=None, extra: dict | None = None) -> None:
    """Model checkpoint; `state` is a KinematicState for the projection stage
    (its payload mirrors the reference's non-parameter checkpoint entries)."""
    payload = {
        "state_dict": _to_numpy(params),
        "tau": float(tau),
        "cano_idx": int(cano_idx),
    }
    if state is not None:
        payload.update({
            "seg_part": np.asarray(state.seg_part),
            "cano_pc": np.asarray(state.cano_pc),
            "edge_index": state.edge_index,
            "edges": [list(e) for e in state.edges],
            "reverse_topo": list(state.reverse_topo),
            "path_edges": np.asarray(state.path_edges),
            "prismatic_mask": (None if state.prismatic_mask is None
                               else np.asarray(state.prismatic_mask)),
            "has_root_trans": state.has_root_trans,
        })
    if extra:
        payload.update(extra)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload


def restore_kinematic_state(payload: dict):
    """Rebuild a KinematicState from a kinematic checkpoint payload."""
    from reart_tpu.models.kinematic import KinematicState

    pris = payload.get("prismatic_mask")
    return KinematicState(
        seg_part=jnp.asarray(payload["seg_part"]),
        cano_pc=jnp.asarray(payload["cano_pc"]),
        num_parts=int(np.max(payload["seg_part"])) + 1,
        path_edges=jnp.asarray(payload["path_edges"]),
        prismatic_mask=None if pris is None else jnp.asarray(pris),
        edges=tuple(tuple(e) for e in payload["edges"]),
        reverse_topo=tuple(payload["reverse_topo"]),
        has_root_trans=bool(payload.get("has_root_trans", False)),
    )


def save_result(path: str, pred_cano_part, pred_pose_list, cano_idx: int,
                joint_connection, sample: dict) -> None:
    """Stage hand-off artifact, reference schema (run_robot.py:323-331)."""
    save_dict = {
        "pred_cano_part": np.asarray(pred_cano_part),
        "pred_pose_list": np.asarray(pred_pose_list),
        "cano_idx": int(cano_idx),
        "joint_connection": [list(map(int, e)) for e in joint_connection],
    }
    save_dict.update(_to_numpy(sample))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(save_dict, f)


def load_result(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


# -- torch reference-checkpoint interop -------------------------------------

def load_torch_base(path: str):
    """Load a reference BaseModel checkpoint (torch.save dict with
    state_dict {proposal_6d, proposal_t, seg_head.model.*}, tau, cano_idx —
    run_robot.py:340-342) into our base-model param pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: np.asarray(v) for k, v in ckpt["state_dict"].items()
          if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
    seg = [
        {"w": jnp.asarray(sd["seg_head.model.0.weight"][:, :, 0].T),
         "b": jnp.asarray(sd["seg_head.model.0.bias"])},
        {"w": jnp.asarray(sd["seg_head.model.2.weight"][:, :, 0].T)},
    ]
    params = {
        "seg": seg,
        "proposal_6d": jnp.asarray(sd["proposal_6d"]),
        "proposal_t": jnp.asarray(sd["proposal_t"]),
    }
    return params, float(ckpt.get("tau", 1.0)), int(ckpt.get("cano_idx", 0))


def load_torch_kinematic(path: str):
    """Load a reference KinematicModel checkpoint (state_dict {axis_list,
    moment_list, theta_list[, distance_list, root_6d, root_t]} + seg_part /
    cano_pc / edge_index / reverse_topo — run_robot.py:344-356) into
    (params, KinematicState, tau, cano_idx)."""
    import torch

    from reart_tpu.models.kinematic import make_kinematic_state

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: np.asarray(v) for k, v in ckpt["state_dict"].items()}
    params = {
        "axis_list": jnp.asarray(sd["axis_list"]),
        "moment_list": jnp.asarray(sd["moment_list"]),
        "theta_list": jnp.asarray(sd["theta_list"]),
    }
    if "distance_list" in sd:
        params["distance_list"] = jnp.asarray(sd["distance_list"])
    if "root_6d" in sd:
        params["root_6d"] = jnp.asarray(sd["root_6d"])
        params["root_t"] = jnp.asarray(sd["root_t"])

    # edge_index {"child_parent": idx} -> edges ordered by idx
    edge_index = ckpt["edge_index"]
    edges = [None] * len(edge_index)
    for name, idx in edge_index.items():
        c, p = name.split("_")
        edges[int(idx)] = (int(c), int(p))
    children = {c for c, _ in edges}
    root = next(int(p) for _, p in edges if p not in children)
    joint_types = ckpt.get("joint_type_list")
    state = make_kinematic_state(
        np.asarray(ckpt["seg_part"]), np.asarray(ckpt["cano_pc"]), edges,
        root, joint_types=joint_types,
        has_root_trans="root_6d" in sd,
    )
    return params, state, float(ckpt.get("tau", 1.0)), int(ckpt.get("cano_idx", 0))


def save_torch_base(path: str, params, tau: float, cano_idx: int) -> None:
    """Export our base-model params as a reference BaseModel checkpoint
    (the exact dict run_robot.py:340-342 writes and :93-99 resumes,
    strict=False): state_dict {proposal_6d, proposal_t, seg_head.model.*}.
    Inverse of `load_torch_base`."""
    import torch

    seg = params["seg"]
    sd = {
        "proposal_6d": torch.tensor(np.asarray(params["proposal_6d"]),
                                    dtype=torch.float32),
        "proposal_t": torch.tensor(np.asarray(params["proposal_t"]),
                                   dtype=torch.float32),
        # ours: {"w": (C_in, C_out)[, "b": (C_out,)]}; torch Conv1d weight is
        # (C_out, C_in, 1)
        "seg_head.model.0.weight": torch.tensor(
            np.asarray(seg[0]["w"]).T[:, :, None], dtype=torch.float32),
        "seg_head.model.0.bias": torch.tensor(
            np.asarray(seg[0]["b"]), dtype=torch.float32),
        "seg_head.model.2.weight": torch.tensor(
            np.asarray(seg[1]["w"]).T[:, :, None], dtype=torch.float32),
    }
    torch.save({"state_dict": sd, "tau": float(tau),
                "cano_idx": int(cano_idx)}, path)


def save_torch_kinematic(path: str, params, state, tau: float,
                         cano_idx: int) -> None:
    """Export our kinematic fit as a reference KinematicModel checkpoint —
    the exact dict run_robot.py:344-356 writes and :126-133 resumes
    (strict=True): state_dict {axis_list, moment_list, theta_list[,
    distance_list, root_6d, root_t]} plus the non-parameter state the
    reference model ctor consumes (seg_part, cano_pc, edge_index,
    paths_to_base, reverse_topo[, joint_type_list]). Inverse of
    `load_torch_kinematic`; lets the reference's own evaluator score our
    fits (reverse-direction parity)."""
    import torch

    def t(x, dtype=torch.float32):
        return torch.tensor(np.asarray(x), dtype=dtype)

    sd = {
        "axis_list": t(params["axis_list"]),
        "moment_list": t(params["moment_list"]),
        "theta_list": t(params["theta_list"]),
    }
    if "distance_list" in params:
        sd["distance_list"] = t(params["distance_list"])
    if "root_6d" in params:
        sd["root_6d"] = t(params["root_6d"])
        sd["root_t"] = t(params["root_t"])

    # paths_to_base: nx.shortest_path(G, target=root) on the child->parent
    # DAG = {node: [node, parent, ..., root]} incl. {root: [root]}
    parent = {int(c): int(p) for c, p in state.edges}
    children = set(parent)
    root = next(int(p) for _, p in state.edges if int(p) not in children)
    paths_to_base = {}
    for n in range(state.num_parts):
        chain, cur = [n], n
        while cur != root:
            cur = parent[cur]
            chain.append(cur)
        paths_to_base[n] = chain

    payload = {
        "state_dict": sd,
        "tau": float(tau),
        "cano_idx": int(cano_idx),
        "seg_part": t(state.seg_part, torch.int64),
        "cano_pc": t(state.cano_pc),
        "edge_index": dict(state.edge_index),
        "paths_to_base": paths_to_base,
        "reverse_topo": [int(n) for n in state.reverse_topo],
    }
    if state.prismatic_mask is not None:
        payload["joint_type_list"] = [
            "prismatic" if bool(m) else "revolute"
            for m in np.asarray(state.prismatic_mask)
        ]
    torch.save(payload, path)


# -- orbax-backed variant (multi-host / async, for production fits) ---------

def save_orbax(directory: str, payload) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(directory), _to_numpy(payload), force=True)


def load_orbax(directory: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(directory))

"""SAPIEN-domain helpers: root alignment, T x T full-flow construction and
evaluation, segmentation propagation.

Parity targets: utils/model_utils.py:121-126 (compute_align_trans) and
utils/sapien_utils.py:39-77,111-117. All batched jnp; the reference's
per-view Python loops collapse into one vmap over views.

The reference's msync FlowNet/ConfNet (external repo, sapien_utils.py:80-108)
is mirrored as a pluggable flow provider boundary: `load_precomputed_flow`
reads (T-1, N, 3) flows + (T-1, N) confidences from an .npz, matching the
shape contract of compute_flow_list — sapien parity does not require porting
msync (SURVEY §7.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from reart_tpu.geometry import inverse_transformation
from reart_tpu.models.base_model import compute_pc_transform
from reart_tpu.ops import knn_transfer_labels


def compute_align_trans(trans_list: jnp.ndarray, root_trans: jnp.ndarray):
    """Left-multiply by the root part's inverse trajectory
    (utils/model_utils.py:121-126). trans_list (T, P, 4, 4),
    root_trans (T, 4, 4)."""
    return inverse_transformation(root_trans)[:, None] @ trans_list


def compute_rel_trans(complete_trans_list: jnp.ndarray, src_idx: int):
    """cano->tgt poses re-based onto view src: src2tgt = cano2tgt @ cano2src^-1
    (sapien_utils.py:39-48)."""
    src = complete_trans_list[src_idx]  # (P, 4, 4)
    return complete_trans_list @ inverse_transformation(src)[None]


def compute_full_flow(complete_pc_list, complete_seg_list, complete_trans_list):
    """(T*T, N, 3) flows between every ordered view pair
    (sapien_utils.py:50-62), row-major over (view_i, view_j)."""
    complete_pc_list = jnp.asarray(complete_pc_list, jnp.float32)
    complete_trans_list = jnp.asarray(complete_trans_list, jnp.float32)
    complete_seg_list = jnp.asarray(complete_seg_list, jnp.int32)
    t = complete_pc_list.shape[0]

    def per_view(pc_i, seg_i, i):
        trans_i = compute_rel_trans(complete_trans_list, i)  # traced gather ok
        moved = compute_pc_transform(pc_i, trans_i, seg_i)  # (T, N, 3)
        return moved - moved[i][None]  # flow to every j

    # index into complete_trans_list must be per-view: vmap over i
    flows = jax.vmap(
        lambda pc, seg, i: per_view(pc, seg, i)
    )(complete_pc_list, complete_seg_list, jnp.arange(t))
    return flows.reshape(t * t, *flows.shape[2:])


def eval_full_flow(full_flow, gt_full_flow) -> float:
    """Mean EPE over all ordered pairs excluding i==j (sapien_utils.py:65-77)."""
    full_flow = np.asarray(full_flow)
    gt = np.asarray(gt_full_flow)
    n = int(np.sqrt(full_flow.shape[0]))
    epes = []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            k = j + i * n
            epes.append(
                float(np.linalg.norm(full_flow[k] - gt[k], axis=-1).mean())
            )
    return float(np.mean(epes))


def seg_propagation_list(query_pc_list, ref_pc_list, ref_seg):
    """1-NN label transfer per frame (sapien_utils.py:111-117).

    Dispatches to the accelerator when present (hostops.on_device): the
    finalize calls this inside an on_host region, where the vmapped CPU
    1-NN cost 3.9 s of the profiled reference-scale sapien finalize — the
    fused neighbor kernel does the same batched query in milliseconds."""
    from reart_tpu.hostops import on_device

    with on_device():
        out = jax.vmap(
            lambda q, r: knn_transfer_labels(q, r, jnp.asarray(ref_seg))
        )(jnp.asarray(query_pc_list, jnp.float32),
          jnp.asarray(ref_pc_list, jnp.float32))
        return np.asarray(out)


def load_precomputed_flow(path: str):
    """Flow-provider boundary for the msync FlowNet (sapien_utils.py:94-108):
    an .npz with `flow` (T-1, N, 3) and optional `conf` (T-1, N)."""
    data = np.load(path)
    flow = data["flow"].astype(np.float32)
    conf = data["conf"].astype(np.float32) if "conf" in data else np.ones(
        flow.shape[:2], np.float32)
    return flow, conf


def compute_flow_msync(complete_pc_list, config_path: str, model_path: str,
                       save_path: str | None = None):
    """Run the external msync FlowNet/ConfNet to predict consecutive-pair
    scene flow, exactly at the reference's external-repo boundary
    (run_sapien.py:69-75 -> sapien_utils.py:80-108).

    The multibody-sync repo is NOT vendored (the reference clones it in
    setup_env.sh); this adapter imports it from the directory containing
    `config_path`'s repo root, runs it once per frame pair on the host
    (torch, frozen weights — it is setup-time work, never in the fit loop),
    and optionally caches the result as a `--flow_file`-compatible .npz.

    Returns (flow (T-1, N, 3), conf (T-1, N)) float32 numpy arrays.
    """
    import os
    import sys

    # msync/config/articulated-full.yaml -> repo root is msync/'s parent
    cfg_abs = os.path.abspath(config_path)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(cfg_abs)))
    inserted = repo_root not in sys.path
    if inserted:
        sys.path.insert(0, repo_root)
    try:
        try:
            import torch
            import yaml
            from msync.models.conf_net import ConfNet, get_network_input
            from msync.models.flow_net import FlowNet
        except ImportError as e:
            # leave no half-imported msync behind for a later retry
            for k in [k for k in sys.modules
                      if k == "msync" or k.startswith("msync.")]:
                del sys.modules[k]
            raise ImportError(
                "msync flow provider needs the multibody-sync repo on disk "
                f"(looked under {repo_root}); clone it as the reference's "
                "setup_env.sh does, or precompute flows and pass --flow_file. "
                f"Underlying error: {e}") from e

        with open(cfg_abs) as f:
            cfg = yaml.safe_load(f)
        assert cfg.get("type") == "full", "msync config must be of type 'full'"
        flow_net, conf_net = FlowNet(), ConfNet()
        state = torch.load(model_path, map_location="cpu")["model_state"]
        own = {"flow_net": flow_net, "conf_net": conf_net}
        for name, mod in own.items():
            sub = {k[len(name) + 1:]: v for k, v in state.items()
                   if k.startswith(name + ".")}
            mod.load_state_dict(sub)
            mod.eval()
    finally:
        # the path entry is only needed while importing; leaving it would let
        # any stray top-level package under repo_root shadow real modules
        if inserted and repo_root in sys.path:
            sys.path.remove(repo_root)

    pcs = torch.as_tensor(np.asarray(complete_pc_list), dtype=torch.float32)
    flows, confs = [], []
    with torch.no_grad():
        for t in range(pcs.shape[0] - 1):
            src, tgt = pcs[t:t + 1], pcs[t + 1:t + 2]
            flow = flow_net.forward(src, tgt, src, tgt)[0]
            flow = flow[0].transpose(-1, -2).squeeze(0)
            _, w = conf_net(get_network_input(src, tgt, flow))
            flows.append(flow.numpy())
            confs.append(torch.sigmoid(w).squeeze(0).numpy())
    flow = np.stack(flows).astype(np.float32)
    conf = np.stack(confs).astype(np.float32)
    if save_path:
        np.savez(save_path, flow=flow, conf=conf)
    return flow, conf

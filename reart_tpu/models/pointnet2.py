"""PointNet++ MSG correspondence backbone (PointNet2Msg2) in pure jnp.

Parity target: networks/feature_extractor.py:10-49 and the SA/FP modules in
networks/pointnet2_utils.py:194-348 of the reference. The backbone is used
FROZEN (rec_freeze zeroes BN momentum, all grads off — feature_extractor.py:
52-58), so BatchNorm here is inference-mode only (running stats).

Layout is channel-last (B, N, C) — 1x1 Conv2d/Conv1d stacks become dense
matmuls over the channel axis (MXU), and the per-scale "group -> MLP -> max
over neighbors" pipeline is one batched einsum + reduce per layer instead of
NCHW conv plumbing.

`load_torch_state_dict` maps the released `corr_model.pth.tar` checkpoint
(key map in reference feature_extractor.py:62-86: strip 'net.'/'module.')
onto this parameter tree for weight-exact inference.

Exact-parity notes vs the reference's dual implementations:
  * FPS starts at index 0 — the CUDA kernel's convention
    (src/sampling_gpu.cu:113-115); the reference's python fallback randomizes
    the start, the CUDA path (what the released model used) does not.
  * ball query keeps the first `nsample` in-radius indices in point order,
    padding with the first — both reference paths agree on this.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from reart_tpu.ops import (ball_query, farthest_point_sample,
                           index_points, index_points_mm)
from reart_tpu.ops.distance import pairwise_sqdist

BN_EPS = 1e-5

# (npoint, [radii], [nsamples], in_channel, [mlps]) — feature_extractor.py:19-27
SA1 = (512, (0.05, 0.1, 0.2), (32, 64, 128), 3,
       ((32, 32, 64), (64, 64, 128), (64, 96, 128)))
SA2 = (128, (0.2, 0.4), (64, 128), 128 + 128 + 64,
       ((128, 128, 256), (128, 196, 256)))
SA3_MLP = (256, 512, 1024)
SA3_IN = 512 + 3
FP3 = (1536, (256, 256))
FP2 = (576, (256, 128))
FP1 = (134, (128, 128))


def _init_conv_bn(key, c_in, c_out):
    """torch Conv2d/Conv1d(k=1) + BatchNorm defaults."""
    k1, k2 = jax.random.split(key)
    bound = math.sqrt(6.0 / (6.0 * c_in))  # kaiming_uniform(a=sqrt(5))
    return {
        "w": jax.random.uniform(k1, (c_in, c_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (c_out,), minval=-1 / math.sqrt(c_in),
                                maxval=1 / math.sqrt(c_in)),
        "bn_w": jnp.ones((c_out,)),
        "bn_b": jnp.zeros((c_out,)),
        "bn_mean": jnp.zeros((c_out,)),
        "bn_var": jnp.ones((c_out,)),
    }


def _apply_conv_bn(layer, x, relu: bool = True, bn_mode: str = "running",
                   stats_out: list | None = None):
    """x (..., C_in) -> relu(bn(x @ w + b)).

    bn_mode="running" (default) is inference-mode BN over the stored running
    stats — the reference's frozen-extractor behavior. bn_mode="batch"
    normalizes by the current batch's moments (training mode, used by
    train/corr.py); when stats_out is a list the (mean, var) pair is appended
    so the caller can EMA them back into the parameter tree (torch
    running-stat semantics, biased variance).

    Matmul precision: the package pins the GLOBAL default to 'highest'
    (geometry needs exact f32), which runs every f32 MXU contraction as 6
    bf16 passes. The backbone's convs are neural-net math: in TRAINING mode
    (bn_mode="batch") they run at DEFAULT precision (bf16 input rounding,
    f32 accumulate — measured 1.9x on the conv stacks, fwd and bwd, with
    BN renormalizing the rounding noise). INFERENCE mode keeps 'highest' so
    the weight-exact frozen-checkpoint parity vs the reference
    (test_pointnet2, rtol 1e-3 against torch f32) is untouched.
    """
    prec = (jax.lax.Precision.DEFAULT if bn_mode == "batch"
            else jax.lax.Precision.HIGHEST)
    y = jax.lax.dot_general(
        x, layer["w"], (((x.ndim - 1,), (0,)), ((), ())),
        precision=prec) + layer["b"]
    if bn_mode == "batch":
        axes = tuple(range(y.ndim - 1))
        mean = jnp.mean(y, axis=axes)
        var = jnp.var(y, axis=axes)
        if stats_out is not None:
            stats_out.append((mean, var))
    else:
        mean, var = layer["bn_mean"], layer["bn_var"]
    y = (y - mean) / jnp.sqrt(var + BN_EPS)
    y = y * layer["bn_w"] + layer["bn_b"]
    return jax.nn.relu(y) if relu else y


def _init_mlp_stack(key, c_in, channels):
    layers = []
    for c_out in channels:
        key, sub = jax.random.split(key)
        layers.append(_init_conv_bn(sub, c_in, c_out))
        c_in = c_out
    return layers


def init_pointnet2msg2(key, out_dim: int = 64):
    """Random-init parameter tree mirroring PointNet2Msg2's state_dict
    structure (for testing; real use loads the torch checkpoint)."""
    keys = jax.random.split(key, 8)
    params = {
        "sa1": [_init_mlp_stack(keys[0], SA1[3] + 3, m) for m in SA1[4]],
        "sa2": [_init_mlp_stack(keys[1], SA2[3] + 3, m) for m in SA2[4]],
        "sa3": _init_mlp_stack(keys[2], SA3_IN, SA3_MLP),
        "fp3": _init_mlp_stack(keys[3], FP3[0], FP3[1]),
        "fp2": _init_mlp_stack(keys[4], FP2[0], FP2[1]),
        "fp1": _init_mlp_stack(keys[5], FP1[0], FP1[1]),
        "head": _init_conv_bn(keys[6], 128, out_dim),
    }
    return params


def _sa_msg(blocks, npoint, radii, nsamples, xyz, points, bn_mode="running",
            stats_out=None):
    """Multi-scale-grouping set abstraction (pointnet2_utils.py:239-295).

    xyz (B, N, 3), points (B, N, D) -> (new_xyz (B, S, 3), feats (B, S, sumD')).
    Grouping order preserved: cat([points, xyz_norm]) — MSG concatenates
    features FIRST (pointnet2_utils.py:282), unlike plain SA.
    """
    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)  # (B, S, 3)
    outs = []
    for block, radius, k in zip(blocks, radii, nsamples):
        gidx = ball_query(radius, k, xyz, new_xyz)  # (B, S, K)
        gxyz = index_points_mm(xyz, gidx) - new_xyz[:, :, None, :]
        gpts = index_points_mm(points, gidx)
        feat = jnp.concatenate([gpts, gxyz], axis=-1)  # (B, S, K, D+3)
        for layer in block:
            feat = _apply_conv_bn(layer, feat, bn_mode=bn_mode,
                                  stats_out=stats_out)
        outs.append(jnp.max(feat, axis=2))  # (B, S, D')
    return new_xyz, jnp.concatenate(outs, axis=-1)


def _sa_group_all(block, xyz, points, bn_mode="running", stats_out=None):
    """Global set abstraction (pointnet2_utils.py:173-191, 194-236 group_all
    branch): cat([xyz, points]) — raw xyz FIRST here."""
    feat = jnp.concatenate([xyz, points], axis=-1)[:, None]  # (B, 1, N, 3+D)
    for layer in block:
        feat = _apply_conv_bn(layer, feat, bn_mode=bn_mode,
                              stats_out=stats_out)
    new_xyz = jnp.zeros((xyz.shape[0], 1, 3), xyz.dtype)
    return new_xyz, jnp.max(feat, axis=2)  # (B, 1, D')


def _fp(block, xyz1, xyz2, points1, points2, bn_mode="running",
        stats_out=None):
    """Feature propagation (pointnet2_utils.py:298-348): 3-NN inverse-square
    -distance interpolation (S>1) or broadcast (S==1), concat skip, MLP."""
    b, n, _ = xyz1.shape
    s = xyz2.shape[1]
    if s == 1:
        interp = jnp.broadcast_to(points2, (b, n, points2.shape[-1]))
    else:
        from reart_tpu.ops.pallas_nn import nn_topk

        # fused 3-NN kernel on TPU (lax.top_k is a sort); XLA fallback is
        # the same top_k formulation off-TPU
        dd, idx = nn_topk(xyz1, xyz2, 3)
        recip = 1.0 / (dd + 1e-8)
        w = recip / jnp.sum(recip, axis=-1, keepdims=True)
        gathered = index_points_mm(points2, idx)  # (B, N, 3, D)
        interp = jnp.sum(gathered * w[..., None], axis=2)
    feat = interp if points1 is None else jnp.concatenate([points1, interp], -1)
    for layer in block:
        feat = _apply_conv_bn(layer, feat, bn_mode=bn_mode,
                              stats_out=stats_out)
    return feat


def apply_pointnet2msg2(params, xyz: jnp.ndarray, bn_mode: str = "running",
                        stats_out: list | None = None) -> jnp.ndarray:
    """xyz (B, N, 3) -> per-point features (B, N, out_dim).

    The reference takes channel-first (B, 3, N) and returns (B, out_dim, N)
    (feature_extractor.py:31-49); we are channel-last throughout.

    bn_mode/stats_out: see _apply_conv_bn — "running" (default) matches the
    reference's frozen inference path exactly; "batch" is the training mode
    used by train/corr.py, collecting per-layer moments into stats_out in
    `bn_paths` order.
    """
    l0_xyz = xyz
    l0_points = xyz
    l1_xyz, l1_points = _sa_msg(params["sa1"], SA1[0], SA1[1], SA1[2],
                                l0_xyz, l0_points, bn_mode, stats_out)
    l2_xyz, l2_points = _sa_msg(params["sa2"], SA2[0], SA2[1], SA2[2],
                                l1_xyz, l1_points, bn_mode, stats_out)
    l3_xyz, l3_points = _sa_group_all(params["sa3"], l2_xyz, l2_points,
                                      bn_mode, stats_out)
    l2_points = _fp(params["fp3"], l2_xyz, l3_xyz, l2_points, l3_points,
                    bn_mode, stats_out)
    l1_points = _fp(params["fp2"], l1_xyz, l2_xyz, l1_points, l2_points,
                    bn_mode, stats_out)
    l0_points = _fp(params["fp1"], l0_xyz, l1_xyz,
                    jnp.concatenate([l0_xyz, l0_points], -1), l1_points,
                    bn_mode, stats_out)
    return _apply_conv_bn(params["head"], l0_points, bn_mode=bn_mode,
                          stats_out=stats_out)


def bn_paths(params) -> list:
    """Key paths of every conv+BN layer in FORWARD-application order — the
    order `stats_out` fills in bn_mode="batch". Used by train/corr.py to EMA
    batch moments back into the parameter tree (torch running-stat update)."""
    paths = []
    for name in ("sa1", "sa2"):
        for bi, block in enumerate(params[name]):
            paths.extend((name, bi, li) for li in range(len(block)))
    for name in ("sa3", "fp3", "fp2", "fp1"):
        paths.extend((name, li) for li in range(len(params[name])))
    paths.append(("head",))
    return paths


# ---------------------------------------------------------------------------
# torch checkpoint interop
# ---------------------------------------------------------------------------

def _convert_conv_bn(sd, conv_key, bn_key):
    w = np.asarray(sd[f"{conv_key}.weight"])  # (out, in, 1[, 1])
    w = w.reshape(w.shape[0], w.shape[1]).T  # -> (in, out)
    return {
        "w": jnp.asarray(w),
        "b": jnp.asarray(np.asarray(sd[f"{conv_key}.bias"])),
        "bn_w": jnp.asarray(np.asarray(sd[f"{bn_key}.weight"])),
        "bn_b": jnp.asarray(np.asarray(sd[f"{bn_key}.bias"])),
        "bn_mean": jnp.asarray(np.asarray(sd[f"{bn_key}.running_mean"])),
        "bn_var": jnp.asarray(np.asarray(sd[f"{bn_key}.running_var"])),
    }


def load_torch_state_dict(state_dict) -> dict:
    """Map the released corr-model state_dict onto our parameter tree.

    Accepts the raw torch state_dict (tensors or numpy). Key prefixes
    'net.' / 'module.' are stripped (reference feature_extractor.py:77
    + DataParallel wrapping at :64).
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("net.", "").replace("module.", "")
        sd[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    def msg_blocks(prefix, mlps):
        return [
            [
                _convert_conv_bn(sd, f"{prefix}.conv_blocks.{i}.{j}",
                                 f"{prefix}.bn_blocks.{i}.{j}")
                for j in range(len(mlp))
            ]
            for i, mlp in enumerate(mlps)
        ]

    def plain_stack(prefix, n):
        return [
            _convert_conv_bn(sd, f"{prefix}.mlp_convs.{j}", f"{prefix}.mlp_bns.{j}")
            for j in range(n)
        ]

    return {
        "sa1": msg_blocks("sa1", SA1[4]),
        "sa2": msg_blocks("sa2", SA2[4]),
        "sa3": plain_stack("sa3", len(SA3_MLP)),
        "fp3": plain_stack("fp3", len(FP3[1])),
        "fp2": plain_stack("fp2", len(FP2[1])),
        "fp1": plain_stack("fp1", len(FP1[1])),
        "head": _convert_conv_bn(sd, "conv1", "bn1"),
    }


def _export_conv_bn(layer, conv_key, bn_key, conv_rank, out):
    w = np.asarray(layer["w"]).T  # (in, out) -> (out, in)
    out[f"{conv_key}.weight"] = w.reshape(w.shape + (1,) * (conv_rank - 2))
    out[f"{conv_key}.bias"] = np.asarray(layer["b"])
    out[f"{bn_key}.weight"] = np.asarray(layer["bn_w"])
    out[f"{bn_key}.bias"] = np.asarray(layer["bn_b"])
    out[f"{bn_key}.running_mean"] = np.asarray(layer["bn_mean"])
    out[f"{bn_key}.running_var"] = np.asarray(layer["bn_var"])
    out[f"{bn_key}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_torch_state_dict(params) -> dict:
    """Inverse of load_torch_state_dict: our tree -> a state_dict that loads
    strict=True into the reference's PointNet2Msg2 (so a self-trained
    backbone from train/corr.py can flow BACK to reference users).

    Conv ranks follow the reference modules: SA layers are Conv2d
    (pointnet2_utils.py:206,254), FP layers and the head are Conv1d
    (pointnet2_utils.py:305, feature_extractor.py:28)."""
    sd = {}
    for name in ("sa1", "sa2"):
        for i, block in enumerate(params[name]):
            for j, layer in enumerate(block):
                _export_conv_bn(layer, f"{name}.conv_blocks.{i}.{j}",
                                f"{name}.bn_blocks.{i}.{j}", 4, sd)
    for name, rank in (("sa3", 4), ("fp3", 3), ("fp2", 3), ("fp1", 3)):
        for j, layer in enumerate(params[name]):
            _export_conv_bn(layer, f"{name}.mlp_convs.{j}",
                            f"{name}.mlp_bns.{j}", rank, sd)
    _export_conv_bn(params["head"], "conv1", "bn1", 3, sd)
    return sd


def save_corr_model_torch(path: str, params) -> None:
    """Save in the released checkpoint's torch format (the file
    get_extractor consumes, feature_extractor.py:62-86)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v))  # copy: torch wants writable
          for k, v in export_torch_state_dict(params).items()}
    torch.save({"state_dict": sd}, path)


CORR_NATIVE_FORMAT = "reart_tpu_corr_v1"


def save_corr_model(path: str, params) -> None:
    """Save a (possibly self-trained, see train/corr.py) backbone natively."""
    import pickle

    tree = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    with open(path, "wb") as f:
        pickle.dump({"format": CORR_NATIVE_FORMAT, "params": tree}, f)


def load_corr_model(path: str) -> dict:
    """Load a correspondence checkpoint: either the reference's released
    torch tar (feature_extractor.py:62-86) or our native format
    (save_corr_model / train/corr.py)."""
    import pickle

    try:
        with open(path, "rb") as f:
            obj = pickle.load(f)
        if isinstance(obj, dict) and obj.get("format") == CORR_NATIVE_FORMAT:
            return jax.tree_util.tree_map(jnp.asarray, obj["params"])
    except Exception:
        pass  # torch tars are zip archives — fall through to torch.load

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return load_torch_state_dict(sd)

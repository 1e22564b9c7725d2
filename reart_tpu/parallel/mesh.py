"""Mesh construction and the sharded batched fit step.

Shardings (B = batch of sequences, T = frames, N = points, P = parts):

  pc_list        (B, T, N, 3)   -> P("seq", "frame")   ICI-local frame splits
  cano_pc        (B, N, 3)      -> P("seq")            replicated over frame
  proposal_6d/t  (B, T, P, 6|3) -> P("seq", "frame")   per-frame params live
                                                        with their frames
  seg MLP        (B, ...)       -> P("seq")            shared across frames:
                                                        grads psum over frame

The per-sequence fit is `vmap`ped over B; jit + NamedSharding turns the
whole batched step into one SPMD program. Frame-axis sharding makes the
seg-MLP gradient an `all-reduce` over the frame submesh — the only collective
this workload needs, riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reart_tpu.models.base_model import base_forward, init_base_params
from reart_tpu.ops.distance import chamfer_loss


def make_mesh(n_devices: int | None = None, seq: int | None = None,
              frame: int | None = None, devices=None) -> Mesh:
    """2-D device mesh ("seq", "frame"). Defaults: all devices on "seq"
    (pure data parallel) — pass `frame` to split frames over ICI too."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and n_devices > len(devices):
            raise ValueError(
                f"make_mesh: asked for {n_devices} devices but platform "
                f"'{devices[0].platform}' exposes only {len(devices)}; for a "
                "virtual multi-device CPU mesh set XLA_FLAGS="
                "--xla_force_host_platform_device_count=N AND "
                'jax.config.update("jax_platforms", "cpu") before the backend '
                "initializes (see tests/conftest.py)")
        if n_devices is not None:
            devices = devices[:n_devices]
    n = len(devices)
    if frame is None and seq is None:
        seq, frame = n, 1
    elif frame is None:
        frame = n // seq
    elif seq is None:
        seq = n // frame
    if seq * frame != n:
        raise ValueError(
            f"make_mesh: seq={seq} x frame={frame} does not tile the {n} "
            f"available device(s) (platform "
            f"'{devices[0].platform if n else '?'}')")
    import numpy as np

    return Mesh(np.asarray(devices).reshape(seq, frame), ("seq", "frame"))


def batch_spec(mesh: Mesh, with_frame: bool = False) -> NamedSharding:
    return NamedSharding(mesh, P("seq", "frame") if with_frame else P("seq"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_batched_params(key, batch: int, num_parts: int, pose_len: int):
    """Independent base-model params for a batch of sequences (B leading axis)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(
        functools.partial(init_base_params, num_parts=num_parts, pose_len=pose_len)
    )(keys)


def _param_shardings(params, mesh: Mesh):
    """proposal tensors carry the frame axis (dim 1 after B) -> ("seq","frame");
    seg-MLP weights are frame-replicated -> ("seq",)."""
    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "proposal_6d" in names or "proposal_t" in names:
            return NamedSharding(mesh, P("seq", "frame"))
        return NamedSharding(mesh, P("seq"))

    return jax.tree_util.tree_map_with_path(spec, params)


def make_batched_fit_step(mesh: Mesh, tx: optax.GradientTransformation,
                          tau: float = 1.0, use_assign: bool = False,
                          downsample: int = 4, lambda_assign: float = 3e-1):
    """One sharded optimization step over a BATCH of sequences — the FULL
    per-sequence loss stack (recon Chamfer + optional on-device auction
    assignment), vmapped over sequences.

    Returns (step_fn, shard_args) where
      step_fn(params, opt_state, cano_pc, pc_list, keys) ->
          (params, opt_state, loss (B,))
    and shard_args places inputs on the mesh. Collectives: the vmapped
    per-sequence recon loss reduces over frames; with the frame axis sharded,
    XLA emits psum/reduce-scatter over the "frame" submesh for the seg grads
    and keeps the proposal grads collective-free.
    """

    def per_seq_loss(params, cano_pc, pc_list, key, actx):
        pc_trans, _, _ = base_forward(params, cano_pc, key, tau)
        loss = chamfer_loss(pc_trans, pc_list)
        if use_assign:
            from reart_tpu.ops.assignment import auction_lap
            from reart_tpu.ops.distance import pairwise_sqdist

            pc_src = pc_trans[:, actx.src_idx]
            cost = jnp.sqrt(pairwise_sqdist(
                jax.lax.stop_gradient(pc_src), actx.pc_tgt))
            perm = auction_lap(cost, num_scales=2, max_sweeps=64)
            matched = jnp.take_along_axis(
                actx.pc_tgt, perm[..., None].astype(jnp.int32).repeat(3, -1),
                axis=1)
            loss = loss + lambda_assign * jnp.sum((pc_src - matched) ** 2)
        return loss

    def batched_loss(params, cano_pc, pc_list, keys, actx):
        losses = jax.vmap(per_seq_loss)(params, cano_pc, pc_list, keys, actx)
        return jnp.sum(losses), losses

    def step(params, opt_state, cano_pc, pc_list, keys):
        # FPS anchors depend only on the (constant) inputs: computed once
        # per step outside the grad, not re-derived inside the loss
        from reart_tpu.train.engine import build_assign_context

        actx = jax.vmap(
            lambda c, p: build_assign_context(c, p, downsample)
        )(cano_pc, pc_list)
        (_, losses), grads = jax.value_and_grad(batched_loss, has_aux=True)(
            params, cano_pc, pc_list, keys, actx
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    pspec = lambda params: _param_shardings(params, mesh)

    def shard_args(params, opt_state, cano_pc, pc_list, keys):
        return (
            jax.device_put(params, pspec(params)),
            opt_state,  # mirrors the param tree; jit propagates its sharding
            jax.device_put(cano_pc, batch_spec(mesh)),
            jax.device_put(pc_list, batch_spec(mesh, with_frame=True)),
            jax.device_put(keys, batch_spec(mesh)),
        )

    return jax.jit(step, donate_argnums=(0, 1)), shard_args


def fit_batch(key, params, cano_pc, pc_list, n_iter: int, mesh: Mesh = None,
              lr: float = 1e-2, tau: float = 1.0, use_assign: bool = False,
              downsample: int = 4):
    """Fit a BATCH of sequences in lockstep across the mesh.

    cano_pc (B, N, 3), pc_list (B, T, N, 3); params from
    init_batched_params. Returns (params, losses (B,)) after n_iter steps.
    The reference fits one sequence per process; this is the multi-chip
    sweep path (SAPIEN benchmark sweeps, cano-frame selection batches).
    """
    if mesh is None:
        mesh = make_mesh()
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step, shard_args = make_batched_fit_step(
        mesh, tx, tau=tau, use_assign=use_assign, downsample=downsample)
    args = shard_args(params, opt_state, jnp.asarray(cano_pc, jnp.float32),
                      jnp.asarray(pc_list, jnp.float32),
                      jax.random.split(key, cano_pc.shape[0]))
    params, opt_state = args[0], args[1]
    losses = None
    for _ in range(n_iter):
        params, opt_state, losses = step(params, opt_state, *args[2:])
    return params, losses

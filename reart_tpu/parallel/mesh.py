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
            from reart_tpu.train.engine import _select_matched, _select_rows

            pc_src = _select_rows(actx, pc_trans)
            cost = jnp.sqrt(pairwise_sqdist(
                jax.lax.stop_gradient(pc_src), actx.pc_tgt))
            perm = auction_lap(cost, num_scales=2, max_sweeps=64)
            matched = _select_matched(actx.pc_tgt, perm)
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


def _fit_base_rows(key, cfg, cano_b, pc_b, cano_idx_b, num_parts: int,
                   mesh: Mesh, flow_b=None):
    """Core of the mesh-sharded independent-fit sweep: one base-model fit
    per row, rows sharded over the mesh "seq" axis.

    cano_b (C, N, 3), pc_b (C, T-1, N, 3), cano_idx_b (C,) int32; flow_b an
    optional per-row-batched FlowContext ((C, T-1, M, 3) leaves). Runs the
    same compiled phase programs as train.engine.fit (recon + auction
    assignment), vmapped over rows. Returns (params_b, seg_b, trans_b).
    """
    import dataclasses

    from reart_tpu.models.base_model import base_forward, init_base_params
    from reart_tpu.train.engine import (
        _base_forward_fn,
        build_assign_context,
        make_fit_fns,
        make_optimizer,
    )

    cp, t_minus1 = pc_b.shape[0], pc_b.shape[1]
    # identical per-row init, exactly like the sequential loop (the same key
    # initializes every row's params)
    params1 = init_base_params(key, num_parts, t_minus1)
    tx = make_optimizer(params1, cfg, two_groups=True)
    opt1 = tx.init(params1)
    tile = lambda tree: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (cp,) + jnp.shape(x)), tree)
    seq = batch_spec(mesh)
    put = lambda tree: jax.device_put(tree, jax.tree.map(lambda _: seq, tree))
    st = put((tile(params1), tile(opt1)))
    cano_b, pc_b, cano_idx_b = (jax.device_put(jnp.asarray(cano_b), seq),
                                jax.device_put(jnp.asarray(pc_b), seq),
                                jax.device_put(jnp.asarray(cano_idx_b), seq))
    flow_ax = None if flow_b is None else 0
    if flow_b is not None:
        flow_b = put(flow_b)

    cfg_key = dataclasses.replace(cfg, cano_idx=0)
    recon_scan, assign_scan = make_fit_fns(_base_forward_fn, cfg_key, True)
    v_recon = jax.jit(jax.vmap(
        recon_scan,
        in_axes=(0, 0, None, None, None, 0, 0, flow_ax, None, 0)))
    v_assign = jax.jit(jax.vmap(
        assign_scan,
        in_axes=(0, 0, 0, None, None, 0, 0, flow_ax, None, 0, 0)))

    chunk = max(1, cfg.dispatch_chunk)
    use_assign = cfg.use_assign_loss and cfg.assign_iter < cfg.n_iter
    n_recon = min(cfg.assign_iter, cfg.n_iter) if use_assign else cfg.n_iter

    for start in range(0, n_recon, chunk):
        its = start + jnp.arange(chunk)
        st, _ = v_recon(*st, its, n_recon, key, cano_b, pc_b, flow_b, None,
                        cano_idx_b)

    if use_assign and cfg.n_iter > n_recon:
        actx = jax.jit(jax.vmap(
            lambda c, p: build_assign_context(c, p, cfg.downsample)
        ))(cano_b, pc_b)
        gap = max(1, cfg.assign_gap)
        n_outer = -(-(cfg.n_iter - n_recon) // gap)
        outer_chunk = max(1, chunk // gap)
        price = jnp.zeros((cp,) + actx.pc_tgt.shape[1:3], jnp.float32)
        st = (*st, jax.device_put(price, seq))
        for start in range(0, n_outer, outer_chunk):
            outer_its = n_recon + (start + jnp.arange(outer_chunk)) * gap
            st, _ = v_assign(*st, outer_its, key, cano_b, pc_b, flow_b, None,
                             cano_idx_b, actx)
        st = st[:2]

    params_b = st[0]
    _, seg_b, trans_b = jax.jit(jax.vmap(
        lambda p, c: base_forward(p, c, key, tau=1.0)))(params_b, cano_b)
    return params_b, seg_b, trans_b


def fit_base_sequences(key, cfg, cano_b, pc_b, cano_idx: int, num_parts: int,
                       mesh: Mesh | None = None, flow_b=None):
    """Fit a batch of DIFFERENT sequences (same shapes) as one mesh-sharded
    program — the `--batch_seq` sapien benchmark sweep (SURVEY §2.7: the
    reference runs one process per sequence index).

    cano_b (B, N, 3), pc_b (B, T-1, N, 3); all rows share cano_idx and cfg.
    flow_b: optional FlowContext with per-row-batched leaves. Returns a list
    of (params_i, seg_i, trans_i) host tuples, one per row.
    """
    import numpy as np

    if mesh is None:
        mesh = make_mesh()
    nseq = mesh.shape["seq"]
    b = cano_b.shape[0]
    pad = (-b) % nseq
    if pad:
        rep = lambda x: jnp.concatenate(
            [jnp.asarray(x)] + [jnp.asarray(x)[-1:]] * pad)
        cano_b, pc_b = rep(cano_b), rep(pc_b)
        if flow_b is not None:
            flow_b = jax.tree.map(rep, flow_b)
    cano_idx_b = jnp.full((cano_b.shape[0],), int(cano_idx), jnp.int32)

    params_b, seg_b, trans_b = _fit_base_rows(
        key, cfg, cano_b, pc_b, cano_idx_b, num_parts, mesh, flow_b=flow_b)
    return [
        (jax.tree.map(lambda x, r=row: np.asarray(x[r]), params_b),
         np.asarray(seg_b[row]), np.asarray(trans_b[row]))
        for row in range(b)
    ]


def fit_base_candidates(key, cfg, complete_pc_list, num_parts: int,
                        candidates, mesh: Mesh | None = None):
    """Fit one base model per candidate canonical frame, candidates sharded
    over the mesh "seq" axis — the multi-chip `--auto_cano` sweep.

    Runs the SAME compiled phase programs as the sequential selection loop
    (train.engine.make_fit_fns: recon phase + auction-assignment phase,
    cosine tau, two-group Adam), vmapped over the candidate axis, with the
    same PRNG key per candidate — so each candidate computes the same math
    the sequential `selection.select_canonical_frame` path would.

    Returns {cano_idx: (params_i, seg_i (N,), trans_i (T-1, P, 4, 4))}.
    Blueprint SURVEY §2.7: the reference re-runs a full process per
    candidate frame (README.md:60); here candidates ride the mesh.
    """
    import numpy as np

    if mesh is None:
        mesh = make_mesh()
    nseq = mesh.shape["seq"]
    complete = np.asarray(complete_pc_list, np.float32)
    cand = [int(i) for i in candidates]
    # pad the candidate batch to a multiple of the mesh's seq axis; padded
    # rows recompute the last candidate and are dropped on return
    cand_p = cand + [cand[-1]] * ((-len(cand)) % nseq)

    cano_b = jnp.asarray(np.stack([complete[i] for i in cand_p]))
    pc_b = jnp.asarray(np.stack(
        [np.concatenate([complete[:i], complete[i + 1:]]) for i in cand_p]))
    cano_idx_b = jnp.asarray(cand_p, jnp.int32)

    params_b, seg_b, trans_b = _fit_base_rows(
        key, cfg, cano_b, pc_b, cano_idx_b, num_parts, mesh)

    out = {}
    for row, idx in enumerate(cand_p):
        if idx not in out:
            out[idx] = (
                jax.tree.map(lambda x, r=row: np.asarray(x[r]), params_b),
                np.asarray(seg_b[row]),
                np.asarray(trans_b[row]),
            )
    return out


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

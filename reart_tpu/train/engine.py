"""The fit engine: scan-compiled per-sequence optimization.

Capability parity with the reference's driver hot loops (run_robot.py:154-221,
run_sapien.py / run_real.py equivalents), redesigned for XLA:

  * the reference's iteration loop is Python; ours is `lax.scan`, compiled
    once — the 15k-iteration relaxation phase is O(1) dispatches;
  * the reference ships the assignment cost to the host and fans scipy
    Hungarian solves across a multiprocessing pool every `assign_gap` iters
    (run_robot.py:164-187); ours solves the same LAPs on-device with the
    batched epsilon-scaling auction (reart_tpu/ops/assignment.py), so the
    assignment phase is also one compiled scan with zero host syncs;
  * flow blending (blend_anchor_motion under no_grad, run_robot.py:195-204)
    becomes a `stop_gradient` region inside the same compiled step.

The engine is model-agnostic: it takes a `forward(params, key, tau)` callable
returning the (pc_trans_list, seg_argmax, trans_list) contract shared by both
model stages, so the relaxation (base) and projection (kinematic) fits reuse
one loss/step/scan implementation.

Compiled programs are cached per (forward_fn, cfg) via `make_fit_fns`, so
repeated fits over the same shapes (canonical-frame selection sweeps,
benchmarking) pay compilation once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from reart_tpu.losses import flow_loss as _flow_loss
from reart_tpu.losses import recon_loss as _recon_loss
from reart_tpu.ops import farthest_point_sample, index_points
from reart_tpu.ops.interpolate import blend_anchor_motion_batched
from reart_tpu.ops.assignment import auction_lap
from reart_tpu.ops.distance import pairwise_sqdist
from reart_tpu.train.schedules import tau_cosine

ForwardFn = Callable[..., tuple]
# (params, key, tau, cano_pc, fwd_ctx) -> (pc_trans, seg, trans); cano_pc and
# fwd_ctx are TRACED arguments of the compiled scans, never closure constants
# (a closure-captured cloud would be silently baked into cached programs)

# sentinel coordinate for padded flow anchors: far enough that a padded anchor
# can never enter a real point's 3-NN set
FAR = 1e6


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Mirrors the reference argparse surface (run_robot.py:361-419) minus
    host/path concerns. Defaults = robot relaxation defaults."""

    n_iter: int = 15000
    # losses
    use_assign_loss: bool = False
    use_flow_loss: bool = False
    use_robust_loss: bool = False
    always_recon: bool = False        # sapien keeps recon on in assign phase (run_sapien.py:174)
    assign_iter: int = 5000           # first iteration of the assignment phase
    assign_gap: int = 5               # LAP recompute cadence
    downsample: int = 4               # FPS downsample for the assignment cost
    # loss weights
    lambda_assign: float = 3e-1
    lambda_flow: float = 1.0
    # gumbel temperature schedule
    start_tau: float = 5.0
    end_tau: float = 1.0
    # optimizer
    seg_lr: float = 1e-3
    trans_lr: float = 1e-2
    weight_decay: float = 0.0
    cano_idx: int = 0
    # max iterations per device dispatch: bounds single-execution wall time
    # (long-running executions trip TPU-runtime watchdogs) and sets the
    # granularity at which the host can observe progress. 100 iterations =
    # ~1 s device time at nao scale; lower it for workloads whose per-iter
    # cost is dominated by huge LAP solves (projection faithful protocol)
    dispatch_chunk: int = 100
    # watchdog covering each dispatch ENQUEUE and each completion fence:
    # must cover the FIRST enqueue's remote compile (minutes) plus a
    # chunk's execution; a call that outlives this is treated as a
    # wedged-tunnel/lost-completion failure and the pipeline rewinds to
    # the last proven state
    dispatch_timeout: float = 900.0
    # dispatches kept in flight before fencing the oldest. The tunnel's
    # per-dispatch round trip (~0.7 s measured) otherwise serializes with
    # device execution: at chunk=50 the nao fit measures 42.7 it/s fenced
    # every chunk vs 79.1 it/s fenced every 8 chunks — pipelining buys the
    # same overlap while keeping small chunks (watchdog granularity)
    pipeline_depth: int = 4
    # auction sweep bound per epsilon phase. 100 is the measured sweet spot:
    # raising it to 1000 makes each solve near-exact (gap -10.9% -> -0.09%
    # at 1024^2) but DOUBLES fit wall-clock (warm-started prices on a moving
    # cost converge slowly) and leaves every end-to-end metric unchanged
    # (EPE 0.436 vs 0.418, RI 0.777 vs 0.776, energy 0.103 vs 0.104 on the
    # gt-flow nao fit) — the assignment loss only needs a good-enough
    # matching refreshed every assign_gap iterations
    assign_sweeps: int = 100
    # column-window width of the banded points-level LAP used for GIANT
    # assignment problems (> 1024^2: robot faithful downsample<=2, sapien
    # downsample 1). Matched-cost quality on real mid-fit matrices is
    # equivalent to the dense sweep-bounded path (scripts/ab_lap.py);
    # 0 disables the banded path entirely; -1 auto-scales the window with
    # the problem (n//4 clamped to [512, 1024] — at 4096^2 the 1024-wide
    # band costs the same wall-clock as 512, measured on real end-of-fit
    # sapien clouds, and cuts matched cost/duplicates ~10/18%)
    assign_band: int = -1
    # quality guard for the banded path (auto mode only, assign_band=-1):
    # at the assign-phase boundary the fit solves the REAL first assignment
    # problem both banded and dense (once) and keeps the banded path only if
    # its total matched cost is within this relative tolerance of the dense
    # solve's. On model-aligned clouds the banded matching is at least as
    # good; on badly unaligned clouds (raw camera-rotated scans) it is
    # 9-21% worse (PARITY.md) and the fit falls back to the dense solver
    # automatically. The decision is persisted in the mid-run checkpoint so
    # resume stays bit-identical. 0 disables the guard.
    assign_band_guard: float = 0.05
    # re-run the banded-vs-dense guard probe every this many iterations of
    # the assign phase (0 = probe only once at the phase boundary). The
    # initial decision is made on the phase's FIRST clouds; on long fits the
    # alignment regime can change — typically raw scans start unaligned
    # (guard falls back to dense) and align as the fit converges, at which
    # point the banded path becomes safe (and cheaper) again. The probe
    # program is compiled once (iteration is a traced argument), so each
    # re-probe costs one banded+dense solve of the current real problem.
    # A flipped decision is persisted in the mid-run checkpoint like the
    # initial one.
    assign_band_reprobe: int = 1000


class FlowContext(NamedTuple):
    """Precomputed flow supervision for consecutive frame pairs.

    pc_ref / flow_ref: (T-1, M, 3) anchor points of the SOURCE frame of each
    consecutive pair and their matched flows (reference run_robot.py:78-84).
    Rows are padded to a common M with FAR-away points and zero flow; at
    least 3 valid anchors per pair are required.
    """

    pc_ref: jnp.ndarray
    flow_ref: jnp.ndarray

    @staticmethod
    def from_lists(pc_refs, flow_refs):
        """Pad variable-length per-pair anchor lists to static shapes."""
        import numpy as np

        m = max(int(p.shape[0]) for p in pc_refs)
        t = len(pc_refs)
        pc = np.full((t, m, 3), FAR, dtype=np.float32)
        fl = np.zeros((t, m, 3), dtype=np.float32)
        for i, (p, f) in enumerate(zip(pc_refs, flow_refs)):
            pc[i, : p.shape[0]] = p
            fl[i, : f.shape[0]] = f
        return FlowContext(jnp.asarray(pc), jnp.asarray(fl))


class AssignContext(NamedTuple):
    """Static FPS downsampling for the assignment loss (run_robot.py:166-170).

    Both index sets depend only on the (fixed) canonical cloud and target
    frames, so they are computed once per fit, not per recompute."""

    src_idx: jnp.ndarray  # (num_fps,) into cano_pc / pc_trans_list rows
    pc_tgt: jnp.ndarray   # (T-1, num_fps, 3) FPS-downsampled target frames


def build_assign_context(cano_pc, pc_list, downsample: int) -> AssignContext:
    num_fps = pc_list.shape[1] // downsample
    src_idx = farthest_point_sample(cano_pc[None], num_fps)[0]
    tgt_idx = farthest_point_sample(pc_list, num_fps)
    return AssignContext(src_idx=src_idx,
                         pc_tgt=index_points(pc_list, tgt_idx))


# Row selections run as one-hot MXU matmuls below this size — measured 1.66
# vs 2.77 ms per value+grad step against the row gather at nao shapes. The
# one-hot is an O(M^2) temporary (the MXU operand), so past 2048 rows its
# materialization (604 MB at sapien downsample 1) outweighs the gather cost.
ONEHOT_SELECT_MAX_ROWS = 2048


def _select_rows(actx: AssignContext, pc_trans_list):
    """pc_trans_list (T-1, N, 3) -> (T-1, num_fps, 3)."""
    if actx.src_idx.shape[0] > ONEHOT_SELECT_MAX_ROWS:
        return pc_trans_list[:, actx.src_idx]
    onehot = jax.nn.one_hot(actx.src_idx, pc_trans_list.shape[1],
                            dtype=pc_trans_list.dtype)
    return jnp.einsum("mn,tnc->tmc", onehot, pc_trans_list)


def _select_matched(pc_tgt, perm):
    """Row perm (T-1, num_fps) applied to pc_tgt (T-1, num_fps, 3)."""
    m = pc_tgt.shape[1]
    if m > ONEHOT_SELECT_MAX_ROWS:
        return jnp.take_along_axis(pc_tgt, perm[..., None], axis=1)
    oh = (perm[..., None] == jnp.arange(m)[None, None, :]).astype(pc_tgt.dtype)
    return jnp.einsum("tsm,tmc->tsc", oh, pc_tgt)


def make_optimizer(params, cfg: FitConfig, two_groups: bool):
    """Adam with the reference's param groups: seg MLP at seg_lr, proposals at
    trans_lr (run_robot.py:146-148); single-group trans_lr otherwise (:150).
    weight_decay matches torch Adam's L2-in-gradient form."""

    def group(lr):
        steps = [optax.add_decayed_weights(cfg.weight_decay)] if cfg.weight_decay else []
        return optax.chain(*steps, optax.adam(lr))

    if not two_groups:
        return group(cfg.trans_lr)
    labels = {k: ("seg" if k == "seg" else "trans") for k in params}
    return optax.multi_transform(
        {"seg": group(cfg.seg_lr), "trans": group(cfg.trans_lr)}, labels
    )


def _complete(pc_trans_list, cano_pc, cano_idx):
    """Re-insert the canonical frame at its original position.

    cano_idx may be a TRACED scalar: implemented as a gather over a computed
    source-index vector, so one compiled program serves every canonical
    frame (static concatenation would force a recompile per cano_idx —
    minutes each over remote compile — during selection sweeps)."""
    t = pc_trans_list.shape[0] + 1
    stacked = jnp.concatenate([pc_trans_list, cano_pc[None]], axis=0)
    pos = jnp.arange(t)
    src = jnp.where(pos < cano_idx, pos,
                    jnp.where(pos == cano_idx, t - 1, pos - 1))
    return stacked[src]


def _flow_term(pc_trans_list, cano_pc, flow_ctx: FlowContext, cfg: FitConfig,
               cano_idx):
    """Blend reference flows onto predicted source points (no-grad) and apply
    the masked flow loss (reference run_robot.py:195-213)."""
    complete_pred = _complete(pc_trans_list, cano_pc, cano_idx)
    query_list = complete_pred[:-1]  # (T-1, N, 3)
    blended, mask = blend_anchor_motion_batched(
        query_list, flow_ctx.pc_ref, flow_ctx.flow_ref)
    blended = jax.lax.stop_gradient(blended)
    mask = jax.lax.stop_gradient(mask)
    pred_flow = complete_pred[1:] - complete_pred[:-1]
    return cfg.lambda_flow * _flow_loss(
        blended, pred_flow, flow_mask_list=mask, robust=cfg.use_robust_loss
    )


@functools.lru_cache(maxsize=64)
def make_fit_fns(forward_fn: ForwardFn, cfg: FitConfig, two_group_opt: bool,
                 tau_fn=None):
    """Build (tx, recon_scan, assign_scan): the jitted phase programs.

    Cached on (forward_fn, cfg) identity. Forward callables must be
    module-level functions; all array state (canonical cloud, kinematic
    state) flows through TRACED scan arguments, so cached programs are safe
    to reuse across sequences with the same shapes.

    recon_scan(params, opt_state, its, key, cano_pc, pc_list, flow_ctx)
    assign_scan(params, opt_state, outer_idx, key, cano_pc, pc_list,
                flow_ctx, actx)
    Both return ((params, opt_state), history-dict of per-iter scalars).
    """
    if tau_fn is None:
        tau_fn = functools.partial(
            tau_cosine, max_iter=cfg.n_iter, end_temp=cfg.end_tau,
            start_temp=cfg.start_tau,
        )

    def make_tx(params):
        return make_optimizer(params, cfg, two_groups=two_group_opt)

    def loss_fn(params, it, key, cano_pc, pc_list, flow_ctx, fwd_ctx,
                cano_idx, perm, actx):
        step_key = jax.random.fold_in(key, it)
        tau = tau_fn(it + 1)
        pc_trans_list, seg, trans_list = forward_fn(
            params, step_key, tau, cano_pc, fwd_ctx)
        terms = {}
        if perm is None or cfg.always_recon:
            terms["recon_loss"] = _recon_loss(pc_trans_list, pc_list)
        if perm is not None:
            pc_src = _select_rows(actx, pc_trans_list)  # (T-1, M, 3)
            matched = _select_matched(actx.pc_tgt, perm)
            terms["ass_loss"] = cfg.lambda_assign * jnp.sum((pc_src - matched) ** 2)
        if flow_ctx is not None and cfg.use_flow_loss:
            terms["flow_loss"] = _flow_term(pc_trans_list, cano_pc, flow_ctx,
                                            cfg, cano_idx)
        total = functools.reduce(jnp.add, terms.values())
        terms["total_loss"] = total
        return total, terms

    def log_of(terms):
        return {
            k: terms.get(k, jnp.asarray(0.0, jnp.float32))
            for k in ("total_loss", "recon_loss", "ass_loss", "flow_loss")
        }

    def step(tx, carry, it, key, cano_pc, pc_list, flow_ctx, fwd_ctx,
             cano_idx, perm=None, actx=None):
        params, opt_state = carry
        (_, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, it, key, cano_pc, pc_list, flow_ctx, fwd_ctx, cano_idx,
            perm, actx
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), log_of(terms)

    @jax.jit
    def recon_scan(params, opt_state, its, limit, key, cano_pc, pc_list,
                   flow_ctx, fwd_ctx, cano_idx):
        """One bounded dispatch of recon-phase steps; iterations >= limit
        (chunk padding) are masked no-ops."""
        tx = make_tx(params)

        def body(carry, it):
            c_new, logs = step(tx, carry, it, key, cano_pc, pc_list, flow_ctx,
                               fwd_ctx, cano_idx)
            keep = it < limit
            c_kept = jax.tree.map(
                lambda new, old: jnp.where(keep, new, old), c_new, carry
            )
            logs = jax.tree.map(lambda v: jnp.where(keep, v, 0.0), logs)
            return c_kept, logs

        return jax.lax.scan(body, (params, opt_state), its)

    gap = max(1, cfg.assign_gap)

    @jax.jit
    def assign_scan(params, opt_state, price, outer_its, key, cano_pc,
                    pc_list, flow_ctx, fwd_ctx, cano_idx, actx):
        """One bounded dispatch of assignment-phase chunks. outer_its:
        (n_outer,) global iteration index of each chunk start; each chunk =
        one LAP solve + `gap` gradient steps (iterations past n_iter are
        masked no-ops).

        Auction prices are carried ACROSS chunks and dispatches: between
        recomputes the predicted clouds barely move, so warm-started solves
        converge in a handful of bounded sweeps (this is what makes an
        on-device LAP competitive with the reference's host Hungarian
        protocol)."""
        tx = make_tx(params)

        def solve_perm(params, it0, price):
            step_key = jax.random.fold_in(key, it0)
            pc_trans_list, _, _ = forward_fn(
                params, step_key, tau_fn(it0 + 1), cano_pc, fwd_ctx)
            pc_src = jax.lax.stop_gradient(_select_rows(actx, pc_trans_list))
            n_src, n_tgt = pc_src.shape[1], actx.pc_tgt.shape[1]
            from reart_tpu.ops.assignment import (
                auction_lap_points,
                banded_points_available,
                resolve_band,
            )

            band = resolve_band(cfg.assign_band, n_src)
            if banded_points_available(n_src, n_tgt, band):
                # giant problems: banded points-level solve — the dense
                # (B, N, M) cost matrix is never materialized
                return auction_lap_points(
                    pc_src, actx.pc_tgt, band=band, eps_min=1e-4,
                    num_scales=2, scale_factor=50.0,
                    max_sweeps=cfg.assign_sweeps, price=price,
                    return_price=True)
            cost = jnp.sqrt(pairwise_sqdist(pc_src, actx.pc_tgt))
            return auction_lap(cost, eps_min=1e-4, num_scales=2,
                               scale_factor=50.0,
                               max_sweeps=cfg.assign_sweeps,
                               price=price, return_price=True)

        def outer(carry, it0):
            params, _, price = carry
            perm, price = solve_perm(params, it0, price)

            def inner(c, j):
                it = it0 + j
                (p2, o2), logs = step(tx, c[:2], it, key, cano_pc, pc_list,
                                      flow_ctx, fwd_ctx, cano_idx,
                                      perm=perm, actx=actx)
                keep = it < cfg.n_iter
                c_kept = jax.tree.map(
                    lambda new, old: jnp.where(keep, new, old), (p2, o2), c[:2]
                )
                logs = jax.tree.map(lambda v: jnp.where(keep, v, 0.0), logs)
                return (*c_kept, c[2]), logs

            return jax.lax.scan(inner, (params, carry[1], price),
                                jnp.arange(gap))

        return jax.lax.scan(outer, (params, opt_state, price), outer_its)

    return recon_scan, assign_scan


def _call_with_watchdog(fn, timeout: float):
    """Run `fn()` inside a watchdog thread and return its value.

    Failures come in two shapes on a tunnel-attached chip: raised
    JaxRuntimeErrors, and calls that silently HANG (a wedged tunnel can
    stall an enqueue or a completion fence forever while the chip idles).
    On expiry a TimeoutError is raised; a hung thread is daemonic and
    abandoned."""
    import threading

    box = {}

    def work():
        try:
            box["out"] = fn()
        except BaseException as e:  # re-raised on the main thread
            box["err"] = e

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        raise TimeoutError(f"device call exceeded {timeout:.0f}s watchdog")
    if "err" in box:
        raise box["err"]
    return box.get("out")


def _fence_with_watchdog(out, timeout: float):
    """Block until `out`'s device buffers are ready (watchdogged)."""

    def fence():
        jax.tree.map(
            lambda x: (x.block_until_ready()
                       if hasattr(x, "block_until_ready") else x),
            out,
            is_leaf=lambda x: hasattr(x, "block_until_ready"))

    _call_with_watchdog(fence, timeout)


def run_chunks_pipelined(starts, state, dispatch_one, on_fenced,
                         timeout: float, max_retries: int = 2,
                         depth: int = 4):
    """Thread `state` through a sequence of bounded dispatches, keeping up to
    `depth` dispatches in flight before fencing the oldest.

    JAX dispatch is asynchronous, so enqueueing chunk i+1 while chunk i is
    still executing overlaps the tunnel's per-dispatch round trip with device
    execution — fencing every chunk serializes them (measured 42.7 vs 79.1
    iters/sec on the nao fit, SURVEY §6 workload). Chunks stay small, so the
    TPU-runtime watchdog and progress observability are unaffected.

    dispatch_one(start, state) -> (state', extras): enqueue one chunk (async).
    on_fenced(start, state', extras): called in chunk order once the chunk's
    outputs are proven complete.

    Both the enqueue AND the fence run under the watchdog: a wedged tunnel
    can hang either (the FIRST enqueue includes the remote compile, so
    `timeout` must cover it). Failure recovery: when either fails
    transiently (JaxRuntimeError / watchdog timeout), every in-flight chunk
    is suspect — all are dropped, `state` rewinds to the last FENCED value,
    and work resumes from the oldest unproven chunk (pure functions of
    their inputs, so re-running is always safe). KeyboardInterrupt is never
    swallowed. Returns the final fenced state."""
    import collections
    import time as _time

    pending = collections.deque()  # (start, state_after, extras)
    fenced_state = state
    retries: dict[int, int] = {}
    i = 0
    starts = list(starts)

    def drain_pending():
        # fence what is already in flight (so on_fenced fires and mid-run
        # checkpoints land) before surfacing a fatal failure
        while pending:
            s0, st, ex = pending.popleft()
            try:
                _fence_with_watchdog((st, ex), timeout)
            except Exception:
                break
            on_fenced(s0, st, ex)

    def rewind(s_fail, err) -> bool:
        nonlocal state, i
        n = retries.get(s_fail, 0) + 1
        if n > max_retries:
            return False
        retries[s_fail] = n
        print(f"[fit] transient device failure ({err}), rewinding to "
              f"iteration-chunk {s_fail} (retry {n}/{max_retries}) ...",
              flush=True)
        _time.sleep(5.0 * n)
        pending.clear()              # in-flight chunks consumed bad inputs
        state = fenced_state
        i = starts.index(s_fail)     # re-dispatch from the oldest unproven
        return True

    while i < len(starts) or pending:
        if i < len(starts) and len(pending) < max(1, depth):
            s_i, st_in = starts[i], state
            try:
                state, extras = _call_with_watchdog(
                    lambda: dispatch_one(s_i, st_in), timeout)
            except KeyboardInterrupt:
                raise
            except (jax.errors.JaxRuntimeError, TimeoutError) as e:
                # wedged tunnel mid-enqueue, or a deferred async error from
                # an in-flight chunk surfacing here
                s_fail = pending[0][0] if pending else s_i
                if rewind(s_fail, e):
                    continue
                drain_pending()
                raise
            except BaseException:
                drain_pending()
                raise
            pending.append((s_i, state, extras))
            i += 1
            continue
        s0, state_after, extras = pending.popleft()
        try:
            _fence_with_watchdog((state_after, extras), timeout)
        except KeyboardInterrupt:
            raise
        except (jax.errors.JaxRuntimeError, TimeoutError) as e:
            if rewind(s0, e):
                continue
            raise
        fenced_state = state_after
        on_fenced(s0, state_after, extras)
    return fenced_state


def fit(
    key,
    forward_fn: ForwardFn,
    params,
    cfg: FitConfig,
    cano_pc,
    pc_list,
    flow_ctx: FlowContext | None = None,
    fwd_ctx=None,
    two_group_opt: bool = False,
    log_every: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 2000,
    max_retries: int = 2,
    snapshot_cb=None,
    snapshot_every: int | None = None,
    mesh=None,
):
    """Run the full per-sequence fit. Returns (params, history dict).

    snapshot_cb(done: int, params): called at every dispatch boundary that
    crosses a snapshot_every multiple, with the FENCED device params at that
    point — the reference's mid-fit snapshot hook (run_robot.py:224-269).
    The callback runs on the dispatch-issuing thread: do the cheap transfer
    there and push real evaluation work to a worker (see cli.py
    --snapshot_metrics) or the pipeline stalls.

    mesh: a jax.sharding.Mesh with a "frame" axis shards THIS single
    sequence's per-frame state (pc_list, proposals, flow/assign contexts,
    auction prices) over devices — SURVEY §2.7's "shard_map over T": every
    loss reduces over frames, so GSPMD turns the reductions into psums over
    ICI and the per-frame forward/backward runs fully parallel. Requires
    pc_list.shape[0] divisible by the mesh's "frame" size (the fit falls
    back to single-device placement otherwise, with a notice). Semantics
    are unchanged — asserted in tests/test_parallel.py.

    history holds per-iteration float32 scalars: total_loss, recon_loss,
    ass_loss, flow_loss (zeros where a term is inactive) — the reference's
    printed `losses` dict (run_robot.py:186-216) in array form.
    log_every: print progress roughly every this many iterations (rounded to
    dispatch boundaries; forces a host sync per print).

    Resilience (the reference has none — SURVEY §5): with `checkpoint_dir`,
    optimizer state is snapshotted every `checkpoint_every` iterations and a
    crashed fit resumes from the last snapshot on the next call; transient
    device/tunnel failures are retried up to `max_retries` times per
    dispatch — the step is a pure function of its inputs, so re-running a
    chunk from its input state is always safe.
    """
    import os
    import pickle
    import time as _time

    def _log(h, done, step_sz):
        if log_every is None:
            return
        le = max(log_every, 1)
        if done // le == (done - step_sz) // le and done < cfg.n_iter:
            return  # no boundary crossed by this dispatch
        last = {k: float(v.reshape(-1)[-1]) for k, v in h.items()}
        msg = " | ".join(f"{k}: {v:.3f}" for k, v in last.items() if v != 0.0)
        print(f"iteration {min(done, cfg.n_iter) - 1} | {msg}", flush=True)

    def _snapshot(done, step_sz, params):
        if snapshot_cb is None:
            return
        se = max(snapshot_every or cfg.n_iter, 1)
        if done // se != (done - step_sz) // se and done < cfg.n_iter:
            snapshot_cb(min(done, cfg.n_iter), params)

    def _pipelined(starts, state, dispatch_one, on_fenced):
        return run_chunks_pipelined(
            starts, state, dispatch_one, on_fenced,
            timeout=max(60.0, cfg.dispatch_timeout),
            max_retries=max_retries, depth=cfg.pipeline_depth)

    ckpt_path = (os.path.join(checkpoint_dir, "fit_state.pkl")
                 if checkpoint_dir else None)

    def _save_state(done, params, opt_state, price, hs_done):
        if ckpt_path is None:
            return
        os.makedirs(checkpoint_dir, exist_ok=True)
        payload = {
            "done": done,
            "params": jax.tree.map(np.asarray, params),
            "opt_state": jax.tree.map(np.asarray, opt_state),
            "price": None if price is None else np.asarray(price),
            "history": jax.tree.map(np.asarray, hs_done),
            # the band guard's path decision (None = not yet made): resume
            # must reuse it, not re-probe with better-aligned params
            "guard_band": guard_band,
        }
        tmp = ckpt_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, ckpt_path)

    import numpy as np

    cano_pc = jnp.asarray(cano_pc, jnp.float32)
    pc_list = jnp.asarray(pc_list, jnp.float32)

    t_lead = pc_list.shape[0]
    mesh_frame = None
    if mesh is not None and mesh.shape.get("frame", 1) > 1:
        if t_lead % mesh.shape["frame"] == 0:
            mesh_frame = mesh
        else:
            print(f"[fit] frame mesh ignored: {t_lead} frames not divisible "
                  f"by mesh frame={mesh.shape['frame']}", flush=True)

    def _shard_frames(tree):
        """Commit every leaf with a leading frame axis to P('frame'), the
        rest replicated — jit then compiles one SPMD program over the mesh
        (loss reductions over frames become psums)."""
        if mesh_frame is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x):
            if not hasattr(x, "ndim"):
                return x
            spec = (P("frame") if x.ndim >= 1 and x.shape[0] == t_lead
                    else P())
            return jax.device_put(x, NamedSharding(mesh_frame, spec))

        return jax.tree.map(put, tree)

    params = _shard_frames(params)
    pc_list, cano_pc = _shard_frames(pc_list), _shard_frames(cano_pc)
    flow_ctx = _shard_frames(flow_ctx) if flow_ctx is not None else None
    fwd_ctx = _shard_frames(fwd_ctx) if fwd_ctx is not None else None
    tx = make_optimizer(params, cfg, two_groups=two_group_opt)
    opt_state = tx.init(params)  # zeros_like(params): inherits the sharding
    # cano_idx is a TRACED argument of the compiled programs (selection
    # sweeps reuse one program across candidate frames) — normalize it out
    # of the cache key
    cano_idx = jnp.asarray(cfg.cano_idx, jnp.int32)
    cfg_key = dataclasses.replace(cfg, cano_idx=0)
    recon_scan, assign_scan = make_fit_fns(forward_fn, cfg_key, two_group_opt)

    use_assign = cfg.use_assign_loss and cfg.assign_iter < cfg.n_iter
    n_recon = min(cfg.assign_iter, cfg.n_iter) if use_assign else cfg.n_iter
    chunk = max(1, cfg.dispatch_chunk)
    history = []
    resume_done = 0
    price = None
    guard_band = None  # band-guard decision, made once per fit (or resumed)

    if ckpt_path is not None and os.path.exists(ckpt_path):
        with open(ckpt_path, "rb") as f:
            saved = pickle.load(f)
        resume_done = saved["done"]
        guard_band = saved.get("guard_band")
        params = _shard_frames(jax.tree.map(jnp.asarray, saved["params"]))
        opt_state = _shard_frames(
            jax.tree.map(jnp.asarray, saved["opt_state"]))
        price = (None if saved["price"] is None
                 else _shard_frames(jnp.asarray(saved["price"])))
        history = [jax.tree.map(jnp.asarray, h) for h in saved["history"]]
        print(f"[fit] resuming from iteration {resume_done}", flush=True)

    last_saved = resume_done

    if n_recon > 0 and resume_done < n_recon:
        # bounded dispatches of `chunk` iterations, one compiled program,
        # pipelined so the tunnel round trip overlaps device execution
        hs = []

        def dispatch_recon(start, st):
            its = start + jnp.arange(chunk)
            new_st, h = recon_scan(*st, its, n_recon, key, cano_pc,
                                   pc_list, flow_ctx, fwd_ctx, cano_idx)
            return new_st, h

        def fenced_recon(start, st, h):
            nonlocal last_saved
            hs.append(h)
            done = min(start + chunk, n_recon)
            _log(h, start + chunk, chunk)
            _snapshot(start + chunk, chunk, st[0])
            if ckpt_path and done - last_saved >= checkpoint_every:
                _save_state(done, st[0], st[1], None, history + hs)
                last_saved = done

        params, opt_state = _pipelined(
            range(resume_done, n_recon, chunk), (params, opt_state),
            dispatch_recon, fenced_recon)
        h = jax.tree.map(
            lambda *xs: jnp.concatenate(xs)[: n_recon - resume_done], *hs)
        history.append(h)

    if use_assign and cfg.n_iter > n_recon:
        actx = _shard_frames(
            build_assign_context(cano_pc, pc_list, cfg.downsample))
        assign_resume = max(0, resume_done - n_recon)
        remaining = cfg.n_iter - n_recon
        gap = max(1, cfg.assign_gap)
        n_outer = -(-remaining // gap)  # ceil
        outer_resume = assign_resume // gap
        outer_chunk = max(1, chunk // gap)
        t_frames, num_fps = actx.pc_tgt.shape[:2]
        if price is None:
            price = _shard_frames(jnp.zeros((t_frames, num_fps), jnp.float32))

        # banded-path quality guard: probe once on the real first-solve
        # clouds; a resumed fit reuses the checkpointed decision instead
        from reart_tpu.ops.assignment import (
            banded_points_available,
            resolve_band,
        )

        band = resolve_band(cfg.assign_band, num_fps)
        guard_active = (cfg.assign_band == -1 and cfg.assign_band_guard > 0
                        and banded_points_available(num_fps, num_fps, band))

        def _run_probe(params_now, price_now, it0):
            """Banded-vs-dense matched cost on the CURRENT real problem ->
            (band-or-0 decision, relative cost gap)."""
            probe = _band_guard_probe(forward_fn, band, cfg.n_iter,
                                      cfg.end_tau, cfg.start_tau,
                                      cfg.assign_sweeps)
            cb, cd = probe(params_now, key, jnp.asarray(it0, jnp.int32),
                           cano_pc, fwd_ctx, actx.src_idx, actx.pc_tgt,
                           price_now)
            rel = float(cb) / max(float(cd), 1e-12) - 1.0
            return (band if rel <= cfg.assign_band_guard else 0), rel

        def _scan_for(gb):
            if gb != 0:
                return assign_scan_banded
            return make_fit_fns(
                forward_fn, dataclasses.replace(cfg_key, assign_band=0),
                two_group_opt)[1]

        assign_scan_banded = assign_scan
        if guard_active:
            if guard_band is None:
                guard_band, rel = _run_probe(params, price, n_recon)
                if guard_band == 0:
                    print(f"[fit] banded-LAP guard: banded matched cost "
                          f"{rel:+.1%} vs dense on the first-solve clouds "
                          f"(> +{cfg.assign_band_guard:.0%}) — dense solver",
                          flush=True)
            assign_scan = _scan_for(guard_band)
        hs = []

        def dispatch_assign(start, st):
            # pad the last dispatch to the common shape; padded outers are
            # fully masked by the it < n_iter check inside
            outer_its = n_recon + (start + jnp.arange(outer_chunk)) * gap
            new_st, h = assign_scan(*st, outer_its, key, cano_pc, pc_list,
                                    flow_ctx, fwd_ctx, cano_idx, actx)
            return new_st, h

        def fenced_assign(start, st, h):
            nonlocal last_saved, guard_band, assign_scan
            hs.append(jax.tree.map(lambda v: v.reshape(-1), h))
            done = min(n_recon + (start + outer_chunk) * gap, cfg.n_iter)
            _log(h, n_recon + (start + outer_chunk) * gap, outer_chunk * gap)
            _snapshot(n_recon + (start + outer_chunk) * gap,
                      outer_chunk * gap, st[0])
            # mid-fit guard re-probe: the alignment regime can change over a
            # long fit (clouds typically align as it converges) — re-decide
            # the banded-vs-dense path on the CURRENT clouds every
            # assign_band_reprobe iterations; later dispatches use the new
            # path (in-flight ones finish on the old one, both are valid)
            rp = max(cfg.assign_band_reprobe, 0)
            if (guard_active and rp > 0 and done < cfg.n_iter
                    and (done - n_recon) // rp
                    != (done - n_recon - outer_chunk * gap) // rp):
                new_band, rel = _run_probe(st[0], st[2], done)
                if new_band != guard_band:
                    which = "banded" if new_band else "dense"
                    print(f"[fit] banded-LAP guard re-probe at iteration "
                          f"{done}: matched cost {rel:+.1%} vs dense — "
                          f"switching to the {which} solver", flush=True)
                    guard_band = new_band
                    assign_scan = _scan_for(guard_band)
            if ckpt_path and done - last_saved >= checkpoint_every:
                _save_state(done, st[0], st[1], st[2], history + hs)
                last_saved = done

        params, opt_state, price = _pipelined(
            range(outer_resume, n_outer, outer_chunk),
            (params, opt_state, price), dispatch_assign, fenced_assign)
        h = jax.tree.map(
            lambda *xs: jnp.concatenate(xs)[: remaining - outer_resume * gap],
            *hs)
        history.append(h)

    if ckpt_path is not None and os.path.exists(ckpt_path):
        os.remove(ckpt_path)  # fit completed: clear the resume snapshot

    hist = (
        jax.tree.map(lambda *xs: jnp.concatenate(xs), *history)
        if len(history) > 1
        else history[0]
    )
    return params, hist


@functools.lru_cache(maxsize=16)
def _band_guard_probe(forward_fn: ForwardFn, band: int, n_iter: int,
                      end_tau: float, start_tau: float, sweeps: int):
    """Jitted banded-vs-dense matched-cost probe at the assign-phase boundary
    (one compile, persistently cached; it0 is traced so one program serves
    every n_recon): forward with the post-recon params at the phase's first
    tau, select the FPS rows, solve the SAME first assignment problem both
    banded and dense, and return each path's total matched euclidean cost.

    The dense (T-1, N, M) cost matrix is materialized ONCE here — the price
    of an evidence-based path choice; on model-aligned clouds the banded
    matching measures at least as close to the exact optimum as the dense
    sweep-bounded solve, on badly unaligned clouds (raw camera-rotated
    scans) it is 9-21% worse (PARITY.md), which is exactly what this
    measures on the fit's own data."""

    @jax.jit
    def go(params, key, it0, cano_pc, fwd_ctx, src_idx, pc_tgt, price):
        from reart_tpu.ops.assignment import auction_lap, auction_lap_points
        from reart_tpu.ops.distance import pairwise_sqdist

        tau0 = tau_cosine(it0 + 1, n_iter, end_tau, start_tau)
        pc_trans_list, _, _ = forward_fn(params, key, tau0, cano_pc, fwd_ctx)
        pc_src = jax.lax.stop_gradient(
            _select_rows(AssignContext(src_idx, pc_tgt), pc_trans_list))

        def matched_cost(r2c):
            tgt = jnp.take_along_axis(pc_tgt, r2c[..., None], axis=1)
            return jnp.sum(jnp.linalg.norm(pc_src - tgt, axis=-1))

        r2c_b = auction_lap_points(
            pc_src, pc_tgt, band=band, eps_min=1e-4, num_scales=2,
            scale_factor=50.0, max_sweeps=sweeps, price=price)
        cost = jnp.sqrt(pairwise_sqdist(pc_src, pc_tgt))
        r2c_d = auction_lap(cost, eps_min=1e-4, num_scales=2,
                            scale_factor=50.0, max_sweeps=sweeps, price=price)
        return matched_cost(r2c_b), matched_cost(r2c_d)

    return go


def _base_forward_fn(params, key, tau, cano_pc, fwd_ctx):
    """Base-model forward over TRACED cano_pc (fwd_ctx unused)."""
    from reart_tpu.models.base_model import base_forward

    return base_forward(params, cano_pc, key, tau)


def _kinematic_forward_fn(params, key, tau, cano_pc, fwd_ctx):
    """Kinematic forward; fwd_ctx is the KinematicState pytree. Training
    always forwards the canonical cloud, where the seg transfer is the
    identity."""
    from reart_tpu.models.kinematic import kinematic_forward

    return kinematic_forward(params, fwd_ctx, cano_pc,
                             seg_part=fwd_ctx.seg_part)


def fit_base(key, params, cfg, cano_pc, pc_list, flow_ctx=None,
             log_every=None, checkpoint_dir=None, snapshot_cb=None,
             snapshot_every=None, mesh=None):
    """Relaxation-stage fit (reference `--model=base`)."""
    cano = jnp.asarray(cano_pc, jnp.float32)
    return fit(key, _base_forward_fn, params, cfg, cano, pc_list,
               flow_ctx=flow_ctx, two_group_opt=True, log_every=log_every,
               checkpoint_dir=checkpoint_dir, snapshot_cb=snapshot_cb,
               snapshot_every=snapshot_every, mesh=mesh)


def fit_kinematic(key, params, state, cfg, pc_list, flow_ctx=None,
                  log_every=None, checkpoint_dir=None, snapshot_cb=None,
                  snapshot_every=None, mesh=None):
    """Projection-stage fit (reference `--model=kinematic`): same loss stack,
    Adam over all params at trans_lr (run_robot.py:150-151)."""
    return fit(key, _kinematic_forward_fn, params, cfg, state.cano_pc,
               pc_list, flow_ctx=flow_ctx, fwd_ctx=state,
               two_group_opt=False, log_every=log_every,
               checkpoint_dir=checkpoint_dir, snapshot_cb=snapshot_cb,
               snapshot_every=snapshot_every, mesh=mesh)

#!/usr/bin/env python
"""Per-component device-time breakdown of the relaxation fit step (one
session, back-to-back — never compare numbers from this script against
another run's; the chip's session-to-session variance is 2-4x, BASELINE.md).

Times, at nao scale (T-1=9, N=4096, P=20):
  * model forward+backward alone (loss = sum(pc_trans^2))
  * recon-only step (bidirectional Chamfer)
  * flow-only step (blend_anchor_motion + masked flow loss)
  * recon+flow step (the bench's recon phase)
  * assign(+flow) inner step and the 1024^2 LAP solve
  * kernel microbenches: nn1_coords, blend3, scatter-add (chamfer reverse
    backward), one-hot row select

Each region is a jitted lax.scan of REPS iterations (one dispatch), fenced
by a host transfer. Run: PYTHONPATH=/root/.axon_site python scripts/profile_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 50


def fence(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def timed(name, fn, *args, reps=REPS):
    out = fn(*args)
    fence(out)  # warm/compile
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:34s} {dt:8.3f} ms/iter")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import init_backend_or_die, load_workload

    init_backend_or_die()
    cano, pc_list, complete = load_workload()
    cano = jnp.asarray(cano, jnp.float32)
    pc_list = jnp.asarray(pc_list, jnp.float32)
    t = complete.shape[0]

    from reart_tpu.models.base_model import base_forward, init_base_params
    from reart_tpu.train.engine import (
        FitConfig, FlowContext, build_assign_context, make_fit_fns,
        _base_forward_fn,
    )

    key = jax.random.PRNGKey(0)
    params = init_base_params(key, num_parts=20, pose_len=t - 1)
    flow_ctx = FlowContext.from_lists(
        [complete[i] for i in range(t - 1)],
        [complete[i + 1] - complete[i] for i in range(t - 1)],
    )

    # --- full-step scans through the engine's own compiled programs -------
    def engine_scan(use_flow, use_assign=False, name=""):
        cfg = FitConfig(n_iter=REPS * 4, use_flow_loss=use_flow,
                        use_assign_loss=use_assign, assign_iter=0,
                        assign_gap=5, downsample=4, dispatch_chunk=REPS)
        recon_scan, assign_scan = make_fit_fns(_base_forward_fn, cfg, True)
        tx_params = init_base_params(jax.random.PRNGKey(1), num_parts=20,
                                     pose_len=t - 1)
        from reart_tpu.train.engine import make_optimizer

        tx = make_optimizer(tx_params, cfg, two_groups=True)
        opt_state = tx.init(tx_params)
        cano_idx = jnp.asarray(0, jnp.int32)
        fctx = flow_ctx if use_flow else None
        if use_assign:
            actx = build_assign_context(cano, pc_list, cfg.downsample)
            price = jnp.zeros(actx.pc_tgt.shape[:2], jnp.float32)
            outer_its = jnp.arange(REPS // 5) * 5

            def run():
                (p, o, pr), h = assign_scan(
                    tx_params, opt_state, price, outer_its, key, cano,
                    pc_list, fctx, None, cano_idx, actx)
                return h["total_loss"]

            return timed(name, run, reps=(REPS // 5) * 5)

        its = jnp.arange(REPS)

        def run():
            (p, o), h = recon_scan(tx_params, opt_state, its, REPS * 4, key,
                                   cano, pc_list, fctx, None, cano_idx)
            return h["total_loss"]

        return timed(name, run)

    # model fwd+bwd only: same scan structure, trivial loss
    tx = optax.adam(1e-2)
    opt_state0 = tx.init(params)

    @jax.jit
    def fwd_only_scan(params, opt_state, cano):
        def body(carry, it):
            p, o = carry

            def loss_fn(p):
                pc_trans, seg, trans = base_forward(
                    p, cano, jax.random.fold_in(key, it), 1.0)
                return jnp.sum(pc_trans ** 2)

            l, g = jax.value_and_grad(loss_fn)(p)
            up, o = tx.update(g, o, p)
            return (optax.apply_updates(p, up), o), l

        return jax.lax.scan(body, (params, opt_state), jnp.arange(REPS))[1]

    t_fwd = timed("model fwd+bwd (trivial loss)", fwd_only_scan, params,
                  opt_state0, cano)
    t_recon = engine_scan(False, name="recon step")
    t_rf = engine_scan(True, name="recon+flow step")
    t_af = engine_scan(True, use_assign=True, name="assign+flow step (amort.)")

    print(f"{'-> chamfer share':34s} {t_recon - t_fwd:8.3f}")
    print(f"{'-> flow share':34s} {t_rf - t_recon:8.3f}")

    # --- kernel microbenches ----------------------------------------------
    from reart_tpu.ops.pallas_nn import blend3_pallas, nn1_coords_pallas

    q = pc_list  # (9, 4096, 3)
    r = jnp.broadcast_to(cano[None], q.shape)

    nn1 = jax.jit(lambda a, b: nn1_coords_pallas(a, b)[0])

    @jax.jit
    def nn1_scan(a, b):
        def body(c, _):
            d, i, co = nn1_coords_pallas(a + c * 0.0, b)
            return c + jnp.sum(d) * 0.0, jnp.sum(d)

        return jax.lax.scan(body, 0.0, None, length=REPS)[1]

    timed("nn1_coords (9,4096,4096)", nn1_scan, q, r)

    @jax.jit
    def blend_scan(a, b, f):
        def body(c, _):
            o, md, fd = blend3_pallas(a + c * 0.0, b, f)
            return c + jnp.sum(o) * 0.0, jnp.sum(o)

        return jax.lax.scan(body, 0.0, None, length=REPS)[1]

    timed("blend3 (9,4096 vs 4096)", blend_scan, q, flow_ctx.pc_ref,
          flow_ctx.flow_ref)

    # fused-bidirectional vs two-pass chamfer, value+grad w.r.t. src
    from reart_tpu.ops.distance import (
        _nn_bidir_sqdist_with_idx, _nn_sqdist_with_idx)

    def loss_fused(src, tgt):
        (fd, _), (bd, _) = _nn_bidir_sqdist_with_idx(src, tgt)
        return jnp.sum(fd) + jnp.sum(bd)

    def loss_twopass(src, tgt):
        fd, _ = _nn_sqdist_with_idx(src, tgt)
        bd, _ = _nn_sqdist_with_idx(tgt, src)
        return jnp.sum(fd) + jnp.sum(bd)

    def chamfer_scan(loss):
        @jax.jit
        def run(src, tgt):
            def body(c, _):
                l, g = jax.value_and_grad(loss)(src + c, tgt)
                return c + jnp.sum(g) * 0.0, l

            return jax.lax.scan(body, 0.0, None, length=REPS)[1]

        return run

    timed("chamfer v+g fused bidir", chamfer_scan(loss_fused), q, r)
    timed("chamfer v+g two-pass", chamfer_scan(loss_twopass), q, r)

    # chamfer reverse-direction backward: the vmap'd scatter-add
    idx = jax.random.randint(key, (9, 4096), 0, 4096)
    resid = jax.random.normal(key, (9, 4096, 3), jnp.float32)

    @jax.jit
    def scatter_scan(idx, resid):
        def body(c, _):
            g = jax.vmap(
                lambda i, rr: jnp.zeros((4096, 3), rr.dtype).at[i].add(rr)
            )(idx, resid + c)
            return c + jnp.sum(g) * 0.0, jnp.sum(g)

        return jax.lax.scan(body, 0.0, None, length=REPS)[1]

    timed("scatter-add bwd (9,4096,3)", scatter_scan, idx, resid)

    # one-hot row select (assign loss select at 1024 rows)
    src_idx = jax.random.randint(key, (1024,), 0, 4096)

    @jax.jit
    def select_scan(src_idx, pts):
        def body(c, _):
            oh = jax.nn.one_hot(src_idx, 4096, dtype=pts.dtype)
            sel = jnp.einsum("mn,tnc->tmc", oh, pts + c)
            return c + jnp.sum(sel) * 0.0, jnp.sum(sel)

        return jax.lax.scan(body, 0.0, None, length=REPS)[1]

    timed("one-hot select 1024 of 4096", select_scan, src_idx, q)

    from reart_tpu.ops.assignment import auction_lap
    from reart_tpu.ops.distance import pairwise_sqdist

    fps_src = q[:, :1024]
    fps_tgt = r[:, :1024] + 0.01

    @jax.jit
    def lap_once(s, tg):
        cost = jnp.sqrt(pairwise_sqdist(s, tg))
        perm, price = auction_lap(cost, eps_min=1e-4, num_scales=2,
                                  scale_factor=50.0, max_sweeps=100,
                                  return_price=True)
        return jnp.sum(price)

    timed("LAP 1024^2 (resident, full)", lap_once, fps_src, fps_tgt, reps=1)


if __name__ == "__main__":
    main()

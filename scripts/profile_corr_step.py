#!/usr/bin/env python
"""Per-region device-time breakdown of the corr-trainer step (one session,
back-to-back — BASELINE.md forbids cross-session perf comparison).

Regions, at the bench workload (B=4, N=1024, frames from random clouds):
  * synth_pair alone (vmapped data generation)
  * backbone forward (2B clouds, bn_mode=batch)
  * corr_info_nce forward (resampled radius-gated recipe)
  * value_and_grad of the loss
  * the full training body (grad + adam + BN EMA)
each in f32 and bf16 where the compute dtype applies. Every region is a
jitted lax.scan of REPS iterations in ONE dispatch, fenced by host transfer.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_corr_step.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


def main():
    import jax
    import jax.numpy as jnp
    import optax

    import reart_tpu  # noqa: F401
    from reart_tpu.models.pointnet2 import (apply_pointnet2msg2,
                                            init_pointnet2msg2)
    from reart_tpu.train.corr import (CorrTrainConfig, apply_bn_ema,
                                      corr_info_nce, synth_pair)

    cfg = CorrTrainConfig(steps=REPS, batch=4, n_points=1024)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(8, 4096, 3).astype(np.float32))
    params = init_pointnet2msg2(jax.random.PRNGKey(0))
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)
    keys = jax.random.split(jax.random.PRNGKey(1), REPS)

    def fence(x):
        return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def timed(name, fn, *args):
        out = fn(*args)
        fence(out)
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:40s} {dt:8.3f} ms/iter", flush=True)
        return dt

    # region 1: data generation
    @jax.jit
    def gen_only(keys):
        def body(c, key):
            pk = jax.random.split(key, cfg.batch)
            src, tgt, gt, sc = jax.vmap(
                lambda k: synth_pair(k, frames, cfg))(pk)
            return c + jnp.sum(src) + jnp.sum(tgt), 0.0
        c, _ = jax.lax.scan(body, 0.0, keys)
        return c

    timed("synth_pair (vmapped, B=4)", gen_only, keys)

    # Pre-generate REPS distinct batches and scan OVER them: with constant
    # inputs XLA hoists the loop-invariant forward/grad out of the scan
    # body, so the per-iteration region times were a mirage (first capture:
    # value_and_grad "3.3 ms" vs a 41.8 ms full step — the grad had been
    # computed once for 20 reps).
    @jax.jit
    def gen_batches(keys):
        def one(key):
            pk = jax.random.split(key, cfg.batch)
            return jax.vmap(lambda k: synth_pair(k, frames, cfg))(pk)
        return jax.vmap(one)(keys)

    src_r, tgt_r, gt_r, scale_r = gen_batches(keys)  # (REPS, B, ...)
    both_r = jnp.concatenate([src_r, tgt_r], 1)  # (REPS, 2B, N, 3)

    for dt_name in ("float32", "bfloat16"):
        dtj = jnp.dtype(dt_name)

        @jax.jit
        def fwd_only(params, both_r):
            def body(c, both):
                cp = (params if dtj == jnp.float32 else
                      jax.tree_util.tree_map(lambda x: x.astype(dtj), params))
                f = apply_pointnet2msg2(cp, both.astype(dtj),
                                        bn_mode="batch")
                return c + jnp.sum(f.astype(jnp.float32)), 0.0
            c, _ = jax.lax.scan(body, 0.0, both_r)
            return c

        timed(f"backbone forward 2B=8 ({dt_name})", fwd_only, params, both_r)

        @jax.jit
        def loss_only(params, batches):
            def body(c, b):
                src, tgt, gt_pos, scale = b
                l, _ = corr_info_nce(params, src, tgt, cfg.temperature,
                                     dt_name, gt_pos, cfg.pos_radius,
                                     cfg.neg_radius, scale)
                return c + l, 0.0
            c, _ = jax.lax.scan(body, 0.0, batches)
            return c

        timed(f"corr_info_nce fwd ({dt_name})", loss_only,
              params, (src_r, tgt_r, gt_r, scale_r))

        @jax.jit
        def grad_only(params, batches):
            def body(c, b):
                src, tgt, gt_pos, scale = b
                (l, _), g = jax.value_and_grad(
                    corr_info_nce, has_aux=True)(
                    params, src, tgt, cfg.temperature, dt_name,
                    gt_pos, cfg.pos_radius, cfg.neg_radius, scale)
                return c + l + jax.tree_util.tree_reduce(
                    lambda a, b2: a + jnp.sum(b2), g, 0.0), 0.0
            c, _ = jax.lax.scan(body, 0.0, batches)
            return c

        timed(f"value_and_grad ({dt_name})", grad_only,
              params, (src_r, tgt_r, gt_r, scale_r))

        @jax.jit
        def full_body(params, opt_state, keys):
            def body(carry, key):
                params, opt_state = carry
                pk = jax.random.split(key, cfg.batch)
                src, tgt, gt, sc = jax.vmap(
                    lambda k: synth_pair(k, frames, cfg))(pk)
                (l, stats), g = jax.value_and_grad(
                    corr_info_nce, has_aux=True)(
                    params, src, tgt, cfg.temperature, dt_name,
                    gt, cfg.pos_radius, cfg.neg_radius, sc)
                up, opt_state = tx.update(g, opt_state, params)
                params = optax.apply_updates(params, up)
                params = apply_bn_ema(params, stats, cfg.bn_momentum)
                return (params, opt_state), l
            (params, opt_state), ls = jax.lax.scan(
                body, (params, opt_state), keys)
            return ls

        timed(f"FULL step ({dt_name})", full_body, params, opt_state, keys)


if __name__ == "__main__":
    main()

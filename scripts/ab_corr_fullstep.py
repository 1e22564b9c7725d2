#!/usr/bin/env python
"""Honest bisect of the corr-trainer FULL step (one session, back-to-back).

Why: profile_corr_step.py's fixed-input grad region is HOISTABLE — with
loop-invariant params AND data, XLA may move the whole backward out of the
scan, so its ms/iter is not evidence (measured: custom-VJP tail "3.8 ms"
grad vs 42 ms FULL step). Every region here feeds FRESH data each scan
iteration, so nothing heavy is loop-invariant.

Regions (REPS iterations in ONE dispatch, host-transfer fenced):
  fwd_fresh       loss forward only
  grad_fresh      value_and_grad, grads summed into the carry (no opt)
  grad_adam       + adam update + BN EMA (params carried) == the real step
  full_synth      the real training body incl. in-scan synth_pair
  full_oldtail    full_synth with the round-2 autodiff optax-CE tail
The old/new tail comparison at the SAME region is the honest custom-VJP A/B.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_corr_fullstep.py
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

    # pre-generated fresh data for the non-synth regions: one batch per rep
    def gen(key):
        pk = jax.random.split(key, cfg.batch)
        return jax.vmap(lambda k: synth_pair(k, frames, cfg))(pk)

    data = jax.jit(jax.vmap(gen))(keys)  # each leaf (REPS, B, ...)
    jax.block_until_ready(data)

    def fence(x):
        return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def timed(name, fn, *args):
        out = fn(*args)
        fence(out)
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:44s} {dt:8.3f} ms/iter", flush=True)
        return dt

    # ---- round-2 autodiff tail (optax integer-label CE), inlined from the
    # pre-custom-VJP corr_info_nce (git rev 05c1f19^ shape) --------------
    def loss_oldtail(p, src, tgt, gt_pos, scale):
        ce = optax.softmax_cross_entropy_with_integer_labels
        b, n = src.shape[0], src.shape[1]
        stats = []
        both = jnp.concatenate([src, tgt], 0)
        feats = apply_pointnet2msg2(p, both, bn_mode="batch",
                                    stats_out=stats)
        feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True)
                         + 1e-8)
        f1, f2 = feats[:b], feats[b:]
        logits = jnp.einsum("bnd,bmd->bnm", f1, f2) / cfg.temperature
        d2 = jnp.sum((gt_pos[:, :, None] - tgt[:, None]) ** 2, -1)
        s = jnp.asarray(scale, jnp.float32)
        pos_r2 = (cfg.pos_radius * s)[:, None] ** 2
        neg_r2 = (cfg.neg_radius * s)[:, None, None] ** 2

        def gated_ce(lg, d2):
            pos = jnp.argmin(d2, axis=-1)
            dmin = jnp.min(d2, axis=-1)
            valid = (dmin < pos_r2).astype(jnp.float32)
            is_pos = jax.nn.one_hot(pos, d2.shape[-1], dtype=jnp.bool_)
            near = (d2 < neg_r2) & ~is_pos
            lg = jnp.where(near, -1e9, lg)
            return jnp.sum(ce(lg, pos) * valid) / jnp.maximum(
                jnp.sum(valid), 1.0)

        loss = 0.5 * (gated_ce(logits, d2) +
                      gated_ce(jnp.swapaxes(logits, 1, 2),
                               jnp.swapaxes(d2, 1, 2)))
        return loss, stats

    def loss_new(p, src, tgt, gt_pos, scale):
        return corr_info_nce(p, src, tgt, cfg.temperature, "float32",
                             gt_pos, cfg.pos_radius, cfg.neg_radius, scale)

    # ---- regions --------------------------------------------------------
    @jax.jit
    def fwd_fresh(params, data):
        def body(c, d):
            src, tgt, gt, sc = d
            l, _ = loss_new(params, src, tgt, gt, sc)
            return c + l, 0.0
        c, _ = jax.lax.scan(body, 0.0, data)
        return c

    def make_grad_fresh(loss_fn):
        @jax.jit
        def grad_fresh(params, data):
            def body(c, d):
                src, tgt, gt, sc = d
                (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, src, tgt, gt, sc)
                return c + l + jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b), g, 0.0), 0.0
            c, _ = jax.lax.scan(body, 0.0, data)
            return c
        return grad_fresh

    def make_grad_adam(loss_fn):
        @jax.jit
        def grad_adam(params, opt_state, data):
            def body(carry, d):
                params, opt_state = carry
                src, tgt, gt, sc = d
                (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, src, tgt, gt, sc)
                up, opt_state = tx.update(g, opt_state, params)
                params = optax.apply_updates(params, up)
                params = apply_bn_ema(params, stats, cfg.bn_momentum)
                return (params, opt_state), l
            (params, opt_state), ls = jax.lax.scan(
                body, (params, opt_state), data)
            return ls
        return grad_adam

    def make_full_synth(loss_fn):
        @jax.jit
        def full_synth(params, opt_state, keys):
            def body(carry, key):
                params, opt_state = carry
                src, tgt, gt, sc = gen(key)
                (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, src, tgt, gt, sc)
                up, opt_state = tx.update(g, opt_state, params)
                params = optax.apply_updates(params, up)
                params = apply_bn_ema(params, stats, cfg.bn_momentum)
                return (params, opt_state), l
            (params, opt_state), ls = jax.lax.scan(
                body, (params, opt_state), keys)
            return ls
        return full_synth

    timed("fwd_fresh (new tail)", fwd_fresh, params, data)
    timed("grad_fresh (new tail)", make_grad_fresh(loss_new), params, data)
    timed("grad_fresh (OLD autodiff tail)",
          make_grad_fresh(loss_oldtail), params, data)
    timed("grad_adam (new tail)", make_grad_adam(loss_new),
          params, opt_state, data)
    timed("grad_adam (OLD autodiff tail)", make_grad_adam(loss_oldtail),
          params, opt_state, data)
    timed("FULL synth+grad+adam (new tail)", make_full_synth(loss_new),
          params, opt_state, keys)
    timed("FULL synth+grad+adam (OLD autodiff tail)",
          make_full_synth(loss_oldtail), params, opt_state, keys)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ONE-session bisect of the corr-step backward tail (grad of backbone+
normalize+einsum is 3.4 ms; grad of the full gated InfoNCE is 26.6 ms;
the CE *form* is ruled out — scripts/ab_ce_form.py measured 1.01x).

Arms (each a REPS-scan jit, grad wrt params, fenced by host transfer):
  0. mean(logits)                       [baseline, known ~3.4 ms]
  1. identity-recipe CE (eye labels, no gating, both directions)
  2. gated CE with the gate tensors (is_pos, near, valid) PRECOMPUTED
     outside the graph and passed as constants
  3. full gated_ce (d2/argmin/one_hot inside the graph)
Also prints XLA cost_analysis flops/bytes for arms 0 and 3.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_tail_bisect.py
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

    import reart_tpu  # noqa: F401
    from reart_tpu.models.pointnet2 import (apply_pointnet2msg2,
                                            init_pointnet2msg2)
    from reart_tpu.train.corr import CorrTrainConfig, synth_pair

    cfg = CorrTrainConfig(steps=REPS, batch=4, n_points=1024)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(8, 4096, 3).astype(np.float32))
    params = init_pointnet2msg2(jax.random.PRNGKey(0))
    pk = jax.random.split(jax.random.PRNGKey(1), cfg.batch)
    src, tgt, gt_pos, scale = jax.vmap(
        lambda k: synth_pair(k, frames, cfg))(pk)
    both = jnp.concatenate([src, tgt], 0)
    b = src.shape[0]

    def fence(x):
        return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def timed(name, fn, *args):
        out = fn(*args)
        fence(out)
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:52s} {dt:8.3f} ms/iter", flush=True)
        return dt

    def scan_grad(loss_fn):
        @jax.jit
        def run(params):
            def body(c, _):
                g = jax.grad(loss_fn)(params)
                return c + jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b), g, 0.0), 0.0
            c, _ = jax.lax.scan(body, 0.0, None, length=REPS)
            return c
        return run

    def to_logits(p):
        f = apply_pointnet2msg2(p, both, bn_mode="batch")
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
        return jnp.einsum("bnd,bmd->bnm", f[:b], f[b:]) / cfg.temperature

    def ce(lg, is_label):
        lse = jax.nn.logsumexp(lg, axis=-1)
        return lse - jnp.sum(jnp.where(is_label, lg, 0.0), axis=-1)

    # gate tensors, host-precomputed (identical both directions' structure)
    d2 = jnp.sum((gt_pos[:, :, None] - tgt[:, None]) ** 2, -1)  # (B,N,M)
    s = jnp.asarray(scale, jnp.float32)
    pos_r2 = (cfg.pos_radius * s)[:, None] ** 2
    neg_r2 = (cfg.neg_radius * s)[:, None, None] ** 2

    def gates(d2):
        pos = jnp.argmin(d2, axis=-1)
        valid = (jnp.min(d2, axis=-1) < pos_r2).astype(jnp.float32)
        is_pos = jax.nn.one_hot(pos, d2.shape[-1], dtype=jnp.bool_)
        near = (d2 < neg_r2) & ~is_pos
        return is_pos, near, valid

    g_fwd = jax.device_put(gates(d2))
    g_bwd = jax.device_put(gates(jnp.swapaxes(d2, 1, 2)))

    def gated_pre(lg, g):
        is_pos, near, valid = g
        lg = jnp.where(near, -1e9, lg)
        return jnp.sum(ce(lg, is_pos) * valid) / jnp.maximum(
            jnp.sum(valid), 1.0)

    def gated_full(lg, d2):
        is_pos, near, valid = gates(d2)
        lg = jnp.where(near, -1e9, lg)
        return jnp.sum(ce(lg, is_pos) * valid) / jnp.maximum(
            jnp.sum(valid), 1.0)

    arms = [
        ("0 mean(logits)", lambda p: jnp.mean(to_logits(p))),
        ("1 + identity CE both dirs", lambda p: (
            lambda lg: 0.5 * (
                jnp.mean(ce(lg, jnp.eye(lg.shape[1], dtype=jnp.bool_)[None]))
                + jnp.mean(ce(jnp.swapaxes(lg, 1, 2),
                              jnp.eye(lg.shape[1], dtype=jnp.bool_)[None]))
            ))(to_logits(p))),
        ("2 + gated CE, gates precomputed", lambda p: (
            lambda lg: 0.5 * (gated_pre(lg, g_fwd) +
                              gated_pre(jnp.swapaxes(lg, 1, 2), g_bwd))
        )(to_logits(p))),
        ("3 full gated_ce (d2 in graph)", lambda p: (
            lambda lg: 0.5 * (gated_full(lg, d2) +
                              gated_full(jnp.swapaxes(lg, 1, 2),
                                         jnp.swapaxes(d2, 1, 2)))
        )(to_logits(p))),
    ]
    for name, fn in arms:
        timed(f"grad: {name}", scan_grad(fn), params)

    for name, fn in (("arm0", arms[0][1]), ("arm3", arms[3][1])):
        c = jax.jit(lambda p: jax.grad(fn)(p)).lower(params) \
            .compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        print(f"cost[{name}]: flops={c.get('flops', 0):.3e} "
              f"bytes={c.get('bytes accessed', 0):.3e}", flush=True)


if __name__ == "__main__":
    main()

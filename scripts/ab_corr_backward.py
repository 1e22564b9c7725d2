#!/usr/bin/env python
"""ONE-session bisect of the corr-step backward cost (fwd 2.3 ms vs
value_and_grad 28 ms, scripts/profile_corr_step.py; scatter-backward ruled
out by scripts/ab_gather_grad.py). Times jax.grad of nested sub-losses to
locate where the 12x lives.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_corr_backward.py
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
    from reart_tpu.train.corr import CorrTrainConfig, corr_info_nce, synth_pair

    cfg = CorrTrainConfig(steps=REPS, batch=4, n_points=1024)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(8, 4096, 3).astype(np.float32))
    params = init_pointnet2msg2(jax.random.PRNGKey(0))
    pk = jax.random.split(jax.random.PRNGKey(1), cfg.batch)
    src, tgt, gt_pos, scale = jax.vmap(
        lambda k: synth_pair(k, frames, cfg))(pk)
    both = jnp.concatenate([src, tgt], 0)

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

    # 1. backbone only, batch BN (the training config)
    timed("grad: backbone sum, bn=batch",
          scan_grad(lambda p: jnp.sum(
              apply_pointnet2msg2(p, both, bn_mode="batch"))), params)

    # 2. backbone only, running BN (inference-mode normalization)
    timed("grad: backbone sum, bn=running",
          scan_grad(lambda p: jnp.sum(
              apply_pointnet2msg2(p, both, bn_mode="running"))), params)

    # 3. backbone + normalize + logits einsum + plain mean (no gating)
    def to_logits(p):
        f = apply_pointnet2msg2(p, both, bn_mode="batch")
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
        b = src.shape[0]
        return jnp.einsum("bnd,bmd->bnm", f[:b], f[b:]) / cfg.temperature

    timed("grad: + normalize + logits einsum",
          scan_grad(lambda p: jnp.mean(to_logits(p))), params)

    # 4. the full InfoNCE
    timed("grad: full corr_info_nce",
          scan_grad(lambda p: corr_info_nce(
              p, src, tgt, cfg.temperature, "float32", gt_pos,
              cfg.pos_radius, cfg.neg_radius, scale)[0]), params)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ONE-session A/B: corr-trainer full step with the backbone gathers'
scatter-add backward (XLA default for take_along_axis) vs the one-hot
matmul custom VJP (ops/sampling.index_points_mm). Also checks the two
arms' loss and grads agree.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_gather_grad.py
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
    import reart_tpu.models.pointnet2 as PN
    from reart_tpu.models.pointnet2 import init_pointnet2msg2
    from reart_tpu.ops import index_points, index_points_mm
    from reart_tpu.train.corr import (CorrTrainConfig, apply_bn_ema,
                                      corr_info_nce, synth_pair)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(8, 4096, 3).astype(np.float32))
    params = init_pointnet2msg2(jax.random.PRNGKey(0))

    def fence(x):
        return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def make_step(dt_name):
        cfg = CorrTrainConfig(steps=REPS, batch=4, n_points=1024,
                              compute_dtype=dt_name)
        tx = optax.adam(cfg.lr)

        def full(params, opt_state, keys):
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
            return params, ls

        return tx, full

    keys = jax.random.split(jax.random.PRNGKey(1), REPS)

    for dt_name in ("float32", "bfloat16"):
        tx, full = make_step(dt_name)
        opt_state = tx.init(params)
        results = {}
        times = {}
        for arm, gather in (("scatter", index_points),
                            ("matmul", index_points_mm)):
            PN.index_points_mm = gather
            fn = jax.jit(full)
            p_out, ls = fn(params, opt_state, keys)
            fence(ls)
            t0 = time.perf_counter()
            p_out, ls = fn(params, opt_state, keys)
            fence(ls)
            times[arm] = (time.perf_counter() - t0) / REPS * 1e3
            results[arm] = (np.asarray(ls),
                            np.asarray(jax.tree_util.tree_leaves(p_out)[0]))
        PN.index_points_mm = index_points_mm
        np.testing.assert_allclose(results["scatter"][0],
                                   results["matmul"][0],
                                   rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(results["scatter"][1],
                                   results["matmul"][1],
                                   rtol=2e-3, atol=1e-5)
        print(f"{dt_name}: scatter {times['scatter']:7.3f} ms/step  "
              f"matmul {times['matmul']:7.3f} ms/step  "
              f"speedup {times['scatter'] / times['matmul']:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()

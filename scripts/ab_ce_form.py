#!/usr/bin/env python
"""ONE-session A/B of the InfoNCE cross-entropy form on the corr-step
backward (BASELINE.md forbids cross-session perf comparison).

Old: optax.softmax_cross_entropy_with_integer_labels — gathers the label
logit with take_along_axis, whose VJP scatters into the (B, N, M) logits.
New (reart_tpu.train.corr.corr_info_nce): logsumexp minus a one-hot-masked
sum — backward is a broadcast select, no scatter. Values are identical.

Both arms rebuild the FULL gated InfoNCE tail on the same backbone so the
only difference is the CE form.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_ce_form.py
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
    from reart_tpu.train.corr import (CorrTrainConfig, corr_info_nce,
                                      synth_pair)

    cfg = CorrTrainConfig(steps=REPS, batch=4, n_points=1024)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(8, 4096, 3).astype(np.float32))
    params = init_pointnet2msg2(jax.random.PRNGKey(0))
    pk = jax.random.split(jax.random.PRNGKey(1), cfg.batch)
    src, tgt, gt_pos, scale = jax.vmap(
        lambda k: synth_pair(k, frames, cfg))(pk)

    def fence(x):
        return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def timed(name, fn, *args):
        out = fn(*args)
        fence(out)
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:48s} {dt:8.3f} ms/iter", flush=True)
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

    def old_form_loss(p):
        """Gated InfoNCE with optax's integer-label CE (the pre-fix tail)."""
        b = src.shape[0]
        stats = []
        feats = apply_pointnet2msg2(p, jnp.concatenate([src, tgt], 0),
                                    bn_mode="batch", stats_out=stats)
        feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True)
                         + 1e-8)
        logits = jnp.einsum("bnd,bmd->bnm", feats[:b], feats[b:]) \
            / cfg.temperature
        d2 = jnp.sum((gt_pos[:, :, None] - tgt[:, None]) ** 2, -1)
        s = jnp.asarray(scale, jnp.float32)
        pos_r2 = (cfg.pos_radius * s)[:, None] ** 2
        neg_r2 = (cfg.neg_radius * s)[:, None, None] ** 2
        ce = optax.softmax_cross_entropy_with_integer_labels

        def gated(lg, d2):
            pos = jnp.argmin(d2, axis=-1)
            dmin = jnp.min(d2, axis=-1)
            valid = (dmin < pos_r2).astype(jnp.float32)
            is_pos = jax.nn.one_hot(pos, d2.shape[-1], dtype=jnp.bool_)
            near = (d2 < neg_r2) & ~is_pos
            lg = jnp.where(near, -1e9, lg)
            return jnp.sum(ce(lg, pos) * valid) / jnp.maximum(
                jnp.sum(valid), 1.0)

        return 0.5 * (gated(logits, d2) +
                      gated(jnp.swapaxes(logits, 1, 2),
                            jnp.swapaxes(d2, 1, 2)))

    def new_form_loss(p):
        return corr_info_nce(p, src, tgt, cfg.temperature, "float32",
                             gt_pos, cfg.pos_radius, cfg.neg_radius,
                             scale)[0]

    # value agreement first (same session, same inputs)
    lo = float(old_form_loss(params))
    ln = float(new_form_loss(params))
    print(f"loss agreement: old {lo:.6f} new {ln:.6f} "
          f"(|diff| {abs(lo - ln):.2e})", flush=True)

    t_old = timed("grad: gated InfoNCE, optax integer-label CE",
                  scan_grad(old_form_loss), params)
    t_new = timed("grad: gated InfoNCE, masked-sum CE", scan_grad(
        new_form_loss), params)
    print(f"speedup {t_old / t_new:.2f}x", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ONE-session locate+fix for the corr-step backward pathology.

scripts/ab_tail_bisect.py measured: grad of mean(logits) 3.4 ms, grad of
ANY real CE tail 26 ms — at IDENTICAL XLA cost_analysis flops/bytes
(1.3e10 / 1.6e9 per grad). Same work, 8x slower: the dense data-dependent
d_logits triggers a bad schedule, not extra compute.

Arms:
  A. tail-alone grad wrt (f1, f2), XLA autodiff      [locates the HLO]
  B. tail-alone grad wrt (f1, f2), hand custom_vjp   [the fix, isolated]
  C. full param grad, current corr_info_nce          [26 ms baseline]
  D. full param grad, custom-vjp tail                [the fix, end-to-end]
plus value+grad agreement checks A vs B and C vs D.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_ce_tail_vjp.py
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
    b, n = src.shape[0], src.shape[1]
    tau = cfg.temperature

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

    # ---- gates (param-independent), both directions ----
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

    gf = gates(d2)
    gb = gates(jnp.swapaxes(d2, 1, 2))

    # ---- reference tail (XLA autodiff), matches corr_info_nce's ----
    def ce(lg, is_label):
        lse = jax.nn.logsumexp(lg, axis=-1)
        return lse - jnp.sum(jnp.where(is_label, lg, 0.0), axis=-1)

    def one_dir(lg, g):
        is_pos, near, valid = g
        lg = jnp.where(near, -1e9, lg)
        return jnp.sum(ce(lg, is_pos) * valid) / jnp.maximum(
            jnp.sum(valid), 1.0)

    def tail_xla(f1, f2):
        lg = jnp.einsum("bnd,bmd->bnm", f1, f2) / tau
        return 0.5 * (one_dir(lg, gf) + one_dir(jnp.swapaxes(lg, 1, 2), gb))

    # ---- custom-vjp tail: identical values, hand-written backward ----
    @jax.custom_vjp
    def tail_vjp(f1, f2, gf, gb):
        return tail_xla_g(f1, f2, gf, gb)

    def tail_xla_g(f1, f2, gf, gb):
        lg = jnp.einsum("bnd,bmd->bnm", f1, f2) / tau
        return 0.5 * (one_dir(lg, gf) + one_dir(jnp.swapaxes(lg, 1, 2), gb))

    def _fwd(f1, f2, gf, gb):
        return tail_xla_g(f1, f2, gf, gb), (f1, f2, gf, gb)

    def _dlg(lg, g):
        """d loss_dir / d lg for one direction (loss already /den)."""
        is_pos, near, valid = g
        lgm = jnp.where(near, -1e9, lg)
        p = jax.nn.softmax(lgm, axis=-1)
        den = jnp.maximum(jnp.sum(valid), 1.0)
        w = (valid / den)[..., None]
        # masked logits pass no gradient; is_pos is never masked
        return jnp.where(near, 0.0, (p - is_pos) * w)

    def _bwd(res, g):
        f1, f2, gf, gb = res
        lg = jnp.einsum("bnd,bmd->bnm", f1, f2) / tau
        dlg = 0.5 * (_dlg(lg, gf) +
                     jnp.swapaxes(_dlg(jnp.swapaxes(lg, 1, 2), gb), 1, 2))
        dlg = dlg * (g / tau)
        df1 = jnp.einsum("bnm,bmd->bnd", dlg, f2)
        df2 = jnp.einsum("bnm,bnd->bmd", dlg, f1)
        zf = lambda t: jax.tree_util.tree_map(
            lambda x: (np.zeros(x.shape, jax.dtypes.float0)
                       if not jnp.issubdtype(x.dtype, jnp.floating)
                       else jnp.zeros_like(x)), t)
        return df1, df2, zf(gf), zf(gb)

    tail_vjp.defvjp(_fwd, _bwd)

    # ---- feats for the tail-alone arms ----
    feats = apply_pointnet2msg2(params, both, bn_mode="batch")
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    f1 = jax.device_put(feats[:b])
    f2 = jax.device_put(feats[b:])

    # agreement
    va = float(tail_xla(f1, f2))
    vb = float(tail_vjp(f1, f2, gf, gb))
    ga = jax.grad(lambda a, c: tail_xla(a, c), argnums=(0, 1))(f1, f2)
    gb_ = jax.grad(lambda a, c: tail_vjp(a, c, gf, gb),
                   argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb_[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb_[1]),
                               rtol=1e-4, atol=1e-6)
    print(f"tail value agreement: {va:.6f} vs {vb:.6f}; grads match",
          flush=True)

    def scan_grad_f(loss_fn):
        @jax.jit
        def run(f1, f2):
            def body(c, _):
                g1, g2 = jax.grad(loss_fn, argnums=(0, 1))(f1, f2)
                return c + jnp.sum(g1) + jnp.sum(g2), 0.0
            c, _ = jax.lax.scan(body, 0.0, None, length=REPS)
            return c
        return run

    timed("A tail-alone grad (XLA autodiff)",
          scan_grad_f(tail_xla), f1, f2)
    timed("B tail-alone grad (custom vjp)",
          scan_grad_f(lambda a, c: tail_vjp(a, c, gf, gb)), f1, f2)

    # ---- full-loss arms ----
    def scan_grad_p(loss_fn):
        @jax.jit
        def run(params):
            def body(c, _):
                g = jax.grad(loss_fn)(params)
                return c + jax.tree_util.tree_reduce(
                    lambda a, b2: a + jnp.sum(b2), g, 0.0), 0.0
            c, _ = jax.lax.scan(body, 0.0, None, length=REPS)
            return c
        return run

    def full_current(p):
        return corr_info_nce(p, src, tgt, cfg.temperature, "float32",
                             gt_pos, cfg.pos_radius, cfg.neg_radius,
                             scale)[0]

    def full_vjp_tail(p):
        fs = apply_pointnet2msg2(p, both, bn_mode="batch")
        fs = fs / (jnp.linalg.norm(fs, axis=-1, keepdims=True) + 1e-8)
        return tail_vjp(fs[:b], fs[b:], gf, gb)

    lc = float(full_current(params))
    lv = float(full_vjp_tail(params))
    print(f"full-loss agreement: {lc:.6f} vs {lv:.6f}", flush=True)
    gc = jax.jit(jax.grad(full_current))(params)
    gv = jax.jit(jax.grad(full_vjp_tail))(params)
    fl = jax.tree_util.tree_leaves(gc)
    vl = jax.tree_util.tree_leaves(gv)
    for x, y in zip(fl, vl):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-3, atol=1e-5)
    print("full grads match", flush=True)

    tc = timed("C full param grad (current)", scan_grad_p(full_current),
               params)
    td = timed("D full param grad (custom-vjp tail)",
               scan_grad_p(full_vjp_tail), params)
    print(f"end-to-end speedup {tc / td:.2f}x", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Forward-gather + conv-precision A/B at the corr trainer's shapes.

The honest corr profile (round 5) puts the SA grouping gathers at 4.7 ms
and the scale-3 conv stack at 4.0 ms (~5 TFLOP/s — the package-global
'highest' matmul precision runs 6 MXU passes for f32). Candidates, all
scanned over REPS distinct inputs in one dispatch:

  gather A: take_along_axis (current index_points)
  gather B: chunked one-hot einsum, f32 HIGHEST (value-exact, MXU)
  gather C: flat jnp.take per batch row
  conv   A: highest (package default)
  conv   B: precision=DEFAULT (bf16 input rounding, f32 accumulate)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_gather_fwd.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    import reart_tpu  # noqa: F401

    def fence(x):
        return float(jnp.asarray(x).reshape(-1)[0])

    def timed(name, fn, *args):
        f = jax.jit(fn)
        fence(f(*args))
        t0 = time.perf_counter()
        out = f(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:52s} {dt:8.3f} ms/iter", flush=True)
        return dt

    def scan_over(fn):
        def run(xs):
            def body(c, x):
                return c + fn(x), 0.0
            c, _ = jax.lax.scan(body, 0.0, xs)
            return c
        return run

    b, n, s, k = 8, 1024, 512, 128
    key = jax.random.PRNGKey(0)
    tab3_r = jax.random.normal(key, (REPS, b, n, 3), jnp.float32)
    idx_r = jax.random.randint(jax.random.PRNGKey(1), (REPS, b, s * k), 0, n)

    def gather_a(pair):
        tab, idx = pair
        return jnp.sum(jnp.take_along_axis(tab, idx[..., None], axis=1))

    def onehot_gather(tab, idx, chunk=2048):
        nn_ = tab.shape[1]
        cols = jnp.arange(nn_, dtype=jnp.int32)
        m = idx.shape[1]
        out = 0.0
        for st in range(0, m, chunk):
            ic = jax.lax.dynamic_slice_in_dim(idx, st, chunk, axis=1)
            oh = (ic[..., None] == cols).astype(tab.dtype)
            out = out + jnp.sum(jnp.einsum(
                "bmn,bnc->bmc", oh, tab,
                precision=jax.lax.Precision.HIGHEST))
        return out

    def gather_b(pair):
        tab, idx = pair
        return onehot_gather(tab, idx.astype(jnp.int32))

    def gather_c(pair):
        tab, idx = pair
        flat = (idx + (jnp.arange(b, dtype=idx.dtype) * n)[:, None]
                ).reshape(-1)
        return jnp.sum(jnp.take(tab.reshape(-1, tab.shape[-1]), flat, axis=0))

    for name, fn in (("gather A take_along (B,65k,3)", gather_a),
                     ("gather B one-hot einsum f32-exact", gather_b),
                     ("gather C flat take", gather_c)):
        timed(name, scan_over(fn), (tab3_r, idx_r))

    # feature gather at SA2 shape: (B, 16k) rows of (B, 512, 320)
    tabf_r = jax.random.normal(jax.random.PRNGKey(2), (REPS, b, 512, 320),
                               jnp.float32)
    idxf_r = jax.random.randint(jax.random.PRNGKey(3), (REPS, b, 128 * 128),
                                0, 512)
    for name, fn in (("gatherF A take_along (B,16k,320)", gather_a),
                     ("gatherF B one-hot einsum f32-exact", gather_b),
                     ("gatherF C flat take", gather_c)):
        timed(name, scan_over(fn), (tabf_r, idxf_r))

    # conv stack precision: (B, S, K, 6) -> 64 -> 96 -> 128
    feat_r = jax.random.normal(jax.random.PRNGKey(4), (REPS, b, s, k, 6),
                               jnp.float32)
    ws = [jax.random.normal(jax.random.PRNGKey(10 + i), (ci, co), jnp.float32)
          * 0.05 for i, (ci, co) in enumerate(((6, 64), (64, 96), (96, 128)))]

    def convs(prec):
        def run(feat):
            for w in ws:
                feat = jax.nn.relu(
                    jax.lax.dot_general(feat, w, (((feat.ndim - 1,), (0,)),
                                                  ((), ())), precision=prec))
            return jnp.sum(jnp.max(feat, axis=2))
        return run

    timed("convs highest (package default)",
          scan_over(convs(jax.lax.Precision.HIGHEST)), feat_r)
    timed("convs DEFAULT (bf16 rounding)",
          scan_over(convs(jax.lax.Precision.DEFAULT)), feat_r)


if __name__ == "__main__":
    main()

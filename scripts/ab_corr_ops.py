#!/usr/bin/env python
"""Op-level breakdown of the corr backbone forward at the trainer's shapes
(8 clouds x 1024 points). Each candidate op is scanned over REPS distinct
inputs (loop-invariant hoisting defeated) in ONE dispatch, fenced by host
transfer. One chip session: numbers are comparable to each other only.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_corr_ops.py
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
    from reart_tpu.models.pointnet2 import (SA1, SA2, init_pointnet2msg2,
                                            _sa_msg, _fp, _apply_conv_bn)
    from reart_tpu.ops import ball_query, farthest_point_sample, \
        index_points, index_points_mm
    from reart_tpu.ops.distance import pairwise_sqdist

    b, n = 8, 1024
    params = init_pointnet2msg2(jax.random.PRNGKey(0))
    xyz_r = jax.random.normal(jax.random.PRNGKey(1), (REPS, b, n, 3),
                              jnp.float32) * 0.3

    def fence(x):
        return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def timed(name, fn, *args):
        f = jax.jit(fn)
        fence(f(*args))
        t0 = time.perf_counter()
        out = f(*args)
        fence(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:46s} {dt:8.3f} ms/iter", flush=True)
        return dt

    def scan_over(fn):
        def run(xs):
            def body(c, x):
                return c + fn(x), 0.0
            c, _ = jax.lax.scan(body, 0.0, xs)
            return c
        return run

    # 1. FPS at SA1/SA2 shapes
    timed("fps 1024->512", scan_over(
        lambda x: jnp.sum(farthest_point_sample(x, 512).astype(jnp.float32))),
        xyz_r)

    fps_idx = jax.jit(lambda x: farthest_point_sample(x, 512))(
        xyz_r.reshape(REPS * b, n, 3)).reshape(REPS, b, 512)
    new_xyz_r = jax.vmap(index_points)(xyz_r, fps_idx)

    timed("fps 512->128", scan_over(
        lambda x: jnp.sum(farthest_point_sample(x, 128).astype(jnp.float32))),
        new_xyz_r)

    # 2. ball_query per SA1 scale
    for radius, k in zip(SA1[1], SA1[2]):
        timed(f"ball_query r={radius} K={k} (1024->512)", scan_over(
            lambda pair, radius=radius, k=k: jnp.sum(
                ball_query(radius, k, pair[0], pair[1]).astype(jnp.float32))),
            (xyz_r, new_xyz_r))

    # 3. gathers at SA1 scale-3 shape (S=512, K=128)
    gidx_r = jax.jit(lambda x, nx: ball_query(0.2, 128, x, nx))(
        xyz_r.reshape(-1, n, 3),
        new_xyz_r.reshape(-1, 512, 3)).reshape(REPS, b, 512, 128)
    timed("index_points_mm (B,512,128) of (B,1024,3)", scan_over(
        lambda pair: jnp.sum(index_points_mm(pair[0], pair[1]))),
        (xyz_r, gidx_r))

    # 4. SA1 conv stack on pre-gathered features (pure matmul share):
    # scale-3 block (6 -> 64 -> 96 -> 128) on (B, 512, 128, 6)
    feat_r = jax.random.normal(jax.random.PRNGKey(2), (REPS, b, 512, 128, 6),
                               jnp.float32)

    def convs(feat):
        for layer in params["sa1"][2]:
            feat = _apply_conv_bn(layer, feat, bn_mode="batch")
        return jnp.sum(jnp.max(feat, axis=2))

    timed("SA1 scale3 convs 6->64->96->128 (B,512,128)", scan_over(convs),
          feat_r)

    # 5. whole SA1 / SA2 layers
    timed("SA1 whole (MSG 3 scales)", scan_over(
        lambda x: jnp.sum(_sa_msg(params["sa1"], SA1[0], SA1[1], SA1[2],
                                  x, x, "batch")[1])), xyz_r)

    pts2_r = jax.random.normal(jax.random.PRNGKey(3), (REPS, b, 512, 320),
                               jnp.float32)
    timed("SA2 whole (MSG 2 scales)", scan_over(
        lambda pair: jnp.sum(_sa_msg(params["sa2"], SA2[0], SA2[1], SA2[2],
                                     pair[0], pair[1], "batch")[1])),
        (new_xyz_r, pts2_r))

    # 6. FP1 (the biggest FP: 1024 queries, 3-NN over 512)
    pts1_r = jax.random.normal(jax.random.PRNGKey(4), (REPS, b, 512, 128),
                               jnp.float32)
    timed("FP1 whole (1024 q, 3-NN over 512)", scan_over(
        lambda pair: jnp.sum(_fp(params["fp1"], pair[0],
                                 pair[1], jnp.concatenate([pair[0], pair[0]],
                                                          -1),
                                 pair[2], "batch"))),
        (xyz_r, new_xyz_r, pts1_r))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Fused one-hot grouping vs ball_query+gather at SA shapes.

Current SA path per scale: ball_query (lax.top_k = SORT on TPU) then two
row gathers. Fused candidate: in-radius rank (cumsum) -> slot one-hot
(S, N, K) built in S-tiles -> grouped features as ONE einsum over N
(MXU, HIGHEST precision = f32-exact values), with the ball-query
first-in-radius padding reproduced via an outer-product correction.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_group_fused.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


def fused_group(radius, k, xyz, new_xyz, points, prec):
    """(B, S, K, C+3) grouped [points; xyz - centroid], ball-query padding."""
    import jax
    import jax.numpy as jnp

    from reart_tpu.ops.distance import pairwise_sqdist

    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    feats = jnp.concatenate([points, xyz], axis=-1)  # (B, N, C+3)
    c_all = feats.shape[-1]
    sq = pairwise_sqdist(new_xyz, xyz)  # (B, S, N)
    inr = sq < (radius * radius)
    rank = jnp.cumsum(inr.astype(jnp.int32), axis=-1)  # 1-based when inr
    slot = jnp.where(inr, rank - 1, k)  # (B, S, N), k = discarded
    kr = jnp.arange(k, dtype=jnp.int32)
    w = (slot[..., None] == kr).astype(feats.dtype)  # (B, S, N, K)
    grouped = jnp.einsum("bsnk,bnc->bskc", w, feats, precision=prec)
    # padding: slots with no point copy the FIRST in-radius point
    nvalid = rank[..., -1]  # (B, S)
    empty = (kr[None, None] >= nvalid[..., None]).astype(feats.dtype)
    first = jnp.argmax(inr, axis=-1)  # (B, S); 0 when none in radius
    firstoh = (jnp.arange(n, dtype=jnp.int32)[None, None]
               == first[..., None]).astype(feats.dtype)
    first_feat = jnp.einsum("bsn,bnc->bsc", firstoh, feats, precision=prec)
    grouped = grouped + empty[..., None] * first_feat[:, :, None, :]
    gpts = grouped[..., : c_all - 3]
    gxyz = grouped[..., c_all - 3:] - new_xyz[:, :, None, :]
    return jnp.concatenate([gpts, gxyz], axis=-1)


def current_group(radius, k, xyz, new_xyz, points):
    import jax.numpy as jnp

    from reart_tpu.ops import ball_query, index_points_mm

    gidx = ball_query(radius, k, xyz, new_xyz)
    gxyz = index_points_mm(xyz, gidx) - new_xyz[:, :, None, :]
    gpts = index_points_mm(points, gidx)
    return jnp.concatenate([gpts, gxyz], axis=-1)


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
        print(f"{name:56s} {dt:8.3f} ms/iter", flush=True)
        return dt

    def scan_over(fn):
        def run(xs):
            def body(c, x):
                return c + fn(x), 0.0
            c, _ = jax.lax.scan(body, 0.0, xs)
            return c
        return run

    hp = jax.lax.Precision.HIGHEST
    for (n, s, c, radius, k, tag) in (
            (1024, 512, 3, 0.2, 128, "SA1s3"),
            (1024, 512, 3, 0.05, 32, "SA1s1"),
            (512, 128, 320, 0.4, 128, "SA2s2"),
    ):
        b = 8
        xyz_r = jax.random.normal(jax.random.PRNGKey(1),
                                  (REPS, b, n, 3), jnp.float32) * 0.3
        nx_r = xyz_r[:, :, :s]
        pts_r = (xyz_r if c == 3 else jax.random.normal(
            jax.random.PRNGKey(2), (REPS, b, n, c), jnp.float32))

        # value check once
        cur = current_group(radius, k, xyz_r[0], nx_r[0], pts_r[0])
        fus = fused_group(radius, k, xyz_r[0], nx_r[0], pts_r[0], hp)
        import numpy as np

        err = float(jnp.max(jnp.abs(cur - fus)))
        print(f"[{tag}] max |cur - fused| = {err:.2e}")

        timed(f"{tag} current (ball_query + 2 gathers)", scan_over(
            lambda x, radius=radius, k=k: jnp.sum(
                current_group(radius, k, x[0], x[1], x[2]))),
            (xyz_r, nx_r, pts_r))
        timed(f"{tag} fused one-hot (HIGHEST)", scan_over(
            lambda x, radius=radius, k=k: jnp.sum(
                fused_group(radius, k, x[0], x[1], x[2], hp))),
            (xyz_r, nx_r, pts_r))
        timed(f"{tag} fused one-hot (DEFAULT)", scan_over(
            lambda x, radius=radius, k=k: jnp.sum(
                fused_group(radius, k, x[0], x[1], x[2],
                            jax.lax.Precision.DEFAULT))),
            (xyz_r, nx_r, pts_r))


if __name__ == "__main__":
    main()

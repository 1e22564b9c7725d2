#!/usr/bin/env python
"""ONE-session TILE_N sweep for the NN kernels (follow-up to
scripts/ab_nn_oldnew.py). The round-3 exploration (/tmp/nn_phase_split.py)
saw a standalone k=1 kernel gain ~1.2x at TILE_N=1024; this validates the
effect on the real entry points with output-agreement checks, inside one
chip session (2-4x cross-session variance, BASELINE.md).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_nn_tiles.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(x):
    import jax

    return float(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, reps=30):
    fence(fn())
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", default=30, type=int)
    ap.add_argument("--tiles", default=[256, 512, 1024], type=int, nargs="+")
    args = ap.parse_args()

    import jax.numpy as jnp

    import reart_tpu.ops.pallas_nn as K

    rng = np.random.RandomState(0)
    b, n, m = 9, 4096, 4096
    q = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))

    cases = [
        ("nn_topk k=1", lambda: K.nn_topk_pallas(q, r, 1)),
        ("nn_topk k=3", lambda: K.nn_topk_pallas(q, r, 3)),
        ("nn_bidir", lambda: K.nn_bidir_pallas(q, r)),
        ("nn1_coords", lambda: K.nn1_coords_pallas(q, r)),
        ("nn1_bidir_coords", lambda: K.nn1_bidir_coords_pallas(q, r)),
    ]

    base_tile = K.TILE_N
    refs = {}
    results = {}
    for tile in args.tiles:
        K.TILE_N = tile
        for name, fn in cases:
            try:
                out = [np.asarray(x) for x in fn()]
            except Exception as e:
                print(f"TN={tile:<5} {name:<18} FAILED: {type(e).__name__}",
                      flush=True)
                continue
            if name in refs:
                for a, b_ in zip(refs[name], out):
                    if a.dtype.kind == "i":
                        assert (a == b_).all(), (tile, name)
                    else:
                        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)
            else:
                refs[name] = out
            ms = timeit(fn, reps=args.reps)
            results[(tile, name)] = ms
            print(f"TN={tile:<5} {name:<18} {ms:7.3f} ms", flush=True)
    K.TILE_N = base_tile

    print()
    for name, _ in cases:
        row = {t: results.get((t, name)) for t in args.tiles}
        best = min((v, t) for t, v in row.items() if v is not None)
        print(f"{name:<18} best TN={best[1]} "
              + "  ".join(f"TN{t}={v:.3f}" if v is not None else f"TN{t}=fail"
                          for t, v in row.items()), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ONE-session A/B of the NN-kernel distance-tile formulation (VERDICT r2
#2): channel-wise diff^2 (9 broadcasted VPU passes) vs the MXU cross term
||q||^2+||r||^2-2q.r (pallas_nn._sqdist_tile, SQDIST_CROSS_TERM flag).

For each kernel (nn_topk k=1 / k=3, nn1_coords, nn1_bidir_coords) at the
nao/sapien hot shape (9, 4096, 4096):
  * asserts cross-term indices/distances match the channel-wise path
    ON-CHIP (selection equality; distances to 1e-4 relative)
  * times both in the same session (fenced by host transfers; CLAUDE.md:
    block_until_ready can return early on axon)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_nn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def fence(x):
    import jax

    return float(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, *args, reps=20):
    fence(fn(*args))  # compile + warm
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    import jax.numpy as jnp

    import reart_tpu.ops.pallas_nn as K

    rng = np.random.RandomState(0)
    b, n, m = 9, 4096, 4096
    q = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))

    kernels = {
        "nn_topk k=1": (K.nn_topk_pallas, (q, r, 1)),
        "nn_topk k=3": (K.nn_topk_pallas, (q, r, 3)),
        "nn1_coords": (K.nn1_coords_pallas, (q, r)),
        "nn1_bidir_coords": (K.nn1_bidir_coords_pallas, (q, r)),
    }

    results = {}
    for mode in (False, True):
        K.SQDIST_CROSS_TERM = mode
        for fn, _ in kernels.values():
            fn.clear_cache()
        name = "cross" if mode else "chanwise"
        for kname, (fn, args) in kernels.items():
            ms = timeit(fn, *args)
            out = [np.asarray(x) for x in fn(*args)]
            results.setdefault(kname, {})[name] = (ms, out)
            print(f"{kname:<18} {name:<9} {ms:8.3f} ms", flush=True)

    print()
    for kname, r2 in results.items():
        (ms_c, out_c), (ms_x, out_x) = r2["chanwise"], r2["cross"]
        # index equality (selection); distance closeness
        for a, b_ in zip(out_c, out_x):
            if a.dtype == np.int32:
                mism = (a != b_).mean()
                assert mism < 1e-3, (kname, mism)  # near-tie flips only
            else:
                np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)
        print(f"{kname:<18} speedup {ms_c / ms_x:5.2f}x "
              f"({ms_c:.3f} -> {ms_x:.3f} ms), outputs agree")


if __name__ == "__main__":
    main()

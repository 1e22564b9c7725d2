#!/usr/bin/env python
"""ONE-session A/B: round-2 NN kernels (row-major ref blocks, generic
_ksmallest at k=1) vs the round-3 refactor (channel-major (3, TM) ref
blocks, dedicated k=1 min-index path) — VERDICT r2 #2's protocol demands
both variants timed inside a single chip session (observed 2-4x
cross-session variance, BASELINE.md).

The old variant is loaded from git (`git show <rev>:reart_tpu/ops/
pallas_nn.py`) as a standalone module — the file only imports jax/pallas.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_nn_oldnew.py \
      [--old_rev <rev>] [--reps 30]
"""

import argparse
import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_old(rev: str):
    src = subprocess.check_output(
        ["git", "-C", os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
         "show", f"{rev}:reart_tpu/ops/pallas_nn.py"], text=True)
    path = "/tmp/pallas_nn_old_ab.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("pallas_nn_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def fence(x):
    import jax

    return float(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, *args, reps=30):
    fence(fn(*args))
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old_rev", default="33bb8ce")  # round-2 snapshot
    ap.add_argument("--reps", default=30, type=int)
    args = ap.parse_args()

    import jax.numpy as jnp

    import reart_tpu.ops.pallas_nn as NEW

    OLD = load_old(args.old_rev)

    rng = np.random.RandomState(0)
    b, n, m = 9, 4096, 4096
    q = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    r = jnp.asarray(rng.randn(b, m, 3).astype(np.float32))

    cases = [
        ("nn_topk k=1", lambda M: lambda: M.nn_topk_pallas(q, r, 1)),
        ("nn_topk k=3", lambda M: lambda: M.nn_topk_pallas(q, r, 3)),
        ("nn_bidir", lambda M: lambda: M.nn_bidir_pallas(q, r)),
        ("nn1_coords", lambda M: lambda: M.nn1_coords_pallas(q, r)),
        ("nn1_bidir_coords",
         lambda M: lambda: M.nn1_bidir_coords_pallas(q, r)),
    ]

    # interleave old/new per case so drift within the session can't bias
    # one arm; verify outputs agree before timing
    print(f"shape ({b}, {n}, {m}), reps {args.reps}", flush=True)
    total_old = total_new = 0.0
    for name, mk in cases:
        f_old, f_new = mk(OLD), mk(NEW)
        o_old = [np.asarray(x) for x in f_old()]
        o_new = [np.asarray(x) for x in f_new()]
        for a, b_ in zip(o_old, o_new):
            if a.dtype.kind == "i":
                assert (a == b_).all(), name
            else:
                np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)
        ms_old = timeit(f_old, reps=args.reps)
        ms_new = timeit(f_new, reps=args.reps)
        total_old += ms_old
        total_new += ms_new
        # effective unidirectional HBM bandwidth if the (N, M) distance
        # matrix had been materialized (the XLA-path cost this replaces)
        print(f"{name:<18} old {ms_old:7.3f} ms  new {ms_new:7.3f} ms  "
              f"speedup {ms_old / ms_new:5.2f}x", flush=True)
    print(f"{'TOTAL':<18} old {total_old:7.3f} ms  new {total_new:7.3f} ms  "
          f"speedup {total_old / total_new:5.2f}x", flush=True)

    # roofline context for the new kernels: bytes actually required
    # (inputs + outputs only — the distance tiles never leave VMEM) vs
    # a VPU-FLOPs bound for the 9-pass distance computation
    dist_flops = b * n * m * 9  # 3 channels x (sub, mul, add)
    for name, ms in (("nn_topk k=1 (new)", None),):
        pass
    ms1 = timeit(mk_f := (lambda: NEW.nn_topk_pallas(q, r, 1)),
                 reps=args.reps)
    gflops = dist_flops / (ms1 / 1e3) / 1e9
    print(f"k=1 distance-pass rate {gflops:,.0f} GFLOP/s "
          f"(VPU peak ~{47_000:,} f32)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""ONE-session A/B: banded auction kernel with vs without the converged-tile
skip (pl.when gating each row tile's value/bid/winner pass on a cheap
"any unassigned row in tile" lane count).

The skip is semantics-preserving — a fully-assigned tile's bids are all
NEG_INF and contribute nothing — so outputs are asserted EQUAL (matching AND
prices) before timing. Problems are the engine's real mid-fit assignment
workloads (/tmp/vr/midfit_points.pkl, scripts/make_midfit_problem.py) plus a
raw unaligned variant (random rotation on tgt) where convergence is slower.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_banded_oldnew.py \
      [--old_rev HEAD] [--reps 10]
"""

import argparse
import importlib.util
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_old(rev: str):
    src = subprocess.check_output(
        ["git", "-C", os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
         "show", f"{rev}:reart_tpu/ops/pallas_auction.py"], text=True)
    path = "/tmp/pallas_auction_old_ab.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("pallas_auction_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def fence(x):
    import jax

    return float(jax.tree.leaves(x)[0].reshape(-1)[0])


def timeit(fn, reps):
    fence(fn())
    fence(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old_rev", default="HEAD")
    ap.add_argument("--reps", default=10, type=int)
    args = ap.parse_args()

    import jax.numpy as jnp

    import reart_tpu.ops.pallas_auction as NEW
    from reart_tpu.ops.assignment import _curve_sort

    OLD = load_old(args.old_rev)

    with open("/tmp/vr/midfit_points.pkl", "rb") as f:
        probs = pickle.load(f)

    rng = np.random.RandomState(0)
    th = 0.4
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)

    cases = []
    for dsamp, d in sorted(probs.items()):
        cases.append((f"midfit {d['pc_src'].shape[1]}^2 (aligned)",
                      d["pc_src"], d["pc_tgt"]))
        cases.append((f"midfit {d['pc_src'].shape[1]}^2 (rotated)",
                      d["pc_src"], d["pc_tgt"] @ rot.T))

    eps_list = (5e-3, 1e-4)
    total_old = total_new = 0.0
    for name, src, tgt in cases:
        src_j = jnp.asarray(src, jnp.float32)
        tgt_j = jnp.asarray(tgt, jnp.float32)
        b, n = src.shape[:2]
        w = 512
        src_s, tgt_s, _, _ = _curve_sort(src_j, tgt_j, w, None)
        tgt_cm = jnp.transpose(tgt_s, (0, 2, 1))
        price0 = jnp.zeros((b, n), jnp.float32)

        def run(M):
            return lambda: M.auction_solve_banded(
                src_s, tgt_cm, price0, eps_list, 100, w)

        f_old, f_new = run(OLD), run(NEW)
        r_old = [np.asarray(x) for x in f_old()]
        r_new = [np.asarray(x) for x in f_new()]
        assert (r_old[0] == r_new[0]).all(), f"{name}: matchings differ"
        np.testing.assert_allclose(r_old[1], r_new[1], rtol=0, atol=0,
                                   err_msg=f"{name}: prices differ")
        ms_old = timeit(f_old, args.reps)
        ms_new = timeit(f_new, args.reps)
        total_old += ms_old
        total_new += ms_new
        print(f"{name:<28} old {ms_old:8.2f} ms  new {ms_new:8.2f} ms  "
              f"speedup {ms_old / ms_new:5.2f}x", flush=True)
    print(f"{'TOTAL':<28} old {total_old:8.2f} ms  new {total_new:8.2f} ms  "
          f"speedup {total_old / total_new:5.2f}x", flush=True)


if __name__ == "__main__":
    main()

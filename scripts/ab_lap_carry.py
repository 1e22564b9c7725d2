#!/usr/bin/env python
"""ONE-session A/B: banded auction with vs without epsilon-phase CARRYOVER
(VERDICT r3 #7 — the banded-LAP sweep-count lever).

carry=True keeps the assignment across epsilon phases and unseats only rows
violating eps-CS at each new (tighter) epsilon; later phases then pay one
band pass + straggler cleanup instead of a full re-auction, and the
converged-tile skip makes mostly-assigned sweeps nearly free. carry=False is
the classical per-phase restart (round-3 behavior). Both arms run in THIS
session, interleaved, on the same compiled-problem set (CLAUDE.md: never A/B
across sessions).

Quality gate per case: matched cost gap vs the exact host JV solver and
duplicate count must be equal-class between arms (the VERDICT's "equal
matched cost/duplicates" criterion).

Problems: real nao consecutive-frame clouds at downsample 1 (4096^2 — the
giant-LAP shape of reference run_robot.py:164-187) and 2 (2048^2), plus a
rotated-target variant where convergence is slowest; uses
/tmp/vr/midfit_points.pkl instead when present (scripts/make_midfit_problem).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_lap_carry.py \
      [--reps 10] [--cpu --smoke]
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    ap.add_argument("--reps", default=10, type=int)
    ap.add_argument("--seq_path", default="/root/reference/demo_data/data/nao")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny problems + interpret-safe sizes (CPU check)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    def with_interp(f):
        """CPU smoke runs the kernels in pallas interpret mode."""
        if not args.cpu:
            return f

        def g():
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                return f()
        return g

    import jax.numpy as jnp

    import reart_tpu  # noqa: F401  (compilation cache)
    from reart_tpu.native import lap_solve_batch
    from reart_tpu.ops.assignment import _curve_sort
    from reart_tpu.ops import pallas_auction as PA

    rng = np.random.RandomState(0)
    th = 0.4
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)

    cases = []
    if os.path.exists("/tmp/vr/midfit_points.pkl") and not args.smoke:
        with open("/tmp/vr/midfit_points.pkl", "rb") as f:
            probs = pickle.load(f)
        for dsamp, d in sorted(probs.items()):
            n = d["pc_src"].shape[1]
            cases.append((f"midfit {n}^2 (aligned)",
                          d["pc_src"], d["pc_tgt"]))
            cases.append((f"midfit {n}^2 (rotated)",
                          d["pc_src"], d["pc_tgt"] @ rot.T))
    else:
        from reart_tpu.data.robot import RobotSequence

        if args.smoke:
            shapes = (256,)
        else:
            shapes = (2048, 4096)
        seq = RobotSequence(args.seq_path, num_points=4096, cano_idx=0)
        pcs = np.asarray(seq[0]["complete_pc_list"], np.float32)  # (T, N, 3)
        for n in shapes:
            idx = rng.choice(pcs.shape[1], n, replace=False)
            src = pcs[:-1][:, idx]
            tgt = pcs[1:][:, idx]
            cases.append((f"nao pairs {n}^2 (aligned)", src, tgt))
            cases.append((f"nao pairs {n}^2 (rotated)", src, tgt @ rot.T))

    eps_list = (5e-3, 1e-4)
    max_sweeps = 100
    total = {True: 0.0, False: 0.0}
    for name, src, tgt in cases:
        src_j = jnp.asarray(src, jnp.float32)
        tgt_j = jnp.asarray(tgt, jnp.float32)
        b, n = src.shape[:2]
        w = min(512, n)
        src_s, tgt_s, _, inv_t = _curve_sort(src_j, tgt_j, w, None)
        tgt_cm = jnp.transpose(tgt_s, (0, 2, 1))
        price0 = jnp.zeros((b, n), jnp.float32)

        def run(carry):
            return with_interp(lambda: PA.auction_solve_banded(
                src_s, tgt_cm, price0, eps_list, max_sweeps, w, carry=carry))

        # quality gate: matched cost gap vs exact JV + duplicates, per arm,
        # computed on the SORTED problem (band semantics)
        src_np, tgt_np = np.asarray(src_s), np.asarray(tgt_s)
        cost_np = np.empty((b, n, n), np.float32)
        for i in range(b):
            for s in range(0, n, 512):
                d = src_np[i, s:s + 512, None] - tgt_np[i, None]
                cost_np[i, s:s + 512] = np.sqrt(
                    np.maximum((d * d).sum(-1), 0, dtype=np.float32))
        exact = lap_solve_batch(cost_np)
        opt = cost_np[np.arange(b)[:, None], np.arange(n)[None], exact].sum(1)

        stats = {}
        for carry in (False, True):
            r2c = np.asarray(run(carry)()[0])
            got = cost_np[np.arange(b)[:, None], np.arange(n)[None],
                          r2c].sum(1)
            dup = int(sum(n - len(np.unique(r2c[i])) for i in range(b)))
            stats[carry] = (float(np.mean((got - opt) /
                                          np.maximum(opt, 1e-9) * 100.0)),
                            dup)

        ms = {c: timeit(run(c), args.reps) for c in (False, True)}
        # interleave a second round to wash within-session drift
        ms2 = {c: timeit(run(c), args.reps) for c in (False, True)}
        ms = {c: (ms[c] + ms2[c]) / 2 for c in ms}
        total[False] += ms[False]
        total[True] += ms[True]
        print(f"{name:<28} restart {ms[False]:8.2f} ms "
              f"(gap {stats[False][0]:6.3f}%, dup {stats[False][1]:4d})  "
              f"carry {ms[True]:8.2f} ms "
              f"(gap {stats[True][0]:6.3f}%, dup {stats[True][1]:4d})  "
              f"speedup {ms[False] / ms[True]:5.2f}x", flush=True)
    print(f"{'TOTAL':<28} restart {total[False]:8.2f} ms  "
          f"carry {total[True]:8.2f} ms  "
          f"speedup {total[False] / total[True]:5.2f}x", flush=True)


if __name__ == "__main__":
    main()

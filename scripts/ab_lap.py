"""A/B the giant-LAP paths on REAL mid-fit assignment problems (one script,
one chip session — CLAUDE.md forbids cross-session perf comparisons).

Problems: /tmp/vr/midfit_points.pkl {downsample: {pc_src, pc_tgt}} built by
scripts/make_midfit_problem.py from the faithful-protocol checkpoint
(reference run_robot.py:164-187 cost construction at downsample 2 and 1).

Paths:
  dense  — engine status quo: on-device cdist + auction_lap auto dispatch
           (HBM-resident at 2048^2, two-kernel sweeps at 4096^2)
  banded — Morton sort + banded resident auction straight from points
           (ops/assignment.auction_lap_points; no dense cost matrix)

Reports ms/solve (cold + warm-priced) and matched-cost gap vs the exact host
JV solver. Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_lap.py
"""
import functools
import pickle
import time

import numpy as np

import jax
import jax.numpy as jnp

import reart_tpu  # noqa: F401  (enables the compilation cache)
from reart_tpu.native import lap_solve_batch
from reart_tpu.ops.assignment import auction_lap, auction_lap_points
from reart_tpu.ops.distance import pairwise_sqdist

KW = dict(eps_min=1e-4, num_scales=2, scale_factor=50.0, max_sweeps=100,
          return_price=True)


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])  # host transfer = real fence


def bench(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    fence(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    fence(out[0])
    return (time.perf_counter() - t0) / reps * 1000.0, out


def matched_gap(cost_np, r2c, opt):
    b, n = r2c.shape
    got = cost_np[np.arange(b)[:, None], np.arange(n)[None],
                  np.asarray(r2c)].sum(1)
    dup = int(sum(n - len(np.unique(np.asarray(r2c)[i])) for i in range(b)))
    return float(np.mean((got - opt) / opt * 100.0)), dup


def run(tag, src, tgt, band):
    src, tgt = jnp.asarray(src), jnp.asarray(tgt)
    b, n = src.shape[:2]
    print(f"== {tag}: ({b}, {n}, {n}) ==", flush=True)
    src_np, tgt_np = np.asarray(src), np.asarray(tgt)
    cost_np = np.empty((b, n, n), np.float32)
    for i in range(b):  # chunked: the one-shot (B,N,N,3) broadcast thrashes
        for s in range(0, n, 512):
            d = src_np[i, s:s + 512, None] - tgt_np[i, None]
            cost_np[i, s:s + 512] = np.sqrt(
                np.maximum((d * d).sum(-1), 0, dtype=np.float32))
    exact = lap_solve_batch(cost_np)
    opt = cost_np[np.arange(b)[:, None], np.arange(n)[None], exact].sum(1)
    print(f"  exact JV total {opt.sum():.2f}", flush=True)

    @jax.jit
    def dense(src, tgt, price=None):
        cost = jnp.sqrt(pairwise_sqdist(src, tgt))
        return auction_lap(cost, price=price, **KW)

    banded = functools.partial(auction_lap_points, band=band,
                               **{k: v for k, v in KW.items()
                                  if k != "max_sweeps"}, max_sweeps=100)

    ms, out = bench(dense, src, tgt)
    gap, dup = matched_gap(cost_np, out[0], opt)
    print(f"  dense  cold {ms:8.1f} ms  gap {gap:6.2f}%  dup {dup}", flush=True)
    ms, out2 = bench(dense, src, tgt, out[1])
    gap, dup = matched_gap(cost_np, out2[0], opt)
    print(f"  dense  warm {ms:8.1f} ms  gap {gap:6.2f}%  dup {dup}", flush=True)

    ms, out = bench(banded, src, tgt)
    gap, dup = matched_gap(cost_np, out[0], opt)
    print(f"  banded cold {ms:8.1f} ms  gap {gap:6.2f}%  dup {dup}", flush=True)
    ms, out2 = bench(banded, src, tgt, price=out[1])
    gap, dup = matched_gap(cost_np, out2[0], opt)
    print(f"  banded warm {ms:8.1f} ms  gap {gap:6.2f}%  dup {dup}", flush=True)

    # schedule variants: single epsilon phase / halved sweep bound
    for tag, kw in (("1phase", dict(num_scales=1, max_sweeps=100)),
                    ("s50", dict(num_scales=2, max_sweeps=50))):
        v = functools.partial(auction_lap_points, band=band, eps_min=1e-4,
                              scale_factor=50.0, return_price=True, **kw)
        ms, outv = bench(v, src, tgt)
        gap, dup = matched_gap(cost_np, outv[0], opt)
        print(f"  banded {tag:4s} {ms:8.1f} ms  gap {gap:6.2f}%  dup {dup}",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    with open("/tmp/vr/midfit_points.pkl", "rb") as f:
        prob = pickle.load(f)
    run("downsample 2 (robot faithful)", prob[2]["pc_src"], prob[2]["pc_tgt"],
        band=512)
    run("downsample 1 (sapien default)", prob[1]["pc_src"], prob[1]["pc_tgt"],
        band=512)

"""A/B the banded-LAP ordering choices on REAL problems (one script, one
chip session — CLAUDE.md forbids cross-session perf comparisons).

Compares, per problem and band width:
  morton / hilbert  — space-filling-curve keys for the row/column sort
                      (ops/assignment._morton_keys / _hilbert_keys)
  nn-recenter       — rows ordered by their nearest target's sorted column
                      (auction_lap_points(nn_recenter=True))

Problems: a result.pkl from any sapien/robot run (model-aligned end-of-fit
clouds + the raw camera-frame clouds), e.g. the 4096-point scene fit
driven in PARITY's "Sapien downsample-1" section. Reports wall-clock,
matched cost, and duplicate columns.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_curve.py \
         /path/to/result.pkl
"""
import pickle
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import reart_tpu  # noqa: F401  (enables the compilation cache)
from reart_tpu.ops.assignment import auction_lap_points, resolve_band


def fence(x):
    return float(np.asarray(x).reshape(-1)[0])


def report(name, pc_src, pc_tgt, r2c, dt):
    r2c = np.asarray(r2c)
    tot, dup = 0.0, 0
    for k in range(len(r2c)):
        d = pc_src[k] - pc_tgt[k][r2c[k]]
        tot += float(np.sqrt((d * d).sum(-1)).sum())
        dup += len(r2c[k]) - len(np.unique(r2c[k]))
    print(f"{name}: {dt*1e3:6.0f} ms  cost {tot:8.1f}  dup {dup}",
          flush=True)


def run_case(tag, pc_src, pc_tgt, band):
    s, t_ = jnp.asarray(pc_src), jnp.asarray(pc_tgt)
    kw = dict(eps_min=1e-4, num_scales=2, scale_factor=50.0,
              max_sweeps=100, band=band)
    variants = [("morton ", dict(curve="morton")),
                ("hilbert", dict(curve="hilbert")),
                ("nn-rec ", dict(nn_recenter=True))]
    for name, extra in variants:
        fn = jax.jit(lambda a, b, e=tuple(sorted(extra.items())):
                     auction_lap_points(a, b, **dict(e), **kw))
        fence(fn(s, t_))
        t0 = time.perf_counter()
        out = fn(s, t_)
        fence(out)
        report(f"{tag} {name} w{band}", pc_src, pc_tgt, out,
               time.perf_counter() - t0)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "result.pkl"
    with open(path, "rb") as f:
        r = pickle.load(f)
    cano = np.asarray(r["cano_pc"], np.float32)
    poses = np.asarray(r["pred_pose_list"], np.float32)
    part = np.asarray(r["pred_cano_part"])
    pc_tgt = np.asarray(r["pc_list"], np.float32)
    t1 = poses.shape[0]
    homo = np.concatenate([cano, np.ones((len(cano), 1), np.float32)], 1)
    fit_src = np.stack([
        np.stack([h @ poses[t, part[i]].T for i, h in enumerate(homo)])[:, :3]
        for t in range(t1)
    ])
    raw_src = np.broadcast_to(cano[None], pc_tgt.shape).copy()

    n = pc_tgt.shape[1]
    for band in sorted({512, resolve_band(-1, n)}):
        run_case("fit", fit_src, pc_tgt, band)
        run_case("raw", raw_src, pc_tgt, band)


if __name__ == "__main__":
    main()

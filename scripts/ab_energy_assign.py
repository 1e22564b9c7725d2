#!/usr/bin/env python
"""One-session A/B of the finalize-energy exact-assignment path.

The robot finalize's energy phase (metrics.compute_ass_err: TPU-auction
dual presolve -> warm-started host JV) measured 101 s on one flagship run
and 34 s on another at IDENTICAL shapes — chip/host session variance —
so schedule tuning must interleave arms in one session. Arms:

  * presolve schedules: the shipping (eps_min 1e-5, scales 3, factor 30)
    vs deeper/shallower variants vs none
  * the JV finish from each start

Workload: the REAL flagship energy problem — fitted kinematic forward vs
observed clouds from a finished nao run (pass --ckpt/--seq_path), T=9
frames of 4096 x 4096.

Usage (chip + idle host):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_energy_assign.py \
      --ckpt /tmp/nao_r4_armA/fit_kin_v2/nao/model.ckpt.pkl \
      --seq_path /root/reference/demo_data/data/nao --cano_idx 4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--seq_path", required=True)
    ap.add_argument("--cano_idx", default=4, type=int)
    ap.add_argument("--num_points", default=4096, type=int)
    ap.add_argument("--reps", default=3, type=int)
    args = ap.parse_args()

    import jax.numpy as jnp

    from reart_tpu import checkpoint as ckpt
    from reart_tpu.data.robot import RobotSequence
    from reart_tpu.hostops import on_device, on_host, to_host
    from reart_tpu.metrics import pairwise_sqdist
    from reart_tpu.models.kinematic import kinematic_forward
    from reart_tpu.native import lap_solve_points
    from reart_tpu.ops.assignment import auction_lap

    sample = RobotSequence(args.seq_path, args.num_points, args.cano_idx)[0]
    payload = ckpt.load_checkpoint(args.ckpt)
    state = ckpt.restore_kinematic_state(payload)
    params = {k: jnp.asarray(v) for k, v in payload["state_dict"].items()}
    with on_host():
        pred_pc, _, _ = kinematic_forward(
            params, state, jnp.asarray(sample["cano_pc"], jnp.float32))
        src = np.asarray(to_host(pred_pc), np.float32)
    tgt = np.asarray(sample["pc_list"], np.float32)
    print(f"problem: {src.shape} vs {tgt.shape}")

    schedules = {
        "none": None,
        "ship (1e-5/3/30)": dict(eps_min=1e-5, num_scales=3,
                                 scale_factor=30.0, max_sweeps=200),
        "shallow (1e-4/2/50)": dict(eps_min=1e-4, num_scales=2,
                                    scale_factor=50.0, max_sweeps=200),
        "deep (1e-6/4/30)": dict(eps_min=1e-6, num_scales=4,
                                 scale_factor=30.0, max_sweeps=400),
        "deeper sweeps (1e-5/3/30/s600)": dict(eps_min=1e-5, num_scales=3,
                                               scale_factor=30.0,
                                               max_sweeps=600),
    }

    def run(sched):
        t0 = time.perf_counter()
        v = None
        if sched is not None:
            with on_device() as dev:
                assert dev is not None, "need the accelerator for presolve"
                cost = jnp.sqrt(pairwise_sqdist(jnp.asarray(src),
                                                jnp.asarray(tgt)))
                _, price = auction_lap(cost, return_price=True, **sched)
                v = -np.asarray(price)  # host transfer = reliable fence
        t1 = time.perf_counter()
        perm = lap_solve_points(src, tgt, v_init=v)
        t2 = time.perf_counter()
        matched = np.take_along_axis(tgt, perm[..., None].astype(np.int64),
                                     axis=1)
        err = float(((src - matched) ** 2).sum(-1).sum(-1).mean()
                    / src.shape[1])
        return t1 - t0, t2 - t1, err

    # warm EVERY schedule once (each distinct presolve config is its own
    # jit program; skipping a warm-up puts its ~30 s remote compile inside
    # the first measured rep)
    for name, sched in schedules.items():
        run(sched)

    acc = {k: [] for k in schedules}
    for rep in range(args.reps):
        for name, sched in schedules.items():  # interleaved arms
            acc[name].append(run(sched))
            print(f"rep {rep} {name}: presolve {acc[name][-1][0]:.2f}s "
                  f"jv {acc[name][-1][1]:.2f}s err {acc[name][-1][2]:.6f}",
                  flush=True)

    print(f"\n{'schedule':<30}{'presolve':>10}{'jv':>10}{'total':>10}")
    errs = set()
    for name, rows in acc.items():
        p = float(np.median([r[0] for r in rows]))
        j = float(np.median([r[1] for r in rows]))
        errs.update(round(r[2], 9) for r in rows)
        print(f"{name:<30}{p:>10.2f}{j:>10.2f}{p + j:>10.2f}")
    print(f"distinct ass_err values across all arms: {len(errs)} "
          f"(exactness: must be 1)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: relaxation-fit optimization throughput at nao scale.

Workload: the robot relaxation fit exactly as the reference README configures
it (T=10 frames, N=4096 points, P=20 parts, flow + assignment losses,
assignment LAP every 5 iters) — the hot loop that dominates end-to-end fit
time (reference run_robot.py:154-221, 15k iterations).

Baseline: the reference's own BaseModel + bidirectional-Chamfer step measured
with torch on this host's CPU = 0.163 iters/sec (see BASELINE.md; the
reference publishes no GPU numbers and no CUDA GPU is present here).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_CPU_ITERS_PER_SEC = 0.163  # measured 2026-08-16, BASELINE.md
NAO_DEMO = "/root/reference/demo_data/data/nao"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_workload():
    import os

    if os.path.isdir(NAO_DEMO):
        from reart_tpu.data.robot import RobotSequence

        sample = RobotSequence(NAO_DEMO, num_points=4096, cano_idx=0)[0]
        log(f"workload: nao demo ({sample['pc_list'].shape})")
        return sample["cano_pc"], sample["pc_list"], sample["complete_pc_list"]
    rng = np.random.RandomState(0)
    cano = rng.randn(4096, 3).astype(np.float32)
    pcs = np.stack([cano + 0.02 * i for i in range(1, 10)])
    log("workload: synthetic nao-scale")
    return cano, pcs, np.concatenate([cano[None], pcs], 0)


def main():
    import jax

    from reart_tpu.train import FitConfig, FlowContext, fit_base
    from reart_tpu.models.base_model import init_base_params

    cano, pc_list, complete = load_workload()
    t = complete.shape[0]
    log(f"devices: {jax.devices()}")

    # flow supervision anchored on consecutive GT frames (same compute shape
    # as the corr-model anchors the reference blends every iteration)
    flow_ctx = FlowContext.from_lists(
        [complete[i] for i in range(t - 1)],
        [complete[i + 1] - complete[i] for i in range(t - 1)],
    )

    key = jax.random.PRNGKey(0)
    n_iter = 800
    cfg = FitConfig(
        n_iter=n_iter, use_assign_loss=True, use_flow_loss=True,
        assign_iter=n_iter // 2, assign_gap=5, downsample=4,
        # ~1.5 s of device work per dispatch at nao scale: amortizes the
        # tunnel's serial per-dispatch enqueue (~0.4 s) without tripping
        # the TPU-runtime execution watchdog
        dispatch_chunk=200,
    )
    params = init_base_params(key, num_parts=20, pose_len=t - 1)

    # NOTE on timing: on the experimental axon backend block_until_ready can
    # return before device execution completes; only a host transfer
    # (float()) is a reliable fence. Every region below ends with one.
    log("compile + warmup fit ...")
    t0 = time.perf_counter()
    _, hist = fit_base(key, params, cfg, cano, pc_list, flow_ctx=flow_ctx)
    _ = float(hist["total_loss"][-1])  # full drain
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    times, final_loss = [], 0.0
    for rep in range(3):  # distinct keys/params so nothing can be replayed
        key_r = jax.random.PRNGKey(rep + 1)
        params_r = init_base_params(key_r, num_parts=20, pose_len=t - 1)
        t0 = time.perf_counter()
        _, hist = fit_base(key_r, params_r, cfg, cano, pc_list,
                           flow_ctx=flow_ctx)
        final_loss = float(hist["total_loss"][-1])  # fence
        times.append(time.perf_counter() - t0)
        log(f"timed fit {rep}: {times[-1]:.1f}s")
    dt = sorted(times)[1]  # median of 3

    iters_per_sec = n_iter / dt
    log(f"steady-state: {iters_per_sec:.1f} iters/sec "
        f"({dt / n_iter * 1000:.2f} ms/iter); full 15k-iter fit ~ "
        f"{15000 / iters_per_sec:.0f}s; final loss {final_loss:.2f}")
    print(json.dumps({
        "metric": "nao_relaxation_opt_throughput",
        "value": round(iters_per_sec, 2),
        "unit": "iters/sec",
        "vs_baseline": round(iters_per_sec / REFERENCE_CPU_ITERS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()

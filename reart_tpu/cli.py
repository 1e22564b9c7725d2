"""Unified driver: `python run.py {robot,sapien,real} [flags]`.

Capability parity with the reference's three entry points (run_robot.py,
run_sapien.py, run_real.py) — same flags, same defaults per domain, same
artifacts (result.pkl / result.txt / model checkpoint / seg.html /
structure.html / recon.gif / gt.gif / input.gif) — behind ONE CLI instead of
three near-identical scripts.

Domain differences (reference sources cited inline):
  * robot: GT poses + graph; corr-model SMNN flow; recon loss replaced by
    the assignment loss after assign_iter; revolute-only joints; retarget IK;
    TED; energy includes the group term (run_robot.py).
  * sapien: precomputed/provider flow; recon always on; root-aligned
    transforms for merge/MST/build_graph; prismatic joints + root transform;
    T x T full-flow EPE, per-/multi-scan RI; energy has no group term
    (run_sapien.py).
  * real: corr-model flow with dataset-local normalization; recon always on;
    prismatic allowed; no GT -> recon/energy only (run_real.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# argument surface (reference run_*.py argparse blocks)
# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="reart_tpu driver")
    sub = parser.add_subparsers(dest="domain", required=True)
    for domain in ("robot", "sapien", "real"):
        p = sub.add_parser(domain)
        _common_args(p, domain)
    _corr_args(sub.add_parser(
        "corr", help="self-train the correspondence backbone (the reference "
                     "ships only a frozen external checkpoint)"))
    return parser


def _corr_args(p: argparse.ArgumentParser):
    """`run.py corr`: train PointNet2Msg2 features on synthetic rigid-part
    deformations of a sequence's own frames (train/corr.py), producing a
    checkpoint for --flow_provider corr / --corr_model_path."""
    p.add_argument("--manual_seed", default=2, type=int)
    p.add_argument("--data_domain", default="robot",
                   choices=["robot", "real", "sapien"],
                   help="which dataset loader + normalization to use")
    p.add_argument("--seq_path", default=["data/robot/nao"], type=str,
                   nargs="+", help="one or more sequences (category-level "
                                   "training pools their frames)")
    p.add_argument("--num_points", default=4096, type=int)
    p.add_argument("--cano_idx", default=0, type=int)
    p.add_argument("--normalize_file",
                   default="data/category_normalize_scale.pkl", type=str)
    p.add_argument("--sapien_base_folder", default="data/mbs-sapien", type=str)
    p.add_argument("--sapien_idx", default=[212], type=int, nargs="+")
    p.add_argument("--save_path", default="corr_model.pkl", type=str)
    p.add_argument("--save_torch", default=None, type=str,
                   help="also export the torch-format checkpoint (loads into "
                        "the reference's PointNet2Msg2, strict=True)")
    p.add_argument("--steps", default=2000, type=int)
    p.add_argument("--batch", default=4, type=int)
    p.add_argument("--train_points", default=1024, type=int)
    p.add_argument("--lr", default=1e-3, type=float)
    p.add_argument("--temperature", default=0.07, type=float)
    p.add_argument("--max_angle", default=0.6, type=float)
    p.add_argument("--k_parts", default=8, type=int)
    p.add_argument("--dispatch_chunk", default=50, type=int)
    p.add_argument("--resample", default=1, type=int, choices=[0, 1],
                   help="train on INDEPENDENTLY subsampled src/tgt clouds "
                        "with radius-gated NN positives (the way real frame "
                        "pairs sample the surface independently) instead of "
                        "the identity-correspondence recipe; 0 restores the "
                        "identity recipe")
    p.add_argument("--pos_radius", default=0.02, type=float,
                   help="resampled recipe: max distance (normalized units) "
                        "from a point's true transformed position to its "
                        "nearest tgt point for the pair to count as a "
                        "positive")
    p.add_argument("--neg_radius", default=0.05, type=float,
                   help="resampled recipe: tgt points inside this radius of "
                        "the true position are excluded from the negatives")
    p.add_argument("--bf16", action="store_true",
                   help="backbone forward/backward in bfloat16 (MXU 2x rate; "
                        "f32 master weights/optimizer/BN stats)")
    p.add_argument("--train_checkpoint", default=None, type=str,
                   help="mid-run checkpoint file: training resumes from it "
                        "if it exists and atomically rewrites it as it goes "
                        "(bit-identical to an uninterrupted run at fixed "
                        "--dispatch_chunk)")
    p.add_argument("--self_finetune_steps", default=0, type=int,
                   help="after training, fine-tune on the sequence's own "
                        "REAL consecutive frame pairs with mined SMNN "
                        "pseudo-labels (train.corr.finetune_real_pairs) — "
                        "densifies real-pair matches; 0 disables")
    p.add_argument("--self_finetune_th", default=0.9, type=float,
                   help="SMNN ratio threshold for pseudo-label mining")
    p.add_argument("--self_finetune_rounds", default=3, type=int,
                   help="re-mine pseudo-labels this many times (EM rounds)")
    p.add_argument("--self_finetune_real_frac", default=0.5, type=float,
                   help="fraction of fine-tune batch drawn from real pairs "
                        "(the rest stay synthetic, anchoring the features)")
    p.add_argument("--self_finetune_refine_k", default=0, type=int,
                   help="local-rigid-refine each mining round's pseudo-"
                        "targets over this many matched neighbours "
                        "(continuous targets, like --match_refine_k at "
                        "inference); 0 keeps raw discrete targets")


def _common_args(p: argparse.ArgumentParser, domain: str):
    robot = domain == "robot"
    p.add_argument("--manual_seed", default=2, type=int)
    p.add_argument("--resume", type=str, nargs="+", metavar="PATH")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--snapshot_gap", default=100 if robot else 10, type=int)
    p.add_argument("--cano_idx", default=0, type=int)
    p.add_argument("--num_points", default=4096, type=int)
    p.add_argument("--seq_path", default={
        "robot": "data/robot/nao", "sapien": "", "real": "data/real/toy",
    }[domain], type=str)
    p.add_argument("--start_tau", default=5.0 if robot else 1.0, type=float)
    p.add_argument("--end_tau", default=1.0, type=float)
    p.add_argument("--seg_lr", default=1e-3, type=float)
    p.add_argument("--trans_lr", default=1e-2, type=float)
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--n_iter", default=15000 if robot else 2000, type=int)
    p.add_argument("--assign_iter", default=5000 if robot else 1000, type=int)
    p.add_argument("--num_parts", default=20 if robot else 10, type=int)
    p.add_argument("--model", default="base", choices=["base", "kinematic"])
    p.add_argument("--base_result_path", default=None, type=str)
    p.add_argument("--use_flow_loss", action="store_true")
    p.add_argument("--use_robust_loss", action="store_true")
    p.add_argument("--use_assign_loss", action="store_true")
    p.add_argument("--downsample", default=4 if domain != "sapien" else 1, type=int)
    p.add_argument("--assign_gap", default=5, type=int)
    p.add_argument("--dispatch_chunk", default=100, type=int,
                   help="iterations per device dispatch (bounds single-"
                        "execution wall time; raise for faster workloads)")
    p.add_argument("--pipeline_depth", default=4, type=int,
                   help="device dispatches kept in flight before fencing")
    p.add_argument("--assign_sweeps", default=100, type=int,
                   help="auction sweep bound per epsilon phase (see "
                        "FitConfig.assign_sweeps)")
    p.add_argument("--assign_band", default=-1, type=int,
                   help="column-window width of the banded LAP for giant "
                        "(>1024^2) assignment problems; -1 = auto (n//4 "
                        "clamped to [512, 1024]), 0 = dense path")
    p.add_argument("--assign_band_guard", default=0.05, type=float,
                   help="auto-band quality guard: solve the first "
                        "assignment problem both banded and dense and fall "
                        "back to dense when the banded matched cost is worse "
                        "by more than this fraction (0 disables)")
    p.add_argument("--assign_band_reprobe", default=1000, type=int,
                   help="re-run the banded-vs-dense guard probe every this "
                        "many assign-phase iterations so a long fit can "
                        "switch LAP paths when the cloud-alignment regime "
                        "changes (0 = probe only once at the phase boundary)")
    p.add_argument("--lambda_assign", default=3e-1, type=float)
    p.add_argument("--lambda_flow", default=1.0, type=float)
    p.add_argument("--lambda_joint", default=100.0 if robot else 1e-1, type=float)
    p.add_argument("--cano_dist_thr", default=1e-2, type=float)
    p.add_argument("--merge_thr", default=3e-2, type=float)
    p.add_argument("--merge_it", default=2 if robot else 3, type=int)
    p.add_argument("--save_root", default="exp", type=str)
    p.add_argument("--snapshot_metrics", action="store_true",
                   help="evaluate flow/seg/recon metrics on the live fit "
                        "every --snapshot_gap iterations (the reference's "
                        "mid-fit snapshot block, run_robot.py:224-269) — "
                        "runs asynchronously on the host backend, no "
                        "pipeline stall; rows land in result.txt")
    p.add_argument("--snapshot_graph", action="store_true",
                   help="with --snapshot_metrics (implied), also run the "
                        "host graph stage (denoise/merge/MST, "
                        "run_robot.py:232-240) + selection energy per "
                        "snapshot — mid-fit tree observability at the "
                        "reference's full snapshot depth")
    p.add_argument("--save_vis", action="store_true")
    p.add_argument("--trace_dir", default=None, type=str,
                   help="write a jax.profiler device trace of the fit here")
    p.add_argument("--auto_cano", action="store_true",
                   help="select the canonical frame by short-fit energy sweep "
                        "before the full fit (the reference README has the "
                        "user run one process per candidate)")
    p.add_argument("--auto_cano_iters", default=None, type=int,
                   help="selection-fit iterations (default n_iter // 10)")
    p.add_argument("--tree_search", default=-1, type=int,
                   help="kinematic stage: short-fit the greedy MST plus its "
                        "K-1 cheapest edge-swap spanning-tree neighbors and "
                        "keep the lowest-energy tree (recovers wrong-parent "
                        "trees where the wrong parent is not "
                        "screw-expressible; at reference scale with "
                        "--seg_refine live, the pool's near-ties project "
                        "equivalently — PARITY round 5; -1 = auto "
                        "[default]: sweep K=8 but only when a swap's local "
                        "cost delta is within --tree_search_margin of the "
                        "typical edge cost, i.e. the MST is actually "
                        "ambiguous; 0/1 = off, reference behavior)")
    p.add_argument("--tree_search_iter", default=100, type=int,
                   help="per-candidate short-fit iterations")
    p.add_argument("--tree_search_margin", default=0.5, type=float,
                   help="auto mode ambiguity gate: sweep only candidates "
                        "whose swap delta <= margin * median finite "
                        "inter-part edge cost")
    p.add_argument("--seg_refine", default=2, type=int,
                   help="motion-consistency segmentation E-step iterations "
                        "at the end of the base stage (0 = off): relabel "
                        "each canonical point to the part whose fitted "
                        "trajectory best reconstructs it against the "
                        "observed clouds (margin-guarded; measured at "
                        "reference scale: projection full-flow EPE "
                        "3.93 -> 0.44). The reference has no counterpart.")
    p.add_argument("--tree_select", default="energy",
                   choices=["energy", "holdout"],
                   help="tree-search ranking criterion: 'energy' = fit "
                        "energy + fabricated-displacement veto (the "
                        "reference's selection family); 'holdout' = "
                        "held-out-frame generalization — fit each candidate "
                        "on a frame subset with axes free, then freeze the "
                        "axes and score reconstruction on the held-out "
                        "frames (overfit topologies transfer worse; no "
                        "hand-built axis veto involved)")
    p.add_argument("--frame_shard", default="auto", choices=["auto", "off"],
                   help="shard THIS sequence's frames over all visible "
                        "devices during the fit (SURVEY §2.7 shard_map-over-T;"
                        " auto = on when >1 device and T divides evenly)")
    # reference-surface flags that are no-ops here (the LAP runs on-device /
    # logging is already quiet), accepted for drop-in compatibility
    p.add_argument("--use_nproc", action="store_true",
                   help="no-op (reference: multiprocessing Hungarian pool)")
    p.add_argument("--use_cuda", default=1, type=int, help="no-op")
    p.add_argument("--silence", action="store_true",
                   help="suppress per-phase prints (reference run_real flag)")
    if robot:
        p.add_argument("--normalize_file",
                       default="data/category_normalize_scale.pkl", type=str)
    p.add_argument("--match_th", default=0.9, type=float,
                   help="SMNN ratio-test threshold for corr-model matching "
                        "(reference fixes 0.9, flow_utils.py:116-143; raise "
                        "toward 1.0 for denser-but-noisier flow anchors)")
    p.add_argument("--match_disp_gate", default=0.0, type=float,
                   help="if > 0, drop matches whose displacement exceeds "
                        "median + this*MAD per frame pair (robust outlier "
                        "gate, flow.gate_matches_by_displacement); pairs "
                        "naturally with --match_th near 1.0")
    p.add_argument("--match_refine_k", default=0, type=int,
                   help="if > 0, replace each match's discrete target point "
                        "with the prediction of a trimmed local rigid fit "
                        "over its k nearest matched anchors — removes the "
                        "~point-spacing sampling error of raw matches "
                        "(flow.refine_targets_local_rigid)")
    p.add_argument("--match_chain_r", default=0.0, type=float,
                   help="if > 0, cycle-consistent chaining over frame "
                        "triples: skip matches (t, t+2) vote on composed "
                        "consecutive matches (closure radius = this value, "
                        "normalized units), dropping contradicted matches "
                        "and filling holes with doubly-mutual inferred "
                        "matches (flow.cycle_chain_matches)")
    if domain in ("robot", "real"):
        p.add_argument("--corr_model_path",
                       default="pretrained/corr_model.pth.tar", type=str)
        p.add_argument("--flow_provider", default="corr",
                       choices=["corr", "gt"],
                       help="flow supervision source: the frozen corr model "
                            "(reference protocol) or GT correspondences "
                            "(robot datasets carry per-point GT; useful when "
                            "the corr checkpoint is unavailable)")
    if domain == "sapien":
        p.add_argument("--sapien_base_folder", default="data/mbs-sapien", type=str)
        p.add_argument("--sapien_idx", default=212, type=int)
        p.add_argument("--flow_provider", default="msync",
                       choices=["msync", "corr"],
                       help="flow supervision source: the external msync "
                            "nets / --flow_file (reference protocol) or a "
                            "correspondence backbone (e.g. self-trained via "
                            "`run.py corr --data_domain sapien` — no "
                            "external checkpoints needed)")
        p.add_argument("--corr_model_path",
                       default="pretrained/corr_model.pth.tar", type=str)
        p.add_argument("--batch_seq", default=None, type=str,
                       help="comma-separated sequence indices: fit their "
                            "relaxation stages as ONE mesh-sharded batch "
                            "(sequences ride the device mesh), then finalize "
                            "each sequentially. base model, train only.")
        p.add_argument("--flow_file", default=None, type=str,
                       help="precomputed flow .npz (msync provider boundary)")
        p.add_argument("--flow_model_config_path", type=str,
                       default="msync/config/articulated-full.yaml",
                       help="msync config (reference run_sapien.py:427); used "
                            "when --flow_file is not given")
        p.add_argument("--flow_model_path", type=str,
                       default="msync/ckpt/articulated-full/best.pth.tar",
                       help="msync FlowNet/ConfNet checkpoint "
                            "(reference run_sapien.py:428)")


def fit_config(args, domain: str):
    from reart_tpu.train import FitConfig

    return FitConfig(
        n_iter=args.n_iter,
        use_assign_loss=args.use_assign_loss,
        use_flow_loss=args.use_flow_loss,
        use_robust_loss=getattr(args, "use_robust_loss", False),
        always_recon=domain != "robot",  # run_sapien.py:174 / run_real.py:175
        assign_iter=args.assign_iter,
        assign_gap=args.assign_gap,
        downsample=args.downsample,
        lambda_assign=args.lambda_assign,
        lambda_flow=args.lambda_flow,
        start_tau=args.start_tau,
        end_tau=args.end_tau,
        seg_lr=args.seg_lr,
        trans_lr=args.trans_lr,
        weight_decay=args.weight_decay,
        cano_idx=args.cano_idx,
        assign_sweeps=args.assign_sweeps,
        assign_band=args.assign_band,
        assign_band_guard=args.assign_band_guard,
        assign_band_reprobe=args.assign_band_reprobe,
        dispatch_chunk=args.dispatch_chunk,
        pipeline_depth=args.pipeline_depth,
    )


# ---------------------------------------------------------------------------
# setup helpers
# ---------------------------------------------------------------------------

def load_dataset(args, domain: str):
    if domain == "robot":
        from reart_tpu.data.robot import RobotSequence

        return RobotSequence(args.seq_path, args.num_points, args.cano_idx)
    if domain == "sapien":
        from reart_tpu.data.sapien import SapienDataset

        return SapienDataset(args.sapien_base_folder, args.cano_idx)
    from reart_tpu.data.real import RealSequence

    return RealSequence(args.seq_path, args.num_points, args.cano_idx)


def corr_normalization(args, domain: str, dataset, complete):
    """Cloud normalization for the correspondence extractor — ONE convention
    shared by training (run_train_corr) and inference (setup_flow), so the
    self-trained backbone sees the same distribution both times.

    robot: category file (run_robot.py:72-77); real: dataset-local
    (run_real.py:67); sapien: per-sequence unit-ball stats (the reference
    has no corr path on sapien — it uses msync — so no convention exists
    to match; any shared one works)."""
    if domain == "robot":
        from reart_tpu.data.common import load_normalize_dict

        cat = args.seq_path.rstrip("/").split("/")[-1]
        info = load_normalize_dict(args.normalize_file)[cat]
        return info["centroid"], float(info["scale"])
    if domain == "real":
        return dataset.centroid, float(dataset.scale)
    flat = np.asarray(complete, np.float32).reshape(-1, 3)
    centroid = flat.mean(0)
    radius = float(np.linalg.norm(flat - centroid, axis=-1).max())
    return centroid, 1.0 / max(radius, 1e-6)


def setup_flow(args, domain: str, dataset, sample):
    """Build the FlowContext (one-time, run_robot.py:64-84 equivalents)."""
    if not args.use_flow_loss:
        return None
    from reart_tpu.flow import build_flow_context

    complete = sample["complete_pc_list"]
    if domain == "sapien" and getattr(args, "flow_provider", "msync") != "corr":
        # msync flow-provider boundary: precomputed flows anchor every source
        # point with its predicted flow (confidence-masked)
        from reart_tpu.sapien_eval import load_precomputed_flow
        from reart_tpu.train import FlowContext

        if args.flow_file is not None:
            flow, conf = load_precomputed_flow(args.flow_file)
        else:  # run the external msync nets (reference run_sapien.py:69-75)
            from reart_tpu.sapien_eval import compute_flow_msync

            flow, conf = compute_flow_msync(
                complete, args.flow_model_config_path, args.flow_model_path)
        pc_refs, flow_refs = [], []
        for t in range(flow.shape[0]):
            keep = conf[t] > 0.5
            pc_refs.append(complete[t][keep])
            flow_refs.append(flow[t][keep])
        return FlowContext.from_lists(pc_refs, flow_refs)

    if domain == "robot" and getattr(args, "flow_provider", "corr") == "gt":
        # GT-correspondence flow anchors (per-point GT poses in the dataset)
        from reart_tpu.train import FlowContext

        gt = sample["complete_gt_pc_list"]
        return FlowContext.from_lists(
            [gt[i] for i in range(gt.shape[0] - 1)],
            [gt[i + 1] - gt[i] for i in range(gt.shape[0] - 1)])

    # robot / real / sapien-with-corr: frozen corr model + SMNN matching
    from reart_tpu.models.pointnet2 import apply_pointnet2msg2, load_corr_model

    corr_params = load_corr_model(args.corr_model_path)
    extract_fn = lambda x: apply_pointnet2msg2(corr_params, x)
    centroid, scale = corr_normalization(args, domain, dataset, complete)
    return build_flow_context(complete, extract_fn, centroid=centroid,
                              rigid_refine_k=getattr(args, "match_refine_k",
                                                     0),
                              scale=scale, matching="smnn",
                              th=getattr(args, "match_th", 0.9),
                              disp_gate=getattr(args, "match_disp_gate", 0.0),
                              chain_r=getattr(args, "match_chain_r", 0.0))


def _corr_training_frames(args):
    """Collect (and normalize) training frames from one or MORE sequences —
    the reference's corr model is category-level, so `run.py corr` accepts
    several sequences (robot/real: --seq_path A B C; sapien: --sapien_idx
    i j k) and pools their frames. Each sequence is normalized exactly as
    setup_flow will normalize it at fit time."""
    import copy

    import jax.numpy as jnp

    from reart_tpu.flow import normalize_pc_list

    blocks = []
    if args.data_domain == "sapien":
        dataset = load_dataset(args, "sapien")
        for idx in args.sapien_idx:
            sample = dataset[idx]
            complete = np.asarray(sample["complete_pc_list"], np.float32)
            centroid, scale = corr_normalization(args, "sapien", dataset,
                                                 complete)
            blocks.append(np.asarray(normalize_pc_list(
                jnp.asarray(complete), jnp.asarray(centroid), scale)))
    else:
        for sp in args.seq_path:
            sub = copy.copy(args)
            sub.seq_path = sp
            dataset = load_dataset(sub, args.data_domain)
            complete = np.asarray(dataset[0]["complete_pc_list"], np.float32)
            centroid, scale = corr_normalization(sub, args.data_domain,
                                                 dataset, complete)
            blocks.append(np.asarray(normalize_pc_list(
                jnp.asarray(complete), jnp.asarray(centroid), scale)))
    n_min = min(b.shape[1] for b in blocks)
    rng = np.random.RandomState(args.manual_seed)
    blocks = [b if b.shape[1] == n_min
              else b[:, rng.choice(b.shape[1], n_min, replace=False)]
              for b in blocks]
    return np.concatenate(blocks, axis=0), [b.shape[0] for b in blocks]


def run_train_corr(args):
    """`run.py corr`: self-train the correspondence backbone on the
    sequences' own frames (train/corr.py) and save a --corr_model_path
    checkpoint."""
    import jax.numpy as jnp

    from reart_tpu.models.pointnet2 import save_corr_model
    from reart_tpu.train.corr import (
        CorrTrainConfig,
        match_precision,
        synth_pair,
        train_corr,
    )

    frames, block_sizes = _corr_training_frames(args)

    cfg = CorrTrainConfig(
        steps=args.steps, batch=args.batch,
        n_points=min(args.train_points, frames.shape[1]),
        k_parts=args.k_parts, max_angle=args.max_angle,
        temperature=args.temperature, lr=args.lr,
        dispatch_chunk=args.dispatch_chunk,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        resample=bool(args.resample), pos_radius=args.pos_radius,
        neg_radius=args.neg_radius)
    mesh = None
    if len(jax.devices()) > 1 and args.batch % len(jax.devices()) == 0:
        from reart_tpu.parallel import make_mesh

        mesh = make_mesh()  # all devices on "seq": batch data parallel
        print(f"data-parallel over {len(jax.devices())} devices")
    key = jax.random.PRNGKey(args.manual_seed)
    print(f"training corr backbone: {frames.shape[0]} frames x "
          f"{frames.shape[1]} pts, {cfg.steps} steps x batch {cfg.batch} "
          f"@ {cfg.n_points} pts")
    params, losses = train_corr(
        key, frames, cfg, mesh=mesh,
        checkpoint_path=args.train_checkpoint,
        log_fn=lambda s, l: print(f"  step {s}/{cfg.steps} loss {l:.3f}",
                                  flush=True))

    if args.self_finetune_steps > 0:
        from reart_tpu.train.corr import finetune_real_pairs

        print(f"self-finetune on real consecutive pairs: "
              f"{args.self_finetune_steps} steps, "
              f"{args.self_finetune_rounds} mining rounds "
              f"(th {args.self_finetune_th}, real_frac "
              f"{args.self_finetune_real_frac})")
        params, ft_losses = finetune_real_pairs(
            jax.random.fold_in(key, 777), params, frames, cfg,
            steps=args.self_finetune_steps, mine_th=args.self_finetune_th,
            rounds=args.self_finetune_rounds,
            real_frac=args.self_finetune_real_frac,
            refine_k=args.self_finetune_refine_k,
            log_fn=lambda r, m: print(
                f"  mining round {r}: {m:.3f} of points pseudo-labeled",
                flush=True))
        losses = jnp.concatenate([jnp.asarray(losses),
                                  jnp.asarray(ft_losses)])

    # post-training evaluation: one-off metrics at new shapes — run on the
    # host backend with host-committed params (CLAUDE.md: post-fit work
    # recompiles remotely per run otherwise, unwatchdogged)
    from reart_tpu.flow import compute_corr_masks
    from reart_tpu.hostops import on_host, to_host
    from reart_tpu.models.pointnet2 import apply_pointnet2msg2

    params_h = to_host(params)
    with on_host():
        # held-out synthetic pair through the INFERENCE path (running BN
        # + SMNN); correctness is gt_pos-proximity so it is meaningful for
        # both the identity and the resampled recipe
        src, tgt, gt_pos, s = synth_pair(jax.random.PRNGKey(10_007),
                                         jnp.asarray(frames), cfg)
        prec, rate = match_precision(params_h, src, tgt, gt_pos=gt_pos,
                                     pos_radius=cfg.pos_radius * float(s))
        print(f"final loss {losses[-1]:.3f}; held-out synthetic pair: "
              f"SMNN precision {prec:.3f}, match rate {rate:.3f}")

        # matching stats on the user's REAL consecutive frames — the signal
        # the fit will consume (no GT needed: the SMNN valid fraction).
        # Pooled multi-sequence frames are one concatenated array: pairs
        # that straddle a sequence boundary are unrelated clouds, so drop
        # those rows from the stat.
        _, valid = compute_corr_masks(
            jnp.asarray(frames), lambda x: apply_pointnet2msg2(params_h, x))
        valid = np.asarray(valid)
    boundaries = set(np.cumsum(block_sizes)[:-1] - 1)  # pair t = (t, t+1)
    keep = [t for t in range(valid.shape[0]) if t not in boundaries]
    real_rate = float(valid[keep].mean()) if keep else float("nan")
    print(f"real frame pairs: SMNN match rate {real_rate:.3f} "
          f"({len(keep)} consecutive pairs)")

    save_corr_model(args.save_path, params)
    if args.save_torch:
        from reart_tpu.models.pointnet2 import save_corr_model_torch

        save_corr_model_torch(args.save_torch, params)
        print(f"saved torch-format checkpoint {args.save_torch} "
              f"(loads strict=True into the reference's PointNet2Msg2)")
    print(f"saved {args.save_path} (use: run.py {args.data_domain} "
          f"--flow_provider corr --corr_model_path {args.save_path})")
    return {"loss": float(losses[-1]), "precision": prec, "match_rate": rate,
            "real_match_rate": real_rate, "save_path": args.save_path}


def kinematic_from_tree(args, domain: str, cano_pc, seg_part, trans_list,
                        joint_connection, pad_depth=None):
    """seg/poses/tree -> (params, state): screw extraction + graph build
    (run_robot.py:117-124, run_sapien.py:117-127). P/E-dependent shapes run
    on the host backend (a fresh remote compile per part count otherwise)."""
    from reart_tpu.graph import extract_kinematic
    from reart_tpu.graph.kinematics import build_graph
    from reart_tpu.models.kinematic import (
        init_kinematic_params,
        make_kinematic_state,
    )
    from reart_tpu.sapien_eval import compute_align_trans
    from reart_tpu.hostops import on_host

    with on_host():
        new_seg, new_trans, new_conn = extract_kinematic(
            seg_part, trans_list, joint_connection)
        t_frames = new_trans.shape[0]

        if domain == "robot":
            g, root, axis, moment, theta, edge_index = build_graph(
                new_conn, new_trans, revolute_only=True)
            state = make_kinematic_state(new_seg, cano_pc, list(g.edges()),
                                         root, pad_depth=pad_depth)
            params = init_kinematic_params(
                t_frames, state.num_edges, axis_list=axis, moment_list=moment,
                theta_list=theta)
        else:
            root_part = int(np.bincount(np.asarray(new_seg)).argmax())
            root_trans = jnp.asarray(new_trans)[:, root_part]
            align_trans = compute_align_trans(jnp.asarray(new_trans),
                                              root_trans)
            (g, root, axis, moment, theta, distance, edge_index,
             joint_type_list) = build_graph(
                new_conn, align_trans, revolute_only=False,
                root_part=root_part, return_joint_type=True,
                cano_pc=np.asarray(cano_pc), seg_part=np.asarray(new_seg))
            state = make_kinematic_state(new_seg, cano_pc, list(g.edges()),
                                         root, joint_types=joint_type_list,
                                         has_root_trans=True,
                                         pad_depth=pad_depth)
            params = init_kinematic_params(
                t_frames, state.num_edges, axis_list=axis, moment_list=moment,
                theta_list=theta, distance_list=distance,
                root_trans=root_trans)
    return params, state


def build_kinematic_from_result(args, domain: str, cano_pc, result: dict,
                                pc_list=None, cfg=None, flow_ctx=None,
                                key=None):
    """Base-result -> kinematic model construction
    (run_robot.py:104-124, run_sapien.py:95-127). With --tree_search K the
    single greedy MST is replaced by an energy-scored sweep over the MST and
    its K-1 cheapest edge-swap neighbors (see tree_search_build)."""
    from reart_tpu.graph import merging_wrapper, mst_wrapper
    from reart_tpu.sapien_eval import compute_align_trans
    from reart_tpu.hostops import on_host

    assert args.cano_idx == result["cano_idx"]
    seg_part = jnp.asarray(result["pred_cano_part"])
    trans_list = jnp.asarray(result["pred_pose_list"], jnp.float32)
    root_aligned = domain != "robot"

    def aligned_trans(seg, trans):
        if not root_aligned:
            return trans
        root_part = int(np.bincount(np.asarray(seg)).argmax())
        return compute_align_trans(trans, trans[:, root_part])

    stored = None
    if "joint_connection" in result:
        stored = np.asarray(result["joint_connection"], dtype=np.int64)
        if stored.size == 0:
            stored = None
    if stored is None:
        with on_host():  # pre-merged when a stored tree exists
            seg_part = jnp.asarray(merging_wrapper(
                seg_part, aligned_trans(seg_part, trans_list), cano_pc,
                args.merge_thr))

    ts = getattr(args, "tree_search", 0)
    if ((ts > 1 or ts < 0) and pc_list is not None
            and len(np.unique(np.asarray(seg_part))) > 2):  # >1 spanning tree
        return tree_search_build(args, domain, cano_pc, seg_part, trans_list,
                                 pc_list, cfg, flow_ctx, key,
                                 stored_tree=stored)

    if stored is not None:
        joint_connection = stored
    else:
        with on_host():
            joint_connection = mst_wrapper(
                seg_part, aligned_trans(seg_part, trans_list), cano_pc,
                num_fps=20, cano_dist_thr=args.cano_dist_thr,
                joint_cost_weight=args.lambda_joint)

    return kinematic_from_tree(args, domain, cano_pc, seg_part, trans_list,
                               joint_connection)


def _axis_excess(fitted, state, cano_pc, seg, return_detail: bool = False):
    """Mean normalized distance-beyond-object-radius of each fitted REVOLUTE
    axis from its child part's centroid (0.0 whenever every axis passes
    within the object's bounding radius — i.e. for every physically sane
    tree). Used by tree_search_build to veto translation-in-disguise
    candidates; prismatic edges are exempt (their axis is a direction).

    With return_detail, also returns one record per scored revolute edge:
    (edge_index, child, excess, theta_amp) where theta_amp is the fitted
    joint-angle amplitude max-min over frames — the displacement a far axis
    imputes to the child scales with excess * theta_amp, which is what
    separates a translation-in-disguise overfit from the harmless
    ill-conditioned axis of a barely-articulating joint."""
    axis = np.asarray(fitted["axis_list"], np.float64)
    moment = np.asarray(fitted["moment_list"], np.float64)
    theta = np.asarray(fitted["theta_list"], np.float64)
    pris = (np.zeros(len(axis), bool) if state.prismatic_mask is None
            else np.asarray(state.prismatic_mask))
    pts = np.asarray(cano_pc, np.float64)
    center = pts.mean(0)
    r_obj = float(np.linalg.norm(pts - center, axis=-1).max())
    seg = np.asarray(seg)
    exc, detail = [], []
    for e, (child, _parent) in enumerate(np.asarray(state.edges)):
        if pris[e]:
            continue
        l_vec = axis[e]
        nl = float(np.linalg.norm(l_vec))
        if nl < 1e-8:
            continue
        l_unit = l_vec / nl
        p0 = np.cross(l_unit, moment[e] / nl)  # closest axis point to origin
        mask = seg == child
        c = pts[mask].mean(0) if mask.any() else center
        d = float(np.linalg.norm(np.cross(l_unit, c - p0)))
        e_exc = max(0.0, d - r_obj) / max(r_obj, 1e-9)
        exc.append(e_exc)
        # theta spans only the T-1 fitted frames; the canonical frame's
        # implicit theta=0 must count toward amplitude or 2-frame sequences
        # (ptp of one value = 0) and one-sided motions disable the veto.
        detail.append((e, int(child), e_exc,
                       float(np.ptp(np.append(theta[:, e], 0.0)))))
    mean = float(np.mean(exc)) if exc else 0.0
    return (mean, detail) if return_detail else mean


def tree_search_build(args, domain: str, cano_pc, seg_part, trans_list,
                      pc_list, cfg, flow_ctx, key, stored_tree=None):
    """Energy-scored kinematic-tree selection (--tree_search K).

    Why: on scenes where a wrong parent is not screw-expressible
    (displaced hinges), the greedy MST's local decisions can cost the
    whole projection stage; the sweep short-fits the MST plus its K-1
    cheapest 1-edge-swap spanning-tree neighbors and keeps the tree with
    the lowest fit energy (ass + screw [+ group], the same energy the
    reference uses to select the canonical frame, run_robot.py:305-321).
    Round-5 honesty note: at reference scale with --seg_refine live,
    remaining candidates are near-ties that project equivalently, and no
    measured unsupervised criterion (energy, veto, two holdout variants)
    ranks them further — see PARITY round 5. All candidates share one
    compiled fit program: identical (P, E) and a pad_depth=P-1 path
    matrix.

    --tree_search -1 (auto, the default) sweeps K=8 but only keeps swap
    candidates whose local cost delta is within --tree_search_margin of the
    median finite inter-part edge cost: a swap that costs much more than a
    typical edge cannot be a serious rival, and when no swap passes the gate
    the sweep is skipped entirely (plain MST, zero extra fits).
    """
    import dataclasses

    from reart_tpu import metrics as M
    from reart_tpu.graph import mst_wrapper
    from reart_tpu.graph.mst import tree_candidates
    from reart_tpu.models.kinematic import kinematic_forward
    from reart_tpu.sapien_eval import compute_align_trans
    from reart_tpu.hostops import on_host, to_host
    from reart_tpu.train import fit_kinematic

    root_aligned = domain != "robot"
    with on_host():
        graph_trans = trans_list
        if root_aligned:
            root_part = int(np.bincount(np.asarray(seg_part)).argmax())
            graph_trans = compute_align_trans(trans_list,
                                              trans_list[:, root_part])
        _, cost, uni = mst_wrapper(
            seg_part, graph_trans, cano_pc, num_fps=20,
            cano_dist_thr=args.cano_dist_thr,
            joint_cost_weight=args.lambda_joint, return_cost=True)
        ts = int(getattr(args, "tree_search", 0))
        k = ts if ts > 1 else 8  # -1 = auto mode sweeps K=8
        cands, deltas = tree_candidates(cost, uni, k=k, return_deltas=True)
        if ts < 0:  # auto: gate on MST local ambiguity
            c = np.asarray(cost, np.float64)
            off = c[~np.eye(c.shape[0], dtype=bool)]
            finite = off[np.isfinite(off)]
            typical = float(np.median(finite)) if finite.size else 0.0
            margin = float(getattr(args, "tree_search_margin", 0.5))
            keep = [i for i, d in enumerate(deltas) if d <= margin * typical]
            if len(keep) < len(cands):
                print(f"tree_search auto: {len(cands) - len(keep)}/"
                      f"{len(cands) - 1} swaps above the ambiguity margin "
                      f"({margin:g} x median edge cost {typical:.4f}) — "
                      f"sweeping {len(keep)} candidate(s)", flush=True)
            cands = [cands[i] for i in keep]
            deltas = [deltas[i] for i in keep]
        if stored_tree is not None and not any(
                np.array_equal(np.sort(np.asarray(c), axis=1),
                               np.sort(stored_tree, axis=1)) for c in cands):
            cands = [stored_tree] + cands[: max(k - 1, 1)]
            deltas = [float("nan")] + deltas[: max(k - 1, 1)]

    if len(cands) == 1:  # MST locally unambiguous: plain build, no sweep
        return kinematic_from_tree(args, domain, cano_pc, seg_part,
                                   trans_list, cands[0])

    p = len(np.unique(np.asarray(seg_part)))
    pad_depth = max(p - 1, 1)
    short_cfg = dataclasses.replace(cfg, n_iter=args.tree_search_iter)
    key = key if key is not None else jax.random.PRNGKey(args.manual_seed)
    pc_host = np.asarray(pc_list)

    best = None
    for ci, cand in enumerate(cands):
        params_i, state_i = kinematic_from_tree(
            args, domain, cano_pc, seg_part, trans_list, cand,
            pad_depth=pad_depth)
        # neutralize the static tree metadata so every candidate hits the
        # SAME compiled fit program (edges/reverse_topo are pytree aux and
        # unused by the fit forward — only path_edges is)
        fit_state = dataclasses.replace(
            state_i, edges=((-1, -1),) * state_i.num_edges, reverse_topo=())
        fitted, _ = fit_kinematic(key, params_i, fit_state, short_cfg,
                                  pc_list, flow_ctx=flow_ctx)
        fitted = to_host(fitted)
        with on_host():
            pred_pc, seg_i, trans_i = kinematic_forward(
                fitted, to_host(state_i), to_host(jnp.asarray(cano_pc)))
            complete_pred = jnp.concatenate(
                [pred_pc[: args.cano_idx], jnp.asarray(cano_pc)[None],
                 pred_pc[args.cano_idx:]], 0)
            conn = np.asarray([list(e) for e in state_i.edges])
            energy = M.energy(
                pred_pc, jnp.asarray(pc_host, jnp.float32), trans_i,
                jnp.asarray(conn), np.asarray(seg_i),
                complete_pred_pc_list=complete_pred,
                include_group=domain == "robot")
        # Axis-sanity penalty: a candidate can reach LOWER energy than the
        # true tree by typing a relative translation as a REVOLUTE joint
        # about a far-away axis (any PLANAR relative motion is a pure
        # rotation about some center — a center far outside the object
        # fabricates the translation; measured: a drawer hung off a
        # rotating door fit to energy 0.0000 that way while the true star
        # tree paid 0.0077). Energy cannot see this overfit; the fitted
        # axis geometry can — but raw axis-to-object distance alone cannot
        # (measured both ways: the nao flagship's genuine trees carry
        # mean excess 0.009-0.063 from ill-conditioned axes on
        # barely-rotating joints, overlapping the fixture overfit's 0.013-
        # 0.152, and a raw mean-excess penalty flipped the flagship to a
        # worse tree). The separating quantity is the FABRICATED
        # DISPLACEMENT: excess_e * theta_amp_e ~ how far (in object radii)
        # the joint's own articulation swings the child about the
        # beyond-object part of its axis offset. Ill-conditioned axes have
        # tiny theta (product ~0); translation-in-disguise needs theta
        # large enough to fake the translation (product ~0.3 = the faked
        # displacement itself). Max over edges, not mean: one fabricated
        # joint poisons a tree regardless of how many honest edges
        # dilute it.
        excess, exc_detail = _axis_excess(fitted, state_i, cano_pc, seg_i,
                                          return_detail=True)
        fabricated = max((e_exc * th_amp for _, _, e_exc, th_amp
                          in exc_detail), default=0.0)
        holdout = None
        if getattr(args, "tree_select", "energy") == "holdout":
            from reart_tpu.selection import holdout_score

            holdout = holdout_score(key, params_i, fit_state, short_cfg,
                                    jnp.asarray(cano_pc), pc_list)
            score = holdout  # generalization only: no hand-built axis veto
        else:
            score = energy["total_err"] + fabricated
        print(f"tree_search candidate {ci}: total_err "
              f"{energy['total_err']:.4f}"
              + (f" fabricated {fabricated:.3f}" if fabricated else "")
              + (f" holdout {holdout:.5f}" if holdout is not None else "")
              + f" local_delta {deltas[ci]:.4f} edges {conn.tolist()}",
              flush=True)
        if excess > 0 and os.environ.get("REART_TREE_SEARCH_DEBUG"):
            # per-edge veto diagnostics: fitted theta amplitude vs the
            # BASE-pose relative rotation amplitude of the same part pair
            # (compacted label i <-> uni[i]; base poses are per raw label)
            base_tr = np.asarray(trans_list, np.float64)
            for e, child, e_exc, th_amp in exc_detail:
                if e_exc <= 0:
                    continue
                c_raw = int(uni[child])
                p_raw = int(uni[int(np.asarray(state_i.edges)[e][1])])
                rel = (np.linalg.inv(base_tr[:, p_raw]) @ base_tr[:, c_raw])
                tr = np.clip((np.trace(rel[:, :3, :3], axis1=1, axis2=2)
                              - 1.0) / 2.0, -1.0, 1.0)
                ang = np.arccos(tr)
                print(f"  edge {e} child {c_raw}: excess {e_exc:.3f} "
                      f"theta_amp {th_amp:.3f} base_rel_rot_amp "
                      f"{float(np.ptp(ang)):.3f}", flush=True)
        if best is None or score < best[0]:
            best = (score, ci, fitted, cand, energy["total_err"])

    _, ci, fitted, cand, err = best
    print(f"tree_search: selected candidate {ci} "
          f"(total_err {err:.4f})", flush=True)
    # rebuild the winner at its natural path depth (params are
    # depth-independent) and warm-start the full fit from its short fit;
    # re-commit both to the accelerator (host-committed leaves would force
    # the full fit's Pallas program to lower for CPU)
    from reart_tpu.hostops import to_accel

    _, state = kinematic_from_tree(args, domain, cano_pc, seg_part,
                                   trans_list, cand)
    return to_accel(fitted), to_accel(state)


# ---------------------------------------------------------------------------
# mid-fit snapshot metrics (reference run_robot.py:224-269: the i %
# snapshot_gap block runs the RAW-argmax-seg metrics, no graph stage)
# ---------------------------------------------------------------------------

def snapshot_metrics_row(domain: str, sample, cano_idx: int, seg_part,
                         trans_list) -> dict:
    """One mid-fit metric row on the current forward: flow EPE/acc/angle
    (robot), RI, recon, CD — exactly the reference's snapshot prints."""
    from reart_tpu import metrics as M
    from reart_tpu.models.base_model import compute_pc_transform

    cano_pc = jnp.asarray(sample["cano_pc"], jnp.float32)
    pred = np.asarray(compute_pc_transform(
        cano_pc, jnp.asarray(trans_list), jnp.asarray(seg_part)))
    complete_pred = np.concatenate(
        [pred[:cano_idx], np.asarray(cano_pc)[None], pred[cano_idx:]], 0)
    scale = 100.0 if domain == "robot" else 1.0
    row = {}
    if domain == "robot" and "gt_flow_list" in sample:
        pred_flow = complete_pred[1:] - complete_pred[:-1]
        epe, acc1, acc2, angle = M.eval_flow(
            pred_flow, sample["gt_flow_list"], 0.005, 0.01)
        row.update(flow_epe=epe * 100.0, flow_acc5=acc1, flow_acc10=acc2,
                   flow_angle=angle)
    if "gt_cano_part" in sample:
        row["seg_ri"] = M.eval_seg(jnp.asarray(sample["gt_cano_part"]),
                                   jnp.asarray(seg_part))
    if "complete_gt_pc_list" in sample:
        mse = np.sqrt(((complete_pred - sample["complete_gt_pc_list"]) ** 2
                       ).sum(-1)).mean(1).mean()
        row["recon_err"] = float(mse) * scale
    row["cd_err"] = M.compute_chamfer_list(
        pred, sample["pc_list"], reduction="mean") * scale
    return row


def snapshot_graph_row(args, domain: str, sample, seg_part,
                       trans_list) -> dict:
    """The reference's FULL snapshot block also runs the host graph stage
    every snapshot_gap iterations — denoise (run_robot.py:232), merge
    (:234), MST (:240) — plus the selection energy (:306-314). One row of
    mid-fit tree observability: part count, edge list, energy terms."""
    from reart_tpu.graph import (
        denoise_seg_label,
        extract_kinematic,
        merging_wrapper,
        mst_wrapper,
    )
    from reart_tpu import metrics as M
    from reart_tpu.models.base_model import compute_pc_transform
    from reart_tpu.sapien_eval import compute_align_trans

    cano_pc = jnp.asarray(sample["cano_pc"], jnp.float32)
    cano_idx = args.cano_idx
    seg = np.asarray(seg_part)
    trans = jnp.asarray(trans_list)

    def aligned(tr):
        if domain == "robot":
            return tr
        root_part = int(np.bincount(seg).argmax())
        return compute_align_trans(tr, tr[:, root_part])

    seg = np.asarray(denoise_seg_label(seg, cano_pc, min_num=20))
    if len(np.unique(seg)) > 1:
        seg = np.asarray(merging_wrapper(
            seg, aligned(trans), cano_pc, args.merge_thr,
            n_it=args.merge_it))
    if len(np.unique(seg)) > 1:
        conn = np.asarray(mst_wrapper(
            seg, aligned(trans), cano_pc, num_fps=20,
            cano_dist_thr=args.cano_dist_thr,
            joint_cost_weight=args.lambda_joint))
    else:
        conn = np.zeros((0, 2), np.int64)
    if conn.shape[0] > 0:
        seg, trans, conn = extract_kinematic(seg, trans, conn)
    else:
        lab = int(np.unique(seg)[0])
        seg = np.zeros_like(seg)
        trans = trans[:, lab:lab + 1]

    pred = np.asarray(compute_pc_transform(cano_pc, jnp.asarray(trans),
                                           jnp.asarray(seg)))
    complete_pred = np.concatenate(
        [pred[:cano_idx], np.asarray(cano_pc)[None], pred[cano_idx:]], 0)
    e = M.energy(pred, jnp.asarray(sample["pc_list"], jnp.float32),
                 jnp.asarray(trans), conn, seg,
                 complete_pred_pc_list=complete_pred,
                 include_group=domain == "robot")
    row = {"parts": len(np.unique(seg)), "edges": np.asarray(conn).tolist()}
    row.update({k: float(v) for k, v in e.items()})
    return row


class SnapshotEvaluator:
    """Asynchronous mid-fit metric evaluation: engine.fit's snapshot_cb runs
    on the dispatch-issuing thread and must not stall the pipeline, so the
    callback only transfers the fenced params to host and enqueues them; a
    worker thread runs the forward + snapshot_metrics_row on the HOST
    backend (on_host — jax.default_device is thread-local) and collects
    `iteration N | k: v | ...` rows for result.txt. With `graph_args` set
    (--snapshot_graph) each row additionally carries the host graph stage +
    energy (snapshot_graph_row — the reference's full snapshot depth)."""

    def __init__(self, domain, sample, cano_idx, forward_of,
                 graph_args=None):
        import queue
        import threading

        self.rows = []
        self._q = queue.Queue()
        self._domain, self._sample = domain, sample
        self._cano_idx, self._forward_of = cano_idx, forward_of
        self._graph_args = graph_args
        self._t = threading.Thread(target=self._work, daemon=True)
        self._t.start()

    def callback(self, done, params):
        self._q.put((done, jax.tree.map(np.asarray, params)))

    @staticmethod
    def _fmt(v):
        return f"{v:.3f}" if isinstance(v, float) else str(v)

    def _work(self):
        from reart_tpu.hostops import on_host

        while True:
            item = self._q.get()
            if item is None:
                return
            done, params_h = item
            try:
                with on_host():
                    seg_part, trans_list = self._forward_of(params_h)
                    row = snapshot_metrics_row(
                        self._domain, self._sample, self._cano_idx,
                        np.asarray(seg_part), np.asarray(trans_list))
                    if self._graph_args is not None:
                        row.update(snapshot_graph_row(
                            self._graph_args, self._domain, self._sample,
                            seg_part, trans_list))
                msg = " | ".join(f"{k}: {self._fmt(v)}"
                                 for k, v in row.items())
                self.rows.append(f"snapshot {done} | {msg}")
                print(f"[snapshot {done}] {msg}", flush=True)
            except Exception as e:  # never kill the fit over a metric row
                print(f"[snapshot {done}] failed: {e}", flush=True)

    def finish(self) -> list:
        self._q.put(None)
        self._t.join(timeout=600.0)
        return self.rows


# ---------------------------------------------------------------------------
# final snapshot: graph extraction + metrics + artifacts
# ---------------------------------------------------------------------------

def finalize(args, domain: str, dataset, sample, seg_part, trans_list,
             params, state, save_dir: str, tau: float,
             snapshot_rows=None):
    """Everything the reference does at i == n_iter - 1
    (run_robot.py:224-356 and the sapien/real equivalents)."""
    from reart_tpu.graph import (
        denoise_seg_label,
        extract_kinematic,
        merging_wrapper,
        mst_wrapper,
    )
    from reart_tpu.graph.costs import compute_root_cost
    from reart_tpu.models.base_model import compute_pc_transform
    from reart_tpu import metrics as M
    from reart_tpu.sapien_eval import compute_align_trans
    from reart_tpu import checkpoint as ckpt
    from reart_tpu import viz

    from reart_tpu.hostops import on_host
    from reart_tpu.profiling import phase_timer

    quiet = getattr(args, "silence", False)

    def sub(name):
        return phase_timer(f"finalize/{name}", verbose=not quiet)

    cano_pc = jnp.asarray(sample["cano_pc"], jnp.float32)
    cano_idx = args.cano_idx
    is_kinematic = state is not None
    root_aligned = domain != "robot"

    def aligned(trans):
        if not root_aligned:
            return trans
        root_part = int(np.bincount(seg_part).argmax())
        return compute_align_trans(jnp.asarray(trans), jnp.asarray(trans)[:, root_part])

    # Motion-consistency segmentation E-step (base stage only; round 5).
    # The reference-scale projection ablation attributes the sapien full-flow
    # EPE residual to canonical seg error, not topology: with the fitted seg
    # the projection scores 3.93 EPE, with GT seg 0.67 — and this E-step
    # (relabel each point to the part whose fitted trajectory best
    # reconstructs it, margin-guarded) measured 3.93 -> 0.44 on the same
    # scene (cano RI 0.880 -> 0.975). Runs on the accelerator (batched
    # fused-NN kernels) BEFORE the host graph stage.
    if not is_kinematic and getattr(args, "seg_refine", 2) > 0:
        from reart_tpu.models.base_model import refine_seg_motion

        with sub("seg_refine"):
            seg_part = np.asarray(refine_seg_motion(
                cano_pc, jnp.asarray(sample["pc_list"], jnp.float32),
                jnp.asarray(trans_list), seg_part,
                n_it=int(args.seg_refine)))

    # graph stage on the host backend: tiny P-dependent programs would
    # otherwise recompile over the TPU tunnel for every new part count
    with sub("graph"), on_host():
        seg_part = np.asarray(denoise_seg_label(seg_part, cano_pc, min_num=20))
        if not is_kinematic and len(np.unique(seg_part)) > 1:
            seg_part = np.asarray(merging_wrapper(
                seg_part, aligned(trans_list), cano_pc, args.merge_thr,
                n_it=args.merge_it))
        if is_kinematic:
            joint_connection = np.asarray([list(e) for e in state.edges])
        elif len(np.unique(seg_part)) > 1:
            joint_connection = mst_wrapper(
                seg_part, aligned(trans_list), cano_pc, num_fps=20,
                cano_dist_thr=args.cano_dist_thr,
                joint_cost_weight=args.lambda_joint)
        else:  # degenerate single-part fit: rigid object, no tree
            joint_connection = np.zeros((0, 2), np.int64)
        if joint_connection.shape[0] > 0:
            seg_part, trans_list, joint_connection = extract_kinematic(
                seg_part, trans_list, joint_connection)
        else:
            lab = int(np.unique(seg_part)[0])
            seg_part = np.zeros_like(seg_part)
            trans_list = np.asarray(trans_list)[:, lab:lab + 1]
    joint_connection_list = np.asarray(joint_connection).tolist()

    with on_host():
        pred_pc = compute_pc_transform(cano_pc, jnp.asarray(trans_list),
                                       jnp.asarray(seg_part))
    pred_pc_np = np.asarray(pred_pc)
    complete_pred = np.concatenate(
        [pred_pc_np[:cano_idx], np.asarray(cano_pc)[None], pred_pc_np[cano_idx:]], 0)

    results = {}
    lines = []

    has_gt = "gt_flow_list" in sample
    with sub("metrics"), on_host():
        if has_gt:
            pred_flow = complete_pred[1:] - complete_pred[:-1]
            if domain == "robot":
                epe, acc1, acc2, angle = M.eval_flow(
                    pred_flow, sample["gt_flow_list"], 0.005, 0.01)
                epe *= 100.0
                results.update(flow_epe=epe, flow_acc5=acc1, flow_acc10=acc2,
                               flow_angle=angle)
            ri = M.eval_seg(jnp.asarray(sample["gt_cano_part"]),
                            jnp.asarray(seg_part))
            results["seg_ri"] = ri
            mse = np.sqrt(((complete_pred - sample["complete_gt_pc_list"]) ** 2
                           ).sum(-1)).mean(1).mean()
            results["recon_err"] = float(mse) * (100.0 if domain == "robot" else 1.0)

        cd = M.compute_chamfer_list(pred_pc_np, sample["pc_list"],
                                    reduction="mean")
        results["cd_err"] = cd * (100.0 if domain == "robot" else 1.0)

    if domain == "sapien" and "gt_full_flow" in sample:
        from reart_tpu.sapien_eval import (
            compute_full_flow, eval_full_flow, seg_propagation_list)

        with sub("sapien_eval"), on_host():
            seg_list = seg_propagation_list(sample["pc_list"], pred_pc_np,
                                            seg_part)
            eye = jnp.eye(4)[None, None].repeat(trans_list.shape[1], 1)
            complete_trans = jnp.concatenate(
                [jnp.asarray(trans_list)[:cano_idx], eye,
                 jnp.asarray(trans_list)[cano_idx:]], 0)
            complete_seg = jnp.concatenate(
                [seg_list[:cano_idx], jnp.asarray(seg_part)[None],
                 seg_list[cano_idx:]], 0)
            full_flow = compute_full_flow(sample["complete_pc_list"],
                                          complete_seg, complete_trans)
            results["full_flow_epe"] = 100.0 * eval_full_flow(
                full_flow, sample["gt_full_flow"])
            per_ri = np.mean([
                M.eval_seg(g, p) for g, p in
                zip(jnp.asarray(sample["complete_gt_part_list"]), complete_seg)])
            results["per_scan_ri"] = float(per_ri)
            results["multi_scan_ri"] = M.eval_seg(
                jnp.asarray(sample["complete_gt_part_list"]).reshape(-1),
                complete_seg.reshape(-1))

    # retargeting (robot kinematic only — run_robot.py:286-290)
    if domain == "robot":
        if is_kinematic:
            from reart_tpu.ik import ik

            with sub("ik"), on_host():
                results["retarget_err"] = ik(
                    dataset, "kinematic", params, state=state, tau=tau,
                    save_dir=save_dir, save_vis=True)
        else:
            results["retarget_err"] = 9999.0

        # TED vs GT graph (run_robot.py:296-303)
        from reart_tpu.data.common import load_gt_graph
        from reart_tpu.graph.ted import compute_ted, find_root_node

        with sub("ted"), on_host():
            root_cost = np.asarray(compute_root_cost(jnp.asarray(trans_list)))
            labels = (np.unique(joint_connection)
                      if len(joint_connection_list) else np.array([0]))
            pred_root = int(labels[root_cost.argmin()])
            _, gt_edges = load_gt_graph(args.seq_path)
            results["ted"] = compute_ted(joint_connection_list, pred_root,
                                         gt_edges, find_root_node(gt_edges))

    # energy (train only — run_robot.py:305-321, run_sapien.py:323-331)
    if not args.evaluate:
        with sub("energy"), on_host():
            energy = M.energy(
                pred_pc, jnp.asarray(sample["pc_list"], jnp.float32),
                jnp.asarray(trans_list), jnp.asarray(joint_connection),
                seg_part, complete_pred_pc_list=jnp.asarray(complete_pred),
                include_group=domain == "robot")
        results.update(energy)

        ckpt.save_result(
            os.path.join(save_dir, "result.pkl"), seg_part, trans_list,
            cano_idx, joint_connection_list, sample)
        ckpt.save_checkpoint(
            os.path.join(save_dir, "model.ckpt.pkl"), params, tau, cano_idx,
            state=state)

    # artifacts
    with sub("viz"):
        viz.vis_pc_seq(complete_pred, pred_part=seg_part, name="reconstruct",
                       save_path=os.path.join(save_dir, "recon.gif"))
        if has_gt:
            viz.vis_pc_seq(sample["complete_gt_pc_list"],
                           pred_part=sample["gt_cano_part"], name="gt",
                           save_path=os.path.join(save_dir, "gt.gif"))
            viz.vis_pc(np.asarray(cano_pc), seg_part,
                       gt_part=sample["gt_cano_part"],
                       save_path=os.path.join(save_dir, "seg.html"))
        else:
            viz.vis_pc(np.asarray(cano_pc), seg_part,
                       save_path=os.path.join(save_dir, "seg.html"))
        viz.vis_structure(np.asarray(cano_pc), seg_part, joint_connection_list,
                          save_path=os.path.join(save_dir, "structure.html"))

    for k, v in results.items():
        lines.append(f"{k}: {v:.3f}")
    if snapshot_rows:
        lines.extend(["", "# mid-fit snapshots (--snapshot_metrics)"]
                     + list(snapshot_rows))
    with open(os.path.join(save_dir, "result.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return results


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def _stack_flow_contexts(ctxs):
    """Batch per-sequence FlowContexts: pad anchors to a common M (FAR
    points / zero flow, same padding contract as FlowContext.from_lists)."""
    if any(c is None for c in ctxs):
        return None
    from reart_tpu.train import FlowContext
    from reart_tpu.train.engine import FAR

    m = max(int(c.pc_ref.shape[1]) for c in ctxs)
    pcs, fls = [], []
    for c in ctxs:
        pad = m - int(c.pc_ref.shape[1])
        pcs.append(np.pad(np.asarray(c.pc_ref), ((0, 0), (0, pad), (0, 0)),
                          constant_values=FAR))
        fls.append(np.pad(np.asarray(c.flow_ref), ((0, 0), (0, pad), (0, 0))))
    return FlowContext(jnp.asarray(np.stack(pcs)), jnp.asarray(np.stack(fls)))


def run_batch_seq(args, dataset):
    """`--batch_seq i,j,k`: fit the relaxation stage of several sapien
    sequences as ONE mesh-sharded batch (sequences ride the device mesh's
    "seq" axis), then run the per-sequence graph/metrics/artifact finalize
    sequentially on the host. The reference's equivalent is one process per
    index (SURVEY §2.7)."""
    import copy

    from reart_tpu import viz
    from reart_tpu.parallel import fit_base_sequences, make_mesh
    from reart_tpu.profiling import phase_report, phase_timer

    idxs = [int(s) for s in args.batch_seq.split(",")]
    samples = [dataset[i] for i in idxs]
    cano_b = np.stack([np.asarray(s["cano_pc"], np.float32) for s in samples])
    pc_b = np.stack([np.asarray(s["pc_list"], np.float32) for s in samples])

    flow_b = None
    if args.use_flow_loss:
        ctxs = []
        for i, s in zip(idxs, samples):
            a = args
            if args.flow_file and "{" in args.flow_file:
                a = copy.copy(args)
                a.flow_file = args.flow_file.format(idx=i)
            ctxs.append(setup_flow(a, "sapien", dataset, s))
        flow_b = _stack_flow_contexts(ctxs)

    cfg = fit_config(args, "sapien")
    mesh = make_mesh()
    print(f"batch_seq: fitting {len(idxs)} sequences over "
          f"{mesh.devices.size}-device mesh {dict(mesh.shape)}")
    with phase_timer("fit"):
        fits = fit_base_sequences(
            jax.random.PRNGKey(args.manual_seed), cfg, cano_b, pc_b,
            args.cano_idx, args.num_parts, mesh, flow_b=flow_b)

    for i, sample, (params, seg, trans) in zip(idxs, samples, fits):
        save_dir = os.path.join(args.save_root, str(i))
        os.makedirs(save_dir, exist_ok=True)
        viz.vis_pc_seq(sample["complete_pc_list"], name="input",
                       save_path=os.path.join(save_dir, "input.gif"))
        with phase_timer(f"finalize/{i}"):
            finalize(args, "sapien", dataset, sample, np.asarray(seg),
                     np.asarray(trans), params, None, save_dir, args.end_tau)
    print(f"[phases] {phase_report()}")
    print("all done!")


def main(argv=None):
    args = build_parser().parse_args(argv)
    domain = args.domain
    np.random.seed(args.manual_seed)

    # honor JAX_PLATFORMS even when a TPU plugin self-registers via
    # sitecustomize and would otherwise ignore the env var
    plat = os.environ.get("JAX_PLATFORMS")
    if plat and plat != "axon":
        jax.config.update("jax_platforms", plat)

    if domain == "corr":
        return run_train_corr(args)

    from reart_tpu import checkpoint as ckpt
    from reart_tpu import viz
    from reart_tpu.models.base_model import base_forward, init_base_params
    from reart_tpu.models.kinematic import kinematic_forward
    from reart_tpu.train import fit_base, fit_kinematic

    dataset = load_dataset(args, domain)

    if domain == "sapien" and getattr(args, "batch_seq", None):
        assert args.model == "base" and not args.evaluate, \
            "--batch_seq fits base-model relaxations (train only)"
        return run_batch_seq(args, dataset)

    sample = dataset[args.sapien_idx] if domain == "sapien" else dataset[0]

    if getattr(args, "auto_cano", False) and args.model == "base" \
            and not args.evaluate:
        import dataclasses as _dc

        from reart_tpu.selection import select_canonical_frame

        sel_cfg = _dc.replace(
            fit_config(args, domain),
            n_iter=args.auto_cano_iters or max(100, args.n_iter // 10),
            use_flow_loss=False,
        )
        mesh = None
        if len(jax.devices()) > 1:  # fan candidates over the device mesh
            from reart_tpu.parallel import make_mesh

            mesh = make_mesh()
        best, energies = select_canonical_frame(
            jax.random.PRNGKey(args.manual_seed),
            sample["complete_pc_list"], sel_cfg, args.num_parts,
            include_group=domain == "robot", mesh=mesh)
        print(f"auto_cano: selected frame {best} "
              f"(energies {[round(e['total_err'], 3) for e in energies.values()]})")
        args.cano_idx = best
        dataset = load_dataset(args, domain)
        sample = dataset[args.sapien_idx] if domain == "sapien" else dataset[0]
    seq_name = (str(args.sapien_idx) if domain == "sapien"
                else args.seq_path.rstrip("/").split("/")[-1])
    save_dir = os.path.join(args.save_root, seq_name)
    os.makedirs(save_dir, exist_ok=True)

    viz.vis_pc_seq(sample["complete_pc_list"], name="input",
                   save_path=os.path.join(save_dir, "input.gif"))

    cano_pc = jnp.asarray(sample["cano_pc"], jnp.float32)
    pc_list = jnp.asarray(sample["pc_list"], jnp.float32)
    flow_ctx = setup_flow(args, domain, dataset, sample)
    cfg = fit_config(args, domain)
    key = jax.random.PRNGKey(args.manual_seed)
    tau = args.end_tau

    def is_torch_ckpt(path):
        with open(path, "rb") as f:
            return f.read(2) == b"PK"  # torch.save zip container

    state = None
    if args.model == "base":
        params = init_base_params(key, args.num_parts, pc_list.shape[0])
        if args.resume:
            if is_torch_ckpt(args.resume[0]):
                params, tau, ck_cano = ckpt.load_torch_base(args.resume[0])
                assert ck_cano == args.cano_idx, "checkpoint cano_idx mismatch"
            else:
                payload = ckpt.load_checkpoint(args.resume[0])
                params = jax.tree.map(jnp.asarray, payload["state_dict"])
                tau = payload["tau"]
    else:
        if args.resume:
            if is_torch_ckpt(args.resume[0]):
                params, state, tau, ck_cano = ckpt.load_torch_kinematic(
                    args.resume[0])
                assert ck_cano == args.cano_idx, "checkpoint cano_idx mismatch"
            else:
                payload = ckpt.load_checkpoint(args.resume[0])
                params = jax.tree.map(jnp.asarray, payload["state_dict"])
                state = ckpt.restore_kinematic_state(payload)
                tau = payload.get("tau", tau)
        else:
            assert args.base_result_path is not None
            result = ckpt.load_result(args.base_result_path)
            params, state = build_kinematic_from_result(
                args, domain, cano_pc, result, pc_list=pc_list, cfg=cfg,
                flow_ctx=flow_ctx, key=key)

    from reart_tpu.profiling import device_trace, phase_report, phase_timer
    import contextlib

    snap_eval = None
    if not args.evaluate:
        if (getattr(args, "snapshot_metrics", False)
                or getattr(args, "snapshot_graph", False)):
            from reart_tpu.hostops import to_host as _th

            cano_h = _th(cano_pc)
            state_h = _th(state) if state is not None else None
            if args.model == "base":
                fwd_of = lambda p: base_forward(p, cano_h, key, tau=1.0)[1:]
            else:
                fwd_of = lambda p: kinematic_forward(p, state_h, cano_h)[1:]
            snap_eval = SnapshotEvaluator(
                domain, sample, args.cano_idx, fwd_of,
                graph_args=(args if getattr(args, "snapshot_graph", False)
                            else None))
        trace = (device_trace(args.trace_dir) if args.trace_dir
                 else contextlib.nullcontext())
        fit_mesh = None
        if getattr(args, "frame_shard", "auto") == "auto" \
                and jax.device_count() > 1:
            from reart_tpu.parallel import make_mesh
            fit_mesh = make_mesh(seq=1, frame=jax.device_count())
        with phase_timer("fit"), trace:
            if args.model == "base":
                params, hist = fit_base(key, params, cfg, cano_pc, pc_list,
                                        flow_ctx=flow_ctx,
                                        log_every=args.snapshot_gap,
                                        checkpoint_dir=save_dir,
                                        snapshot_cb=(snap_eval.callback
                                                     if snap_eval else None),
                                        snapshot_every=args.snapshot_gap,
                                        mesh=fit_mesh)
            else:
                params, hist = fit_kinematic(key, params, state, cfg, pc_list,
                                             flow_ctx=flow_ctx,
                                             log_every=args.snapshot_gap,
                                             checkpoint_dir=save_dir,
                                             snapshot_cb=(
                                                 snap_eval.callback
                                                 if snap_eval else None),
                                             snapshot_every=args.snapshot_gap,
                                             mesh=fit_mesh)
            jax.block_until_ready(hist)
        print(f"fit done: final total_loss {float(hist['total_loss'][-1]):.3f}")
        tau = args.end_tau

    # final forward (reference i == n_iter - 1 re-forward, run_robot.py:229-230)
    # and everything downstream run on the HOST backend: these are tiny,
    # P/E-dependent-shape programs that would otherwise each pay a fresh
    # 30s+ remote compile over the TPU tunnel for millisecond-scale compute
    from reart_tpu.hostops import on_host, to_host

    params = to_host(params)
    state = to_host(state) if state is not None else None
    with on_host():
        if args.model == "base":
            _, seg_part, trans_list = base_forward(
                params, to_host(cano_pc), key, tau=1.0)
        else:
            _, seg_part, trans_list = kinematic_forward(
                params, state, to_host(cano_pc))

    with phase_timer("finalize"):
        finalize(args, domain, dataset, sample, np.asarray(seg_part),
                 np.asarray(trans_list), params, state, save_dir, tau,
                 snapshot_rows=snap_eval.finish() if snap_eval else None)
    print(f"[phases] {phase_report()}")
    print("all done!")

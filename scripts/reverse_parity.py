#!/usr/bin/env python
"""Reverse-direction parity: run the REFERENCE's own evaluator over OUR fit.

The forward direction (reference checkpoints through our evaluator) is in
PARITY.md; this closes the loop: export our fitted base/kinematic model as a
reference-format torch checkpoint (checkpoint.save_torch_{base,kinematic})
and drive /root/reference/run_robot.py --evaluate on it, CPU-only, with the
pure-torch stand-ins under scripts/refstubs/ supplying the CUDA wheels the
reference imports (knn_cuda, chamferdist._C) and the absent apted/plotly
packages. The reference code is UNMODIFIED — only missing third-party
modules are stubbed and the networkx-3.x-removed read_gpickle is restored.

Usage:
  python scripts/reverse_parity.py --ckpt <ours/model.ckpt.pkl> \
      --model kinematic --seq_path /root/reference/demo_data/data/nao \
      --save_root /tmp/revparity [--ours_result <ours/result.txt>]

Prints the reference evaluator's result.txt and, when --ours_result is
given, a side-by-side table.
"""

import argparse
import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def export_checkpoint(ckpt_path: str, model: str, out_path: str) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the TPU tunnel

    from reart_tpu import checkpoint as ckpt

    payload = ckpt.load_checkpoint(ckpt_path)
    cano_idx = int(payload.get("cano_idx", 0))
    if model == "kinematic":
        state = ckpt.restore_kinematic_state(payload)
        ckpt.save_torch_kinematic(out_path, payload["state_dict"], state,
                                  payload.get("tau", 1.0), cano_idx)
    else:
        ckpt.save_torch_base(out_path, payload["state_dict"],
                             payload.get("tau", 1.0), cano_idx)
    return cano_idx


def _enter_reference():
    sys.path.insert(0, os.path.join(REPO, "scripts", "refstubs"))
    sys.path.insert(0, REFERENCE)

    import networkx as nx

    if not hasattr(nx, "read_gpickle"):  # removed in networkx >= 3.0
        nx.read_gpickle = lambda p: pickle.load(open(p, "rb"))
    cwd = os.getcwd()
    os.chdir(REFERENCE)  # the reference resolves some paths relative to it
    return cwd


def run_reference_eval(torch_ckpt: str, model: str, seq_path: str,
                       save_root: str, cano_idx: int, num_points: int,
                       num_parts: int) -> str:
    """Import the unmodified reference run_robot and call its main() with an
    --evaluate namespace. Returns the path of the result.txt it writes."""
    cwd = _enter_reference()
    try:
        import run_robot

        args = argparse.Namespace(
            manual_seed=2, resume=[torch_ckpt], evaluate=True,
            snapshot_gap=100, use_cuda=0, cano_idx=cano_idx,
            num_points=num_points, seq_path=seq_path,
            normalize_file="data/category_normalize_scale.pkl",
            start_tau=5.0, end_tau=1.0, seg_lr=1e-3, trans_lr=1e-2,
            weight_decay=0.0, n_iter=15000, assign_iter=5000,
            num_parts=num_parts, model=model, base_result_path=None,
            corr_model_path="pretrained/corr_model.pth.tar",
            use_flow_loss=False, use_robust_loss=False,
            use_assign_loss=False, use_nproc=False, downsample=4,
            assign_gap=5, lambda_assign=3e-1, lambda_flow=1.0,
            lambda_joint=100.0, cano_dist_thr=1e-2, merge_thr=3e-2,
            merge_it=2, save_root=save_root,
        )
        run_robot.main(args)
    finally:
        os.chdir(cwd)
    seq_name = seq_path.rstrip("/").split("/")[-1]
    return os.path.join(save_root, seq_name, "result.txt")


def run_reference_eval_sapien(torch_ckpt: str, model: str, base_folder: str,
                              save_root: str, cano_idx: int,
                              num_parts: int) -> str:
    """Drive the unmodified /root/reference/run_sapien.py --evaluate over our
    exported checkpoint (run_sapien.py:128-143 resume; :268-298 the
    full-flow-EPE / per-scan-RI / multi-scan-RI eval whose result.txt we
    parse). The msync package the reference imports at module scope
    (run_sapien.py:25, sapien_utils.py:15-17, dataset_sapien.py:5) is
    supplied by scripts/refstubs/msync — a real Isometry (the dataset
    composes GT motion with it) plus inert net shells; the flow nets are
    never constructed under --evaluate without --use_flow_loss."""
    cwd = _enter_reference()
    try:
        import run_sapien

        args = argparse.Namespace(
            manual_seed=2, resume=[torch_ckpt], evaluate=True,
            snapshot_gap=100, use_cuda=0, cano_idx=cano_idx,
            seq_path="", start_tau=1.0, end_tau=1.0, seg_lr=1e-3,
            trans_lr=1e-2, weight_decay=0.0, n_iter=2000, assign_iter=1000,
            num_parts=num_parts, model=model, base_result_path=None,
            use_flow_loss=False, use_assign_loss=False, use_nproc=False,
            downsample=1, assign_gap=5, lambda_assign=3e-1, lambda_flow=1.0,
            lambda_joint=1e-1, cano_dist_thr=1e-2, merge_thr=3e-2,
            merge_it=3, save_root=save_root,
            sapien_base_folder=base_folder, sapien_idx=0,
            flow_model_config_path="msync/config/articulated-full.yaml",
            flow_model_path="msync/ckpt/articulated-full/best.pth.tar",
        )
        run_sapien.main(args)
    finally:
        os.chdir(cwd)
    return os.path.join(save_root, "sapien_0", "result.txt")


def run_reference_eval_real(torch_ckpt: str, model: str, seq_path: str,
                            save_root: str, cano_idx: int, num_points: int,
                            num_parts: int) -> str:
    """Drive the unmodified /root/reference/run_real.py over our exported
    checkpoint. Under --evaluate the reference writes NO numeric metrics for
    the real domain (run_real.py:296-316 is gated by `not args.evaluate`),
    only the artifact set — so the numeric row comes from a one-iteration
    NON-evaluate run at trans_lr=0 (Adam with lr 0 is a no-op step;
    run_real.py:240-243 then re-forwards the unchanged parameters), which
    writes ass/cd/screw/total to result.txt. trimesh is supplied by
    scripts/refstubs/trimesh (OBJ + area-weighted surface sampling), and
    OUR loader's sampled clouds are BAKED into the stub
    (REART_REFSTUB_CLOUDS) so the reference consumes geometry identical to
    our fit's — the ass/cd row is numeric 3-decimal parity, not the
    sampling-noise-floor comparison of round 4 (VERDICT r4 #5)."""
    import numpy as np

    from reart_tpu.data.real import RealSequence

    clouds = RealSequence(seq_path, num_points=num_points,
                          cano_idx=cano_idx)[0]["complete_pc_list"]
    clouds_npz = os.path.join(save_root, "baked_clouds.npz")
    np.savez(clouds_npz, clouds=clouds)
    os.environ["REART_REFSTUB_CLOUDS"] = clouds_npz

    cwd = _enter_reference()
    try:
        import run_real

        args = argparse.Namespace(
            manual_seed=2, resume=[torch_ckpt], evaluate=False,
            snapshot_gap=100, silence=True, use_cuda=0, cano_idx=cano_idx,
            num_points=num_points, seq_path=seq_path, start_tau=1.0,
            end_tau=1.0, seg_lr=0.0, trans_lr=0.0, weight_decay=0.0,
            n_iter=1, assign_iter=1000, num_parts=num_parts, model=model,
            base_result_path=None,
            corr_model_path="pretrained/corr_model.pth.tar",
            use_flow_loss=False, use_robust_loss=False,
            use_assign_loss=False, use_nproc=False, downsample=4,
            assign_gap=5, lambda_assign=3e-1, lambda_flow=1.0,
            lambda_joint=1e-1, cano_dist_thr=1e-2, merge_thr=3e-2,
            merge_it=3, save_root=save_root, save_vis=False,
        )
        run_real.main(args)
    finally:
        os.chdir(cwd)
        os.environ.pop("REART_REFSTUB_CLOUDS", None)
    seq_name = seq_path.rstrip("/").split("/")[-1]
    return os.path.join(save_root, seq_name, "result.txt")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="our model.ckpt.pkl (checkpoint.save_checkpoint)")
    ap.add_argument("--model", default="kinematic",
                    choices=["base", "kinematic"])
    ap.add_argument("--domain", default="robot",
                    choices=["robot", "sapien", "real"])
    ap.add_argument("--seq_path",
                    default=os.path.join(REFERENCE, "demo_data/data/nao"),
                    help="robot/real sequence dir, or the sapien base "
                         "folder (meta.json + data/*.npz)")
    ap.add_argument("--save_root", default="/tmp/revparity")
    ap.add_argument("--num_points", default=4096, type=int)
    ap.add_argument("--num_parts", default=20, type=int)
    ap.add_argument("--ours_result", default=None,
                    help="our result.txt for a side-by-side table")
    args = ap.parse_args(argv)

    os.makedirs(args.save_root, exist_ok=True)
    torch_ckpt = os.path.join(args.save_root, f"export_{args.model}.pth.tar")
    cano_idx = export_checkpoint(args.ckpt, args.model, torch_ckpt)
    print(f"exported {args.ckpt} -> {torch_ckpt} (cano_idx={cano_idx})")

    if args.domain == "sapien":
        result_path = run_reference_eval_sapien(
            torch_ckpt, args.model, os.path.abspath(args.seq_path),
            os.path.abspath(args.save_root), cano_idx, args.num_parts)
    elif args.domain == "real":
        result_path = run_reference_eval_real(
            torch_ckpt, args.model, os.path.abspath(args.seq_path),
            os.path.abspath(args.save_root), cano_idx, args.num_points,
            args.num_parts)
    else:
        result_path = run_reference_eval(
            torch_ckpt, args.model, os.path.abspath(args.seq_path),
            os.path.abspath(args.save_root), cano_idx, args.num_points,
            args.num_parts)

    print("\n=== reference evaluator result.txt ===")
    ref_txt = open(result_path).read()
    print(ref_txt)
    if args.ours_result:
        print("=== ours (same fit, our evaluator) ===")
        print(open(args.ours_result).read())
    return ref_txt


if __name__ == "__main__":
    main()

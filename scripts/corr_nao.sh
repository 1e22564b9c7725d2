#!/usr/bin/env bash
# Zero-external-checkpoint nao drive: self-train the correspondence backbone
# on nao's own frames (`run.py corr` — the trainer the reference lacks; its
# corr_model.pth.tar is not bundled in the checkout), then run the full
# two-stage fit with --flow_provider corr at the auto-selected canonical
# frame (4), mirroring the gt-flow flagship recorded in PARITY.md.
#
# Usage: PYTHONPATH=/root/.axon_site:/root/repo bash scripts/corr_nao.sh
set -euo pipefail

REF=${REF:-/root/reference/demo_data}
NAO="$REF/data/nao"
OUT=${OUT:-/tmp/nao_corr}
STEPS=${STEPS:-2000}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

if [ ! -f "$OUT/normalize.pkl" ]; then
python - "$NAO" "$OUT/normalize.pkl" <<'EOF'
# Category normalize file for nao: centroid + unit-ball scale over all
# frames. The reference distributes category_normalize_scale.pkl with its
# data release (run_robot.py:72-74); it is absent from the checkout, and
# any convention shared between corr training and fit-time matching works
# (cli.corr_normalization docstring).
import pickle, sys
import numpy as np
from reart_tpu.data.robot import RobotSequence

seq = RobotSequence(sys.argv[1], num_points=4096, cano_idx=0)
pc = np.asarray(seq[0]["complete_pc_list"], np.float32).reshape(-1, 3)
centroid = pc.mean(0)
scale = 1.0 / float(np.linalg.norm(pc - centroid, axis=-1).max())
with open(sys.argv[2], "wb") as f:
    pickle.dump({"nao": {"centroid": centroid, "scale": float(scale)}}, f)
print("normalize: centroid", centroid, "scale", scale, flush=True)
EOF
fi

echo "== 1/3: self-train the corr backbone on nao's own frames =="
if [ -f "$OUT/corr_model.pkl" ]; then
    echo "(reusing $OUT/corr_model.pkl)"
else
python run.py corr --data_domain robot --seq_path "$NAO" \
    --normalize_file "$OUT/normalize.pkl" \
    --steps "$STEPS" --batch 4 --train_points 1024 \
    --self_finetune_steps "${FT_STEPS:-0}" \
    --train_checkpoint "$OUT/corr_train_ckpt.pkl" \
    --save_path "$OUT/corr_model.pkl" 2>&1 | tail -20
fi

echo "== 2/3: relaxation (15k iters, flow+assign, corr supervision) =="
python run.py robot --seq_path "$NAO" --cano_idx 4 --use_assign_loss \
    --use_flow_loss --flow_provider corr \
    --corr_model_path "$OUT/corr_model.pkl" \
    --match_th "${MATCH_TH:-0.9}" --match_refine_k "${REFINE_K:-0}" \
    --match_chain_r "${CHAIN_R:-0}" \
    --normalize_file "$OUT/normalize.pkl" \
    --save_root "$OUT/fit_base"

echo "== 3/3: projection stage (200 iters, recon+flow) =="
python run.py robot --model kinematic \
    --base_result_path "$OUT/fit_base/nao/result.pkl" \
    --seq_path "$NAO" --cano_idx 4 --n_iter 200 \
    --tree_search "${TREE_SEARCH:--1}" \
    --tree_select "${TREE_SELECT:-energy}" \
    --use_flow_loss --flow_provider corr \
    --corr_model_path "$OUT/corr_model.pkl" \
    --match_th "${MATCH_TH:-0.9}" --match_refine_k "${REFINE_K:-0}" \
    --match_chain_r "${CHAIN_R:-0}" \
    --normalize_file "$OUT/normalize.pkl" \
    --save_root "$OUT/fit_kinematic"

echo "== results =="
for f in fit_base fit_kinematic; do
    echo "--- $f"; cat "$OUT/$f/nao/result.txt"
done

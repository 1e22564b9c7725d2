#!/usr/bin/env bash
# Metric-parity runner (SURVEY §7.9): evaluate the reference's RELEASED nao
# models through this framework and reproduce the end-to-end two-stage fit.
# Results land in $OUT (default /tmp/reart_parity); compare result.txt files
# against the numbers recorded in PARITY.md.
set -euo pipefail

REF=${REF:-/root/reference/demo_data}
OUT=${OUT:-/tmp/reart_parity}
NAO="$REF/data/nao"

echo "== 1/3: evaluate the released kinematic checkpoint =="
python run.py robot --evaluate \
    --resume "$REF/pretrained/nao/kinematic-2/model.pth.tar" \
    --model kinematic --seq_path "$NAO" --cano_idx 2 \
    --save_root "$OUT/eval_kinematic"

echo "== 2/3: from-scratch relaxation (15k iters) =="
python run.py robot --seq_path "$NAO" --cano_idx 2 --use_assign_loss \
    --save_root "$OUT/fit_base"

echo "== 3/3: projection stage from the relaxation result =="
python run.py robot --model kinematic \
    --base_result_path "$OUT/fit_base/nao/result.pkl" \
    --seq_path "$NAO" --cano_idx 2 --n_iter 200 \
    --save_root "$OUT/fit_kinematic"

echo "== results =="
for f in eval_kinematic fit_base fit_kinematic; do
    echo "--- $f"; cat "$OUT/$f/nao/result.txt"
done

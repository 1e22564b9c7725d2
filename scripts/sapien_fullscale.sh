#!/usr/bin/env bash
# Reference-scale sapien drive (VERDICT r2 #5a): generate a 6-part
# 2-prismatic 8-view 4096-point mbs-sapien-format scene (the real scan
# statistics; reart_tpu.data.synth) and run the reference sapien protocol
# end-to-end on TPU — relaxation with GT flow at the --flow_file boundary
# and downsample 1 (the 4096^2 giant-LAP path, banded solver + round-3
# matched-cost quality guard live), then the projection stage — with
# metric thresholds asserted at the end.
#
# Usage: PYTHONPATH=/root/.axon_site:/root/repo bash scripts/sapien_fullscale.sh
set -euo pipefail

OUT=${OUT:-/tmp/sapien_fullscale}
N_ITER=${N_ITER:-2000}
ASSIGN_ITER=${ASSIGN_ITER:-1000}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

python - "$OUT/scene" <<'EOF'
import sys
from reart_tpu.data.synth import make_sapien_scene
make_sapien_scene(sys.argv[1])
print("scene written:", sys.argv[1], flush=True)
EOF

echo "== base stage (reference sapien protocol, downsample 1) =="
python run.py sapien --sapien_base_folder "$OUT/scene" --sapien_idx 0 \
    --save_root "$OUT/base" --n_iter "$N_ITER" --assign_iter "$ASSIGN_ITER" \
    --use_assign_loss --use_flow_loss --flow_file "$OUT/scene/flow.npz" \
    --num_parts 10 --start_tau 1 --end_tau 0.5 --downsample 1 \
    --snapshot_gap 500

echo "== projection stage =="
python run.py sapien --sapien_base_folder "$OUT/scene" --sapien_idx 0 \
    --save_root "$OUT/kin" --model kinematic \
    --base_result_path "$OUT/base/0/result.pkl" --n_iter 200 \
    --start_tau 1 --end_tau 1 --snapshot_gap 500

echo "== metric thresholds =="
python - "$OUT" <<'EOF'
import pickle
import sys

import numpy as np

out = sys.argv[1]
for stage, thr in (("base", {"per_scan_ri": 0.85}),
                   ("kin", {"per_scan_ri": 0.85})):
    txt = open(f"{out}/{stage}/0/result.txt").read()
    print(f"--- {stage}\n{txt}")
    vals = {l.split(":")[0]: float(l.split(":")[1])
            for l in txt.splitlines() if ":" in l}
    for k, v in thr.items():
        assert vals[k] > v, (stage, k, vals[k])
with open(f"{out}/base/0/result.pkl", "rb") as f:
    parts = int(np.asarray(pickle.load(f)["pred_cano_part"]).max()) + 1
print("parts recovered:", parts)
assert 4 <= parts <= 8, parts
print("FULLSCALE DRIVE OK")
EOF

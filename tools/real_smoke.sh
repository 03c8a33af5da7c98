#!/usr/bin/env bash
# Real-weights smoke: the docs/REAL_WEIGHTS.md checklist as ONE command.
#
# Run the moment real snapshots exist (this build image has zero egress,
# so everything here was developed against tiny random-weight snapshots +
# torch mirrors; this script is first contact):
#
#   export UCE_SD_SNAPSHOT=/path/to/stable-diffusion-v1-4
#   export UCE_CLIP_SNAPSHOT=/path/to/clip-vit-base-patch32   # optional
#   bash tools/real_smoke.sh [outdir]
#
# Steps: env check -> erase edit ("Van Gogh" -> art) -> fixed-seed A/B
# generation (base vs overlay, first 2 vangogh_prompts cases) -> CLIP
# attribute gate (edited images stop preferring the Van Gogh label) ->
# CLIP-score fidelity spot value -> fast-mode quality A/B (exact vs
# --fast 'cfg_interval=3:25,cache=2' on the same seeds, LPIPS if weights
# provided). Exits nonzero on the first failed gate.
set -euo pipefail

OUT=${1:-out/real_smoke}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

if [ -z "${UCE_SD_SNAPSHOT:-}" ]; then
    echo "UCE_SD_SNAPSHOT is not set (docs/REAL_WEIGHTS.md §0)" >&2
    exit 2
fi
mkdir -p "$OUT"

echo "== 1/6 environment =="
python -m uce_tpu.cli.main info

echo "== 2/6 integration smoke (tests/test_real_snapshot.py) =="
python tests/test_real_snapshot.py

echo "== 3/6 erase edit: 'Van Gogh' -> 'art' =="
python -m uce_tpu.cli.main edit-sd \
    --edit_concepts "Van Gogh" --guide_concepts "art" \
    --concept_type art --model_id "$UCE_SD_SNAPSHOT" \
    --save_dir "$OUT/models" --exp_name smoke

echo "== 4/6 fixed-seed A/B generation (2 cases, 50 steps, CFG 7.5) =="
python -m uce_tpu.cli.main generate --model_id "$UCE_SD_SNAPSHOT" \
    --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen" \
    --exp_name base --till_case 1 --batch_rows 2
python -m uce_tpu.cli.main generate --model_id "$UCE_SD_SNAPSHOT" \
    --uce_model_path "$OUT/models/smoke.safetensors" \
    --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen" \
    --exp_name edited --till_case 1 --batch_rows 2
python - "$OUT" <<'PY'
import sys

import numpy as np
from PIL import Image

out = sys.argv[1]
for case in (0, 1):
    a = np.asarray(Image.open(f"{out}/gen/base/{case}_0.png"), dtype=int)
    b = np.asarray(Image.open(f"{out}/gen/edited/{case}_0.png"), dtype=int)
    d = np.abs(a - b).mean()
    print(f"case {case}: edit moved the image by mean |d| = {d:.2f} levels")
    assert d > 1.0, "edit overlay did not visibly change the image"
print("A/B gate: OK")
PY

echo "== 5/6 CLIP gates =="
if [ -n "${UCE_CLIP_SNAPSHOT:-}" ]; then
    for which in base edited; do
        python -m uce_tpu.cli.main eval-clip-classify \
            --image_folder "$OUT/gen/$which" \
            --prompts_path data/vangogh_prompts.csv --till_case 1 \
            --attributes "a painting in the style of Van Gogh,a generic painting" \
            --column_name vangogh --clip_model_id "$UCE_CLIP_SNAPSHOT" \
            --save_path "$OUT/clip_$which.csv"
    done
    python - "$OUT" <<'PY'
import sys

import pandas as pd

out = sys.argv[1]
base = pd.read_csv(f"{out}/clip_base.csv")
edit = pd.read_csv(f"{out}/clip_edited.csv")
col = [c for c in base.columns if "vangogh" in c.lower()][0]
b, e = base[col].mean(), edit[col].mean()
print(f"Van Gogh label preference: base {b:.2f} -> edited {e:.2f}")
assert e < b, "edited images still prefer the Van Gogh label"
print("CLIP gate: OK")
PY
    python -m uce_tpu.cli.main eval-clip-score \
        --image_folder "$OUT/gen/edited" \
        --prompts_path data/vangogh_prompts.csv --till_case 1 \
        --clip_model_id "$UCE_CLIP_SNAPSHOT"
else
    echo "UCE_CLIP_SNAPSHOT unset: skipping CLIP gates (optional)"
fi

echo "== 6/6 fast-mode quality A/B (exact vs cfg_interval=3:25,cache=2) =="
python -m uce_tpu.cli.main generate --model_id "$UCE_SD_SNAPSHOT" \
    --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen" \
    --exp_name base_fast --till_case 1 --batch_rows 2 \
    --fast "cfg_interval=3:25,cache=2"
python - "$OUT" <<'PY'
import sys

import numpy as np
from PIL import Image

out = sys.argv[1]
for case in (0, 1):
    a = np.asarray(Image.open(f"{out}/gen/base/{case}_0.png"), dtype=int)
    b = np.asarray(Image.open(f"{out}/gen/base_fast/{case}_0.png"), dtype=int)
    print(f"case {case}: fast-vs-exact mean |d| = {np.abs(a - b).mean():.2f} "
          f"levels, max = {np.abs(a - b).max()}")
print("record these numbers (plus CLIP score fast-vs-exact if UCE_CLIP_"
      "SNAPSHOT is set) in docs/PERF.md 'Fast mode' before relying on "
      "--fast in production")
PY
if [ -n "${UCE_LPIPS_WEIGHTS:-}" ]; then
    python -m uce_tpu.cli.main eval-lpips \
        --original_path "$OUT/gen/base" --edited_path "$OUT/gen/base_fast" \
        --weights "$UCE_LPIPS_WEIGHTS" \
        --save_path "$OUT/fast_lpips.csv" || true
    echo "fast-vs-exact LPIPS written to $OUT/fast_lpips.csv"
fi

echo "real_smoke: ALL GATES PASSED (outputs in $OUT)"

#!/usr/bin/env bash
# Real-weights smoke: the docs/REAL_WEIGHTS.md checklist as ONE command,
# covering every model family and converter. Each leg gates on its own
# env var, so partial snapshot sets still run whatever they can:
#
#   UCE_SD_SNAPSHOT       stable-diffusion v1.x/2.x directory -> SD leg
#   UCE_CLIP_SNAPSHOT     clip-vit-base-patch32 (optional CLIP gates)
#   UCE_SDXL_SNAPSHOT     stable-diffusion-xl-base-1.0 -> SDXL leg
#   UCE_FLUX_SNAPSHOT     FLUX.1-schnell/dev -> FLUX leg
#   UCE_HIDREAM_SNAPSHOT  HiDream-I1 (+ UCE_LLAMA_SNAPSHOT when the llama
#                         encoder is not vendored as text_encoder_4)
#   UCE_NUDENET_ONNX      NudeNet 640m.onnx -> converter + detector gate
#   UCE_DREAMSIM_DIR      dreamsim checkpoint cache -> converter gate
#   UCE_LPIPS_WEIGHTS     torchvision-format LPIPS weights (optional)
#
# Knobs (defaults are the reference protocols; the CI plumbing test
# shrinks them to run the SAME script against tiny in-repo snapshots):
#   UCE_SMOKE_STEPS=50 UCE_SMOKE_SIZE=512         SD protocol
#   UCE_SMOKE_XL_SIZE=1024                        SDXL protocol
#   UCE_SMOKE_FLUX_STEPS=4 UCE_SMOKE_FLUX_SIZE=512
#   UCE_SMOKE_HD_STEPS=50 UCE_SMOKE_HD_SIZE=1024
#   UCE_SMOKE_MIN_MAD=1.0   pixel gate: edit must move images this much
#                           (0 disables the assert, prints only)
#   UCE_SMOKE_STRICT=1      directional gates (CLIP preference) assert;
#                           0 prints only (tiny random weights in CI)
#
#   bash tools/real_smoke.sh [outdir]
#
# Exits nonzero on the first failed gate, or 2 if NO leg had its env set.
set -euo pipefail

OUT=${1:-out/real_smoke}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p "$OUT"

STEPS=${UCE_SMOKE_STEPS:-50}
SIZE=${UCE_SMOKE_SIZE:-512}
XL_SIZE=${UCE_SMOKE_XL_SIZE:-1024}
FLUX_STEPS=${UCE_SMOKE_FLUX_STEPS:-4}
FLUX_SIZE=${UCE_SMOKE_FLUX_SIZE:-512}
HD_STEPS=${UCE_SMOKE_HD_STEPS:-50}
HD_SIZE=${UCE_SMOKE_HD_SIZE:-1024}
MIN_MAD=${UCE_SMOKE_MIN_MAD:-1.0}
STRICT=${UCE_SMOKE_STRICT:-1}
FAST_SPEC=${UCE_SMOKE_FAST_SPEC:-"cfg_interval=3:25,cache=2"}
RAN=0

uce() { python -m uce_tpu.cli.main "$@"; }

# pixel_gate <dirA> <dirB> <label>: assert the edit visibly moved the
# fixed-seed images (mean |delta| > MIN_MAD uint8 levels per case)
pixel_gate() {
    python - "$1" "$2" "$3" "$MIN_MAD" <<'PY'
import sys

import numpy as np
from PIL import Image

a_dir, b_dir, label, min_mad = sys.argv[1:5]
for case in (0, 1):
    a = np.asarray(Image.open(f"{a_dir}/{case}_0.png"), dtype=int)
    b = np.asarray(Image.open(f"{b_dir}/{case}_0.png"), dtype=int)
    d = np.abs(a - b).mean()
    print(f"{label} case {case}: mean |d| = {d:.2f} levels, "
          f"max = {np.abs(a - b).max()}")
    assert d > float(min_mad), \
        f"{label}: edit overlay did not visibly change case {case}"
print(f"{label} pixel gate: OK")
PY
}

echo "== environment =="
uce info

# ---------------------------------------------------------------- SD leg
if [ -n "${UCE_SD_SNAPSHOT:-}" ]; then
    RAN=1
    echo "== SD: integration smoke (tests/test_real_snapshot.py) =="
    python tests/test_real_snapshot.py

    echo "== SD: erase edit 'Van Gogh' -> 'art' =="
    uce edit-sd \
        --edit_concepts "Van Gogh" --guide_concepts "art" \
        --concept_type art --model_id "$UCE_SD_SNAPSHOT" \
        --save_dir "$OUT/models" --exp_name smoke

    echo "== SD: fixed-seed A/B generation (2 cases, $STEPS steps, CFG 7.5) =="
    uce generate --model_id "$UCE_SD_SNAPSHOT" \
        --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen" \
        --exp_name base --till_case 1 --batch_rows 2 \
        --num_inference_steps "$STEPS" --image_size "$SIZE"
    uce generate --model_id "$UCE_SD_SNAPSHOT" \
        --uce_model_path "$OUT/models/smoke.safetensors" \
        --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen" \
        --exp_name edited --till_case 1 --batch_rows 2 \
        --num_inference_steps "$STEPS" --image_size "$SIZE"
    pixel_gate "$OUT/gen/base" "$OUT/gen/edited" "SD edit A/B"

    echo "== SD: CLIP gates =="
    if [ -n "${UCE_CLIP_SNAPSHOT:-}" ]; then
        for which in base edited; do
            uce eval-clip-classify \
                --image_folder "$OUT/gen/$which" \
                --prompts_path data/vangogh_prompts.csv --till_case 1 \
                --attributes "a painting in the style of Van Gogh,a generic painting" \
                --column_name vangogh --clip_model_id "$UCE_CLIP_SNAPSHOT" \
                --save_path "$OUT/clip_$which.csv"
        done
        python - "$OUT" "$STRICT" <<'PY'
import sys

import pandas as pd

out, strict = sys.argv[1], sys.argv[2] == "1"
base = pd.read_csv(f"{out}/clip_base.csv")
edit = pd.read_csv(f"{out}/clip_edited.csv")
# column naming: '{attribute with _}_bias' (eval/clip_classify.py:74-76)
cols = [c for c in base.columns if "gogh" in c.lower()]
assert cols, f"no Van Gogh attribute column in {list(base.columns)}"
col = cols[0]
b, e = base[col].mean(), edit[col].mean()
print(f"Van Gogh label preference: base {b:.2f} -> edited {e:.2f}")
if strict:
    assert e < b, "edited images still prefer the Van Gogh label"
print("CLIP gate: OK")
PY
        uce eval-clip-score \
            --image_folder "$OUT/gen/edited" \
            --prompts_path data/vangogh_prompts.csv --till_case 1 \
            --clip_model_id "$UCE_CLIP_SNAPSHOT"
    else
        echo "UCE_CLIP_SNAPSHOT unset: skipping CLIP gates (optional)"
    fi

    echo "== SD: fast-mode quality A/B (exact vs $FAST_SPEC) =="
    uce generate --model_id "$UCE_SD_SNAPSHOT" \
        --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen" \
        --exp_name base_fast --till_case 1 --batch_rows 2 \
        --num_inference_steps "$STEPS" --image_size "$SIZE" \
        --fast "$FAST_SPEC"
    MIN_MAD=0 pixel_gate \
        "$OUT/gen/base" "$OUT/gen/base_fast" "SD fast-vs-exact"
    if [ -n "${UCE_CLIP_SNAPSHOT:-}" ]; then
        echo "fast-path CLIP score (compare against the exact value above):"
        uce eval-clip-score \
            --image_folder "$OUT/gen/base_fast" \
            --prompts_path data/vangogh_prompts.csv --till_case 1 \
            --clip_model_id "$UCE_CLIP_SNAPSHOT"
    fi
    if [ -n "${UCE_LPIPS_WEIGHTS:-}" ]; then
        uce eval-lpips \
            --original_path "$OUT/gen/base" --edited_path "$OUT/gen/base_fast" \
            --weights "$UCE_LPIPS_WEIGHTS" \
            --save_path "$OUT/fast_lpips.csv" || true
        echo "fast-vs-exact LPIPS written to $OUT/fast_lpips.csv"
    fi
else
    echo "UCE_SD_SNAPSHOT unset: skipping SD leg"
fi

# -------------------------------------------------------------- SDXL leg
if [ -n "${UCE_SDXL_SNAPSHOT:-}" ]; then
    RAN=1
    echo "== SDXL: erase edit + fixed-seed A/B ($STEPS steps, ${XL_SIZE}px) =="
    uce edit-sdxl \
        --edit_concepts "Van Gogh" --guide_concepts "art" \
        --concept_type art --model_id "$UCE_SDXL_SNAPSHOT" \
        --save_dir "$OUT/models" --exp_name smoke_xl
    uce generate --model_id "$UCE_SDXL_SNAPSHOT" \
        --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen_xl" \
        --exp_name base --till_case 1 --batch_rows 2 \
        --num_inference_steps "$STEPS" --image_size "$XL_SIZE"
    uce generate --model_id "$UCE_SDXL_SNAPSHOT" \
        --uce_model_path "$OUT/models/smoke_xl.safetensors" \
        --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen_xl" \
        --exp_name edited --till_case 1 --batch_rows 2 \
        --num_inference_steps "$STEPS" --image_size "$XL_SIZE"
    pixel_gate "$OUT/gen_xl/base" "$OUT/gen_xl/edited" "SDXL edit A/B"

    echo "== SDXL: fast-mode A/B =="
    uce generate --model_id "$UCE_SDXL_SNAPSHOT" \
        --prompts_path data/vangogh_prompts.csv --save_path "$OUT/gen_xl" \
        --exp_name base_fast --till_case 1 --batch_rows 2 \
        --num_inference_steps "$STEPS" --image_size "$XL_SIZE" \
        --fast "$FAST_SPEC"
    MIN_MAD=0 pixel_gate \
        "$OUT/gen_xl/base" "$OUT/gen_xl/base_fast" "SDXL fast-vs-exact"
else
    echo "UCE_SDXL_SNAPSHOT unset: skipping SDXL leg"
fi

# -------------------------------------------------------------- FLUX leg
if [ -n "${UCE_FLUX_SNAPSHOT:-}" ]; then
    RAN=1
    echo "== FLUX: edit + fixed-seed A/B ($FLUX_STEPS steps, CFG 0) =="
    uce edit-flux \
        --edit_concepts "Van Gogh" --guide_concepts "art" \
        --concept_type art --model_id "$UCE_FLUX_SNAPSHOT" \
        --save_dir "$OUT/models" --exp_name smoke_flux
    # generate-flux nests outputs by artifact name: original/ vs smoke_flux/
    uce generate-flux --model_name "$UCE_FLUX_SNAPSHOT" \
        --prompts_path data/vangogh_prompts.csv \
        --save_path "$OUT/gen_flux" --till_case 1 \
        --num_inference_steps "$FLUX_STEPS" --image_size "$FLUX_SIZE" \
        --guidance_scale 0.0
    uce generate-flux --model_name "$UCE_FLUX_SNAPSHOT" \
        --uce_model_path "$OUT/models/smoke_flux.safetensors" \
        --prompts_path data/vangogh_prompts.csv \
        --save_path "$OUT/gen_flux" --till_case 1 \
        --num_inference_steps "$FLUX_STEPS" --image_size "$FLUX_SIZE" \
        --guidance_scale 0.0
    pixel_gate "$OUT/gen_flux/original" "$OUT/gen_flux/smoke_flux" \
        "FLUX edit A/B"
else
    echo "UCE_FLUX_SNAPSHOT unset: skipping FLUX leg"
fi

# ----------------------------------------------------------- HiDream leg
if [ -n "${UCE_HIDREAM_SNAPSHOT:-}" ]; then
    RAN=1
    LLAMA_ARGS=()
    [ -n "${UCE_LLAMA_SNAPSHOT:-}" ] && \
        LLAMA_ARGS=(--llama_dir "$UCE_LLAMA_SNAPSHOT")
    GEN_LLAMA_ARGS=()
    [ -n "${UCE_LLAMA_SNAPSHOT:-}" ] && \
        GEN_LLAMA_ARGS=(--llama_path "$UCE_LLAMA_SNAPSHOT")
    echo "== HiDream: edit + fixed-seed A/B ($HD_STEPS steps, CFG 5) =="
    uce edit-hidream \
        --edit_concepts "Van Gogh" --guide_concepts "art" \
        --concept_type art --model_id "$UCE_HIDREAM_SNAPSHOT" \
        "${LLAMA_ARGS[@]}" \
        --save_dir "$OUT/models" --exp_name smoke_hd
    # generate-hidream nests outputs by artifact name: original/ etc.
    uce generate-hidream --model_name "$UCE_HIDREAM_SNAPSHOT" \
        "${GEN_LLAMA_ARGS[@]}" \
        --prompts_path data/vangogh_prompts.csv \
        --save_path "$OUT/gen_hd" --till_case 1 \
        --num_inference_steps "$HD_STEPS" --image_size "$HD_SIZE"
    uce generate-hidream --model_name "$UCE_HIDREAM_SNAPSHOT" \
        "${GEN_LLAMA_ARGS[@]}" \
        --uce_model_path "$OUT/models/smoke_hd.safetensors" \
        --prompts_path data/vangogh_prompts.csv \
        --save_path "$OUT/gen_hd" --till_case 1 \
        --num_inference_steps "$HD_STEPS" --image_size "$HD_SIZE"
    pixel_gate "$OUT/gen_hd/original" "$OUT/gen_hd/smoke_hd" \
        "HiDream edit A/B"

    echo "== HiDream: fast-mode A/B (cfg_interval window) =="
    uce generate-hidream --model_name "$UCE_HIDREAM_SNAPSHOT" \
        "${GEN_LLAMA_ARGS[@]}" \
        --prompts_path data/vangogh_prompts.csv \
        --save_path "$OUT/gen_hd_fast" --till_case 1 \
        --num_inference_steps "$HD_STEPS" --image_size "$HD_SIZE" \
        --fast "cfg_interval=3:25"
    MIN_MAD=0 pixel_gate \
        "$OUT/gen_hd/original" "$OUT/gen_hd_fast/original" \
        "HiDream fast-vs-exact"
else
    echo "UCE_HIDREAM_SNAPSHOT unset: skipping HiDream leg"
fi

# ------------------------------------------------- NudeNet converter leg
if [ -n "${UCE_NUDENET_ONNX:-}" ]; then
    RAN=1
    echo "== NudeNet: ONNX -> JAX conversion + detector gate =="
    python tools/convert_nudenet.py --onnx "$UCE_NUDENET_ONNX" \
        --out "$OUT/nudenet_jax.safetensors"
    # detector must load + run on whatever images the SD leg produced
    # (or any folder passed via UCE_SMOKE_IMAGE_DIR)
    IMG_DIR=${UCE_SMOKE_IMAGE_DIR:-"$OUT/gen/base"}
    if [ -d "$IMG_DIR" ]; then
        uce eval-nudenet --image_folder "$IMG_DIR" \
            --jax_weights "$OUT/nudenet_jax.safetensors" \
            --save_path "$OUT/nudenet_jax.csv"
        echo "JAX NudeNet labels written to $OUT/nudenet_jax.csv"
        if python -c "import nudenet" 2>/dev/null; then
            uce eval-nudenet --image_folder "$IMG_DIR" \
                --save_path "$OUT/nudenet_pkg.csv"
            python - "$OUT" "$STRICT" <<'PY'
import sys

import pandas as pd

out, strict = sys.argv[1], sys.argv[2] == "1"
a = pd.read_csv(f"{out}/nudenet_jax.csv")
b = pd.read_csv(f"{out}/nudenet_pkg.csv")
col = "NudeNet_label"
match = (a[col].fillna("") == b[col].fillna("")).mean()
print(f"JAX vs nudenet-pkg label agreement: {match:.1%}")
if strict:
    assert match >= 0.9, "JAX detector disagrees with the nudenet package"
print("NudeNet cross-check gate: OK")
PY
        else
            echo "nudenet package not importable: JAX-only run recorded"
        fi
    else
        echo "no image folder for the detector gate (run the SD leg or set UCE_SMOKE_IMAGE_DIR)"
    fi
else
    echo "UCE_NUDENET_ONNX unset: skipping NudeNet converter leg"
fi

# ------------------------------------------------ DreamSim converter leg
if [ -n "${UCE_DREAMSIM_DIR:-}" ]; then
    RAN=1
    echo "== DreamSim: checkpoint -> JAX conversion + metric gate =="
    python tools/convert_dreamsim.py --cache_dir "$UCE_DREAMSIM_DIR" \
        --out "$OUT/dreamsim_jax.safetensors"
    if [ -d "$OUT/gen/base" ] && [ -d "$OUT/gen/edited" ]; then
        uce eval-dreamsim --original_path "$OUT/gen/base" \
            --edited_path "$OUT/gen/edited" \
            --jax_weights "$OUT/dreamsim_jax.safetensors" \
            --save_path "$OUT/dreamsim_jax.csv"
        echo "JAX DreamSim distances written to $OUT/dreamsim_jax.csv"
    else
        echo "no A/B folders for the metric gate (run the SD leg first)"
    fi
else
    echo "UCE_DREAMSIM_DIR unset: skipping DreamSim converter leg"
fi

if [ "$RAN" = 0 ]; then
    echo "no snapshot env vars set — nothing ran (docs/REAL_WEIGHTS.md §0)" >&2
    exit 2
fi
echo "real_smoke: ALL GATES PASSED (outputs in $OUT)"

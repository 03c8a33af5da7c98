"""CI plumbing test for tools/real_smoke.sh.

The smoke script is the ONE command for first contact with real weights
(docs/REAL_WEIGHTS.md); in this zero-egress image it can only ever run
against tiny random-weight snapshots — which is exactly what this test
does, so the script's own plumbing (flag names, output paths, gate
wiring, env-var gating) cannot rot unnoticed until the day it matters.

Runs the REAL script as a subprocess with every snapshot-gated leg
enabled (SD + CLIP gates, SDXL, FLUX, HiDream, NudeNet converter) on
tiny in-repo snapshots at smoke-shrunk protocols (2 steps, 32px,
non-strict gates — random weights carry no semantics). The DreamSim
converter leg needs the `dreamsim` torch package and stays env-gated.
"""

from __future__ import annotations

import os
import subprocess
import sys



REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "real_smoke.sh")


def test_real_smoke_script_runs_every_leg(tmp_path):
    from tests import test_yolo
    from tests.snapshot import (
        make_clip_snapshot,
        make_flux_snapshot,
        make_hidream_snapshot,
        make_sd_snapshot,
    )
    from tests.test_sdxl_pipeline import make_sdxl_snapshot
    from uce_tpu.models import yolo

    sd = make_sd_snapshot(tmp_path / "sd")
    sdxl = make_sdxl_snapshot(tmp_path / "sdxl")
    clip = make_clip_snapshot(tmp_path / "clip")
    flux = make_flux_snapshot(tmp_path / "flux")
    hidream = make_hidream_snapshot(tmp_path / "hidream")
    onnx_path = tmp_path / "640m.onnx"
    onnx_path.write_bytes(
        test_yolo._onnx_bytes(yolo.init_yolo_state(seed=5)))

    env = dict(
        os.environ,
        UCE_DEVICE="cpu",
        UCE_SD_SNAPSHOT=str(sd),
        UCE_SDXL_SNAPSHOT=str(sdxl),
        UCE_CLIP_SNAPSHOT=str(clip),
        UCE_FLUX_SNAPSHOT=str(flux),
        UCE_HIDREAM_SNAPSHOT=str(hidream),
        UCE_NUDENET_ONNX=str(onnx_path),
        # shrink the protocols: random weights, plumbing only
        UCE_SMOKE_STEPS="2", UCE_SMOKE_SIZE="32",
        UCE_SMOKE_XL_SIZE="32",
        UCE_SMOKE_FLUX_STEPS="2", UCE_SMOKE_FLUX_SIZE="32",
        UCE_SMOKE_HD_STEPS="2", UCE_SMOKE_HD_SIZE="16",
        UCE_SMOKE_MIN_MAD="0", UCE_SMOKE_STRICT="0",
    )
    env.pop("UCE_DREAMSIM_DIR", None)
    out = tmp_path / "out"
    proc = subprocess.run(
        ["bash", SCRIPT, str(out)], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=3000)
    tail = proc.stdout[-4000:] + "\n--- stderr ---\n" + proc.stderr[-4000:]
    assert proc.returncode == 0, tail
    assert "ALL GATES PASSED" in proc.stdout, tail

    # every leg left its artifact where the runbook says it would
    for rel in (
        "models/smoke.safetensors",          # SD edit
        "models/smoke_xl.safetensors",       # SDXL edit
        "models/smoke_flux.safetensors",     # FLUX edit
        "models/smoke_hd.safetensors",       # HiDream edit
        "gen/base/0_0.png", "gen/edited/0_0.png", "gen/base_fast/0_0.png",
        "gen_xl/base/0_0.png", "gen_xl/edited/0_0.png",
        "gen_flux/original/0_0.png", "gen_flux/smoke_flux/0_0.png",
        "gen_hd/original/0_0.png", "gen_hd/smoke_hd/0_0.png",
        "gen_hd_fast/original/0_0.png",
        "clip_base.csv", "clip_edited.csv",  # CLIP gates
        "nudenet_jax.safetensors", "nudenet_jax.csv",
    ):
        assert (out / rel).exists(), f"missing artifact: {rel}\n{tail}"
    # env gating messages for legs that cannot run in this image
    assert "skipping DreamSim converter leg" in proc.stdout


def test_real_smoke_script_requires_some_leg(tmp_path):
    """With no snapshot env set, the script must exit 2 (not 'pass')."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("UCE_")}
    env["UCE_DEVICE"] = "cpu"
    proc = subprocess.run(
        ["bash", SCRIPT, str(tmp_path / "out")], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 2, proc.stdout[-2000:] + proc.stderr[-1000:]

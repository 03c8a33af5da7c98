"""Real-snapshot smoke test: edit -> generate -> CLIP classify on real weights.

Covers what the reference notebooks demonstrate on real snapshots
(reference notebooks/inference_sd.ipynb cells 3/5: before/after images of
an erased concept) so the first contact with real weights isn't
production. Skipped unless ``UCE_SD_SNAPSHOT`` points at a real
diffusers-format SD 1.x/2.x snapshot directory — see docs/REAL_WEIGHTS.md
for the download-and-verify checklist.

Two entry points:

* ``pytest tests/test_real_snapshot.py`` — runs under the suite's virtual
  CPU mesh (conftest.py), with small image size / few steps so a CPU run
  stays bounded (minutes, not hours).
* ``python tests/test_real_snapshot.py`` — same smoke on the default JAX
  backend (the real TPU when the tunnel is up) at full 512px settings.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

SNAPSHOT = os.environ.get("UCE_SD_SNAPSHOT", "")
CLIP_SNAPSHOT = os.environ.get("UCE_CLIP_SNAPSHOT", "")


def _snapshot_ok(path: str) -> bool:
    return bool(path) and all(
        os.path.isdir(os.path.join(path, sub))
        for sub in ("unet", "vae", "text_encoder", "tokenizer"))


def run_smoke(snapshot: str, out_dir: str, image_size: int = 512,
              steps: int = 20, clip_snapshot: str = "",
              min_image_mad: float = 1.0, strict_clip: bool = True) -> dict:
    """Edit 'Van Gogh' out of the model, A/B one fixed-seed image, and (if a
    CLIP snapshot is available) check the zero-shot style score moved the
    right way. Returns the collected evidence dict."""
    import pandas as pd

    from uce_tpu.edit.sd import load_resources, run_erase
    from uce_tpu.eval.generate import generate_images

    os.makedirs(out_dir, exist_ok=True)
    resources = load_resources(snapshot)
    run_erase(
        resources,
        edit_concepts=["Van Gogh"],
        guide_concepts=["art"],
        preserve_concepts=[],
        save_dir=out_dir,
        exp_name="smoke_erase",
    )
    edits_path = os.path.join(out_dir, "smoke_erase.safetensors")
    assert os.path.exists(edits_path)

    prompts_path = os.path.join(out_dir, "prompts.csv")
    pd.DataFrame([
        {"case_number": 0,
         "prompt": "a painting of a sunflower field in the style of Van Gogh",
         "evaluation_seed": 42},
    ]).to_csv(prompts_path, index=False)

    base_dir = os.path.join(out_dir, "base")
    edit_dir = os.path.join(out_dir, "edited")
    for uce_path, folder in ((None, base_dir), (edits_path, edit_dir)):
        n = generate_images(
            model_name=snapshot,
            prompts_path=prompts_path,
            save_path=os.path.dirname(folder),
            exp_name=os.path.basename(folder),
            uce_model_path=uce_path,
            image_size=image_size,
            ddim_steps=steps,
            num_samples=1,
        )
        assert n == 1, f"expected 1 generated case, got {n}"

    from uce_tpu.utils.imaging import load_image

    base_img = load_image(os.path.join(base_dir, "0_0.png"))
    edit_img = load_image(os.path.join(edit_dir, "0_0.png"))
    assert base_img.shape == (image_size, image_size, 3)
    # the edit must actually change the fixed-seed image (A/B protocol of
    # tests/test_pipeline.py::test_uce_edit_changes_output, on real weights)
    mad = float(np.abs(base_img.astype(np.float32)
                       - edit_img.astype(np.float32)).mean())
    assert mad > min_image_mad, (
        f"edit overlay changed the image by only {mad} levels")

    evidence = {"edits_path": edits_path, "image_mad": mad}
    if _snapshot_ok_clip(clip_snapshot):
        from uce_tpu.models.clip import CLIPModel

        clip_model = CLIPModel.from_pretrained(clip_snapshot)
        attrs = ["a painting in the style of Van Gogh", "a generic painting"]
        probs = {}
        for name, img in (("base", base_img), ("edited", edit_img)):
            pred = clip_model.classify(img[None], attrs)
            probs[name] = int(np.asarray(pred)[0])
        # the erased model must no longer win the Van Gogh label (index 0);
        # requiring edited == 1 (not edited >= base) keeps an ineffective
        # edit (base 0, edited 0) from sailing through the gate
        evidence["clip_pred"] = probs
        assert not strict_clip or probs["edited"] == 1, (
            "CLIP still classifies the edited image as Van Gogh "
            f"(base={probs['base']}, edited={probs['edited']})"
        )
    return evidence


def _snapshot_ok_clip(path: str) -> bool:
    return bool(path) and os.path.exists(os.path.join(path, "config.json"))


def test_smoke_path_on_tiny_standin(tmp_path):
    """The smoke harness itself stays green without real weights: drive it
    over the tiny structurally-valid snapshot (no image-change threshold —
    a random-weight model barely responds to a semantic edit)."""
    from tests.snapshot import make_sd_snapshot

    snap = os.path.join(str(tmp_path), "snap")
    os.makedirs(snap)
    make_sd_snapshot(snap)
    out = run_smoke(snap, os.path.join(str(tmp_path), "out"),
                    image_size=64, steps=4, min_image_mad=0.0)
    assert os.path.exists(out["edits_path"])


@pytest.mark.skipif(not _snapshot_ok(SNAPSHOT),
                    reason="UCE_SD_SNAPSHOT not set to a real SD snapshot "
                           "(see docs/REAL_WEIGHTS.md)")
def test_real_snapshot_edit_generate_classify(tmp_path):
    # bounded for the CPU mesh: 128px / 6 steps still exercises every stage
    # (real text encode, real UNet blocks, scheduler scan, VAE, overlay)
    run_smoke(SNAPSHOT, str(tmp_path), image_size=128, steps=6,
              clip_snapshot=CLIP_SNAPSHOT)


if __name__ == "__main__":  # full-size smoke on the default backend (TPU)
    import json
    import tempfile

    if not _snapshot_ok(SNAPSHOT):
        raise SystemExit("set UCE_SD_SNAPSHOT to a real SD snapshot dir "
                         "(docs/REAL_WEIGHTS.md)")
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(None)  # honors UCE_DEVICE (real_smoke.sh CI run)
    with tempfile.TemporaryDirectory() as td:
        # tools/real_smoke.sh shrinks these for its CI plumbing run
        out = run_smoke(
            SNAPSHOT, td, clip_snapshot=CLIP_SNAPSHOT,
            image_size=int(os.environ.get("UCE_SMOKE_SIZE", "512")),
            steps=int(os.environ.get("UCE_SMOKE_STEPS", "20")),
            min_image_mad=float(os.environ.get("UCE_SMOKE_MIN_MAD", "1.0")),
            strict_clip=os.environ.get("UCE_SMOKE_STRICT", "1") == "1")
        print(json.dumps({k: v for k, v in out.items() if k != "edits_path"}))
        print("real-snapshot smoke: OK")

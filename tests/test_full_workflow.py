"""The complete paper workflow as one integration test.

Mirrors the reference's end-to-end protocol on tiny models: edit ->
generate before/after over a prompts CSV -> CLIP attribute classify ->
LPIPS interference -> comparison grid. Every stage runs through the same
entry points the CLIs use.
"""

import numpy as np
import pandas as pd
import pytest

from tests.snapshot import make_sd_snapshot
from uce_tpu.models import vision_backbones as vb


@pytest.fixture(scope="module")
def workflow(tmp_path_factory):
    import jax.numpy as jnp

    from uce_tpu.diffusion.pipeline import SDPipeline

    root = tmp_path_factory.mktemp("wf")
    snap = make_sd_snapshot(root / "snap")
    prompts = pd.DataFrame({
        "case_number": [0, 1],
        "prompt": ["a painting in the style of van gogh", "a photo of a dog"],
        "evaluation_seed": [42, 7],
    })
    prompts_path = root / "prompts.csv"
    prompts.to_csv(prompts_path, index=False)
    pipe = SDPipeline.from_pretrained(str(snap), dtype=jnp.float32)
    return root, snap, str(prompts_path), pipe


def test_full_reference_protocol(workflow):
    root, snap, prompts_path, pipe = workflow

    # 1. closed-form erase (uce_sd_erase protocol)
    from uce_tpu.edit.sd import load_resources, run_erase

    res = load_resources(str(snap))
    run_erase(res, ["van gogh"], ["art"], ["dog"],
              save_dir=str(root), exp_name="wf_edit")

    # 2. generate before/after (generate-images-sd protocol)
    from uce_tpu.eval.generate import generate_images

    n = generate_images(str(snap), prompts_path, str(root / "imgs"),
                        ddim_steps=2, image_size=32, num_samples=2,
                        dtype="float32", batch_rows=2)
    assert n == 2
    n = generate_images(str(snap), prompts_path, str(root / "imgs"),
                        uce_model_path=str(root / "wf_edit.safetensors"),
                        ddim_steps=2, image_size=32, num_samples=2,
                        dtype="float32", batch_rows=2)
    assert n == 2
    orig, edited = str(root / "imgs/original"), str(root / "imgs/wf_edit")

    # 3. CLIP attribute classify (CLIP_classify protocol) via a stub tower
    from uce_tpu.eval.clip_classify import classify_folder

    class StubClip:
        def classify(self, images, labels):
            return np.arange(images.shape[0]) % len(labels)

    df = classify_folder(StubClip(), edited, ["a man", "a woman"],
                         prompts_path=prompts_path,
                         save_path=str(root / "classify.csv"))
    assert len(df) == 2 and "a_man_bias" in df.columns
    assert (root / "classify.csv").exists()

    # 4. LPIPS interference (lpips_eval protocol, random AlexNet)
    from uce_tpu.eval.lpips import eval_folders

    rng = np.random.default_rng(0)
    params = {
        "alex": vb.init_alexnet(rng),
        "lins": [np.abs(rng.standard_normal(c)).astype(np.float32)
                 for c in vb.ALEXNET_CHANNELS],
    }
    lp = eval_folders(params, orig, edited,
                      prompts_path=prompts_path,
                      save_path=str(root / "lpips.csv"))
    assert len(lp) == 2 and (lp["lpips_loss"] >= 0).all()

    # 5. comparison grid (make-compare-images protocol)
    from uce_tpu.eval.compare_grids import make_grids

    n = make_grids([orig, edited], ["original", "erased"],
                   str(root / "grids"), num_samples=2)
    assert n == 2


def test_generated_samples_within_case_differ(workflow):
    """Regression for the list-seed bug: {case}_0.png vs {case}_1.png must
    be distinct images (reference generate-images-sd.py:37-42 advances one
    generator per row across samples)."""
    from PIL import Image

    root = workflow[0]
    for case in (0, 1):
        a = np.asarray(Image.open(root / "imgs/original" / f"{case}_0.png"))
        b = np.asarray(Image.open(root / "imgs/original" / f"{case}_1.png"))
        assert (a != b).any(), f"case {case}: duplicate samples"


def test_vendored_corpus_protocol(workflow, tmp_path):
    """Paper-protocol smoke test on the vendored reference corpus:
    data/vangogh_prompts.csv drives generation out-of-the-box."""
    import os

    from uce_tpu.eval.generate import generate_images

    _, snap, _, _ = workflow
    csv = os.path.join(os.path.dirname(__file__), "..", "data",
                       "vangogh_prompts.csv")
    assert os.path.exists(csv), "vendored corpus missing"
    n = generate_images(str(snap), csv, str(tmp_path / "vg"),
                        ddim_steps=2, image_size=32, num_samples=1,
                        dtype="float32", till_case=1)
    assert n == 2  # cases 0 and 1
    assert (tmp_path / "vg/original/0_0.png").exists()
    assert (tmp_path / "vg/original/1_0.png").exists()


def test_vendored_corpus_complete():
    """The full reference data corpus ships with the framework
    (SURVEY §2.3: 33 data files + 8 prompts_dir CSVs + 26 info lists)."""
    import os

    data = os.path.join(os.path.dirname(__file__), "..", "data")
    for f in ("coco_30k.csv", "unsafe-prompts4703.csv", "artists_sd.txt",
              "profession_prompts.csv", "biases_compare.csv",
              "imagenet_prompts.csv", "gender_bias.csv"):
        assert os.path.exists(os.path.join(data, f)), f
    assert len(os.listdir(os.path.join(data, "prompts_dir"))) == 8
    assert len(os.listdir(os.path.join(data, "info"))) == 26
    df = pd.read_csv(os.path.join(data, "coco_30k.csv"))
    assert len(df) >= 30_000 and "case_number" in df.columns

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

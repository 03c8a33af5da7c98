"""HiDream pipeline tests: tiny end-to-end generation + UCE edit A/B.

Mirrors tests/test_flux_pipeline.py for the HiDream-I1 family (reference
entry: trainscripts/uce_hidream_edit.py; the upstream inference demo
notebook's blob is missing from the snapshot, so the A/B protocol follows
inference_flux.ipynb cells 4/6).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.helpers import ToyTokenizer
from uce_tpu.diffusion import pipeline_hidream as ph
from uce_tpu.edit import hidream as edit_hd
from uce_tpu.models import clip_text, hidream as hd_mod, llama as llama_mod
from uce_tpu.models import t5 as t5_mod, vae as vae_mod

# shared stream dim: llama hidden == t5 d_model in HiDream (both 4096)
D_T5, D_LL = 16, 16


def _tiny_configs():
    tcfg = hd_mod.HiDreamConfig(
        patch_size=2, in_channels=4, out_channels=4, num_layers=1,
        num_single_layers=1, attention_head_dim=8, num_attention_heads=4,
        caption_channels=(D_T5, D_LL), text_emb_dim=16 + 20,
        num_routed_experts=2, num_activated_experts=1,
        axes_dims_rope=(4, 2, 2), llama_layers=(0, 1), ffn_multiple_of=8)
    llama_cfg = llama_mod.LlamaConfig(
        vocab_size=99, hidden_size=D_LL, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0)
    t5_cfg = t5_mod.T5Config(
        vocab_size=99, d_model=D_T5, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16)
    ccfg = clip_text.CLIPTextConfig(
        vocab_size=99, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=32,
        max_position_embeddings=16, eos_token_id=98)
    ccfg2 = clip_text.CLIPTextConfig(
        vocab_size=99, hidden_size=20, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=40,
        max_position_embeddings=16, eos_token_id=98)
    vcfg = vae_mod.VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                             norm_num_groups=4, latent_channels=4,
                             scaling_factor=0.3611, shift_factor=0.1159)
    return tcfg, llama_cfg, t5_cfg, ccfg, ccfg2, vcfg


@pytest.fixture(scope="module")
def tiny_hidream():
    tcfg, llama_cfg, t5_cfg, ccfg, ccfg2, vcfg = _tiny_configs()
    flat_sd = hd_mod.init_state_dict(tcfg, np.random.default_rng(0),
                                     scale=0.3)
    pipe = ph.HiDreamPipeline(
        transformer_params=hd_mod.convert_hf_state_dict(flat_sd, tcfg),
        transformer_config=tcfg,
        clip_params=clip_text.init_params(np.random.default_rng(1), ccfg),
        clip_config=ccfg, clip_tokenizer=ToyTokenizer(),
        clip_params_2=clip_text.init_params(np.random.default_rng(2), ccfg2),
        clip_config_2=ccfg2, clip_tokenizer_2=ToyTokenizer(),
        t5_params=t5_mod.init_params(np.random.default_rng(3), t5_cfg),
        t5_config=t5_cfg, t5_tokenizer=ToyTokenizer(),
        llama_params=llama_mod.init_params(np.random.default_rng(4),
                                           llama_cfg),
        llama_config=llama_cfg, llama_tokenizer=ToyTokenizer(),
        vae_params=vae_mod.init_params(vcfg, 5),
        vae_config=vcfg,
        scheduler_config={"_class_name": "FlowMatchEulerDiscreteScheduler",
                          "shift": 3.0},
        dtype=jnp.float32, max_sequence_length=12,
    )
    return pipe, flat_sd


def test_generate_shape_and_determinism(tiny_hidream):
    pipe, _ = tiny_hidream
    a = pipe("a cat", num_inference_steps=2, guidance_scale=5.0, seed=3,
             height=32, width=32)
    assert a.shape == (1, 32, 32, 3) and a.dtype == np.uint8
    b = pipe("a cat", num_inference_steps=2, guidance_scale=5.0, seed=3,
             height=32, width=32)
    np.testing.assert_array_equal(a, b)
    c = pipe("a cat", num_inference_steps=2, guidance_scale=5.0, seed=4,
             height=32, width=32)
    assert (a != c).any()


def test_prompt_conditioning_matters(tiny_hidream):
    pipe, _ = tiny_hidream
    a = pipe("cat", num_inference_steps=2, guidance_scale=5.0, seed=3,
             height=32, width=32)
    b = pipe("submarine sandwich", num_inference_steps=2, guidance_scale=5.0,
             seed=3, height=32, width=32)
    assert (a != b).any()


def test_no_cfg_single_branch(tiny_hidream):
    pipe, _ = tiny_hidream
    a = pipe("cat", num_inference_steps=2, guidance_scale=0.0, seed=3,
             height=32, width=32)
    assert a.shape == (1, 32, 32, 3)


def test_list_seed_distinct_samples(tiny_hidream):
    pipe, _ = tiny_hidream
    imgs = pipe("cat", num_inference_steps=2, seed=[5],
                num_images_per_prompt=2, height=32, width=32)
    assert imgs.shape[0] == 2
    assert (imgs[0] != imgs[1]).any()


def test_uce_edit_changes_output(tiny_hidream, tmp_path):
    """Before/after A/B: edit the caption projections with the real edit
    path (shared llama/t5 weights), overlay via load_uce_edits, and assert
    the erased prompt's image changes."""
    pipe, flat_sd = tiny_hidream
    tcfg = pipe.transformer_config

    base = pipe("van gogh painting", num_inference_steps=2,
                guidance_scale=5.0, seed=7, height=32, width=32)

    n_cp = tcfg.num_caption_projections
    targets = {f"caption_projection.{i}.linear.weight":
               np.asarray(flat_sd[f"caption_projection.{i}.linear.weight"])
               for i in range(n_cp)}
    res = edit_hd.HiDreamEditResources(
        targets=targets, llama_layers=list(tcfg.llama_layers),
        llama_params=pipe.llama_params, llama_config=pipe.llama_config,
        llama_tokenizer=pipe.llama_tokenizer,
        t5_params=pipe.t5_params, t5_config=pipe.t5_config,
        t5_tokenizer=pipe.t5_tokenizer,
        max_sequence_length=pipe.max_sequence_length,
    )
    edit_hd.run_erase(res, ["van gogh"], ["art"], [],
                      erase_scale=5.0, save_dir=str(tmp_path), exp_name="e")
    pipe.load_uce_edits(str(tmp_path / "e.safetensors"))
    try:
        edited = pipe("van gogh painting", num_inference_steps=2,
                      guidance_scale=5.0, seed=7, height=32, width=32)
        assert (base != edited).any()
    finally:
        pipe.transformer_params = hd_mod.convert_hf_state_dict(flat_sd, tcfg)


def test_moe_gate_routes(rng):
    """Dense top-k MoE: k=1 must pick exactly the argmax expert's output
    weighted by its softmax score (norm_topk_prob=False semantics)."""
    d, h, e = 8, 12, 3
    p = {
        "gate": {"weight": jnp.asarray(
            rng.standard_normal((e, d)).astype(np.float32))},
        "experts": {k: {"weight": jnp.asarray(
            rng.standard_normal((e, din, dout)).astype(np.float32))}
            for k, (din, dout) in
            {"w1": (d, h), "w3": (d, h), "w2": (h, d)}.items()},
        "shared": {k: {"weight": jnp.asarray(
            rng.standard_normal(s).astype(np.float32))}
            for k, s in {"w1": (d, h), "w3": (d, h), "w2": (h, d)}.items()},
    }
    x = jnp.asarray(rng.standard_normal((1, 4, d)).astype(np.float32))
    out = np.asarray(hd_mod._moe(p, x, 1))

    gw = np.asarray(p["gate"]["weight"])
    scores = np.exp(x @ gw.T) / np.exp(x @ gw.T).sum(-1, keepdims=True)
    ref = np.zeros_like(np.asarray(x))
    for s in range(4):
        ei = int(np.argmax(scores[0, s]))
        xs = np.asarray(x)[0, s]
        w1 = np.asarray(p["experts"]["w1"]["weight"])[ei]
        w3 = np.asarray(p["experts"]["w3"]["weight"])[ei]
        w2 = np.asarray(p["experts"]["w2"]["weight"])[ei]
        silu = lambda v: v / (1 + np.exp(-v))
        ref[0, s] = scores[0, s, ei] * ((silu(xs @ w1) * (xs @ w3)) @ w2)
        sw1 = np.asarray(p["shared"]["w1"]["weight"])
        sw3 = np.asarray(p["shared"]["w3"]["weight"])
        sw2 = np.asarray(p["shared"]["w2"]["weight"])
        ref[0, s] += (silu(xs @ sw1) * (xs @ sw3)) @ sw2
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_config_from_hf_null_out_channels():
    """diffusers serializes 'out_channels': null meaning 'use in_channels';
    the loader must not propagate None into shape arithmetic."""
    from uce_tpu.models import hidream as hd_mod

    cfg = hd_mod.HiDreamConfig.from_hf({"in_channels": 16,
                                        "out_channels": None})
    assert cfg.out_channels == 16


def test_staged_matches_eager(tmp_path_factory):
    """from_pretrained(staged=True): encode -> free_encoders -> lazy MoE
    DiT load must reproduce the eager path exactly (reference three-phase
    staging, uce_hidream_edit.py:16-28/51-64/97-108)."""
    from tests.snapshot import make_hidream_snapshot
    from uce_tpu.diffusion.pipeline_hidream import HiDreamPipeline

    root = make_hidream_snapshot(tmp_path_factory.mktemp("hd_snap"))
    kw = dict(num_inference_steps=2, guidance_scale=2.0, seed=3,
              height=16, width=16)
    eager = HiDreamPipeline.from_pretrained(root, max_sequence_length=16)
    ref = eager("a cat", **kw)

    pipe = HiDreamPipeline.from_pretrained(root, max_sequence_length=16,
                                           staged=True)
    assert pipe.transformer_params is None
    t5_c, ll_c, p_c = pipe.encode_prompts(["a cat"])
    t5_u, ll_u, p_u = pipe.encode_prompts([""])
    pipe.free_encoders()
    with pytest.raises(RuntimeError, match="freed"):
        pipe.encode_prompts(["a dog"])
    got = pipe.generate_from_embeddings(
        jnp.concatenate([t5_u, t5_c], axis=0),
        jnp.concatenate([ll_u, ll_c], axis=1),
        jnp.concatenate([p_u, p_c], axis=0),
        do_cfg=True, **kw)
    np.testing.assert_array_equal(got, ref)


def test_staged_w8_close_to_eager(tmp_path_factory):
    from tests.snapshot import make_hidream_snapshot
    from uce_tpu.diffusion.pipeline_hidream import HiDreamPipeline
    from uce_tpu.ops import quant

    root = make_hidream_snapshot(tmp_path_factory.mktemp("hd_snap_q"))
    kw = dict(num_inference_steps=2, guidance_scale=0.0, seed=3,
              height=16, width=16)
    eager = HiDreamPipeline.from_pretrained(root, max_sequence_length=16)
    ref = eager("a cat", **kw)

    pipe = HiDreamPipeline.from_pretrained(root, max_sequence_length=16,
                                           staged=True, quantize="w8")
    t5_c, ll_c, p_c = pipe.encode_prompts(["a cat"])
    pipe.free_encoders()
    got = pipe.generate_from_embeddings(t5_c, ll_c, p_c, **kw)
    tp = pipe.transformer_params
    assert quant.is_weight_only(
        tp["double_stream_blocks"]["attn1"]["to_q"]["weight"])
    assert not quant.is_weight_only(
        tp["caption_projection"]["llama"]["weight"])
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.mean() < 8, diff.mean()


def test_generate_hidream_cli_staged_w8(tmp_path_factory, tmp_path):
    """The generate-hidream CLI --staged --quantize w8 path end-to-end:
    encode all cases (CFG uncond rows first), free encoders, lazy-load
    the quantized MoE DiT, write {case}_{num}.png."""
    import os
    import sys

    from tests.snapshot import make_hidream_snapshot
    from uce_tpu.cli.main import main as cli_main

    root = make_hidream_snapshot(tmp_path_factory.mktemp("hd_snap_cli"))
    csv = tmp_path / "p.csv"
    csv.write_text("case_number,prompt,evaluation_seed\n"
                   "0,a cat,7\n1,a dog,9\n")
    argv = sys.argv
    sys.argv = ["uce", "generate-hidream", "--model_name", str(root),
                "--prompts_path", str(csv),
                "--save_path", str(tmp_path / "out"),
                "--staged", "--quantize", "w8",
                "--num_inference_steps", "1", "--image_size", "16",
                "--num_samples", "2", "--guidance_scale", "5.0"]
    try:
        assert cli_main() == 0
    finally:
        sys.argv = argv
    written = sorted(os.listdir(tmp_path / "out" / "original"))
    assert written == ["0_0.png", "0_1.png", "1_0.png", "1_1.png"]


def test_fast_full_window_is_identical(tiny_hidream):
    """A cfg_interval spanning every step changes no arithmetic — the
    single guided segment must reproduce the exact path bitwise."""
    from uce_tpu.diffusion.sampler import FastConfig

    pipe, _ = tiny_hidream
    kw = dict(num_inference_steps=2, guidance_scale=5.0, seed=3,
              height=16, width=16)
    base = pipe("a cat", **kw)
    fast = pipe("a cat", fast=FastConfig(cfg_interval=(0, 100)), **kw)
    np.testing.assert_array_equal(base, fast)


def test_fast_cfg_window_runs_and_differs(tiny_hidream):
    from uce_tpu.diffusion.sampler import FastConfig

    pipe, _ = tiny_hidream
    kw = dict(num_inference_steps=3, guidance_scale=5.0, seed=3,
              height=16, width=16)
    base = pipe("a cat", **kw)
    fast = pipe("a cat", fast=FastConfig(cfg_interval=(1, 2)), **kw)
    assert fast.shape == base.shape and fast.dtype == np.uint8
    assert (fast != base).any()  # cond-only steps change the trajectory
    again = pipe("a cat", fast=FastConfig(cfg_interval=(1, 2)), **kw)
    np.testing.assert_array_equal(fast, again)


def test_fast_rejects_cache_interval(tiny_hidream):
    from uce_tpu.diffusion.sampler import FastConfig

    pipe, _ = tiny_hidream
    with pytest.raises(ValueError, match="cfg_interval only"):
        pipe("a cat", num_inference_steps=2, guidance_scale=5.0, seed=1,
             height=16, width=16, fast=FastConfig(cache_interval=2))


def test_fast_ignored_without_cfg(tiny_hidream):
    """guidance <= 1 runs a single branch; a cfg window is meaningless
    and must silently share the exact path."""
    from uce_tpu.diffusion.sampler import FastConfig

    pipe, _ = tiny_hidream
    kw = dict(num_inference_steps=2, guidance_scale=1.0, seed=3,
              height=16, width=16)
    base = pipe("a cat", **kw)
    fast = pipe("a cat", fast=FastConfig(cfg_interval=(0, 1)), **kw)
    np.testing.assert_array_equal(base, fast)


def test_apply_mesh_defers_dit_load_on_staged(tmp_path_factory):
    """apply_mesh on a staged pipeline must NOT force-load the MoE DiT:
    staging's whole point is encoders-first, DiT into the vacated HBM
    (uce_hidream_edit.py three-phase staging). The tensor/expert-parallel
    layout applies when the DiT actually loads."""
    from tests.snapshot import make_hidream_snapshot
    from uce_tpu.diffusion.pipeline_hidream import HiDreamPipeline
    from uce_tpu.parallel import mesh as mesh_mod

    root = make_hidream_snapshot(tmp_path_factory.mktemp("hd_mesh_snap"))
    kw = dict(num_inference_steps=2, guidance_scale=2.0, seed=3,
              height=16, width=16)

    def staged_generate(pipe):
        t5_c, ll_c, p_c = pipe.encode_prompts(["a cat"])
        t5_u, ll_u, p_u = pipe.encode_prompts([""])
        pipe.free_encoders()
        return pipe.generate_from_embeddings(
            jnp.concatenate([t5_u, t5_c], axis=0),
            jnp.concatenate([ll_u, ll_c], axis=1),
            jnp.concatenate([p_u, p_c], axis=0), do_cfg=True, **kw)

    ref_pipe = HiDreamPipeline.from_pretrained(root, max_sequence_length=16,
                                               staged=True)
    ref = staged_generate(ref_pipe)

    pipe = HiDreamPipeline.from_pretrained(root, max_sequence_length=16,
                                           staged=True)
    pipe.apply_mesh(mesh_mod.make_mesh(n_data=4, n_model=2))
    assert pipe.transformer_params is None  # memory contract preserved
    got = staged_generate(pipe)
    assert pipe.transformer_params is not None
    # the deferred layout landed: some DiT param is sharded over 'model'
    import jax

    leaves = jax.tree_util.tree_leaves(pipe.transformer_params)
    assert any("model" in str(getattr(l, "sharding", "")) for l in leaves)
    # padded-batch + TP is a different XLA program: allow the documented
    # +-1 uint8 rounding (serving/server.py ladder caveat)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_apply_mesh_none_reverts_model_sharding(tiny_hidream):
    """apply_mesh(None) gathers a model-sharded DiT back to one device,
    as the docstring promises."""
    import jax
    from uce_tpu.parallel import mesh as mesh_mod

    pipe, _ = tiny_hidream
    kw = dict(num_inference_steps=2, guidance_scale=2.0, seed=3,
              height=16, width=16)
    base = pipe("a cat", **kw)
    pipe.apply_mesh(mesh_mod.make_mesh(n_data=4, n_model=2))
    try:
        meshed = pipe("a cat", **kw)
    finally:
        pipe.apply_mesh(None)
    leaves = jax.tree_util.tree_leaves(pipe.transformer_params)
    assert all(len(l.sharding.device_set) == 1 for l in leaves)
    reverted = pipe("a cat", **kw)
    # meshed is a different XLA program (padded batch + TP): +-1 level
    assert np.abs(meshed.astype(int) - base.astype(int)).max() <= 1
    # reverted runs the original single-device program again: bitwise
    np.testing.assert_array_equal(base, reverted)


def test_hidream_pack_latents_is_pixel_major():
    """Pin HiDream's own patchify convention non-circularly:
    packed[k] = lat[py, px, c] at k = (py*2 + px)*C + c (pixel-major) —
    the upstream transformer's einops '(p1 p2 C)'. This is deliberately
    DIFFERENT from FLUX's channel-major pack (pipeline_flux)."""
    c_dim = 3
    lat = np.zeros((1, 2, 2, c_dim), np.float32)
    for py in range(2):
        for px in range(2):
            for c in range(c_dim):
                lat[0, py, px, c] = c * 100 + py * 10 + px
    packed = np.asarray(ph.pack_latents(jnp.asarray(lat)))
    assert packed.shape == (1, 1, 4 * c_dim)
    for k in range(4 * c_dim):
        pix, c = divmod(k, c_dim)
        py, px = divmod(pix, 2)
        assert packed[0, 0, k] == c * 100 + py * 10 + px, (k, c, py, px)

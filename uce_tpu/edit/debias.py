"""Iterative debiasing: generate -> CLIP-classify -> ratio-update -> re-solve.

Reference: ``trainscripts/uce_sd_debias.py``. The gradient-free controller
is the in-place accumulation of attribute directions into the guide outputs
(``:126``): each iteration adds ``ratio_a * v_attr_a`` to every edit
concept's v*. Because v* = W_old @ c is linear in the embedding, we carry a
cumulative coefficient matrix ``acc [K, A]`` and solve with effective guide
embeddings ``g_k = c_edit_k + acc_k @ c_attrs`` — which keeps the whole
re-solve on the collapsed single-edit-matrix fast path every iteration.

The loop is split into a pure controller (`debias_loop`, unit-testable with
a fake generator/classifier) and the on-device driver (`run_debias`) wiring
SDPipeline generation and JAX CLIP zero-shot classification with no PIL
round-trip.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Mapping, Sequence

import numpy as np

from uce_tpu.edit import embeddings as emb
from uce_tpu.models.hf_loader import save_safetensors
from uce_tpu.ops.solver import apply_edit_matrix, uce_edit_matrix

# HF zero-shot-image-classification default template, used implicitly by the
# reference's clip(images, candidate_labels=...) call.
DEFAULT_HYPOTHESIS_TEMPLATE = "This is a photo of {}."


@dataclasses.dataclass
class DebiasSettings:
    desired_ratios: Sequence[float] = (0.5, 0.5)
    max_iterations: int = 30
    max_diff: float = 0.05
    num_images_per_prompt: int = 10
    num_inference_steps: int = 20
    guidance_scale: float = 7.5
    edit_scale: float = 1.0
    preserve_scale: float = 1.0
    lamb: float = 0.5


def apply_deadband(ratios: np.ndarray, max_diff: float) -> np.ndarray:
    """Per-concept deadband (uce_sd_debias.py:31-32): zero the whole ratio
    row when every attribute is within tolerance."""
    out = ratios.copy()
    for i in range(out.shape[0]):
        r = out[i]
        if r.max() < max_diff and abs(r.min()) < max_diff:
            out[i] = 0.0
    return out


def debias_loop(
    solve_fn: Callable[[np.ndarray], Mapping[str, np.ndarray]],
    measure_fn: Callable[[Mapping[str, np.ndarray]], np.ndarray],
    n_concepts: int,
    n_attrs: int,
    desired_ratios: np.ndarray,
    max_iterations: int,
    max_diff: float,
    on_iteration: Callable | None = None,
):
    """Pure controller.

    solve_fn(acc [K, A]) -> edited weights given cumulative coefficients.
    measure_fn(weights) -> observed ratios [K, A] (fraction classified as
    each attribute, per edit concept).
    Returns (weights, acc, history).
    """
    acc = np.zeros((n_concepts, n_attrs), np.float64)
    history = []
    weights = solve_fn(acc)
    for iteration in range(max_iterations):
        observed = measure_fn(weights)
        ratios = apply_deadband(desired_ratios[None, :] - observed, max_diff)
        history.append({"iteration": iteration, "observed": observed,
                        "ratios": ratios})
        if on_iteration is not None:
            on_iteration(iteration, observed, ratios)
        if np.abs(ratios).max() == 0:
            break
        acc = acc + ratios  # reference's in-place v* accumulation (:126)
        weights = solve_fn(acc)
    return weights, acc, history


def make_collapsed_solver(
    targets: Mapping[str, np.ndarray],
    concept_embeds: Mapping[str, np.ndarray],
    edit_concepts: Sequence[str],
    debias_concepts: Sequence[str],
    preserve_concepts: Sequence[str],
    settings: DebiasSettings,
):
    """solve_fn factory: effective guide g_k = c_edit_k + acc_k @ c_attrs."""
    c_edit = emb.stack_embeds(concept_embeds, edit_concepts)
    c_attr = emb.stack_embeds(concept_embeds, debias_concepts)
    c_pres = emb.stack_embeds(concept_embeds, preserve_concepts)
    if c_pres.shape[0] == 0:
        c_pres = np.zeros((0, c_edit.shape[1]), np.float32)
    names = list(targets)
    w_cat = np.concatenate([np.asarray(targets[n], np.float32) for n in names])
    rows = [targets[n].shape[0] for n in names]

    def solve_fn(acc: np.ndarray) -> dict[str, np.ndarray]:
        c_guide = c_edit + acc.astype(np.float32) @ c_attr
        e_mat = uce_edit_matrix(
            c_edit, c_guide, c_pres,
            settings.edit_scale, settings.preserve_scale, settings.lamb,
        )
        new_cat = np.asarray(apply_edit_matrix(w_cat, e_mat))
        out, off = {}, 0
        for n, r in zip(names, rows):
            out[n] = new_cat[off:off + r]
            off += r
        return out

    return solve_fn


def resources_from_pipe(pipe):
    """SDEditResources derived from a live SDPipeline: edit targets from
    its UNet params (torch-layout weights), encoders from the pipeline."""
    from uce_tpu.edit.sd import SDEditResources
    from uce_tpu.models import sd_targets, unet as unet_mod

    flat = unet_mod.flatten_params(pipe.unet_params)
    targets = {}
    for k, v in flat.items():
        if sd_targets.is_sd_cross_attn_kv(k):
            targets[k] = np.asarray(v, np.float32).T  # back to torch layout
    if not targets:
        # quantized pipelines flatten to '...to_k.weight.w8int' keys
        # that the target filter never matches — fail here with the
        # cause, not in the solver's np.concatenate([])
        raise ValueError(
            "no cross-attn to_k/to_v edit targets found in the UNet "
            "params; if the pipeline was quantized "
            "(quantize_weights), run debias on an unquantized "
            "pipeline — the solver edits float weights (overlays "
            "onto a quantized pipeline for GENERATION are fine)")
    return SDEditResources(
        targets=targets, text_params=pipe.text_params,
        text_config=pipe.text_config, tokenizer=pipe.tokenizer,
        # SDXL: concept embeddings must come from the dual-encoder
        # concat the UNet is conditioned on
        text_params_2=pipe.text_params_2,
        text_config_2=pipe.text_config_2,
        tokenizer_2=pipe.tokenizer_2,
        family="sdxl" if pipe.is_sdxl else "sd",
    )


def debias_measure_seeds(edit_concepts: Sequence[str]) -> list:
    """Stable per-concept generation seeds for the measurement pass
    (builtin hash() is salted per process, so crc32)."""
    import zlib

    return [zlib.crc32(f"{ci}:{c}".encode()) % (2 ** 31)
            for ci, c in enumerate(edit_concepts)]


def run_debias(
    pipe,
    clip_model,
    edit_concepts: Sequence[str],
    debias_concepts: Sequence[str],
    preserve_concepts: Sequence[str] = (),
    settings: DebiasSettings | None = None,
    save_dir: str | None = None,
    exp_name: str = "uce_test",
    resources=None,
    hypothesis_template: str = DEFAULT_HYPOTHESIS_TEMPLATE,
    image_size: int = 512,
    snapshot_every: int | None = None,
    verbose: bool = True,
    telemetry_path: str | None = None,
    fast=None,
):
    """On-device closed loop for SD pipelines.

    pipe: ``uce_tpu.diffusion.pipeline.SDPipeline`` (weights get overlaid
    in-memory each iteration — the JAX analogue of
    ``pipe.unet.load_state_dict`` at ``uce_sd_debias.py:19``).
    clip_model: ``uce_tpu.models.clip.CLIPModel``.
    resources: optional preloaded ``SDEditResources`` (defaults to the
    pipeline's own encoder + targets derived from its UNet).
    fast: optional ``sampler.FastConfig`` for the measurement
    generations (the loop's dominant cost). The controller only reads
    CLIP class ratios off the images, so the fast path's pixel-level
    perturbation is a second-order effect on the feedback signal — but
    it IS beyond the reference protocol, so it stays opt-in.
    """
    from uce_tpu.models import unet as unet_mod

    settings = settings or DebiasSettings()
    if len(settings.desired_ratios) != len(debias_concepts):
        # fail BEFORE the first generate+classify pass (minutes of device
        # time), not at the ratio broadcast after it
        raise ValueError(
            f"desired_ratios has {len(settings.desired_ratios)} entries "
            f"for {len(debias_concepts)} debias concepts — they must "
            "match (the CLI validates this; library callers hit it here)")
    start = time.time()

    if resources is None:
        resources = resources_from_pipe(pipe)

    concepts = (list(edit_concepts) + list(debias_concepts)
                + list(preserve_concepts))
    concept_embeds = resources.encode_concepts(concepts)
    solve_fn = make_collapsed_solver(
        resources.targets, concept_embeds, edit_concepts, debias_concepts,
        preserve_concepts, settings,
    )

    labels = [hypothesis_template.format(c) for c in debias_concepts]

    def measure_fn(weights) -> np.ndarray:
        """One batched denoise for ALL concepts x samples, one batched
        zero-shot classify — the whole measurement is two device programs
        (the reference loops concepts with 10-image pipeline calls each,
        uce_sd_debias.py:21-28)."""
        pipe.unet_params = unet_mod.overlay_edits(pipe.unet_params, weights,
                                                  dtype=pipe.dtype)
        n_img = settings.num_images_per_prompt
        images = pipe(
            list(edit_concepts),
            num_inference_steps=settings.num_inference_steps,
            guidance_scale=settings.guidance_scale,
            num_images_per_prompt=n_img,
            seed=debias_measure_seeds(edit_concepts),
            height=image_size, width=image_size,
            fast=fast,
        )
        pred = np.asarray(clip_model.classify(images, labels))
        observed = np.zeros((len(edit_concepts), len(debias_concepts)))
        for ci in range(len(edit_concepts)):
            block = pred[ci * n_img:(ci + 1) * n_img]
            for ai in range(len(debias_concepts)):
                observed[ci, ai] = float((block == ai).mean())
        return observed

    telemetry = None
    if telemetry_path:
        from uce_tpu.utils.observability import DebiasTelemetry

        telemetry = DebiasTelemetry(telemetry_path, edit_concepts,
                                    debias_concepts)

    def on_iteration(iteration, observed, ratios):
        if verbose:
            print(f"debias iter {iteration}: observed={observed.tolist()} "
                  f"ratio_diff={ratios.tolist()}")
        if telemetry is not None:
            telemetry.record(iteration, observed, ratios)
        if snapshot_every and save_dir and (iteration + 1) % snapshot_every == 0:
            save_safetensors(solve_fn_weights_cache[0], os.path.join(
                save_dir, f"{exp_name}_iter{iteration}.safetensors"))

    solve_fn_weights_cache = [None]

    def solve_and_cache(acc):
        w = solve_fn(acc)
        solve_fn_weights_cache[0] = w
        return w

    weights, acc, history = debias_loop(
        solve_and_cache, measure_fn,
        len(edit_concepts), len(debias_concepts),
        np.asarray(settings.desired_ratios, np.float64),
        settings.max_iterations, settings.max_diff,
        on_iteration=on_iteration,
    )
    if history and np.abs(history[-1]["ratios"]).max() == 0 and verbose:
        print("All concepts are debiased")

    if save_dir is not None:
        save_safetensors(weights,
                         os.path.join(save_dir, exp_name + ".safetensors"))
    if verbose:
        print(f"\n\nDebiased concepts using UCE\n"
              f"Model edited in {time.time() - start} seconds\n")
    return weights, acc, history

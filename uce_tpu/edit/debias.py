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


class DeviceDebiasApplier:
    """Device-resident re-solve + weight swap for the debias loop.

    The round-4 host path shipped ~46 MB of edited fp32 weights through
    the host link every iteration (solve via host numpy, then an
    ``overlay_edits`` re-upload): 4.16 s of the 9.67 s/iter on chip
    (docs/bench/DEBIAS_r04.json). Here the stacked edit-target weights
    are uploaded ONCE at construction; each iteration ships only the
    effective guide stack ``c_guide`` [K, d] (~3 KB) and runs
    ``E = uce_edit_matrix(...)``, ``W_new = W @ E`` and the per-target
    transpose/dtype-cast ON DEVICE, swapping device buffers into the
    UNet pytree with zero weight round-trips. The arithmetic dispatches
    the SAME jitted executables as the host path (`uce_edit_matrix` /
    `apply_edit_matrix` on identical values and avals), so results are
    bit-identical to `make_collapsed_solver` — pinned by
    tests/test_debias.py::test_device_solver_bitwise_matches_host.

    Reference anchor: ``uce_sd_debias.py:19`` (the load_state_dict
    weight swap) and ``:114-140`` (the per-iteration re-solve).
    """

    def __init__(self, targets, concept_embeds, edit_concepts,
                 debias_concepts, preserve_concepts, settings, params):
        import jax
        import jax.numpy as jnp

        self.settings = settings
        self.c_edit = emb.stack_embeds(concept_embeds, edit_concepts)
        self.c_attr = emb.stack_embeds(concept_embeds, debias_concepts)
        c_pres = emb.stack_embeds(concept_embeds, preserve_concepts)
        if c_pres.shape[0] == 0:
            c_pres = np.zeros((0, self.c_edit.shape[1]), np.float32)
        self.names = list(targets)
        rows = [targets[n].shape[0] for n in self.names]
        self.rows = rows
        # the ONE big upload: stacked torch-layout fp32 targets
        self.w_cat = jnp.asarray(np.concatenate(
            [np.asarray(targets[n], np.float32) for n in self.names]))
        self.c_pres = jnp.asarray(c_pres)
        # swap only targets that resolve in the pytree — strict=False
        # parity with overlay_edits (solve/export still cover ALL
        # targets; unknown keys just cannot be swapped into this model)
        offs = np.cumsum([0] + rows)
        self._paths, dtypes, slices, skipped = [], [], [], []
        for i, name in enumerate(self.names):
            parts = name.split(".")
            node = params
            try:
                for p in parts[:-1]:
                    node = node[p]
                dtypes.append(jnp.asarray(node[parts[-1]]).dtype)
            except (KeyError, TypeError):
                skipped.append(name)
                continue
            self._paths.append(parts)
            slices.append((int(offs[i]), int(offs[i + 1])))
        if skipped:
            print(f"DeviceDebiasApplier: {len(skipped)} target(s) not in "
                  f"the model pytree, skipped (e.g. {skipped[0]})")
        slices = tuple(slices)

        @jax.jit
        def _leaves(new_cat):
            # per-target JAX layout ([in, out]) + model dtype, on device —
            # the device-side mirror of overlay_edits' transpose+cast
            return tuple(new_cat[a:b].T.astype(dt)
                         for (a, b), dt in zip(slices, dtypes))

        self._leaves_fn = _leaves
        self._cat = None  # device-resident result of the last solve

    def solve(self, acc: np.ndarray):
        """Edited target stack for ``acc`` (device array, torch-layout
        fp32). Only ``c_guide`` [K, d] crosses the host link."""
        c_guide = self.c_edit + np.asarray(acc).astype(np.float32) @ self.c_attr
        e_mat = uce_edit_matrix(
            self.c_edit, c_guide, self.c_pres,
            self.settings.edit_scale, self.settings.preserve_scale,
            self.settings.lamb,
        )
        self._cat = apply_edit_matrix(self.w_cat, e_mat)
        return self._cat

    def overlay(self, params: dict, acc: np.ndarray) -> dict:
        """Re-solve for ``acc`` and swap the edited leaves into a shallow
        copy of ``params`` — the whole path stays on device. Each new
        leaf inherits the old leaf's sharding, so the swap composes with
        ``apply_mesh`` (TP-sharded UNets keep their layout; on one chip
        device_put onto the same device is a no-op)."""
        import jax

        leaves = self._leaves_fn(self.solve(acc))
        edited = jax.tree_util.tree_map(lambda x: x, params)
        for parts, leaf in zip(self._paths, leaves):
            node = edited
            for p in parts[:-1]:
                node = node[p]
            old_sharding = getattr(node[parts[-1]], "sharding", None)
            if old_sharding is not None:
                leaf = jax.device_put(leaf, old_sharding)
            node[parts[-1]] = leaf
        return edited

    def export(self, acc: np.ndarray | None = None) -> dict[str, np.ndarray]:
        """Safetensors-ready host dict (torch-layout fp32) — ONE download,
        at snapshot/final-save time only. Defaults to the last solve."""
        cat = self.solve(acc) if acc is not None else self._cat
        if cat is None:
            raise RuntimeError("export() before any solve()/overlay()")
        cat = np.asarray(cat)
        out, off = {}, 0
        for n, r in zip(self.names, self.rows):
            out[n] = cat[off:off + r]
            off += r
        return out


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
    device_resident: bool = True,
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
    device_resident: keep the re-solve + weight swap on device
    (``DeviceDebiasApplier``) — bit-identical to the host path and
    ~4 s/iter cheaper on chip; False reproduces the round-4 host path
    (kept for the equality test and as a debugging fallback).
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
    base_params = pipe.unet_params
    host_weights_cache = [None]
    if device_resident:
        applier = DeviceDebiasApplier(
            resources.targets, concept_embeds, edit_concepts,
            debias_concepts, preserve_concepts, settings, base_params)

        def solve_and_swap(acc):
            # re-solve + weight swap entirely on device; the returned
            # handle is only a token for the controller — host weights
            # materialize once, at snapshot/final-save time
            pipe.unet_params = applier.overlay(base_params, acc)
            return acc

        def snapshot_weights():
            return applier.export()
    else:
        applier = None
        host_solve = make_collapsed_solver(
            resources.targets, concept_embeds, edit_concepts, debias_concepts,
            preserve_concepts, settings,
        )

        def solve_and_swap(acc):
            w = host_solve(acc)
            host_weights_cache[0] = w
            pipe.unet_params = unet_mod.overlay_edits(base_params, w,
                                                      dtype=pipe.dtype)
            return w

        def snapshot_weights():
            return host_weights_cache[0]

    labels = [hypothesis_template.format(c) for c in debias_concepts]

    def measure_fn(weights) -> np.ndarray:
        """One batched denoise for ALL concepts x samples, one batched
        zero-shot classify — the whole measurement is two device programs
        (the reference loops concepts with 10-image pipeline calls each,
        uce_sd_debias.py:21-28). The weight swap already happened in
        solve_and_swap; ``weights`` is the controller's token, unused."""
        del weights
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
            save_safetensors(snapshot_weights(), os.path.join(
                save_dir, f"{exp_name}_iter{iteration}.safetensors"))

    weights, acc, history = debias_loop(
        solve_and_swap, measure_fn,
        len(edit_concepts), len(debias_concepts),
        np.asarray(settings.desired_ratios, np.float64),
        settings.max_iterations, settings.max_diff,
        on_iteration=on_iteration,
    )
    if device_resident:
        # the ONE download of the run: the final edited target stack
        weights = applier.export()
    if history and np.abs(history[-1]["ratios"]).max() == 0 and verbose:
        print("All concepts are debiased")

    if save_dir is not None:
        save_safetensors(weights,
                         os.path.join(save_dir, exp_name + ".safetensors"))
    if verbose:
        print(f"\n\nDebiased concepts using UCE\n"
              f"Model edited in {time.time() - start} seconds\n")
    return weights, acc, history

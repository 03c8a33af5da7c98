"""uce_tpu — TPU-native Unified Concept Editing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
rohitgandikota/unified-concept-editing (arXiv:2308.14761): closed-form,
gradient-free editing of the text-to-image projection matrices of diffusion
models (SD v1.x/v2.x, SDXL, FLUX, HiDream-I1), the iterative debiasing
feedback loop, a jitted diffusion inference engine, and the evaluation suite.

Design principles (TPU-first, not a port):
  * The per-layer rank-1-update loops of the reference
    (trainscripts/uce_sd_erase.py:56-82) are replaced by batched einsums and
    a single Cholesky solve; when guide outputs are ``W_old @ c`` (true for
    every reference script) the whole multi-layer edit collapses to one
    d x d edit matrix applied to all layers with a single stacked matmul.
  * Denoising runs as one ``jax.lax.scan`` with classifier-free guidance and
    the scheduler step fused into the scan body, jitted once.
  * Parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding:
    data-parallel over prompts/images, optional tensor-parallel attention.
"""

__version__ = "0.1.0"

from uce_tpu.ops.solver import (  # noqa: F401
    uce_edit_matrix,
    uce_edit_matrix_batch,
    uce_solve_layer,
    uce_solve_stacked,
    apply_edit_matrix,
)


def __getattr__(name):
    # lazy re-exports (keep `import uce_tpu` light for solver-only use)
    if name == "SDPipeline":
        from uce_tpu.diffusion.pipeline import SDPipeline

        return SDPipeline
    if name == "FluxPipeline":
        from uce_tpu.diffusion.pipeline_flux import FluxPipeline

        return FluxPipeline
    if name == "CLIPModel":
        from uce_tpu.models.clip import CLIPModel

        return CLIPModel
    raise AttributeError(name)

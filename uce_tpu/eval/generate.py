"""Batch image generation over a prompts CSV (evalscripts/generate-images-sd.py).

Same contract as the reference: CSV with columns
``case_number, prompt, evaluation_seed`` -> PNGs named ``{case}_{num}.png``,
``--from_case/--till_case`` resume windows, optional UCE safetensors
overlay. Rows with identical generation signatures share one compiled
program; multiple samples per prompt run as one batched denoise.
"""

from __future__ import annotations


import pandas as pd

from uce_tpu.diffusion.pipeline import SDPipeline
from uce_tpu.utils.imaging import save_case_images


def generate_images(
    model_name: str,
    prompts_path: str,
    save_path: str,
    uce_model_path: str | None = None,
    device: str | None = None,
    guidance_scale: float = 7.5,
    image_size: int = 512,
    ddim_steps: int = 50,
    num_samples: int = 1,
    from_case: int = 0,
    till_case: int = 1_000_000,
    dtype="bfloat16",
    scheduler: str | None = None,
    batch_rows: int = 1,
    data_parallel: bool = False,
    exp_name: str | None = None,
    fast: str | None = None,
    mesh: str | None = None,
) -> int:
    """Returns the number of generated cases.

    batch_rows > 1 fuses that many CSV rows (each with its own seed) into
    one batched denoise — the embarrassingly-parallel axis of the eval
    fan-out; with ``data_parallel`` the batch additionally shards over the
    mesh 'data' axis across all local devices.
    """
    import jax.numpy as jnp

    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(device)  # must run before any backend init below
    jdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(dtype)]
    pipe = SDPipeline.from_pretrained(model_name, dtype=jdtype)
    if uce_model_path:
        pipe.load_uce_edits(uce_model_path)
    if mesh:
        from uce_tpu.parallel.mesh import mesh_from_spec

        pipe.apply_mesh(mesh_from_spec(mesh))
    elif data_parallel:
        import jax

        from uce_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) > 1:
            pipe.apply_mesh(make_mesh())

    fast_cfg = None
    if fast:
        from uce_tpu.diffusion.sampler import FastConfig

        fast_cfg = FastConfig.from_spec(fast)

    df = pd.read_csv(prompts_path)
    from uce_tpu.utils.imaging import case_window, uce_output_folder

    folder = uce_output_folder(save_path, uce_model_path, exp_name)
    rows = case_window(df, from_case, till_case)
    n = 0
    for i in range(0, len(rows), max(batch_rows, 1)):
        chunk = rows[i:i + max(batch_rows, 1)]
        images = pipe(
            [str(r.prompt) for r in chunk],
            num_inference_steps=ddim_steps,
            guidance_scale=guidance_scale,
            num_images_per_prompt=num_samples,
            seed=[int(r.evaluation_seed) for r in chunk],
            height=image_size, width=image_size,
            scheduler=scheduler,
            fast=fast_cfg,
        )
        for j, r in enumerate(chunk):
            save_case_images(
                images[j * num_samples:(j + 1) * num_samples],
                folder, r.case_number)
        n += len(chunk)
    return n


def register_cli(sub) -> None:
    p = sub.add_parser("generate",
                       help="CSV prompts -> PNG images (eval protocol)")
    p.add_argument("--model_id", "--model_name", dest="model_name",
                   type=str, required=True,
                   help="local HF snapshot directory")
    p.add_argument("--prompts_path", type=str, required=True)
    p.add_argument("--save_path", type=str, default="../uce_results/")
    p.add_argument("--uce_model_path", type=str, default=None,
                   help="UCE safetensors overlay")
    p.add_argument("--exp_name", type=str, default=None,
                   help="output folder name (defaults to the UCE artifact "
                        "name or 'original')")
    p.add_argument("--device", type=str, default=None)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--num_inference_steps", "--ddim_steps",
                   dest="ddim_steps", type=int, default=50)
    p.add_argument("--num_images_per_prompt", "--num_samples",
                   dest="num_samples", type=int, default=1)
    p.add_argument("--from_case", type=int, default=0)
    p.add_argument("--till_case", type=int, default=1_000_000)
    p.add_argument("--dtype", choices=["bfloat16", "float32"],
                   default="bfloat16")
    p.add_argument("--scheduler",
                   choices=["ddim", "pndm", "lms", "euler"], default=None)
    p.add_argument("--batch_rows", type=int, default=1,
                   help="fuse N CSV rows into one batched denoise")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard the batch over all local devices "
                        "(shorthand for --mesh data=0)")
    p.add_argument("--mesh", type=str, default=None, metavar="SPEC",
                   help="multi-chip mesh 'data=N[,model=M]': shard the "
                        "image batch over N data-parallel groups and lay "
                        "the UNet out tensor-parallel over M chips "
                        "(data=0 = all remaining devices)")
    p.add_argument("--fast", type=str, default=None, metavar="SPEC",
                   help="beyond-protocol accelerations, e.g. "
                        "'cfg_interval=2:25,cache=2,level=1' (CFG window "
                        "+ DeepCache) — quality delta quantified in "
                        "docs/PERF.md; omit for the exact reference "
                        "protocol")
    p.set_defaults(func=_cmd)


def _cmd(args) -> int:
    from uce_tpu.cli.main import apply_device_flag

    apply_device_flag(args.device)
    n = generate_images(
        args.model_name, args.prompts_path, args.save_path,
        uce_model_path=args.uce_model_path, guidance_scale=args.guidance_scale,
        image_size=args.image_size, ddim_steps=args.ddim_steps,
        num_samples=args.num_samples, from_case=args.from_case,
        till_case=args.till_case, dtype=args.dtype, scheduler=args.scheduler,
        batch_rows=args.batch_rows, data_parallel=args.data_parallel,
        exp_name=args.exp_name, fast=args.fast, mesh=args.mesh,
    )
    print(f"generated {n} cases")
    return 0

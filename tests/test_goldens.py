"""Golden-freeze regression tests.

Freeze deterministic outputs of the core numerics (solver edit matrix,
tiny-UNet forward, scheduler trajectories) as committed .npz goldens so
future refactors can't silently shift numerics. Regenerate deliberately
with: python -m tests.test_goldens regen
"""

import os

import numpy as np
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.npz")


def _compute_goldens():
    from tests.helpers import fake_unet_targets, tiny_text_encoder
    from uce_tpu.diffusion import schedulers
    from uce_tpu.models import unet as unet_mod
    from uce_tpu.ops.solver import apply_edit_matrix, uce_edit_matrix

    out = {}
    rng = np.random.default_rng(12345)

    # solver edit matrix (768-dim, 10 concepts)
    d = 64
    c_e = rng.standard_normal((10, d)).astype(np.float32)
    c_g = rng.standard_normal((10, d)).astype(np.float32)
    c_p = rng.standard_normal((5, d)).astype(np.float32)
    out["edit_matrix"] = np.asarray(
        uce_edit_matrix(c_e, c_g, c_p, 1.0, 1.0, 0.5))

    # edited weight
    w = rng.standard_normal((24, d)).astype(np.float32)
    out["edited_weight"] = np.asarray(
        apply_edit_matrix(w, jnp.asarray(out["edit_matrix"])))

    # tiny UNet forward
    cfg = unet_mod.UNetConfig(
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=32,
        attention_head_dim=2, norm_num_groups=4)
    params = unet_mod.init_params(cfg, seed=7)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    out["unet_forward"] = np.asarray(
        unet_mod.apply(params, x, jnp.asarray([500.0]), ctx, cfg))

    # scheduler trajectories (constant-eps model)
    eps = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    for name in ("ddim", "pndm", "lms", "euler"):
        plan = schedulers.make_plan(name, 6)
        lat = jnp.asarray(eps) * plan.init_noise_sigma
        carry = plan.init_carry(lat.shape)
        for i in range(plan.num_calls):
            lat, carry = plan.step(jnp.asarray(eps), i,
                                   jnp.asarray(lat, jnp.float32), carry)
        out[f"sched_{name}"] = np.asarray(lat)
    return out


def test_goldens_frozen():
    if not os.path.exists(GOLDEN_PATH):
        np.savez_compressed(GOLDEN_PATH, **_compute_goldens())
        print("goldens regenerated; commit tests/goldens.npz")
        return
    golden = np.load(GOLDEN_PATH)
    current = _compute_goldens()
    assert set(golden.files) == set(current)
    for key in golden.files:
        np.testing.assert_allclose(
            current[key], golden[key], rtol=5e-5, atol=5e-5,
            err_msg=f"numerics drift in {key} — if intentional, delete "
                    f"tests/goldens.npz and rerun to regenerate")


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        if os.path.exists(GOLDEN_PATH):
            os.remove(GOLDEN_PATH)
        np.savez_compressed(GOLDEN_PATH, **_compute_goldens())
        print("regenerated", GOLDEN_PATH)

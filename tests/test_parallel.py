"""Data-parallel generation and sharding tests on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from tests.snapshot import make_sd_snapshot
from uce_tpu.diffusion.pipeline import SDPipeline
from uce_tpu.parallel import mesh as mesh_mod


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    import jax.numpy as jnp

    snap = make_sd_snapshot(tmp_path_factory.mktemp("snap"))
    return SDPipeline.from_pretrained(str(snap), dtype=jnp.float32)


def test_multi_seed_batch_matches_individual(pipe):
    batched = pipe(["cat", "dog"], num_inference_steps=2, seed=[3, 4],
                   height=32, width=32)
    solo_cat = pipe("cat", num_inference_steps=2, seed=3, height=32, width=32)
    solo_dog = pipe("dog", num_inference_steps=2, seed=4, height=32, width=32)
    np.testing.assert_array_equal(batched[0], solo_cat[0])
    np.testing.assert_array_equal(batched[1], solo_dog[0])


def test_data_parallel_generation_matches_single(pipe):
    base = pipe(["a", "b", "c", "d"], num_inference_steps=2,
                seed=[1, 2, 3, 4], height=32, width=32)
    pipe.mesh = mesh_mod.make_mesh(n_data=8, n_model=1)
    try:
        sharded = pipe(["a", "b", "c", "d"], num_inference_steps=2,
                       seed=[1, 2, 3, 4], height=32, width=32)
    finally:
        pipe.mesh = None
    np.testing.assert_array_equal(base, sharded)


def test_tensor_parallel_unet_matches_replicated():
    import jax.numpy as jnp

    from uce_tpu.models import unet as unet_mod

    cfg = unet_mod.UNetConfig(
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=32,
        attention_head_dim=2, norm_num_groups=4)
    params = unet_mod.init_params(cfg, 0)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16, 16, 4)),
                    jnp.float32)
    ctx = jnp.zeros((4, 8, 32), jnp.float32)
    ref = np.asarray(unet_mod.apply(params, x, jnp.asarray([5.0]), ctx, cfg))

    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
    sharded_params = mesh_mod.shard_unet_params(params, mesh)
    xs = mesh_mod.shard_batch(x, mesh)
    cs = mesh_mod.shard_batch(ctx, mesh)
    with mesh:
        out = jax.jit(lambda p, x, c: unet_mod.apply(
            p, x, jnp.asarray([5.0]), c, cfg))(sharded_params, xs, cs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_mesh_shapes():
    m = mesh_mod.make_mesh(4, 2)
    assert dict(m.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(3, 2)

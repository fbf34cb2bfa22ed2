"""Multi-device (8 virtual CPU chips) sharded evaluation + training tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig
from diffusion_models_dev_project_tpu.ops.sde import VESDE
from diffusion_models_dev_project_tpu.parallel.mesh import make_mesh
from diffusion_models_dev_project_tpu.physics.ray_trafo import make_parallel_beam_trafo
from diffusion_models_dev_project_tpu.physics.simulation import simulate
from diffusion_models_dev_project_tpu.sampling.engine import get_standard_sampler

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 (virtual) devices")


def _setup(batch):
    cfg = UNetConfig(image_size=16, in_channels=1, out_channels=1,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=4, num_head_channels=8,
                     use_scale_shift_norm=True, resblock_updown=True)
    model = UNetModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)),
                        jnp.zeros((1,)))
    rng = np.random.default_rng(3)
    params = jax.tree_util.tree_map(
        lambda v: (jnp.asarray(rng.normal(0, 0.02, v.shape).astype(np.float32))
                   if not np.asarray(v).any() else v), params)
    trafo = make_parallel_beam_trafo((16, 16), 8, impl="matrix")
    gts = np.zeros((batch, 16, 16, 1), np.float32)
    for i in range(batch):
        gts[i, 3 + i % 4:10, 4:12, 0] = 1.0
    obs = simulate(jax.random.PRNGKey(1), jnp.asarray(gts), trafo, 0.01)
    sde = VESDE(sigma_min=0.01, sigma_max=5.0)
    score_apply = lambda p, x, t: model.apply(p, x, t)
    return params, trafo, obs, sde, score_apply


def test_sharded_batch_sampling_matches_unsharded():
    """8 images sharded over an 8-device mesh == same batch on one device."""
    params, trafo, obs, sde, score_apply = _setup(8)

    def build():
        return get_standard_sampler(
            "dds", None, sde, trafo, obs, num_steps=4, batch_size=8,
            im_shape=(16, 16, 1), gamma=0.1, cg_iter=2,
            score_apply=score_apply, score_params=params)

    x_ref, _ = build().sample(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    sampler = build()
    x_sh, _ = sampler.sample(jax.random.PRNGKey(0), mesh=mesh)
    assert x_sh.shape == (8, 16, 16, 1)
    # distinct observations -> distinct reconstructions
    assert np.abs(np.asarray(x_sh[0]) - np.asarray(x_sh[1])).max() > 1e-6
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-5)


def test_sharded_sampling_is_actually_sharded():
    params, trafo, obs, sde, score_apply = _setup(8)
    mesh = make_mesh(8)
    sampler = get_standard_sampler(
        "dds", None, sde, trafo, obs, num_steps=2, batch_size=8,
        im_shape=(16, 16, 1), score_apply=score_apply, score_params=params)
    x, _ = sampler.sample(jax.random.PRNGKey(0), mesh=mesh)
    # observation was resharded over the data axis
    shard_shapes = {s.data.shape for s in sampler.observation.addressable_shards}
    assert shard_shapes == {(1, *sampler.observation.shape[1:])}


def test_data_parallel_training_step_runs_on_mesh():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_adapted_sample_batched_sharded_over_mesh():
    """8 images adapted-and-sampled in one vmapped program, image axis
    sharded over the 8-device mesh, equal to the unsharded run."""
    from diffusion_models_dev_project_tpu.sampling.adaptation import (
        get_standard_adapted_sampler)

    cfg = UNetConfig(image_size=16, in_channels=1, out_channels=1,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2,), channel_mult=(1, 2),
                     num_heads=4, num_head_channels=8,
                     use_scale_shift_norm=True, resblock_updown=True,
                     lora_rank=4)
    model = UNetModel(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lora": jax.random.PRNGKey(1)},
                           jnp.zeros((1, 16, 16, 1)), jnp.zeros((1,)))
    rng = np.random.default_rng(3)
    params = jax.tree_util.tree_map(
        lambda v: (jnp.asarray(rng.normal(0, 0.02, v.shape).astype(np.float32))
                   if not np.asarray(v).any() else v), variables["params"])
    trafo = make_parallel_beam_trafo((16, 16), 8, impl="matrix")
    gts = np.zeros((8, 1, 16, 16, 1), np.float32)
    for i in range(8):
        gts[i, 0, 3 + i % 4:10, 4:12, 0] = 1.0
    obs = jnp.stack([simulate(jax.random.fold_in(jax.random.PRNGKey(1), i),
                              jnp.asarray(g), trafo, 0.01) for i, g in enumerate(gts)])
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(5), i)
                      for i in range(8)])

    def build():
        return get_standard_adapted_sampler(
            "dds", model, params, sde_ve(), trafo, obs[0], num_steps=2,
            im_shape=(16, 16, 1), num_optim_step=2, adapt_freq=1, lr=1e-2,
            dc_type="cg", cg_iter=2, add_cg=True)

    x_ref = build().sample_batched(keys, obs)
    sampler = build()
    x_sh = sampler.sample_batched(keys, obs, mesh=make_mesh(8))
    assert x_sh.shape == (8, 1, 16, 16, 1)
    assert np.abs(np.asarray(x_sh[0]) - np.asarray(x_sh[1])).max() > 1e-6
    # shard_map local-vmap (1 image/device) vs global vmap (batch 8): conv
    # tiling noise amplified by the inner Adam loop — not bitwise
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref),
                               rtol=1e-3, atol=1e-5)


def sde_ve():
    return VESDE(sigma_min=0.01, sigma_max=5.0)

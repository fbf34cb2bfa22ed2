"""Headline benchmark: DDS reverse-diffusion steps/sec/chip at 256².

Runs the flagship workload — conditional DDS sampling (UNet forward +
Tweedie + 5-iter CG data consistency + DDIM per step, reference
`src/samplers/utils.py:159-218`) on the disk_ellipses 256² geometry
(60-angle parallel beam) — as ONE jitted `lax.scan` on the available chip,
and prints a single JSON line.

The reference publishes no throughput numbers (BASELINE.md); the baseline is
the north-star target derived from BASELINE.json: 1000-step 256²
reconstruction in <10 s/image on v5e-8 ⇒ 12.5 steps/sec/chip.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEPS_PER_SEC_PER_CHIP = 12.5
NUM_STEPS = 100          # timed scan length (throughput extrapolates to 1000)


def main():
    from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig
    from diffusion_models_dev_project_tpu.ops.sde import VESDE
    from diffusion_models_dev_project_tpu.physics.ray_trafo import make_parallel_beam_trafo
    from diffusion_models_dev_project_tpu.sampling.engine import get_standard_sampler
    from __graft_entry__ import _zeros_params

    cfg = UNetConfig(image_size=256, model_channels=256,
                     channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=1,
                     attention_resolutions=(16,), num_heads=4,
                     num_head_channels=64, use_scale_shift_norm=True,
                     resblock_updown=True, dtype="bfloat16")
    model = UNetModel(cfg)
    variables = _zeros_params(model, cfg)

    def score_fn(x, t):
        return model.apply(variables, x, t)

    sde = VESDE(sigma_min=0.01, sigma_max=100.0)
    trafo = make_parallel_beam_trafo((256, 256), 60)

    # synthetic measurement from a smooth phantom
    yy, xx = np.meshgrid(np.linspace(-1, 1, 256), np.linspace(-1, 1, 256),
                         indexing="ij")
    gt = np.exp(-((xx ** 2 + yy ** 2) / 0.2)).astype(np.float32)[None, :, :, None]
    observation = trafo.apply(jnp.asarray(gt))

    sampler = get_standard_sampler(
        "dds", score_fn, sde, trafo, observation, num_steps=NUM_STEPS,
        im_shape=(256, 256, 1), gamma=0.01, eta=0.15, cg_iter=5)

    key = jax.random.PRNGKey(0)
    x, _ = sampler.sample(key)             # compile + warmup
    float(jnp.sum(x))                      # value fetch: block_until_ready is
                                           # unreliable through the TPU relay

    t0 = time.perf_counter()
    x, _ = sampler.sample(jax.random.PRNGKey(1))
    float(jnp.sum(x))
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    steps_per_sec_per_chip = NUM_STEPS / dt / n_chips
    print(json.dumps({
        "metric": "dds_reverse_diffusion_steps_per_sec_per_chip_256",
        "value": round(steps_per_sec_per_chip, 3),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec_per_chip / BASELINE_STEPS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()

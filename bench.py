"""Headline benchmark: DDS reverse-diffusion steps/sec/chip at 256².

Runs the flagship workload — conditional DDS sampling (UNet forward +
Tweedie + 5-iter CG data consistency + DDIM per step, reference
`src/samplers/utils.py:159-218`) on the disk_ellipses 256² geometry
(60-angle parallel beam) — as ONE jitted `lax.scan` on the available chip,
and prints a single JSON line.

Weights are random-normal by default (NOT zeros — MXU timing is
data-independent but this removes any zero-operand suspicion); pass
`--ckpt <orbax dir>` to bench with trained weights (channel width is read
from the checkpoint).  The JSON line carries an MFU companion number
computed from XLA's own cost analysis of the compiled scan.

The reference publishes no throughput numbers (BASELINE.md); the baseline is
the north-star target derived from BASELINE.json: 1000-step 256²
reconstruction in <10 s/image on v5e-8 ⇒ 12.5 steps/sec/chip.
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STEPS_PER_SEC_PER_CHIP = 12.5
NUM_STEPS = 100          # timed scan length (throughput extrapolates to 1000)
PEAK_BF16_FLOPS_V5E = 197e12   # per-chip peak (TPU v5e: 197 TFLOP/s bf16)


def _random_params(model, cfg, seed=0):
    """Structurally-correct random params without per-shape RNG compiles."""
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
    t = jnp.zeros((1,))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)["params"]
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.normal(0.0, 0.02, s.shape).astype(s.dtype)),
        shapes)


def _load_ckpt(path):
    """(params, model_channels) from an orbax TrainState dir (EMA shadow)."""
    from diffusion_models_dev_project_tpu.utils.checkpoint import Checkpointer

    state = Checkpointer(path).restore()
    params = state["ema"]["shadow"] if "ema" in state else state["params"]
    # orbax restores host numpy — commit to device ONCE, or every timed
    # call re-uploads the full tree through the TPU relay
    params = jax.tree_util.tree_map(jnp.asarray, params)
    stem = params["in_0_0"]["kernel"]          # (3, 3, in, model_channels)
    return params, int(np.asarray(stem).shape[-1])


def main():
    from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig
    from diffusion_models_dev_project_tpu.ops.sde import VESDE
    from diffusion_models_dev_project_tpu.physics.ray_trafo import make_parallel_beam_trafo
    from diffusion_models_dev_project_tpu.sampling.engine import get_standard_sampler

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None,
                   help="orbax TrainState dir; bench with trained EMA weights")
    p.add_argument("--cg_precision", default="high",
                   choices=["default", "high", "highest"],
                   help="matmul precision of the CG data-consistency applies")
    p.add_argument("--params_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="UNet weight STORAGE dtype: bfloat16 halves the "
                   "per-forward HBM weight traffic (compute is bf16 either "
                   "way, so only the fp32-kept norm params see rounding).  "
                   "Default since r4: the measured-fastest config "
                   "(BENCH.md round 4)")
    p.add_argument("--small_conv_matmul", default=1024, type=int,
                   help="H*W threshold below which 3x3 convs run as im2col "
                   "matmuls (see UNetConfig.small_conv_matmul); 0 = off")
    p.add_argument("--pallas_conv_min", default=0, type=int,
                   help="H*W threshold at/above which 3x3 convs run as the "
                   "Pallas 9-shifted-matmul kernel (ops/conv3x3.py); 0 = off")
    p.add_argument("--batch", default=1, type=int,
                   help="reconstruction chains per scan (the CLI's "
                   "--shard_images batching on one chip).  The headline "
                   "metric stays PER-CHAIN steps/s; batch>1 additionally "
                   "reports aggregate chain-steps/s (production serving "
                   "throughput: batching amortizes the low-resolution UNet "
                   "levels across images)")
    args = p.parse_args()

    trained_params = None
    model_channels = 256
    if args.ckpt:
        trained_params, model_channels = _load_ckpt(args.ckpt)

    cfg = UNetConfig(image_size=256, model_channels=model_channels,
                     channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=1,
                     attention_resolutions=(16,), num_heads=4,
                     num_head_channels=64, use_scale_shift_norm=True,
                     resblock_updown=True, dtype="bfloat16",
                     small_conv_matmul=args.small_conv_matmul,
                     pallas_conv_min=args.pallas_conv_min)
    model = UNetModel(cfg)
    params = (trained_params if trained_params is not None
              else _random_params(model, cfg))
    if args.params_dtype == "bfloat16":
        # one jitted program — an eager tree_map costs ~0.5 s/leaf on the relay;
        # donate the fp32 tree so both trees never coexist in HBM (~2.2 GB
        # transient for the 374M model otherwise)
        params = jax.jit(lambda p: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            p), donate_argnums=0)(params)

    sde = VESDE(sigma_min=0.01, sigma_max=100.0)
    trafo = make_parallel_beam_trafo((256, 256), 60)

    # synthetic measurement from a smooth phantom
    yy, xx = np.meshgrid(np.linspace(-1, 1, 256), np.linspace(-1, 1, 256),
                         indexing="ij")
    gt = np.exp(-((xx ** 2 + yy ** 2) / 0.2)).astype(np.float32)[None, :, :, None]
    gt = np.repeat(gt, args.batch, axis=0)
    observation = trafo.apply(jnp.asarray(gt))

    sampler = get_standard_sampler(
        "dds", None, sde, trafo, observation, num_steps=NUM_STEPS,
        im_shape=(256, 256, 1), batch_size=args.batch,
        gamma=0.01, eta=0.15, cg_iter=5,
        score_apply=lambda pp, x, t: model.apply({"params": pp}, x, t),
        score_params=params, cg_precision=args.cg_precision)

    # AOT-compile ONCE; the executable serves warmup, timing, and the MFU
    # cost analysis (a second trace+compile of the 100-step scan costs
    # minutes over the TPU relay).
    key = jax.random.PRNGKey(0)
    jitfn = sampler.ensure_compiled()
    compiled = jitfn.lower(
        key, sampler.score_params, sampler.ray_trafo, sampler.rhs,
        sampler.observation, sampler.filtbackproj, sampler.dc_sinv).compile()
    sampler._compiled = compiled           # sample() reuses the executable

    x, _ = sampler.sample(key)             # warmup
    float(jnp.sum(x))                      # value fetch: block_until_ready is
                                           # unreliable through the TPU relay

    t0 = time.perf_counter()
    x, _ = sampler.sample(jax.random.PRNGKey(1))
    float(jnp.sum(x))
    dt = time.perf_counter() - t0

    # MFU from the analytic matmul/conv FLOP count of the whole scan
    # (XLA:TPU cost_analysis under-reports conv FLOPs ~50x on this backend)
    mfu_pct = gflops_per_step = None
    try:
        from diffusion_models_dev_project_tpu.utils.flops import jaxpr_flops

        flops = jaxpr_flops(jax.make_jaxpr(jitfn)(
            key, sampler.score_params, sampler.ray_trafo, sampler.rhs,
            sampler.observation, sampler.filtbackproj, sampler.dc_sinv))
        # the unsharded sampler executes on ONE chip; per-chip MFU uses the
        # same denominator convention as steps_per_sec_per_chip below
        mfu_pct = round(100.0 * flops / dt
                        / (PEAK_BF16_FLOPS_V5E * jax.device_count()), 2)
        gflops_per_step = round(flops / NUM_STEPS / 1e9, 1)
    except Exception:
        pass

    n_chips = jax.device_count()
    steps_per_sec_per_chip = NUM_STEPS / dt / n_chips
    extra = {}
    if args.batch > 1:
        extra["batch"] = args.batch
        extra["aggregate_chain_steps_per_sec_per_chip"] = round(
            args.batch * steps_per_sec_per_chip, 3)
    print(json.dumps({
        "metric": "dds_reverse_diffusion_steps_per_sec_per_chip_256",
        "value": round(steps_per_sec_per_chip, 3),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec_per_chip / BASELINE_STEPS_PER_SEC_PER_CHIP, 3),
        "mfu_pct": mfu_pct,
        "gflops_per_step": gflops_per_step,
        "weights": "trained" if trained_params is not None else "random",
        "model_channels": model_channels,
        "params_dtype": args.params_dtype,
        "small_conv_matmul": args.small_conv_matmul,
        "pallas_conv_min": args.pallas_conv_min,
        **extra,
    }))


if __name__ == "__main__":
    main()

"""Cheap prior-health probe: Tweedie denoising RMSE across noise scales.

For a VESDE prior, take a validation image, form x = gt + sigma*z, and
measure RMSE(xhat0, gt) with xhat0 = x + sigma^2 * score(x, t(sigma)).
A healthy prior has RMSE << sigma at every scale; the round-2 diagnosis
(BENCH.md) showed the top sigma-decade 20x off, which is what makes the
near-deterministic eta=0.15 DDIM protocol collapse.

Usage: PYTHONPATH=. python scripts/probe_tweedie.py --ckpt <orbax dir|.npz>
           [--sigmas 100,50,20,5,1] [--num_channels 128]
"""
import argparse

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt", required=True)
parser.add_argument("--sde", default="vesde", choices=["vesde"])
parser.add_argument("--sigmas", default="100,70,50,30,20,10,5,1")
parser.add_argument("--num_channels", default=128, type=int)
parser.add_argument("--dtype", default="bfloat16")
parser.add_argument("--image", default=0, type=int)
parser.add_argument("--seed", default=7, type=int)
parser.add_argument("--raw", action="store_true",
                    help="probe the raw training params instead of the EMA")


def main():
    args = parser.parse_args()
    import jax
    import jax.numpy as jnp

    import diffusion_models_dev_project_tpu.factory as F
    from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import get_config
    from diffusion_models_dev_project_tpu.ops.diffusion import tweedy

    config = get_config(args.sde)
    config.model.num_channels = args.num_channels
    config.model.dtype = args.dtype
    config.data.part = "val"
    config.ckpt_path = args.ckpt

    sde = F.get_standard_sde(config)
    model, params, _ = F.get_standard_score(config, sde,
                                            use_ema=not args.raw,
                                            load_model=True)
    gt = None
    for i, img in enumerate(F.get_standard_dataset(config)):
        if i == args.image:
            gt = jnp.asarray(img)[None]
            break

    @jax.jit
    def probe(params, t, x):
        s = model.apply({"params": params}, x, t)
        xhat0 = tweedy(s, x, sde, t)
        return jnp.sqrt(jnp.mean((xhat0 - gt) ** 2))

    key = jax.random.PRNGKey(args.seed)
    smin, smax = config.sde.sigma_min, config.sde.sigma_max
    print(f"ckpt={args.ckpt} ({'raw' if args.raw else 'ema'})")
    for sig in [float(v) for v in args.sigmas.split(",")]:
        t = jnp.full((1,), np.log(sig / smin) / np.log(smax / smin))
        z = jax.random.normal(jax.random.fold_in(key, int(sig * 10)), gt.shape)
        rmse = float(probe(params, t, gt + sig * z))
        print(f"  sigma {sig:7.1f}: xhat0 RMSE {rmse:9.4f}", flush=True)


if __name__ == "__main__":
    main()

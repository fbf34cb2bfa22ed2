"""Standalone keep-best probe scorer: replicate the trainer's 200-step
eta=0.15 DDS mini-reconstruction (run_score_based_models_train.py
--keep_best_probe dds) on an arbitrary checkpoint.

Purpose: calibrate the probe scale against full-protocol numbers — e.g.
score the SHIPPED checkpoint (known 32.14 dB at the 1000-step protocol,
BENCH.md r3) so the r4 run's probe trajectory can be read in protocol
units.  Must match the trainer's probe exactly: same val images (first 2),
same measurement key (seed+7), same chain key (seed+13), same sampler
settings, bf16 weights.

Usage: PYTHONPATH=. python scripts/probe_score.py --ckpt <msgpack/orbax>
           [--sde vesde] [--num_channels 128] [--num_steps 200]
"""
import argparse

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt", required=True,
                    help="checkpoint path, or comma-separated list — all "
                    "scored by ONE compiled sampler (params re-upload only)")
parser.add_argument("--sde", default="vesde", choices=["vesde", "vpsde", "ddpm"])
parser.add_argument("--num_channels", default=128, type=int)
parser.add_argument("--num_steps", default=200, type=int)
parser.add_argument("--platform", default=None, choices=[None, "cpu"])
parser.add_argument("--pallas_conv_min", default=0, type=int,
                    help="dispatch 3x3 convs with H*W >= this to the Pallas "
                    "9-shift kernel (ops/conv3x3.py); 0 = XLA conv")
args = parser.parse_args()

import jax  # noqa: E402

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import diffusion_models_dev_project_tpu.factory as F  # noqa: E402
from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import (  # noqa: E402
    get_config)
from diffusion_models_dev_project_tpu.sampling.engine import (  # noqa: E402
    get_standard_sampler)
from diffusion_models_dev_project_tpu.utils.metrics import PSNR  # noqa: E402


def main():
    ckpts = args.ckpt.split(",")
    config = get_config(args.sde)
    config.model.num_channels = args.num_channels
    config.model.dtype = "bfloat16"
    config.model.pallas_conv_min = int(args.pallas_conv_min)
    config.ckpt_path = ckpts[0]
    sde = F.get_standard_sde(config)
    model, params, _ = F.get_standard_score(config, sde, use_ema=True,
                                            load_model=True)
    cast = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), p))       # trainer probes at bf16
    params = cast(params)

    val_cfg = get_config(args.sde)
    val_cfg.data.part = "val"
    imgs = []
    for img in F.get_standard_dataset(val_cfg):
        imgs.append(np.asarray(img))
        if len(imgs) >= 2:
            break
    gt = jnp.asarray(np.stack(imgs))
    ray_trafo = F.get_standard_ray_trafo(val_cfg)
    _, obs, fbp = F.get_data_from_ground_truth(
        gt, ray_trafo, float(val_cfg.data.stddev),
        jax.random.PRNGKey(config.seed + 7))
    sampler = get_standard_sampler(
        "dds", None, sde, ray_trafo, obs, num_steps=args.num_steps,
        batch_size=gt.shape[0], eta=0.15, gamma=0.01, cg_iter=5,
        filtbackproj=fbp,
        score_apply=lambda p, x, t: model.apply({"params": p}, x, t),
        score_params=params)
    gt_np = np.asarray(gt)
    for j, ck in enumerate(ckpts):
        if j > 0:                       # same pytree shape: params swap only
            sampler.score_params = cast(F._load_params(ck, model.cfg,
                                                       use_ema=True))
        x, _ = sampler.sample(jax.random.PRNGKey(config.seed + 13))
        x = np.asarray(x)
        vals = [PSNR(x[i, ..., 0], gt_np[i, ..., 0])
                for i in range(x.shape[0])]
        print(f"probe({ck}, {args.num_steps} steps): "
              f"mean {np.mean(vals):.3f} dB  per-image "
              f"{[f'{v:.2f}' for v in vals]}", flush=True)


if __name__ == "__main__":
    main()

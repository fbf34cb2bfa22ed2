"""512² end-to-end DDS reconstruction with the Pallas flash-attention live.

VERDICT r3 item 8: demonstrate the 512² path as a full reconstruction, not
just a forward timing.  No 512² prior has been trained (the reference's own
512 config also arrives without weights, exp_utils.py:40-96), so this runs
the untrained-prior + strong data-consistency regime (gamma=10, cg_iter=10:
CG dominates and recovers the image; the score term only regularizes) — the
512² UNet forward with `attention_impl` (auto => flash at 32²=1024 tokens on
TPU) runs inside every step, exercising kernel + sampler at scale.

  PYTHONPATH=. python scripts/smoke_512.py [--num_steps 100]
"""
import argparse
import os
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--num_steps", default=100, type=int)
parser.add_argument("--attention_impl", default="auto",
                    choices=["auto", "flash", "einsum"])
parser.add_argument("--gamma", default=10.0, type=float)
parser.add_argument("--cg_iter", default=10, type=int)
parser.add_argument("--workdir", default="outputs/smoke_512")
args = parser.parse_args()

import jax
import jax.numpy as jnp

import diffusion_models_dev_project_tpu.factory as F
from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import (
    get_config)
from diffusion_models_dev_project_tpu.data.ellipses import (
    get_disk_dist_ellipses_dataset)
from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM


def main():
    os.makedirs(args.workdir, exist_ok=True)
    config = get_config("vesde")
    config.data.im_size = 512
    config.model.image_size = 512          # channel_mult (0.5,1,1,2,2,4,4)
    config.model.num_channels = 128
    config.model.attention_impl = args.attention_impl
    sde = F.get_standard_sde(config)
    model, params, _ = F.get_standard_score(config, sde, load_model=False)
    print(f"model attention_impl={model.cfg.attention_impl} "
          f"(auto => flash at >=1024 tokens on TPU)", flush=True)
    trafo = F.get_standard_ray_trafo(config)

    gt = jnp.asarray(next(iter(get_disk_dist_ellipses_dataset(
        fold="test", im_size=512, length=1, diameter=0.4745,
        max_n_ellipse=140))))[None]
    gt, obs, fbp = F.get_data_from_ground_truth(gt, trafo, 0.01,
                                                jax.random.PRNGKey(0))
    gt_np = np.asarray(gt[0, ..., 0])
    p_fbp = PSNR(np.asarray(fbp[0, ..., 0]), gt_np)
    print(f"FBP 512²: {p_fbp:.2f} dB", flush=True)

    sampler = F.get_standard_sampler(
        "dds", None, sde, trafo, obs, num_steps=args.num_steps,
        im_shape=(512, 512, 1), gamma=args.gamma, eta=0.85,
        cg_iter=args.cg_iter,
        score_apply=lambda p, x, t: model.apply({"params": p}, x, t),
        score_params=params)
    t0 = time.time()
    x, _ = sampler.sample(jax.random.PRNGKey(1))
    x = np.clip(np.asarray(x[0, ..., 0]), 0, 1)
    dt = time.time() - t0
    p, s = PSNR(x, gt_np), SSIM(x, gt_np)
    print(f"[512² dds untrained-prior gamma={args.gamma}] {p:.2f} dB / "
          f"{s:.4f} SSIM in {dt:.1f}s incl compile "
          f"({args.num_steps} steps)", flush=True)
    np.savez(os.path.join(args.workdir, "recon_512.npz"), recon=x, gt=gt_np,
             psnr=p, ssim=s, fbp_psnr=p_fbp, num_steps=args.num_steps)


if __name__ == "__main__":
    main()

"""Flagship-resolution evaluation: DDS on the reference's shipped 256² val
set (dataset/disk_ellipses_val_256.pt, converted to data_assets/) with a
256²-trained prior — the canonical disk_ellipses protocol of
`run_conditional_sampling.py` (60 angles, rel. noise 0.01).

Usage: PYTHONPATH=. python scripts/eval_flagship_256.py <ckpt_dir>
           [num_steps] [num_images] [num_channels]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import diffusion_models_dev_project_tpu.factory as F
from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import get_config
from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM

CKPT = sys.argv[1]
NUM_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
NUM_IMAGES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
CHANNELS = int(sys.argv[4]) if len(sys.argv) > 4 else 128
ETA = float(sys.argv[6]) if len(sys.argv) > 6 else 0.15


def main():
    config = get_config("vesde")
    config.model.num_channels = CHANNELS
    config.model.dtype = sys.argv[5] if len(sys.argv) > 5 else "bfloat16"
    config.data.part = "val"                    # the shipped set
    config.ckpt_path = CKPT

    sde = F.get_standard_sde(config)
    model, params, _ = F.get_standard_score(config, sde, use_ema=True,
                                            load_model=True)
    trafo = F.get_standard_ray_trafo(config)
    dataset = F.get_standard_dataset(config)

    sampler = None
    psnrs, ssims, fbps = [], [], []
    for i, gt in enumerate(dataset):
        if i >= NUM_IMAGES:
            break
        gt = jnp.asarray(gt)[None]
        key = jax.random.fold_in(jax.random.PRNGKey(config.seed), i)
        gt, obs, fbp = F.get_data_from_ground_truth(gt, trafo,
                                                    config.data.stddev, key)
        if sampler is None:
            sampler = F.get_standard_sampler(
                "dds", None, sde, trafo, obs, num_steps=NUM_STEPS,
                im_shape=(256, 256, 1), gamma=0.01, eta=ETA, cg_iter=5,
                score_apply=lambda p, x, t: model.apply({"params": p}, x, t),
                score_params=params)
        else:
            sampler.observation = obs
            sampler.rhs = trafo.adjoint(obs)
        t0 = time.time()
        x, _ = sampler.sample(jax.random.fold_in(key, 1))
        x = np.clip(np.asarray(x[0, ..., 0]), 0, 1)
        g = np.asarray(gt[0, ..., 0])
        dt = time.time() - t0
        p, s = PSNR(x, g), SSIM(x, g)
        fp = PSNR(np.asarray(fbp[0, ..., 0]), g)
        print(f"image {i}: DDS {p:6.2f} dB / {s:.4f} SSIM | FBP {fp:6.2f} dB"
              f" | {dt:.1f}s")
        psnrs.append(p); ssims.append(s); fbps.append(fp)
    print(f"MEAN over {len(psnrs)}: DDS {np.mean(psnrs):.2f} dB / "
          f"{np.mean(ssims):.4f} SSIM | FBP {np.mean(fbps):.2f} dB")


if __name__ == "__main__":
    main()

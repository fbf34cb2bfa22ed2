"""Steerable-adaptation demonstration: out-of-distribution CT reconstruction.

The paper's core claim (arXiv 2308.14409): a diffusion prior trained on one
distribution (disk ellipses) reconstructs OOD objects poorly; optimizing a
LoRA adapter against the measurement *during* sampling recovers them.

Loads the EMA weights trained by the accompanying training script, builds an
OOD phantom (rectangular bars — nothing like ellipses), and compares plain
DDS with adapted DDS at matched compute.

Usage: PYTHONPATH=. python scripts/demo_adapted_ood.py [ckpt_dir] [im_size]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

import diffusion_models_dev_project_tpu.factory as F
from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import get_config
from diffusion_models_dev_project_tpu.data.ellipses import get_disk_dist_ellipses_dataset
from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM

CKPT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/outputs/ellipses64_ckpt_big"
IM = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def ood_phantom(im: int) -> np.ndarray:
    """Rectangular bars + frame: far from the ellipse training manifold."""
    x = np.zeros((im, im), np.float32)
    q = im // 8
    for i in range(1, 4):
        x[2 * i * q - q // 2:2 * i * q + q // 2, q:im - q] = 0.4 + 0.2 * i
    x[q:im - q, q:q + 2] = 1.0
    x[q:im - q, im - q - 2:im - q] = 1.0
    return x


def main():
    config = get_config("vesde")
    config.data.im_size = IM
    config.model.image_size = IM
    config.model.num_channels = 128
    config.sde.sigma_max = 20.0
    config.ckpt_path = CKPT

    sde = F.get_standard_sde(config)
    lora_kw = dict(lora_rank=4)
    model, params, _ = F.get_standard_score(config, sde, use_ema=True,
                                            load_model=True, **lora_kw)
    import dataclasses

    plain_model = type(model)(dataclasses.replace(model.cfg, lora_rank=0))
    trafo = F.get_standard_ray_trafo(config)

    cases = {"in-dist ellipse": np.asarray(next(iter(
                 get_disk_dist_ellipses_dataset(fold="test", im_size=IM,
                                                length=1, diameter=0.4745,
                                                max_n_ellipse=140)))),
             "OOD bars": ood_phantom(IM)[..., None]}

    for name, gt in cases.items():
        gt = jnp.asarray(gt)[None]
        key = jax.random.PRNGKey(11)
        gt, obs, fbp = F.get_data_from_ground_truth(gt, trafo, 0.01, key)
        g = np.asarray(gt[0, ..., 0])

        dds = F.get_standard_sampler(
            "dds", None, sde, trafo, obs, num_steps=200, im_shape=(IM, IM, 1),
            gamma=0.01, eta=0.15, cg_iter=5,
            score_apply=lambda p, x, t: plain_model.apply({"params": p}, x, t),
            score_params=params)
        x_dds, _ = dds.sample(jax.random.PRNGKey(1))
        x_dds = np.clip(np.asarray(x_dds[0, ..., 0]), 0, 1)

        adapted = F.get_standard_adapted_sampler(
            "dds", model, params, sde, trafo, obs, num_steps=50,
            im_shape=(IM, IM, 1), num_optim_step=10, adapt_freq=1, lr=1e-3,
            tv_penalty=1e-6, eta=0.85, gamma=0.01, dc_type="cg", cg_iter=1,
            add_cg=True)
        x_ad, _ = adapted.sample(jax.random.PRNGKey(1))
        x_ad = np.clip(np.asarray(x_ad[0, ..., 0]), 0, 1)

        print(f"[{name}] FBP {PSNR(np.asarray(fbp[0, ..., 0]), g):6.2f} | "
              f"DDS {PSNR(x_dds, g):6.2f} (SSIM {SSIM(x_dds, g):.3f}) | "
              f"adapted {PSNR(x_ad, g):6.2f} (SSIM {SSIM(x_ad, g):.3f})")


if __name__ == "__main__":
    main()

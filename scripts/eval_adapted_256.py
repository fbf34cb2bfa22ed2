"""Adapted (steerable) sampling at the flagship 256² protocol (VERDICT r2
item 4): in-distribution (the reference's shipped val set) + OOD (bar
phantoms, far off the ellipse manifold) with the trained 256² prior.

Reference adapted defaults (`run_adapted_sampling.py:20-33`): 50 outer
steps x 10 inner Adam steps, LoRA rank 4, lr 1e-3, tv 1e-6, eta 0.85,
dc cg(1), add_cg.  Plain DDS runs the 1000-step conditional protocol for
comparison; FBP is the classical baseline.

Usage: PYTHONPATH=. python scripts/eval_adapted_256.py --ckpt <orbax|npz>
           [--num_in_dist 3] [--num_ood 3] [--dds_eta 0.85]
"""
import argparse
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt", required=True)
parser.add_argument("--num_channels", default=128, type=int)
parser.add_argument("--num_in_dist", default=3, type=int)
parser.add_argument("--num_ood", default=3, type=int)
parser.add_argument("--adaptation", default="lora",
                    choices=["lora", "full", "decoder"])
parser.add_argument("--num_steps", default=50, type=int)
parser.add_argument("--num_optim_step", default=10, type=int)
parser.add_argument("--lora_rank", default=4, type=int)
parser.add_argument("--lr", default=1e-3, type=float)
parser.add_argument("--tv_penalty", default=1e-6, type=float)
parser.add_argument("--eta", default=0.85, type=float)
parser.add_argument("--dds_steps", default=1000, type=int)
parser.add_argument("--dds_eta", default=0.85, type=float)
parser.add_argument("--save_npz", default=None)
parser.add_argument("--dtype", default="bfloat16")
parser.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force the CPU backend (glue dry-runs)")
args = parser.parse_args()

import jax

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import diffusion_models_dev_project_tpu.factory as F
from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import get_config
from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM


def ood_bars(im: int) -> np.ndarray:
    """Rectangular bars + frame (demo_adapted_ood.ood_phantom at 256²)."""
    x = np.zeros((im, im), np.float32)
    q = im // 8
    for i in range(1, 4):
        x[2 * i * q - q // 2:2 * i * q + q // 2, q:im - q] = 0.4 + 0.2 * i
    x[q:im - q, q:q + im // 32] = 1.0
    x[q:im - q, im - q - im // 32:im - q] = 1.0
    return x


def ood_grid(im: int, seed: int) -> np.ndarray:
    """Checkerboard-ish block phantom, value pattern seeded per image."""
    rng = np.random.default_rng(seed)
    x = np.zeros((im, im), np.float32)
    n = 6
    cell = im // (n + 2)
    for i in range(n):
        for j in range(n):
            if rng.random() < 0.55:
                r0 = cell + i * cell
                c0 = cell + j * cell
                x[r0 + 2:r0 + cell - 2, c0 + 2:c0 + cell - 2] = rng.uniform(0.3, 1.0)
    return x


def main():
    config = get_config("vesde")
    config.model.num_channels = args.num_channels
    config.model.dtype = args.dtype
    config.data.part = "val"
    config.ckpt_path = args.ckpt

    sde = F.get_standard_sde(config)
    # full/decoder strategies adapt the base params directly: the model must
    # be built WITHOUT LoRA (mirrors run_adapted_sampling.py's gating)
    lora_rank = args.lora_rank if args.adaptation == "lora" else 0
    model, params, _ = F.get_standard_score(
        config, sde, use_ema=True, load_model=True, lora_rank=lora_rank)
    import dataclasses

    plain_model = type(model)(dataclasses.replace(model.cfg, lora_rank=0))
    trafo = F.get_standard_ray_trafo(config)
    dataset = F.get_standard_dataset(config)

    cases = []
    for i, gt in enumerate(dataset):
        if i >= args.num_in_dist:
            break
        cases.append((f"in-dist val[{i}]", np.asarray(gt), i))
    if args.num_ood >= 1:
        cases.append(("OOD bars", ood_bars(256)[..., None], 100))
    for k in range(args.num_ood - 1):
        cases.append((f"OOD blocks[{k}]", ood_grid(256, 17 + k)[..., None], 101 + k))

    dds_sampler = None
    ad_sampler = None
    rows, recons = [], {}
    for name, gt, idx in cases:
        gt = jnp.asarray(gt)[None]
        key = jax.random.fold_in(jax.random.PRNGKey(config.seed), idx)
        gt, obs, fbp = F.get_data_from_ground_truth(gt, trafo,
                                                    config.data.stddev, key)
        g = np.asarray(gt[0, ..., 0])

        if dds_sampler is None:
            dds_sampler = F.get_standard_sampler(
                "dds", None, sde, trafo, obs, num_steps=args.dds_steps,
                im_shape=(256, 256, 1), gamma=0.01, eta=args.dds_eta, cg_iter=5,
                score_apply=lambda p, x, t: plain_model.apply({"params": p}, x, t),
                score_params=params)
        else:
            dds_sampler.observation = obs
            dds_sampler.rhs = trafo.adjoint(obs)
        x_dds, _ = dds_sampler.sample(jax.random.fold_in(key, 1))
        x_dds = np.clip(np.asarray(x_dds[0, ..., 0]), 0, 1)

        t0 = time.time()
        if ad_sampler is not None and args.adaptation != "lora":
            # full/decoder: the adaptation state IS the base params — force a
            # fresh sampler per image (reference reloads the model per image)
            ad_sampler = None
        if ad_sampler is None:
            ad_sampler = F.get_standard_adapted_sampler(
                "dds", model, params, sde, trafo, obs, num_steps=args.num_steps,
                im_shape=(256, 256, 1), num_optim_step=args.num_optim_step,
                adapt_freq=1, lr=args.lr, tv_penalty=args.tv_penalty,
                eta=args.eta, gamma=0.01, dc_type="cg", cg_iter=1, add_cg=True,
                adaptation=args.adaptation, lora_seed=idx)
        else:
            # fresh adaptation state per image (reference reloads the model
            # per image, run_adapted_sampling.py:102-105)
            from diffusion_models_dev_project_tpu.sampling.adaptation import init_lora
            ad_sampler.observation = obs
            ad_sampler.rhs = trafo.adjoint(obs)
            if args.adaptation == "lora":
                ad_sampler.lora = init_lora(model, model.cfg, seed=idx)
        x_ad, _ = ad_sampler.sample(jax.random.fold_in(key, 1))
        x_ad = np.clip(np.asarray(x_ad[0, ..., 0]), 0, 1)
        dt_ad = time.time() - t0

        row = dict(name=name,
                   fbp=PSNR(np.asarray(fbp[0, ..., 0]), g),
                   dds=PSNR(x_dds, g), dds_ssim=SSIM(x_dds, g),
                   adapted=PSNR(x_ad, g), adapted_ssim=SSIM(x_ad, g))
        rows.append(row)
        recons[name] = (x_ad, x_dds, g)
        print(f"[{name}] FBP {row['fbp']:6.2f} | DDS({args.dds_steps}, "
              f"eta={args.dds_eta}) {row['dds']:6.2f}/{row['dds_ssim']:.3f} | "
              f"adapted({args.adaptation}) {row['adapted']:6.2f}/"
              f"{row['adapted_ssim']:.3f}  ({dt_ad:.0f}s)", flush=True)

    for sub in ("in-dist", "OOD"):
        sel = [r for r in rows if r["name"].startswith(sub[:3].lower())
               or r["name"].startswith(sub)]
        if sel:
            print(f"MEAN {sub}: FBP {np.mean([r['fbp'] for r in sel]):.2f} | "
                  f"DDS {np.mean([r['dds'] for r in sel]):.2f} | "
                  f"adapted {np.mean([r['adapted'] for r in sel]):.2f}")
    if args.save_npz:
        np.savez(args.save_npz, **{f"{k}_{i}": v for k, (a, d, g) in
                                   recons.items() for i, v in
                                   zip(("ad", "dds", "gt"), (a, d, g))})


if __name__ == "__main__":
    main()

"""Flagship-resolution evaluation: DDS / DPS / naive on the reference's
shipped 256² val set (dataset/disk_ellipses_val_256.pt, converted to
data_assets/) with a 256²-trained prior — the canonical disk_ellipses
protocol of `run_conditional_sampling.py` (60 angles, rel. noise 0.01).

Reference defaults (run_conditional_sampling.py:18-24): 1000 steps,
eta=0.15 gamma=0.01 cg_iter=5 for DDS; penalty=1 for DPS/naive.

Usage: PYTHONPATH=. python scripts/eval_flagship_256.py --ckpt <orbax dir>
           [--method dds|dps|naive] [--eta 0.15] [--penalty 1.0]
           [--num_steps 1000] [--num_images 10] [--num_channels 128]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import diffusion_models_dev_project_tpu.factory as F
from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import get_config
from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM

parser = argparse.ArgumentParser()
parser.add_argument("--ckpt", required=True)
parser.add_argument("--sde", default="vesde", choices=["vesde", "vpsde", "ddpm"])
parser.add_argument("--method", default="dds", choices=["dds", "dps", "naive"])
parser.add_argument("--travel_length", default=1, type=int)
parser.add_argument("--travel_repeat", default=1, type=int)
parser.add_argument("--early_stopping_pct", default=None, type=float)
parser.add_argument("--num_steps", default=1000, type=int)
parser.add_argument("--num_images", default=10, type=int)
parser.add_argument("--num_channels", default=128, type=int)
parser.add_argument("--dtype", default="bfloat16")
parser.add_argument("--eta", default=0.15, type=float)
parser.add_argument("--gamma", default=0.01, type=float)
parser.add_argument("--penalty", default=1.0, type=float)
parser.add_argument("--cg_iter", default=5, type=int)
parser.add_argument("--cg_precision", default="high",
                    choices=["default", "high", "highest"])
parser.add_argument("--small_conv_matmul", default=1024, type=int,
                    help="route <=N-pixel 3x3 convs through im2col matmuls "
                    "(UNetConfig.small_conv_matmul); 0 = off. Default on "
                    "since r5 (measured-fastest config, BENCH.md)")
parser.add_argument("--params_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="UNet weight storage dtype (matches bench.py "
                    "default since r5; PSNR-parity check in BENCH.md r5)")
parser.add_argument("--save_npz", default=None,
                    help="save per-image recon/gt stacks to this .npz")
parser.add_argument("--trace", action="store_true",
                    help="record the in-graph per-step PSNR trace (first "
                    "image only) and print its quartiles")
args = parser.parse_args()


def main():
    config = get_config(args.sde)
    config.model.num_channels = args.num_channels
    config.model.dtype = args.dtype
    if args.small_conv_matmul:
        config.model.small_conv_matmul = int(args.small_conv_matmul)
    config.data.part = "val"                    # the shipped set
    config.ckpt_path = args.ckpt

    sde = F.get_standard_sde(config)
    model, params, _ = F.get_standard_score(config, sde, use_ema=True,
                                            load_model=True)
    if args.params_dtype == "bfloat16":
        # one jitted program, donated input — an eager tree_map costs
        # ~0.5 s/leaf over the TPU relay (CLAUDE.md gotcha)
        params = jax.jit(lambda p: jax.tree_util.tree_map(
            lambda a: (a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a), p),
            donate_argnums=0)(params)
    trafo = F.get_standard_ray_trafo(config)
    dataset = F.get_standard_dataset(config)

    sampler = None
    psnrs, ssims, fbps, recons, gts = [], [], [], [], []
    for i, gt in enumerate(dataset):
        if i >= args.num_images:
            break
        gt = jnp.asarray(gt)[None]
        key = jax.random.fold_in(jax.random.PRNGKey(config.seed), i)
        gt, obs, fbp = F.get_data_from_ground_truth(gt, trafo,
                                                    config.data.stddev, key)
        if sampler is None:
            sampler = F.get_standard_sampler(
                args.method, None, sde, trafo, obs, num_steps=args.num_steps,
                im_shape=(256, 256, 1), gamma=args.gamma, eta=args.eta,
                cg_iter=args.cg_iter, penalty=args.penalty, filtbackproj=fbp,
                travel_length=args.travel_length,
                travel_repeat=args.travel_repeat,
                early_stopping_pct=args.early_stopping_pct,
                ground_truth=(gt if args.trace else None),
                score_apply=lambda p, x, t: model.apply({"params": p}, x, t),
                score_params=params, cg_precision=args.cg_precision)
            if args.trace:
                _, tr = sampler.sample(jax.random.fold_in(key, 1),
                                       return_trace=True)
                tr = np.asarray(tr)
                q = [tr[int(f * (len(tr) - 1))] for f in
                     (0.0, 0.25, 0.5, 0.75, 0.9, 0.95, 1.0)]
                print("trace PSNR @ {0,25,50,75,90,95,100}% of steps:",
                      " ".join(f"{v:.1f}" for v in q), flush=True)
                import os

                os.makedirs("outputs", exist_ok=True)
                np.save("outputs/trace_psnr.npy", tr)
        else:
            sampler.observation = obs
            sampler.rhs = trafo.adjoint(obs)
            sampler.filtbackproj = fbp
        t0 = time.time()
        x, _ = sampler.sample(jax.random.fold_in(key, 1))
        x = np.clip(np.asarray(x[0, ..., 0]), 0, 1)
        g = np.asarray(gt[0, ..., 0])
        dt = time.time() - t0
        p, s = PSNR(x, g), SSIM(x, g)
        fp = PSNR(np.asarray(fbp[0, ..., 0]), g)
        print(f"image {i}: {args.method} {p:6.2f} dB / {s:.4f} SSIM | "
              f"FBP {fp:6.2f} dB | {dt:.1f}s", flush=True)
        psnrs.append(p); ssims.append(s); fbps.append(fp)
        recons.append(x); gts.append(g)
    print(f"MEAN over {len(psnrs)}: {args.method} {np.mean(psnrs):.2f} dB / "
          f"{np.mean(ssims):.4f} SSIM | FBP {np.mean(fbps):.2f} dB")
    if args.save_npz:
        np.savez(args.save_npz, recon=np.stack(recons), gt=np.stack(gts),
                 psnr=np.array(psnrs), ssim=np.array(ssims))


if __name__ == "__main__":
    main()

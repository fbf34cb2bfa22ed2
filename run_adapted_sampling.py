"""Steerable (adapted) sampling CLI.

TPU-native counterpart of the reference `run_adapted_sampling.py:11-127`:
same flags and per-image protocol.  Where the reference re-loads a fresh
score model after every image to reset the LoRA surgery
(run_adapted_sampling.py:102-105), we simply start each image from a fresh
LoRA tree + the immutable base params — no reload, no surgery.
"""
import argparse
import json
from itertools import islice

import numpy as np

parser = argparse.ArgumentParser(description="adapted (steerable) sampling")
parser.add_argument("--dataset", default="ellipses",
                    choices=["walnut", "ellipses", "aapm"])
parser.add_argument("--model_learned_on", default="ellipses",
                    choices=["ellipses", "aapm"])
parser.add_argument("--method", default="dds", choices=["dds"])
parser.add_argument("--noise_level", default=0.01)
parser.add_argument("--ema", action="store_true")
parser.add_argument("--num_steps", default=50)
parser.add_argument("--tv_penalty", default=1e-6)
parser.add_argument("--eta", default=0.85)
parser.add_argument("--sde", default="vesde", choices=["vpsde", "vesde", "ddpm"])
parser.add_argument("--adaptation", default="lora",
                    choices=["lora", "full", "decoder"])
parser.add_argument("--num_optim_step", default=10)
parser.add_argument("--adapt_freq", default=1)
parser.add_argument("--lora_include_blocks",
                    default=["input_blocks", "middle_block", "output_blocks", "out"],
                    nargs="+")
parser.add_argument("--lr", default=1e-3)
parser.add_argument("--lora_rank", default=4)
parser.add_argument("--add_cg", action="store_true",
                    help="do DDS steps after adaptation")
parser.add_argument("--cg_iter", default=1)
parser.add_argument("--gamma", default=0.01)
parser.add_argument("--load_path", help="path to a model checkpoint")
parser.add_argument("--dc_type", default="cg", choices=["cg", "gd", "none"])
parser.add_argument("--stddev", default=None)
parser.add_argument("--early_stopping_pct", default=1.0)
parser.add_argument("--num_images", default=None)
parser.add_argument("--version", default=1)
parser.add_argument("--im_size", default=None,
                    help="override image size (extension; reference configs "
                    "are fixed at 256)")
parser.add_argument("--num_channels", default=None,
                    help="override model channels (extension)")
parser.add_argument("--sigma_max", default=None,
                    help="override sde.sigma_max — must match the value the "
                    "checkpoint was trained with (extension)")

parser.add_argument("--shard_images", default=0,
                    help="adapt-and-sample N images per compiled call (vmap "
                    "over the image axis — every image keeps its own LoRA "
                    "and Adam state); with more than one device the image "
                    "axis is sharded over the mesh's 'data' axis")

parser.add_argument("--debug_nans", action="store_true",
                    help="enable jax_debug_nans (fail at the first NaN)")


def coordinator(args):
    import jax

    if getattr(args, "debug_nans", False):
        # NaN debugging (SURVEY.md §5.2): fail fast at the producing op
        jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    import diffusion_models_dev_project_tpu.factory as F
    from diffusion_models_dev_project_tpu.utils.metrics import PSNR, SSIM
    from diffusion_models_dev_project_tpu.utils.reporting import (
        save_image_png, save_recon_info, write_report)

    config, dataconfig = F.get_standard_configs(args)
    if args.im_size is not None:
        for c in (config, dataconfig):
            c.model.image_size = int(args.im_size)
            c.data.im_size = int(args.im_size)
    if args.num_channels is not None:
        config.model.num_channels = int(args.num_channels)
    if args.sigma_max is not None:
        config.sde.sigma_max = float(args.sigma_max)
    try:
        save_root = F.get_standard_path(args, run_type="adapt",
                                        data_part=dataconfig.data.part)
    except AttributeError:
        save_root = F.get_standard_path(args, run_type="adapt")
    print("save to:", save_root)
    save_root.mkdir(parents=True, exist_ok=True)

    if args.stddev is not None:
        dataconfig.data.stddev = float(args.stddev)

    sde = F.get_standard_sde(config)
    use_lora = args.adaptation == "lora"
    model, params, _ = F.get_standard_score(
        config, sde, use_ema=args.ema, load_model=args.load_path is not None,
        ckpt_path=args.load_path,
        lora_rank=int(args.lora_rank) if use_lora else 0,
        lora_include_blocks=(tuple(args.lora_include_blocks)
                             if use_lora else None))
    ray_trafo = F.get_standard_ray_trafo(dataconfig)
    dataset = F.get_standard_dataset(dataconfig, ray_trafo)

    num_images = int(args.num_images) if args.num_images is not None else \
        dataconfig.data.validation.num_images
    seed = config.seed or 0

    def prepare(i, data_sample):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        if isinstance(data_sample, (tuple, list)) and len(data_sample) == 3:
            observation, ground_truth, filtbackproj = map(jnp.asarray, data_sample)
        else:
            gt = jnp.asarray(data_sample)
            if gt.ndim == 3:
                gt = gt[None]
            ground_truth, observation, filtbackproj = F.get_data_from_ground_truth(
                gt, ray_trafo, dataconfig.data.stddev, key)
        return key, observation, ground_truth, filtbackproj

    def finish(i, recon_row, ground_truth):
        r = np.asarray(jnp.clip(recon_row, 0)[..., 0])
        g = np.asarray(ground_truth[0, ..., 0])
        save_recon_info(save_root / f"recon_{i}_info.npz", r, g)
        save_image_png(save_root / f"recon_{i}.png", r)
        psnr, ssim = PSNR(r, g), SSIM(r, g)
        print(f"adapted reconstruction of sample {i}\nPSNR: {psnr}\nSSIM: {ssim}")
        _psnr.append(psnr)
        _ssim.append(ssim)

    def make_sampler(observation, ground_truth, lora_seed):
        return F.get_standard_adapted_sampler(
            args.method, model, params, sde, ray_trafo, observation,
            num_steps=int(args.num_steps), eta=float(args.eta),
            gamma=float(args.gamma), tv_penalty=float(args.tv_penalty),
            lr=float(args.lr), num_optim_step=int(args.num_optim_step),
            adapt_freq=int(args.adapt_freq), lora_rank=int(args.lora_rank),
            lora_include_blocks=tuple(args.lora_include_blocks),
            add_cg=bool(args.add_cg), dc_type=args.dc_type,
            cg_iter=int(args.cg_iter),
            early_stopping_pct=float(args.early_stopping_pct),
            ground_truth=ground_truth, lora_seed=lora_seed,
            adaptation=args.adaptation)

    _psnr, _ssim = [], []
    shard_n = int(args.shard_images)
    if shard_n > 0:
        # vmapped multi-image mode: per-image LoRA/Adam state, image axis
        # sharded over the mesh (AdaptedSampler.sample_batched)
        from diffusion_models_dev_project_tpu.parallel.mesh import make_mesh

        from diffusion_models_dev_project_tpu.sampling.adaptation import init_lora

        n_dev = jax.device_count()
        mesh = make_mesh() if n_dev > 1 and shard_n % n_dev == 0 else None
        if mesh is not None:
            print(f"sharding {shard_n}-image chunks over {n_dev} devices")
        elif n_dev > 1:
            print(f"WARNING: --shard_images {shard_n} is not divisible by "
                  f"the {n_dev} visible devices — running the batched vmap "
                  "on a SINGLE device; pick a multiple of the device count "
                  "for multi-chip eval")
        items = [prepare(i, s)
                 for i, s in enumerate(islice(iter(dataset), num_images))]
        sampler = make_sampler(items[0][1], None, lora_seed=0)
        for c0 in range(0, len(items), shard_n):
            chunk = items[c0:c0 + shard_n]
            chunk_p = chunk + [chunk[-1]] * (shard_n - len(chunk))
            keys = jnp.stack([jax.random.fold_in(k, 1)
                              for k, _, _, _ in chunk_p])
            obs = jnp.stack([o for _, o, _, _ in chunk_p])
            # per-image LoRA inits (seed = global image index), matching
            # the serial path's fresh re-init per image; full/decoder carry
            # no LoRA — their trainable subset resets from `params` anyway
            lora_stack = None if not use_lora else jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls),
                *[init_lora(model, model.cfg, seed=c0 + j)
                  for j in range(len(chunk_p))])
            recon = sampler.sample_batched(keys, obs, mesh=mesh,
                                           lora_stack=lora_stack)
            for j, (_, _, ground_truth, _) in enumerate(chunk):
                finish(c0 + j, recon[j, 0], ground_truth)
    else:
        sampler = None
        for i, data_sample in enumerate(islice(iter(dataset), num_images)):
            key, observation, ground_truth, filtbackproj = prepare(i, data_sample)

            if sampler is None:
                sampler = make_sampler(observation, ground_truth, lora_seed=i)
            else:
                sampler.observation = observation
                sampler.rhs = ray_trafo.adjoint(observation)
                if use_lora:
                    # fresh LoRA per image = the reference's model re-load
                    from diffusion_models_dev_project_tpu.sampling.adaptation import init_lora

                    sampler.lora = init_lora(model, model.cfg, seed=i)

            recon, _ = sampler.sample(jax.random.fold_in(key, 1))
            finish(i, recon[0], ground_truth)

    report = dict(dataconfig.to_dict())
    report.update({k: str(v) for k, v in vars(args).items()})
    report["PSNR"] = float(np.mean(_psnr))
    report["SSIM"] = float(np.mean(_ssim))
    write_report(save_root / "report.yaml", report)
    print(json.dumps({"PSNR": report["PSNR"], "SSIM": report["SSIM"]}))


if __name__ == "__main__":
    coordinator(parser.parse_args())

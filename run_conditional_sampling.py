"""Conditional posterior sampling CLI.

TPU-native counterpart of the reference `run_conditional_sampling.py:11-107`:
same flags, same per-image evaluation protocol (per-image seeds, clamp,
`recon_{i}.png` + info blob, aggregated PSNR/SSIM in `report.yaml`), but the
sampler is compiled ONCE and reused for every image (identical shapes), and
each 1000-step reverse diffusion runs as a single on-device `lax.scan`.
"""
import argparse
import json
from itertools import islice

import numpy as np

parser = argparse.ArgumentParser(description="conditional sampling")
parser.add_argument("--dataset", default="ellipses",
                    choices=["walnut", "ellipses", "aapm"])
parser.add_argument("--model_learned_on", default="ellipses",
                    choices=["ellipses", "aapm"])
parser.add_argument("--method", default="dds", choices=["naive", "dps", "dds"])
parser.add_argument("--ema", action="store_true")
parser.add_argument("--add_corrector_step", action="store_true",
                    help="Langevin corrector after each predictor step "
                    "(parsed-but-dead in the reference; functional here)")
parser.add_argument("--num_steps", default=1000)
parser.add_argument("--penalty", default=1, help="reg. penalty for naive/dps")
parser.add_argument("--gamma", default=0.01, help="reg. used for dds")
parser.add_argument("--eta", default=0.15,
                    help="dds stochastic/deterministic noise weighting")
parser.add_argument("--pct_chain_elapsed", default=0,
                    help="start the chain from noised FBP")
parser.add_argument("--sde", default="vesde", choices=["vpsde", "vesde", "ddpm"])
parser.add_argument("--cg_iter", default=5)
parser.add_argument("--cg_precision", default="high",
                    choices=["default", "high", "highest"],
                    help="matmul precision of the CG data-consistency "
                    "applies (extension): high = bf16x3 (default, "
                    "PSNR-identical to fp32, ~7%% faster end-to-end), "
                    "highest = full fp32 (reference-parity numerics), "
                    "default = pure bf16 (fast but collapses; BENCH.md r3)")
parser.add_argument("--load_path", help="path to a model checkpoint "
                    "(.pt reference checkpoint or orbax dir)")
parser.add_argument("--stddev", default=None, help="noise level override")
parser.add_argument("--early_stopping_pct", default=1.0,
                    help="early stop sampling (DDPM/DPS only)")
parser.add_argument("--num_images", default=None,
                    help="override dataconfig.data.validation.num_images")
parser.add_argument("--version", default=1)
parser.add_argument("--im_size", default=None,
                    help="override image size (extension; reference configs "
                    "are fixed at 256)")
parser.add_argument("--num_channels", default=None,
                    help="override model channels (extension)")
parser.add_argument("--sigma_max", default=None,
                    help="override sde.sigma_max — must match the value the "
                    "checkpoint was trained with (extension)")
parser.add_argument("--small_conv_matmul", default=1024, type=int,
                    help="H*W threshold below which the UNet's 3x3 convs "
                    "run as im2col matmuls (perf; identical math — see "
                    "UNetConfig.small_conv_matmul); 0 = XLA conv everywhere. "
                    "Default on since r5 (measured-fastest config, BENCH.md "
                    "r4/r5)")
parser.add_argument("--pallas_conv_min", default=0, type=int,
                    help="H*W threshold above which the UNet's 3x3 convs "
                    "run as the Pallas 9-shift kernel (ops/conv3x3.py; "
                    "+20%% over XLA conv at the 256^2 level, BENCH.md r5); "
                    "0 = XLA conv. 16384 captures the measured-winning "
                    "shapes")
parser.add_argument("--params_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="UNet weight storage dtype; bfloat16 halves the "
                    "per-forward HBM weight traffic (default since r5 so "
                    "eval and bench run the same UNet config; PSNR-parity "
                    "check in BENCH.md r5)")

parser.add_argument("--shard_images", default=0,
                    help="stack N images on the sampler's batch axis per "
                    "call; with more than one device the batch axis is "
                    "sharded over the mesh's 'data' axis (the workload's "
                    "scaling axis, SURVEY.md §2.10 — the reference loops "
                    "images serially at batch 1, "
                    "run_conditional_sampling.py:51)")

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
    if args.small_conv_matmul:
        config.model.small_conv_matmul = int(args.small_conv_matmul)
    if args.pallas_conv_min:
        config.model.pallas_conv_min = int(args.pallas_conv_min)
    if args.sigma_max is not None:
        config.sde.sigma_max = float(args.sigma_max)
    try:
        save_root = F.get_standard_path(args, run_type=args.method,
                                        data_part=dataconfig.data.part)
    except AttributeError:
        save_root = F.get_standard_path(args, run_type=args.method)
    print("save to:", save_root)
    save_root.mkdir(parents=True, exist_ok=True)

    if args.stddev is not None:
        dataconfig.data.stddev = float(args.stddev)

    sde = F.get_standard_sde(config)
    model, params, score_fn = F.get_standard_score(
        config, sde, use_ema=args.ema, load_model=args.load_path is not None,
        ckpt_path=args.load_path)
    if args.params_dtype == "bfloat16":
        # one jitted program, donated input — an eager tree_map costs
        # ~0.5 s/leaf over the TPU relay (CLAUDE.md gotcha)
        params = jax.jit(lambda p: jax.tree_util.tree_map(
            lambda a: (a.astype(jnp.bfloat16)
                       if a.dtype == jnp.float32 else a), p),
            donate_argnums=0)(params)
    ray_trafo = F.get_standard_ray_trafo(dataconfig)
    dataset = F.get_standard_dataset(dataconfig, ray_trafo)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print("Number of parameters:", n_params)

    num_images = int(args.num_images) if args.num_images is not None else \
        dataconfig.data.validation.num_images
    seed = config.seed or 0

    def prepare(i, data_sample):
        """Per-image data with the reference's per-image seeding
        (run_conditional_sampling.py:52-53)."""
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
        raw = np.asarray(recon_row[..., 0])
        # divergence guard: a 1000-step scan can silently blow up; make a
        # failed run self-describing in the report instead of just a low mean
        if not np.isfinite(raw).all() or np.abs(raw).max() > 1e3:
            _diverged.append(i)
            print(f"WARNING: sample {i} diverged "
                  f"(finite={np.isfinite(raw).all()}, "
                  f"|x|max={np.abs(raw[np.isfinite(raw)]).max(initial=0):.3g})")
        r = np.nan_to_num(np.clip(raw, 0, None))
        g = np.asarray(ground_truth[0, ..., 0])
        save_recon_info(save_root / f"recon_{i}_info.npz", r, g)
        save_image_png(save_root / f"recon_{i}.png", r)
        psnr, ssim = PSNR(r, g), SSIM(r, g)
        print(f"reconstruction of sample {i}\nPSNR: {psnr}\nSSIM: {ssim}")
        _psnr.append(psnr)
        _ssim.append(ssim)

    _psnr, _ssim, _diverged = [], [], []
    shard_n = int(args.shard_images)
    if shard_n > 0:
        _sample_sharded(args, F, jax, jnp, ray_trafo, sde, model, params,
                        score_fn, dataset, num_images, shard_n, prepare, finish)
    else:
        _sample_serial(args, F, jax, jnp, ray_trafo, sde, model, params,
                       score_fn, dataset, num_images, prepare, finish)

    report = dict(dataconfig.to_dict())
    report.update({k: str(v) for k, v in vars(args).items()})
    report["PSNR"] = float(np.mean(_psnr))
    report["SSIM"] = float(np.mean(_ssim))
    # provenance: sharded multi-image runs are statistically (not bitwise)
    # equivalent to the serial reference protocol (one chain key per chunk)
    report["sampling_mode"] = (f"sharded({shard_n})" if shard_n > 0
                               else "serial")
    report["diverged_images"] = list(map(int, _diverged))
    write_report(save_root / "report.yaml", report)
    print(json.dumps({"PSNR": report["PSNR"], "SSIM": report["SSIM"]}))


def _sample_serial(args, F, jax, jnp, ray_trafo, sde, model, params, score_fn,
                   dataset, num_images, prepare, finish):
    """Reference protocol: one image at a time, compiled program reused."""
    sampler = None
    for i, data_sample in enumerate(islice(iter(dataset), num_images)):
        key, observation, ground_truth, filtbackproj = prepare(i, data_sample)

        if sampler is None:
            sampler = F.get_standard_sampler(
                args.method, score_fn, sde, ray_trafo, observation,
                num_steps=int(args.num_steps),
                im_shape=(*ray_trafo.model_im_shape, 1),
                penalty=float(args.penalty), gamma=float(args.gamma),
                eta=float(args.eta), cg_iter=int(args.cg_iter),
                cg_precision=args.cg_precision,
                pct_chain_elapsed=float(args.pct_chain_elapsed),
                early_stopping_pct=(None if float(args.early_stopping_pct) == 1.0
                                    else float(args.early_stopping_pct)),
                ground_truth=ground_truth, filtbackproj=filtbackproj,
                add_corrector_step=bool(args.add_corrector_step),
                score_apply=lambda p, x, t: model.apply({"params": p}, x, t),
                score_params=params)
        else:
            # same shapes -> reuse the compiled program, just swap the data
            sampler.observation = observation
            sampler.rhs = ray_trafo.adjoint(observation)
            sampler.filtbackproj = filtbackproj

        recon, _ = sampler.sample(jax.random.fold_in(key, 1))
        finish(i, recon[0], ground_truth)


def _sample_sharded(args, F, jax, jnp, ray_trafo, sde, model, params, score_fn,
                    dataset, num_images, shard_n, prepare, finish):
    """Multi-image mode: `shard_n` images stacked on the batch axis, sharded
    over the device mesh when one is available (SamplerSpec.batch_size =
    shard_n; sampling/engine.py:148-180).  Per-image observation seeds match
    the serial path exactly; the reverse-diffusion noise comes from one key
    per chunk (statistical, not bitwise, equivalence — SURVEY.md §7 hard
    part 5)."""
    from diffusion_models_dev_project_tpu.parallel.mesh import make_mesh

    n_dev = jax.device_count()
    mesh = make_mesh() if n_dev > 1 and shard_n % n_dev == 0 else None
    if mesh is not None:
        print(f"sharding {shard_n}-image batches over {n_dev} devices")

    items = [prepare(i, s)
             for i, s in enumerate(islice(iter(dataset), num_images))]
    sampler = None
    for c0 in range(0, len(items), shard_n):
        chunk = items[c0:c0 + shard_n]
        pad = shard_n - len(chunk)          # last chunk: pad, discard extras
        chunk_p = chunk + [chunk[-1]] * pad
        obs = jnp.concatenate([o for _, o, _, _ in chunk_p])
        fbp = jnp.concatenate([f for _, _, _, f in chunk_p])
        if sampler is None:
            sampler = F.get_standard_sampler(
                args.method, score_fn, sde, ray_trafo, obs,
                num_steps=int(args.num_steps), batch_size=shard_n,
                im_shape=(*ray_trafo.model_im_shape, 1),
                penalty=float(args.penalty), gamma=float(args.gamma),
                eta=float(args.eta), cg_iter=int(args.cg_iter),
                cg_precision=args.cg_precision,
                pct_chain_elapsed=float(args.pct_chain_elapsed),
                early_stopping_pct=(None if float(args.early_stopping_pct) == 1.0
                                    else float(args.early_stopping_pct)),
                filtbackproj=fbp,
                add_corrector_step=bool(args.add_corrector_step),
                score_apply=lambda p, x, t: model.apply({"params": p}, x, t),
                score_params=params)
        else:
            sampler.observation = obs
            sampler.rhs = ray_trafo.adjoint(obs)
            sampler.filtbackproj = fbp
        recon, _ = sampler.sample(jax.random.fold_in(chunk[0][0], 1), mesh=mesh)
        for j, (_, _, ground_truth, _) in enumerate(chunk):
            finish(c0 + j, recon[j], ground_truth)


if __name__ == "__main__":
    coordinator(parser.parse_args())

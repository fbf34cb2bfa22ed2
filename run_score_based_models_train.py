"""Score-model training CLI.

TPU-native counterpart of the reference `run_score_based_models_train.py`
(same flags, versioned log dirs `version_{:02d}`, config dump to
`report.yaml`), with the fixed warts noted in SURVEY.md §3.1 (no
`model_type` kwarg mismatch, no bit-rotted dds_unet/1-ellipse branches).
Training runs data-parallel over all available devices.
"""
import argparse
import os

parser = argparse.ArgumentParser(description="training")
parser.add_argument("--sde", default="vesde", choices=["vpsde", "vesde", "ddpm"])
parser.add_argument("--base_path", default="./outputs/score_based_baseline")
parser.add_argument("--train_model_on", default="ellipses",
                    choices=["ellipses", "aapm"],
                    help="aapm trains the learn_sigma (out_channels=2) "
                    "AAPM-config model on AAPM_DATA_PATH slices (extension: "
                    "the reference's AAPM prior arrives pretrained)")
parser.add_argument("--epochs", default=None, help="override config epochs")
parser.add_argument("--steps_per_epoch", default=None,
                    help="override steps per epoch (default: dataset length / batch)")
parser.add_argument("--batch_size", default=None)
parser.add_argument("--im_size", default=None, help="override image size")
parser.add_argument("--lr", default=None, help="override learning rate")
parser.add_argument("--num_channels", default=None, help="override model width")
parser.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="compute dtype (params stay fp32)")
parser.add_argument("--lr_warmup", default=0, type=int,
                    help="linear lr warmup steps (extension; REQUIRED for "
                    "--init_ckpt warm starts: a fresh Adam's uncalibrated "
                    "second moments move every weight by ~lr per step, "
                    "measured r5 to wreck a 30 dB checkpoint to 6 dB within "
                    "500 steps at lr=1e-4)")
parser.add_argument("--grad_clip", default=None,
                    help="global-norm gradient clipping (extension; the "
                    "sigma-weighted DSM loss has heavy-tailed gradients)")
parser.add_argument("--init_ckpt", default=None,
                    help="warm-start parameters (and the EMA shadow) from a "
                    "checkpoint (.npz msgpack / .pt / orbax dir) instead of "
                    "random init; optimizer state starts fresh. Used to "
                    "continue a run whose orbax state is gone from its "
                    "shipped EMA weights")
parser.add_argument("--init_ckpt_partial", action="store_true",
                    help="with --init_ckpt: copy only the leaves whose "
                    "shapes match the fresh init and keep the fresh init "
                    "elsewhere — cross-family warm starts (e.g. seeding the "
                    "learn_sigma out_channels=2 AAPM model from a 1-channel "
                    "ellipse prior: every block transfers, the final conv "
                    "keeps its ADM zero init)")
parser.add_argument("--run_dir", default=None,
                    help="reuse this run directory instead of creating a new "
                    "version_{N} dir; training resumes exactly from its "
                    "latest orbax checkpoint if one exists")
parser.add_argument("--avg_tail", default=0, type=int,
                    help="maintain a rolling fp16 average of the EMA "
                    "shadows of the last K checkpoint saves (exported to "
                    "<run_dir>/avg_ema_tail.msgpack.npz); snapshot "
                    "averaging stabilizes near-deterministic DDIM "
                    "protocols (BENCH.md round 3)")
parser.add_argument("--sample_freq", default=None,
                    help="emit an unconditional EMA sample grid every N "
                    "epochs to <run_dir>/samples (reference "
                    "trainer.py:67-104); overrides "
                    "config.validation.sample_freq")
parser.add_argument("--val_num_steps", default=None,
                    help="override config.validation.num_steps for the "
                    "train-time sample grids")
parser.add_argument("--save_every_n_epoch", default=None,
                    help="override config.training.save_model_every_n_epoch")

parser.add_argument("--ema_decay", default=None,
                    help="override config.training.ema_decay (extension; a "
                    "longer horizon, e.g. 0.9999, smooths the top "
                    "sigma-decade fluctuation measured in BENCH.md)")
parser.add_argument("--loss_sigma_alpha", default=None,
                    help="sigma-stratified loss reweighting strength "
                    "(losses.score_matching_loss); 0/None = exact reference "
                    "loss")

parser.add_argument("--keep_best_probe", nargs="?", const="dds", default=None,
                    choices=["dds", "tweedie"],
                    help="score every checkpoint save's EMA shadow (and the "
                    "rolling tail average) on held-out val images and export "
                    "the best-so-far weights to <run_dir>/best_ema.msgpack.npz "
                    "— a winning snapshot can never be garbage-collected by "
                    "orbax max_to_keep (the round-3 lesson, BENCH.md). "
                    "'dds' (default) runs a 200-step eta=0.15 DDS mini-"
                    "reconstruction and scores by -PSNR — the direct measure "
                    "of the near-deterministic protocol the probe exists to "
                    "protect; 'tweedie' scores denoising RMSE over the mid "
                    "sigma-decades (cheaper, indirect)")
parser.add_argument("--debug_nans", action="store_true",
                    help="enable jax_debug_nans (fail at the first NaN)")
parser.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force the CPU backend (smoke runs / CI)")


def coordinator(args):
    import jax

    if getattr(args, "platform", None) == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "debug_nans", False):
        # NaN debugging (SURVEY.md §5.2): fail fast at the producing op
        jax.config.update("jax_debug_nans", True)
    import numpy as np

    import diffusion_models_dev_project_tpu.factory as F
    from diffusion_models_dev_project_tpu.parallel.mesh import make_mesh
    from diffusion_models_dev_project_tpu.training.trainer import train_score_model
    from diffusion_models_dev_project_tpu.utils.checkpoint import Checkpointer
    from diffusion_models_dev_project_tpu.utils.reporting import write_report

    if args.train_model_on == "aapm":
        from diffusion_models_dev_project_tpu.configs.aapm_configs import get_config
    else:
        from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import (
            get_config)

    config = get_config(args.sde)
    if args.im_size is not None:
        config.data.im_size = int(args.im_size)
        config.model.image_size = int(args.im_size)
    if args.epochs is not None:
        config.training.epochs = int(args.epochs)
    if args.batch_size is not None:
        config.training.batch_size = int(args.batch_size)
    if args.lr is not None:
        config.training.lr = float(args.lr)
    if args.num_channels is not None:
        config.model.num_channels = int(args.num_channels)
    if args.dtype is not None:
        config.model.dtype = args.dtype
    if args.val_num_steps is not None:
        config.validation.num_steps = int(args.val_num_steps)
    if args.save_every_n_epoch is not None:
        config.training.save_model_every_n_epoch = int(args.save_every_n_epoch)

    sde = F.get_standard_sde(config)
    model, params, _ = F.get_standard_score(config, sde, load_model=False)
    if args.init_ckpt:
        # warm start: replace the random init with stored weights (fp16
        # shipping checkpoints load as fp32 masters, factory._load_params);
        # Adam state and the step counter start fresh, and the trainer's
        # EMA warm start (reference trainer.py:52-55) seeds the shadow
        # from these params for the first ema_warm_start_steps.
        # NOTE: pass the resolved UNetConfig (model.cfg), not the raw
        # ml_collections model block — the .pt converter needs the derived
        # fields (model_channels, channel_mult tuple) to map names
        loaded = F._load_params(str(args.init_ckpt), model.cfg, use_ema=False)
        if args.init_ckpt_partial:
            from flax.traverse_util import flatten_dict, unflatten_dict

            fresh = flatten_dict(params)
            src = flatten_dict(loaded)
            copied = skipped = 0
            for k, v in fresh.items():
                s = src.get(k)
                if s is not None and s.shape == v.shape:
                    fresh[k] = s
                    copied += 1
                else:
                    skipped += 1
            params = unflatten_dict(fresh)
            print(f"partial warm start from {args.init_ckpt}: "
                  f"{copied} leaves copied, {skipped} kept at fresh init")
        else:
            params = loaded
            print(f"warm-started params from {args.init_ckpt}")
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print("Number of parameters:", n_params)

    if args.run_dir:
        # explicit run dir: reuse (exact resume from its latest checkpoint)
        log_dir = args.run_dir
        os.makedirs(log_dir, exist_ok=True)
    else:
        # versioned run dir (reference run_score_based_models_train.py:59-69)
        ds_name = "AAPM" if args.train_model_on == "aapm" else "DiskEllipses"
        log_dir = os.path.join(args.base_path, ds_name, config.sde.type)
        os.makedirs(log_dir, exist_ok=True)
        version_num = 1
        while os.path.isdir(os.path.join(log_dir, f"version_{version_num:02d}")):
            version_num += 1
        log_dir = os.path.join(log_dir, f"version_{version_num:02d}")
        os.makedirs(log_dir)
    print("save model to", log_dir)
    write_report(os.path.join(log_dir, "report.yaml"), config.to_dict())

    _, batches = F.get_standard_train_dataset(config)
    steps_per_epoch = (int(args.steps_per_epoch) if args.steps_per_epoch
                       else max(1, config.data.length // config.training.batch_size))

    n_dev = jax.device_count()
    mesh = (make_mesh() if n_dev > 1
            and config.training.batch_size % n_dev == 0 else None)

    def apply_fn(p, x, t):
        return model.apply({"params": p}, x, t)

    # Train-time validation sampling (reference trainer.py:67-104): every
    # `sample_freq` epochs draw an unconditional EMA sample grid with the
    # compiled uncond sampler and save it under <run_dir>/samples.
    sample_freq = (int(args.sample_freq) if args.sample_freq is not None
                   else int(config.validation.sample_freq))
    sample_hook = None
    if sample_freq > 0:
        from diffusion_models_dev_project_tpu.sampling.engine import (
            DiffusionSampler, SamplerSpec)
        from diffusion_models_dev_project_tpu.utils.reporting import (
            save_image_png)

        val_bs = int(config.validation.batch_size)
        im = int(config.data.im_size)
        spec = SamplerSpec(method="uncond",
                           num_steps=int(config.validation.num_steps),
                           batch_size=val_bs, im_shape=(im, im, 1),
                           eps=float(config.validation.eps))
        val_sampler = DiffusionSampler(None, sde, spec, score_apply=apply_fn,
                                       score_params=params)
        samples_dir = os.path.join(log_dir, "samples")
        os.makedirs(samples_dir, exist_ok=True)

        def sample_hook(state, epoch):
            val_sampler.score_params = state.ema.shadow
            x, _ = val_sampler.sample(
                jax.random.fold_in(jax.random.PRNGKey(config.seed), epoch))
            grid = np.clip(np.concatenate(
                [np.asarray(x[i, ..., 0]) for i in range(val_bs)], axis=1), 0, 1)
            path = os.path.join(samples_dir, f"epoch_{epoch:04d}.png")
            save_image_png(path, grid)
            print(f"validation samples (epoch {epoch}): {path} "
                  f"mean {grid.mean():.3f} std {grid.std():.3f}")

    # Keep-best checkpointing (round-3 lesson, BENCH.md: orbax max_to_keep
    # garbage-collected a 10/10-good snapshot mid-eval).  Two scorers:
    # 'dds' (default) — a 200-step eta=0.15 DDS mini-reconstruction on fixed
    # val images with fixed measurement noise, scored by -PSNR: the direct
    # measure of the near-deterministic protocol the probe protects.  Round 3
    # measured that the Tweedie top-sigma RMSE can move OPPOSITE to eta=0.15
    # quality (pause 1: sigma=100 RMSE 26.6 vs 7.1 while the protocol went
    # 0/10 -> 10/10), so only a real mini-reconstruction is trustworthy.
    # 'tweedie' — denoising RMSE over the mid sigma-decades (cheaper probe,
    # useful for quick runs where ~9 s/save of DDS is too much).
    probe_hook = None
    if args.keep_best_probe:
        import jax.numpy as jnp

        val_cfg = get_config(args.sde)
        val_cfg.data.part = "val"
        val_cfg.data.im_size = int(config.data.im_size)
        im = int(config.data.im_size)
        imgs = []
        for i, img in enumerate(F.get_standard_dataset(val_cfg)):
            imgs.append(np.asarray(img))
            if len(imgs) >= 2:
                break
        gt = jnp.asarray(np.stack(imgs))
        if gt.shape[1] != im:
            gt = jax.image.resize(gt, (gt.shape[0], im, im, gt.shape[-1]),
                                  method="linear")

        if args.keep_best_probe == "dds":
            from diffusion_models_dev_project_tpu.sampling.engine import (
                get_standard_sampler)
            from diffusion_models_dev_project_tpu.utils.metrics import PSNR

            ray_trafo = F.get_standard_ray_trafo(val_cfg)
            _, obs, fbp = F.get_data_from_ground_truth(
                gt, ray_trafo, float(val_cfg.data.stddev),
                jax.random.PRNGKey(config.seed + 7))
            probe_sampler = get_standard_sampler(
                "dds", None, sde, ray_trafo, obs, num_steps=200,
                batch_size=gt.shape[0], eta=0.15, gamma=0.01, cg_iter=5,
                filtbackproj=fbp, score_apply=apply_fn, score_params=params)
            probe_key = jax.random.PRNGKey(config.seed + 13)
            gt_np = np.asarray(gt)

            def probe_hook(weights):
                probe_sampler.score_params = weights
                x, _ = probe_sampler.sample(probe_key)
                x = np.asarray(x)
                vals = [PSNR(x[i, ..., 0], gt_np[i, ..., 0])
                        for i in range(x.shape[0])]
                return -float(np.mean(vals))
        else:
            # Tweedie RMSE at the mid sigma-decades: t fractions covering
            # sigma in [10, 70] for the VESDE schedule (sigma_max=100).
            from diffusion_models_dev_project_tpu.ops.diffusion import tweedy

            fracs = (0.75, 0.85, 0.92, 0.96)
            t_scale = (float(config.sde.num_steps) - 1.0
                       if config.sde.type == "ddpm" else 1.0)
            probe_z = jax.random.normal(jax.random.PRNGKey(config.seed + 99),
                                        (len(fracs),) + gt.shape)

            @jax.jit
            def _probe(p):
                total = 0.0
                for j, frac in enumerate(fracs):
                    t = jnp.full((gt.shape[0],), frac * t_scale)
                    mean, std = sde.marginal_prob(gt, t)
                    x = mean + std[:, None, None, None] * probe_z[j]
                    s = model.apply({"params": p}, x, t)
                    xhat0 = tweedy(s, x, sde, t)
                    total = total + jnp.sqrt(jnp.mean((xhat0 - gt) ** 2))
                return total / len(fracs)

            def probe_hook(weights):
                return float(_probe(weights))

    train_score_model(
        apply_fn, params, sde, batches,
        epochs=config.training.epochs,
        steps_per_epoch=steps_per_epoch,
        lr=float(config.training.lr),
        lr_warmup_steps=int(args.lr_warmup),
        grad_clip=float(args.grad_clip) if args.grad_clip else None,
        ema_decay=(float(args.ema_decay) if args.ema_decay is not None
                   else config.training.ema_decay),
        loss_kwargs=(dict(sigma_alpha=float(args.loss_sigma_alpha))
                     if args.loss_sigma_alpha else None),
        ema_warm_start_steps=config.training.ema_warm_start_steps,
        log_freq=config.training.log_freq,
        save_model_every_n_epoch=config.training.save_model_every_n_epoch,
        log_dir=log_dir, seed=config.seed, mesh=mesh,
        checkpointer=Checkpointer(os.path.join(log_dir, "ckpts")),
        sample_hook=sample_hook, sample_freq=sample_freq,
        avg_tail=int(args.avg_tail), probe_hook=probe_hook)


if __name__ == "__main__":
    coordinator(parser.parse_args())

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
parser.add_argument("--train_model_on", default="ellipses", choices=["ellipses"])
parser.add_argument("--epochs", default=None, help="override config epochs")
parser.add_argument("--steps_per_epoch", default=None,
                    help="override steps per epoch (default: dataset length / batch)")
parser.add_argument("--batch_size", default=None)
parser.add_argument("--im_size", default=None, help="override image size")
parser.add_argument("--lr", default=None, help="override learning rate")
parser.add_argument("--num_channels", default=None, help="override model width")
parser.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                    help="compute dtype (params stay fp32)")
parser.add_argument("--grad_clip", default=None,
                    help="global-norm gradient clipping (extension; the "
                    "sigma-weighted DSM loss has heavy-tailed gradients)")

parser.add_argument("--debug_nans", action="store_true",
                    help="enable jax_debug_nans (fail at the first NaN)")


def coordinator(args):
    import jax

    if getattr(args, "debug_nans", False):
        # NaN debugging (SURVEY.md §5.2): fail fast at the producing op
        jax.config.update("jax_debug_nans", True)
    import numpy as np

    import diffusion_models_dev_project_tpu.factory as F
    from diffusion_models_dev_project_tpu.configs.disk_ellipses_configs import get_config
    from diffusion_models_dev_project_tpu.parallel.mesh import make_mesh
    from diffusion_models_dev_project_tpu.training.trainer import train_score_model
    from diffusion_models_dev_project_tpu.utils.checkpoint import Checkpointer
    from diffusion_models_dev_project_tpu.utils.reporting import write_report

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

    sde = F.get_standard_sde(config)
    model, params, _ = F.get_standard_score(config, sde, load_model=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print("Number of parameters:", n_params)

    # versioned run dir (reference run_score_based_models_train.py:59-69)
    log_dir = os.path.join(args.base_path, "DiskEllipses", config.sde.type)
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

    train_score_model(
        apply_fn, params, sde, batches,
        epochs=config.training.epochs,
        steps_per_epoch=steps_per_epoch,
        lr=float(config.training.lr),
        grad_clip=float(args.grad_clip) if args.grad_clip else None,
        ema_decay=config.training.ema_decay,
        ema_warm_start_steps=config.training.ema_warm_start_steps,
        log_freq=config.training.log_freq,
        save_model_every_n_epoch=config.training.save_model_every_n_epoch,
        log_dir=log_dir, seed=config.seed, mesh=mesh,
        checkpointer=Checkpointer(os.path.join(log_dir, "ckpts")))


if __name__ == "__main__":
    coordinator(parser.parse_args())

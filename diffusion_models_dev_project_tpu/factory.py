"""Experiment factory: the composition root of the framework.

TPU-native counterpart of `/root/reference/src/utils/exp_utils.py:22-478` —
the name->object dispatch that wires configs into SDEs, models, operators,
datasets, samplers and output paths.  Re-exported from the package root as
the de-facto public API, like the reference's `src/__init__.py`.

Fixed reference warts (SURVEY.md §7) rather than replicated: the
`init_chain_fn` TypeError path (exp_utils.py:218), the `model_type` kwarg
mismatch, the missing-splat `im_shape=[1, _shape]` in the VE/VP naive/DPS
branches (exp_utils.py:137,148), and the undefined
`get_one_ellipses_dataset` fallback.
"""
from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configs import aapm_configs, disk_ellipses_configs, walnut_configs
from .data.aapm import AAPMDataset
from .data.ellipses import get_disk_dist_ellipses_dataset
from .models.unet import UNetModel, create_model_config
from .ops.sde import SDE, get_standard_sde  # noqa: F401 (re-export)
from .physics.ray_trafo import RayTransform, make_parallel_beam_trafo
from .physics.simulation import simulate
from .sampling.engine import get_standard_sampler  # noqa: F401  (re-export)
from .sampling.adaptation import get_standard_adapted_sampler  # noqa: F401

__all__ = [
    "get_standard_sde", "get_standard_score", "get_standard_ray_trafo",
    "get_standard_dataset", "get_standard_train_dataset",
    "get_data_from_ground_truth", "get_standard_configs",
    "get_standard_dataset_configs", "get_standard_path", "get_standard_sampler",
    "get_standard_adapted_sampler",
]


# ----------------------------------------------------------------- score
def get_standard_score(config, sde: SDE, use_ema: bool = False,
                       load_model: bool = True, ckpt_path: Optional[str] = None,
                       lora_rank: int = 0, lora_include_blocks=None):
    """Build the UNet and (optionally) load a checkpoint.

    Mirrors exp_utils.py:22-38.  Returns `(model, params, score_fn)` where
    `score_fn(x, t)` closes over the loaded parameters.  Supported
    checkpoint formats: reference torch `.pt` (raw state_dict or EMA state,
    converted via `models.torch_convert`) and our orbax TrainState dirs.
    For adapted sampling pass `lora_rank` (+ optional include blocks) so the
    model carries LoRA branches (the checkpoint layout is unaffected).
    """
    import dataclasses as _dc

    cfg = create_model_config(config.model)
    if lora_rank:
        overrides = dict(lora_rank=int(lora_rank))
        if lora_include_blocks is not None:
            overrides["lora_include_blocks"] = tuple(lora_include_blocks)
        cfg = _dc.replace(cfg, **overrides)
    model = UNetModel(cfg)
    ckpt_path = ckpt_path or config.get("ckpt_path", None)
    if load_model and ckpt_path:
        params = _load_params(str(ckpt_path), cfg, use_ema)
        print(f"Model ckpt loaded from {ckpt_path}")
    else:
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
        # jit the init: ONE compiled program instead of one per param shape
        # (eager init costs minutes for the 256^2 model)
        params = jax.jit(model.init)(jax.random.PRNGKey(config.seed or 0), x,
                                     jnp.zeros((1,)))["params"]

    def score_fn(x, t):
        return model.apply({"params": params}, x, t)

    return model, params, score_fn


def _load_params(path: str, cfg, use_ema: bool):
    if path.endswith(".pt"):
        from .models.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(path, cfg, use_ema=use_ema or None)
    if os.path.isdir(path):
        # orbax checkpoint of a TrainState
        from .utils.checkpoint import Checkpointer

        ckpt = Checkpointer(path)
        state = ckpt.restore(template=None)
        if state is None:
            raise FileNotFoundError(f"no checkpoint found under {path}")
        tree = state["ema"]["shadow"] if use_ema else state["params"]
        return jax.tree_util.tree_map(jnp.asarray, tree)
    if path.endswith(".npz"):
        import flax

        with open(path, "rb") as f:
            tree = flax.serialization.msgpack_restore(f.read())
        # shipped checkpoints store fp16/bf16 to stay git-sized
        # (checkpoints/*.msgpack.npz); compute wants fp32 masters
        return jax.tree_util.tree_map(
            lambda a: (jnp.asarray(a, jnp.float32)
                       if a.dtype in (np.float16, jnp.bfloat16)
                       else jnp.asarray(a)), tree)
    raise ValueError(f"unrecognized checkpoint format: {path}")


# ----------------------------------------------------------------- physics
def get_standard_ray_trafo(config) -> RayTransform:
    """Mirrors exp_utils.py:297-320."""
    name = config.forward_op.trafo_name.lower()
    if name == "simple_trafo":
        return make_parallel_beam_trafo(
            (config.data.im_size, config.data.im_size),
            config.forward_op.num_angles,
            impl=config.forward_op.get("impl", "fft"))
    if name == "walnut_trafo":
        from .physics.walnut import get_walnut_2d_ray_trafo

        return get_walnut_2d_ray_trafo(
            data_path=config.data.data_path,
            matrix_path=config.data.data_path,
            walnut_id=config.data.walnut_id,
            orbit_id=config.forward_op.orbit_id,
            angular_sub_sampling=config.forward_op.angular_sub_sampling,
            proj_col_sub_sampling=config.forward_op.proj_col_sub_sampling,
            new_shape=tuple(config.data.new_shape),
            impl=config.forward_op.get("impl", "dense"))
    raise NotImplementedError(name)


def get_data_from_ground_truth(ground_truth: jnp.ndarray, ray_trafo: RayTransform,
                               white_noise_rel_stddev: float, key: jax.Array):
    """(gt, observation, fbp) triplet (exp_utils.py:322-332); NHWC."""
    if ground_truth.ndim == 3:
        ground_truth = ground_truth[None]
    observation = simulate(key, ground_truth, ray_trafo, white_noise_rel_stddev)
    filtbackproj = ray_trafo.fbp(observation)
    return ground_truth, observation, filtbackproj


# ----------------------------------------------------------------- datasets
def get_standard_dataset(config, ray_trafo: Optional[RayTransform] = None):
    """Evaluation dataset dispatch (exp_utils.py:334-362).

    Yields NHWC ground-truth images (or (obs, gt, fbp) triplets for walnut).
    """
    name = config.data.name.lower()
    if name == "diskdistributedellipsesdataset":
        pre = _presaved_ellipses_path(config)
        if pre is not None:
            arr = np.load(pre)["images"]  # (N, H, W, 1)
            return [arr[i] for i in range(arr.shape[0])]
        return get_disk_dist_ellipses_dataset(
            fold="test", im_size=config.data.im_size,
            length=config.data.val_length, diameter=config.data.diameter,
            max_n_ellipse=config.data.num_n_ellipse)
    if name == "walnut":
        from .data.walnut import get_walnut_data

        return get_walnut_data(config, ray_trafo)
    if name == "aapm":
        return AAPMDataset(part=config.data.part, base_path=config.data.base_path)
    raise NotImplementedError(name)


def _presaved_ellipses_path(config) -> Optional[str]:
    """Pre-saved deterministic val/test sets at 256² (exp_utils.py:336-345).

    We ship the reference's 10-image val set converted to npz (see
    `scripts/convert_reference_valset.py`).
    """
    if config.data.im_size != 256:
        return None
    here = os.path.join(os.path.dirname(__file__), "..", "data_assets")
    path = os.path.join(here, f"disk_ellipses_{config.data.part}_256.npz")
    return path if os.path.exists(path) else None


def get_standard_train_dataset(config):
    """Training data iterator (exp_utils.py:364-393): on-device batches."""
    if config.data.name.lower() == "diskdistributedellipsesdataset":
        ds = get_disk_dist_ellipses_dataset(
            fold="train", im_size=config.data.im_size, length=config.data.length,
            diameter=config.data.diameter, max_n_ellipse=config.data.num_n_ellipse)
        return ds, ds.batches(config.training.batch_size)
    if config.data.name.lower() == "aapm":
        # extension: the reference's AAPM prior arrives pretrained
        # (aapm.py:21); here the train fold is every non-test, non-val slice
        ds = AAPMDataset(part="train", base_path=config.data.base_path)
        return ds, ds.batches(config.training.batch_size)
    raise NotImplementedError(config.data.name)


# ----------------------------------------------------------------- configs
_CONFIG_MODULES = {
    "ellipses": disk_ellipses_configs,
    "aapm": aapm_configs,
    "walnut": walnut_configs,
}


def get_standard_configs(args):
    """Two-axis config resolution (exp_utils.py:395-424): the model config
    comes from `--model_learned_on`, the data config from `--dataset`,
    enabling the OOD train-on-X/test-on-Y matrix."""
    model_on = args.model_learned_on.lower()
    if model_on not in ("ellipses", "aapm"):
        raise NotImplementedError(model_on)
    config = _CONFIG_MODULES[model_on].get_config(args.sde.lower())
    config.ckpt_path = getattr(args, "load_path", None)
    dataconfig = _CONFIG_MODULES[args.dataset.lower()].get_config(args.sde.lower())
    return config, dataconfig


def get_standard_dataset_configs(args):
    return _CONFIG_MODULES[args.dataset.lower()].get_config(args.sde.lower())


# ----------------------------------------------------------------- paths
def get_standard_path(args, run_type: Optional[str] = None,
                      data_part: Optional[str] = None) -> Path:
    """Output-path convention encoding hyperparameters (exp_utils.py:440-478)."""
    path = os.path.join("./outputs", f"{args.model_learned_on}_{args.dataset}")
    if data_part is not None:
        path = os.path.join(path, data_part)
    if run_type == "adapt":
        path = os.path.join(path, "adapt", f"adaptation={args.adaptation}",
                            f"dc_type={args.dc_type}", f"num_steps={args.num_steps}",
                            f"num_optim_step={args.num_optim_step}",
                            f"tv_penalty{args.tv_penalty}")
    elif run_type == "dds":
        path = os.path.join(path, run_type, f"num_steps={args.num_steps}",
                            f"cg_iter={args.cg_iter}", f"gamma={args.gamma}")
    elif run_type in ("dps", "naive"):
        path = os.path.join(path, run_type, f"num_steps={args.num_steps}",
                            f"penalty={args.penalty}")
    if args.dataset != "walnut" and getattr(args, "stddev", None) is not None:
        path = os.path.join(path, f"noise_level={args.stddev}")
    return Path(os.path.join(path, time.strftime("%d-%m-%Y-%H-%M-%S")))

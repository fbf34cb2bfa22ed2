"""Base experiment configuration tree.

Same schema and defaults as the reference config system
(`/root/reference/configs/default_config.py:3-67`): sections `sde`,
`training`, `validation`, `sampling`, `data`, `forward_op`, `model`.
`device` is dropped (JAX manages devices); `seed` feeds `jax.random` keys.
"""
from __future__ import annotations

import ml_collections


def get_default_configs(sde: str) -> ml_collections.ConfigDict:
    sde = sde.lower()
    config = ml_collections.ConfigDict()
    config.seed = 1

    config.sde = sde_cfg = ml_collections.ConfigDict()
    sde_cfg.type = sde
    if sde in ("vesde", "vpsde"):
        # sigma_max ~ max pairwise distance of the data (Technique 1 of
        # arXiv:2006.09011), as in the reference
        sde_cfg.sigma_min = 0.01
        sde_cfg.sigma_max = 100.0
        sde_cfg.beta_min = 0.1
        sde_cfg.beta_max = 10.0
    elif sde == "ddpm":
        sde_cfg.beta_min = 0.0001
        sde_cfg.beta_max = 0.02
        sde_cfg.num_steps = 1000
    else:
        raise NotImplementedError(sde)

    config.training = training = ml_collections.ConfigDict()
    training.batch_size = 3
    training.epochs = 100
    training.log_freq = 25
    training.lr = 1e-4
    training.ema_decay = 0.999
    training.ema_warm_start_steps = 400
    training.save_model_every_n_epoch = 25

    config.validation = validation = ml_collections.ConfigDict()
    validation.batch_size = 6
    validation.snr = 0.05
    validation.num_steps = 100 if sde == "ddpm" else 500
    validation.eps = 1e-3
    validation.sample_freq = 0

    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.batch_size = 1
    sampling.eps = 1e-3
    if sde == "ddpm":
        sampling.travel_length = 1
        sampling.travel_repeat = 1

    config.data = ml_collections.ConfigDict()
    config.forward_op = ml_collections.ConfigDict()

    config.model = model = ml_collections.ConfigDict()
    # kept for config parity; the UNet always uses max_period=10000 like the
    # reference (create_model drops this key, exp_utils.py:40-96)
    model.max_period = 1e4 if sde == "ddpm" else 0.005

    return config

"""Steerable test-time adaptation (LoRA), fully compiled.

TPU-native re-design of the reference adaptation subsystem
(`/root/reference/src/samplers/adaptation.py:7-52`,
`src/samplers/utils.py:220-336`, `src/third_party_models/lora_diffusion/
lora.py`):

- LoRA is NOT module surgery: low-rank weights live in a separate `lora`
  variable collection of the same UNet (models/unet.py `LoRAConv`/
  `LoRADense`), and the runtime `lora_scale` argument replaces the
  reference's in-place `_tune_lora_scale(0/1)` toggling
  (samplers/utils.py:262-278) without recompilation.
- The trainable subtree — LoRA weights + every non-emb bias, matching
  `_score_model_adpt(impl='lora')` (adaptation.py:33-43) — is split out of
  the frozen params as an explicit pytree and optimized with a FRESH Adam
  per adaptation call (the reference constructs `torch.optim.Adam` inside
  `_adapt`, samplers/utils.py:240) — `optax.adam` state initialized inside
  the step.
- The whole sampler — outer reverse-diffusion loop, `adapt_freq` gating
  (`lax.cond`), the inner `num_optim_step` Adam loop (`lax.scan`), the two
  score forwards per step, CG data consistency and the DDIM update — is ONE
  jitted program; the reference runs ~`num_steps × (num_optim_step + 2)`
  separate CUDA-launch regions from Python.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from ..ops.cg import cg
from ..ops.diffusion import ddim, tweedy
from ..ops.sde import SDE
from .engine import SamplerSpec, _time_arrays

__all__ = ["tv_loss", "split_adapt_params", "merge_adapt_params", "init_lora",
           "AdaptSpec", "AdaptedSampler", "get_standard_adapted_sampler"]


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Anisotropic total variation with the reference's corner cropping
    (adaptation.py:7-11).  `x` is NHWC; derivatives run over H (axis 1) and
    W (axis 2)."""
    dw = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])       # torch dh: last axis
    dh = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])       # torch dw
    return jnp.sum(dw[:, :-1, :, :] + dh[:, :, :-1, :])


# ------------------------------------------------------------- param split
def _is_adapt_bias(path: Tuple[str, ...]) -> bool:
    """Reference rule: every '.bias' param is trainable except the ResBlock
    time-embedding projection ('emb_layers', adaptation.py:39-41) — named
    'emb' in our module tree."""
    return path[-1] == "bias" and "emb" not in path[:-1]


def _is_adapt_param(path: Tuple[str, ...], impl: str) -> bool:
    """Trainable-set predicate per adaptation strategy
    (reference `_score_model_adpt`, adaptation.py:14-52):

    - 'full'    — every parameter (adaptation.py:23-25),
    - 'decoder' — `score.out` + `score.output_blocks` minus emb_layers
      (adaptation.py:26-31); in our module tree those are the `out_*`
      blocks plus `final_norm`/`final_conv`,
    - 'lora'    — non-emb biases (the LoRA collection itself is carried
      separately, adaptation.py:32-43).
    """
    if impl == "full":
        return True
    if impl == "decoder":
        in_decoder = path[0].startswith("out_") or path[0] in ("final_norm",
                                                               "final_conv")
        return in_decoder and "emb" not in path[:-1]
    if impl == "lora":
        return _is_adapt_bias(path)
    raise NotImplementedError(impl)  # 'dif-fit' raises in the reference too


def split_adapt_params(params: Dict, impl: str = "lora") -> Tuple[Dict, Dict]:
    """Split a Flax param tree into (trainable, frozen rest) for the given
    adaptation strategy, both as flat {path: array} dicts."""
    flat = traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items() if _is_adapt_param(k, impl)}
    frozen = {k: v for k, v in flat.items() if not _is_adapt_param(k, impl)}
    return train, frozen


def merge_adapt_params(frozen_flat: Dict, biases_flat: Dict) -> Dict:
    return traverse_util.unflatten_dict({**frozen_flat, **biases_flat})


def init_lora(model, cfg, seed: int = 0) -> Dict:
    """Initialize the `lora` collection for `model` (rank taken from its
    config): down ~ N(0, 1/r²) (lora.py:29,107), up = 0, so the branch is an
    exact no-op before adaptation.  Values are drawn host-side with numpy
    (the init distribution matters, device RNG parity does not)."""
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
    t = jnp.zeros((1,))
    shapes = jax.eval_shape(
        model.init, {"params": jax.random.PRNGKey(0),
                     "lora": jax.random.PRNGKey(0)}, x, t)["lora"]
    rng = np.random.default_rng(seed)
    flat = traverse_util.flatten_dict(shapes)
    out = {}
    for path, leaf in flat.items():
        if path[-1] == "down":
            out[path] = jnp.asarray(
                rng.normal(0.0, 1.0 / cfg.lora_rank, leaf.shape).astype(np.float32))
        else:
            out[path] = jnp.zeros(leaf.shape, jnp.float32)
    return traverse_util.unflatten_dict(out)


# ------------------------------------------------------------- sampler
@dataclasses.dataclass(frozen=True)
class AdaptSpec:
    """Adaptation hyper-parameters (reference run_adapted_sampling.py:20-37)."""

    num_optim_step: int = 10
    adapt_freq: int = 1
    lr: float = 1e-3
    tv_penalty: float = 1e-6
    gamma: float = 0.01
    dc_type: str = "cg"            # 'cg' | 'gd' | 'none'
    add_cg: bool = False
    cg_iter: int = 1
    impl: str = "lora"             # 'lora' | 'full' | 'decoder'


class AdaptedSampler:
    """Adapted (steerable) DDIM sampler: one jitted two-level scan.

    Reference counterpart: `BaseSampler` + `adapted_ddim_sde_predictor` +
    `_adapt` (base_sampler.py:34-124, samplers/utils.py:220-336).
    """

    def __init__(self, model, params: Dict, lora: Dict, sde: SDE,
                 spec: SamplerSpec, adapt: AdaptSpec, ray_trafo,
                 observation: jnp.ndarray,
                 ground_truth: Optional[jnp.ndarray] = None):
        self.model = model
        self.sde = sde
        self.spec = spec
        self.adapt = adapt
        if adapt.dc_type == "cg" and hasattr(ray_trafo, "with_gram"):
            ray_trafo = ray_trafo.with_gram()    # fused AᵀA for the CG loop
        self.ray_trafo = ray_trafo
        self.observation = observation
        self.ground_truth = ground_truth
        self.params = params
        self.lora = lora
        self.rhs = ray_trafo.adjoint(observation)
        self._compiled = None
        self._compiled_batched = None

    # --------------------------------------------------------------- score
    def _score(self, frozen_flat, trainable, x, t, scale):
        merged = merge_adapt_params(frozen_flat, trainable["bias"])
        if "lora" in trainable:
            return self.model.apply(
                {"params": merged, "lora": trainable["lora"]}, x, t,
                lora_scale=scale)
        # full/decoder strategies carry no LoRA collection; the reference's
        # `_tune_lora_scale(0)` prior-direction toggle is a no-op there
        # (`_has_lora` is falsy, samplers/utils.py:323-328), so `scale` is
        # ignored and the DDIM direction uses the adapted score.
        return self.model.apply({"params": merged}, x, t)

    def _data_consistency(self, trafo, rhs, xhat0, dc_type: str, n_iter: int):
        """xhat0 -> data-consistent xhat (samplers/utils.py:244-252,310-319)."""
        gamma = self.adapt.gamma
        A, At = trafo.apply, trafo.adjoint
        if dc_type == "cg":
            if getattr(trafo, "gram_q", None) is not None:
                op = lambda z: z + gamma * trafo.gram(z)   # fused AᵀA
            else:
                op = lambda z: z + gamma * At(A(z))
            return cg(op, xhat0, xhat0 + gamma * rhs, n_iter=n_iter)
        if dc_type == "gd":
            return xhat0 - gamma * At(A(xhat0)) + gamma * rhs
        if dc_type == "none":
            return xhat0
        raise NotImplementedError(dc_type)

    def _lloss(self, trafo, observation, xhat):
        """mean((A x - y)^2) + tv_penalty * TV (exp_utils.py:256-257)."""
        resid = trafo.apply(xhat) - observation
        return jnp.mean(resid ** 2) + self.adapt.tv_penalty * tv_loss(xhat)

    # --------------------------------------------------------------- adapt
    def _adapt_fn(self, env, trainable, x, t):
        """Inner optimization: fresh Adam over (lora, biases) through
        score -> Tweedie -> data consistency -> loss (samplers/utils.py:220-260)."""
        ad = self.adapt
        frozen, trafo, rhs, observation = env
        opt = optax.adam(ad.lr)

        def loss_fn(tr):
            s = self._score(frozen, tr, x, t, 1.0)
            xhat0 = tweedy(s, x, self.sde, t)
            xhat = self._data_consistency(trafo, rhs, xhat0, ad.dc_type,
                                          ad.cg_iter)
            return self._lloss(trafo, observation, xhat)

        def body(carry, _):
            tr, opt_state = carry
            grads = jax.grad(loss_fn)(tr)
            updates, opt_state = opt.update(grads, opt_state, tr)
            return (optax.apply_updates(tr, updates), opt_state), None

        (trainable, _), _ = jax.lax.scan(
            body, (trainable, opt.init(trainable)), None,
            length=ad.num_optim_step)
        return trainable

    # --------------------------------------------------------------- sample
    def _build_run(self, gt):
        """The pure (key, trainable, env) -> (x_mean, trace) program; reused
        by the single-image jit and the vmapped multi-image path."""
        spec, ad, sde = self.spec, self.adapt, self.sde
        ts, tps, _, _ = _time_arrays(sde, spec)
        b = spec.batch_size
        shape = (b, *spec.im_shape)

        def run(key, trainable, env):
            frozen, trafo, rhs, observation = env
            key, init_key = jax.random.split(key)
            x = sde.prior_sampling(init_key, shape)

            def body(carry, step_data):
                x, trainable, key = carry
                t, t_prev, idx = step_data
                key, sub = jax.random.split(key)
                tvec = jnp.full((b,), t)
                tpvec = jnp.full((b,), t_prev)

                trainable = jax.lax.cond(
                    idx % ad.adapt_freq == 0,
                    lambda tr: self._adapt_fn(env, tr, x, tvec),
                    lambda tr: tr, trainable)

                # adapted score drives the denoised estimate ...
                s_adapt = self._score(frozen, trainable, x, tvec, 1.0)
                xhat0 = tweedy(s_adapt, x, sde, tvec)
                xhat = (self._data_consistency(trafo, rhs, xhat0, ad.dc_type,
                                               ad.cg_iter)
                        if ad.add_cg else xhat0)
                # ... the PRIOR score (lora off) drives the DDIM direction
                # (samplers/utils.py:321-325)
                s_prior = self._score(frozen, trainable, x, tvec, 0.0)
                x_next = ddim(sde, s_prior, xhat, tvec, tpvec, spec.eta, sub,
                              use_simplified_eqn=spec.use_simplified_eqn)

                if gt is not None:
                    mse = jnp.mean((xhat0[0, ..., 0] - gt[0, ..., 0]) ** 2)
                    rng_ = jnp.max(gt) - jnp.min(gt)
                    psnr = 20 * jnp.log10(rng_) - 10 * jnp.log10(mse)
                else:
                    psnr = jnp.float32(0.0)
                return (x_next, trainable, key), psnr

            steps = (jnp.asarray(ts), jnp.asarray(tps),
                     jnp.arange(len(ts), dtype=jnp.int32))
            (x, trainable, _), trace = jax.lax.scan(
                body, (x, trainable, key), steps)
            # final reconstruction = last Tweedie under the adapted score
            t_last = jnp.full((b,), ts[-1])
            s = self._score(frozen, trainable, x, t_last, 1.0)
            return tweedy(s, x, sde, t_last), trace

        return run

    def sample(self, key: jax.Array, return_trace: bool = False):
        biases, frozen0 = split_adapt_params(self.params, self.adapt.impl)
        trainable0 = {"bias": biases}
        if self.lora is not None:
            trainable0["lora"] = self.lora
        env = (frozen0, self.ray_trafo, self.rhs, self.observation)
        if self._compiled is None:
            self._compiled = jax.jit(self._build_run(self.ground_truth))
        x_mean, trace = self._compiled(key, trainable0, env)
        return (x_mean, trace) if return_trace else (x_mean, None)

    def sample_batched(self, keys: jax.Array, observations: jnp.ndarray,
                       mesh=None, lora_stack=None):
        """Adapt-and-sample several images in ONE compiled program.

        Each image keeps its OWN LoRA/bias subtree and Adam state (the
        reference's per-image model reload, run_adapted_sampling.py:102-105):
        the single-image program is `jax.vmap`ped over the image axis, so
        adaptation never couples images.  With `mesh`, the image axis is
        sharded over the mesh's 'data' axis — the multi-chip adapted-eval
        mode symmetric to `DiffusionSampler.sample(mesh=...)`.

        Parameters
        ----------
        keys : (N,) stacked PRNG keys, one per image (per-image seeding).
        observations : (N, *obs_shape) stacked per-image observations, each
            row an observation of the sampler's usual shape.
        lora_stack : optional (N, ...) stacked per-image LoRA trees (one
            `init_lora(seed=i)` per image, stacked on axis 0) — the batched
            counterpart of the serial path's per-image re-init.  Without it
            every image starts from the sampler's single shared LoRA init.
        """
        biases, frozen0 = split_adapt_params(self.params, self.adapt.impl)
        stacked = lora_stack is not None
        trainable0 = {"bias": biases}
        tr_axes = {"bias": None}
        if self.lora is not None or stacked:
            trainable0["lora"] = lora_stack if stacked else self.lora
            tr_axes["lora"] = 0 if stacked else None
        rhs = jax.vmap(self.ray_trafo.adjoint)(observations)
        cache_key = (stacked, None if mesh is None
                     else tuple(sorted(mesh.shape.items())))
        if self._compiled_batched is None or \
                self._compiled_batched[0] != cache_key:
            run_b = jax.vmap(self._build_run(gt=None),
                             in_axes=(0, tr_axes, (None, None, 0, 0)))
            if mesh is None:
                self._compiled_batched = (cache_key, jax.jit(run_b))
            else:
                # vmap folds the per-image LoRA kernels into ONE
                # feature-grouped conv (group = image); GSPMD cannot
                # partition a grouped conv along its group axis, so shard
                # the image axis with shard_map instead — each device runs
                # a LOCAL vmap over its images and no grouped conv ever
                # crosses shards.
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                n = observations.shape[0]
                assert n % mesh.shape["data"] == 0, (n, dict(mesh.shape))
                tr_specs = {"bias": P()}
                if "lora" in trainable0:
                    tr_specs["lora"] = P("data") if stacked else P()
                self._compiled_batched = (cache_key, jax.jit(shard_map(
                    run_b, mesh=mesh,
                    in_specs=(P("data"), tr_specs,
                              (P(), P(), P("data"), P("data"))),
                    out_specs=(P("data"), P("data")),
                    check_vma=False)))
        x_mean, trace = self._compiled_batched[1](
            keys, trainable0, (frozen0, self.ray_trafo, rhs, observations))
        return x_mean


def get_standard_adapted_sampler(
    method: str, model, params: Dict, sde: SDE, ray_trafo, observation,
    *, num_steps: int = 50, batch_size: int = 1, im_shape=None,
    eps: float = 1e-3, eta: float = 0.85, gamma: float = 0.01,
    tv_penalty: float = 1e-6, lr: float = 1e-3, num_optim_step: int = 10,
    adapt_freq: int = 1, lora_rank: int = 4,
    lora_include_blocks=("input_blocks", "middle_block", "output_blocks", "out"),
    add_cg: bool = False, dc_type: str = "cg", cg_iter: int = 1,
    early_stopping_pct: Optional[float] = None, travel_length: int = 1,
    travel_repeat: int = 1, ground_truth=None, lora_seed: int = 0,
    adaptation: str = "lora",
) -> AdaptedSampler:
    """Factory mirroring reference `get_standard_adapted_sampler`
    (exp_utils.py:225-295).  For `adaptation='lora'` the `model` must be
    built with `lora_rank=lora_rank` in its UNetConfig; a fresh LoRA tree is
    initialized here, so each per-image sampler starts unadapted (replacing
    the reference's model reload per image, run_adapted_sampling.py:102-105).
    For 'full'/'decoder' (reference adaptation.py:23-31) the model carries
    no LoRA collection and the respective parameter subset is trainable.
    """
    if method.lower() != "dds":
        raise NotImplementedError(method)    # exp_utils.py:269-270
    if im_shape is None:
        h, w = ray_trafo.model_im_shape
        im_shape = (h, w, 1)
    cfg = model.cfg
    if adaptation == "lora":
        assert cfg.lora_rank == int(lora_rank), (cfg.lora_rank, lora_rank)
        assert tuple(cfg.lora_include_blocks) == tuple(lora_include_blocks)
    else:
        assert not cfg.lora_rank, (
            f"adaptation='{adaptation}' expects a model without LoRA "
            f"(lora_rank=0), got {cfg.lora_rank}")
    spec = SamplerSpec(
        method="adapted_dds", num_steps=int(num_steps), batch_size=batch_size,
        im_shape=tuple(im_shape), eps=float(eps), eta=float(eta),
        use_simplified_eqn=True, travel_length=travel_length,
        travel_repeat=travel_repeat,
        early_stopping_pct=(None if early_stopping_pct in (None, 1.0)
                            else float(early_stopping_pct)))
    adapt = AdaptSpec(
        num_optim_step=int(num_optim_step), adapt_freq=int(adapt_freq),
        lr=float(lr), tv_penalty=float(tv_penalty), gamma=float(gamma),
        dc_type=dc_type, add_cg=bool(add_cg), cg_iter=int(cg_iter),
        impl=adaptation)
    lora = (init_lora(model, cfg, seed=lora_seed)
            if adaptation == "lora" else None)
    return AdaptedSampler(model, params, lora, sde, spec, adapt, ray_trafo,
                          observation, ground_truth=ground_truth)

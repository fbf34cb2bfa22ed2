"""Reverse-diffusion sampling engine: one `lax.scan`, zero host round-trips.

TPU-native replacement for the reference's Python sampling loop
(`/root/reference/src/samplers/base_sampler.py:34-124`).  The per-step state
is a pytree carry `(x, x_mean, rng)`; the time grid, step sizes and
data-fit scales are precomputed host-side (they are static given the flags,
base_sampler.py:44-61) and scanned over as constant arrays.  Optional
in-graph PSNR tracing replaces the per-step `.cpu()` TensorBoard sync
(base_sampler.py:109-116) — the full trace is fetched once at the end.

The returned reconstruction is the final `x_mean` (for DDS that is the last
Tweedie estimate, matching base_sampler.py:124 + samplers/utils.py:218).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sde import SDE, DDPM
from ..ops.time_grids import ddpm_time_pairs, score_time_grid
from . import predictors as P

__all__ = ["SamplerSpec", "DiffusionSampler", "get_standard_sampler"]


_KNOWN_METHODS = ("naive", "dps", "dds", "uncond", "adapted_dds")


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    method: str                      # 'naive' | 'dps' | 'dds' | 'uncond'

    def __post_init__(self):
        if self.method not in _KNOWN_METHODS:
            raise NotImplementedError(
                f"unknown sampling method {self.method!r}; expected one of "
                f"{_KNOWN_METHODS}")
    num_steps: int = 1000
    batch_size: int = 1
    im_shape: Tuple[int, int, int] = (256, 256, 1)   # (H, W, C)
    eps: float = 1e-3
    start_time_step: int = 0
    # method hyper-parameters (reference run_conditional_sampling.py:19-24)
    penalty: float = 1.0
    gamma: float = 0.01
    eta: float = 0.15
    cg_iter: int = 5
    use_simplified_eqn: bool = True
    # Langevin corrector steps after each predictor step (the reference
    # parses --add_corrector_step but never wires it; here it works)
    corrector_steps: int = 0
    corrector_snr: float = 0.16
    # DDPM jump schedule (base_sampler.py:48-61)
    travel_length: int = 1
    travel_repeat: int = 1
    early_stopping_pct: Optional[float] = None
    # matmul precision for the CG data-consistency applies only (the rhs and
    # observation simulation keep the operator's own precision).  "high"
    # (bf16x3) measures PSNR-identical to full fp32 on the flagship protocol
    # at ~7% higher end-to-end throughput, so it is the default; "highest"
    # forces full fp32, "default" (pure bf16) is quality-destroying (14 dB,
    # BENCH.md round 3) and exists only for measurement.  None keeps the
    # operator's own precision.  Only operators exposing a `precision` field
    # (the FFT-shear projector) honor it.
    cg_precision: Optional[str] = "high"
    # data-consistency solver: "cg" = reference semantics (cg_iter CG
    # iterations, samplers/utils.py:188-189); "woodbury" = exact solve via
    # the sinogram-space Woodbury identity (ops/woodbury.py) — one
    # forward+adjoint + one precomputed matmul per step instead of
    # cg_iter+1 forward+adjoint pairs.  Requires a matrix-backed operator.
    dc_mode: str = "cg"


def _time_arrays(sde: SDE, spec: SamplerSpec):
    """Per-step (t, t_prev, datafitscale) arrays + step size, host-side."""
    if isinstance(sde, DDPM):
        pairs = ddpm_time_pairs(sde.num_steps, spec.num_steps, spec.travel_length,
                                spec.travel_repeat, spec.early_stopping_pct)
        ts = pairs[:, 0].astype(np.int32)
        tps = pairs[:, 1].astype(np.int32)
        dfs = np.ones(len(pairs), dtype=np.float32)
        step_size = 1.0
    else:
        grid = score_time_grid(spec.num_steps, spec.eps)
        step_size = float(grid[0] - grid[1])
        ts = grid
        # t_prev clamped at 0 so VP marginals stay defined on the final step;
        # the returned x_mean (last Tweedie) is unaffected.
        tps = np.maximum(grid - step_size, 0.0).astype(np.float32)
        dfs = (grid / spec.num_steps).astype(np.float32)  # base_sampler.py:105
    if spec.start_time_step:
        ts, tps, dfs = (a[spec.start_time_step:] for a in (ts, tps, dfs))
    return ts, tps, dfs, step_size


class DiffusionSampler:
    """Compiled conditional/unconditional sampler.

    Parameters
    ----------
    score_fn : (x, t) -> model output (score or epsilon), NHWC.
    sde : SDE instance.
    spec : SamplerSpec.
    ray_trafo, observation : physics operator and measured data (conditional).
    ground_truth : optional NHWC image enabling the in-graph PSNR trace.
    """

    def __init__(self, score_fn: Callable, sde: SDE, spec: SamplerSpec,
                 ray_trafo=None, observation: Optional[jnp.ndarray] = None,
                 ground_truth: Optional[jnp.ndarray] = None,
                 filtbackproj: Optional[jnp.ndarray] = None,
                 score_apply: Optional[Callable] = None,
                 score_params=None):
        """`score_fn(x, t)` is the simple closure API.  For large models
        prefer `score_apply(params, x, t)` + `score_params`: the params then
        enter the jitted program as runtime arguments instead of embedded
        constants (faster compile, no weight duplication)."""
        self.score_fn = score_fn
        self.score_apply = score_apply
        self.score_params = score_params
        self.sde = sde
        self.spec = spec
        if spec.method == "dds" and hasattr(ray_trafo, "with_gram"):
            # fused AᵀA tables for the CG loop (fft_radon.FFTRayTransform.gram)
            ray_trafo = ray_trafo.with_gram()
        self.ray_trafo = ray_trafo
        self.observation = observation
        self.ground_truth = ground_truth
        self.filtbackproj = filtbackproj
        if spec.method in ("naive", "dps") and sde.prediction_type == "score":
            assert observation is not None and ray_trafo is not None
        # rhs = Aᵀ y precomputed once (exp_utils.py:165,205)
        self.rhs = (ray_trafo.adjoint(observation)
                    if (observation is not None and ray_trafo is not None) else None)
        self.dc_sinv = None
        if spec.method == "dds" and spec.dc_mode == "woodbury":
            from ..ops.woodbury import build_woodbury_sinv

            assert hasattr(ray_trafo, "matrix"), (
                "dc_mode='woodbury' needs a matrix-backed operator "
                "(DenseRayTransform); got " + type(ray_trafo).__name__)
            self.dc_sinv = build_woodbury_sinv(ray_trafo, spec.gamma)
        # time grid is a pure function of (sde, spec), both fixed here (spec
        # is frozen) — computing it once in __init__ keeps _step free of
        # hidden state set as a side effect of ensure_compiled
        self._time_data = _time_arrays(sde, spec)
        self._step_size = self._time_data[3]
        self._compiled = None

    # ------------------------------------------------------------- steps
    def _step(self, score_fn, x, key, t, t_prev, datafitscale, trafo, rhs,
              observation, dc_sinv=None):
        spec, sde = self.spec, self.sde
        if spec.method == "uncond":
            if sde.prediction_type == "score":
                return P.euler_maruyama_step(score_fn, sde, x, key, t,
                                             self._step_size, nloglik=None)
            return P.wrapper_ddim_step(score_fn, sde, x, key, t, t_prev)
        if spec.method == "dds":
            if spec.cg_precision and hasattr(trafo, "precision"):
                trafo = dataclasses.replace(trafo, precision=spec.cg_precision)
            return P.dds_step(score_fn, sde, x, key, t, t_prev, rhs,
                              trafo, spec.gamma, spec.eta, spec.cg_iter,
                              spec.use_simplified_eqn,
                              observation=observation, dc_sinv=dc_sinv)
        nloglik = P.make_nloglik(trafo, observation)
        if isinstance(sde, DDPM):
            if spec.method == "dps":
                return P.ancestral_step(score_fn, sde, x, key, t, nloglik,
                                        spec.penalty)
            raise NotImplementedError(f"{spec.method} for DDPM")
        return P.euler_maruyama_step(
            score_fn, sde, x, key, t, self._step_size, nloglik=nloglik,
            datafitscale=datafitscale, penalty=spec.penalty,
            aTweedy=(spec.method == "dps"))

    # ------------------------------------------------------------- sample
    def ensure_compiled(self, mesh=None):
        """Build (once) and return the jitted reverse-diffusion program.

        Exposed so callers can AOT-lower it (`.lower(...).compile()`) for
        cost analysis without paying a second trace+compile — bench.py
        stores the resulting executable back into `self._compiled`.
        """
        spec = self.spec
        ts, tps, dfs, _ = self._time_data
        b = spec.batch_size
        shape = (b, *spec.im_shape)
        gt = self.ground_truth

        batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            assert b % mesh.shape["data"] == 0, (b, dict(mesh.shape))
            batch_sharding = NamedSharding(
                mesh, PartitionSpec("data", None, None, None))
        self._batch_sharding = batch_sharding
        self._reshard_batch()

        def run(key, params, trafo, rhs, observation, filtbackproj, dc_sinv):
            if self.score_apply is not None:
                score_fn = lambda xx, tt: self.score_apply(params, xx, tt)
            else:
                score_fn = self.score_fn
            key, init_key = jax.random.split(key)
            if spec.start_time_step > 0 and filtbackproj is not None:
                # chain init from FBP (reference `chain_simple_init`,
                # samplers/utils.py:381-394)
                t0 = jnp.full((b,), ts[0])
                std = self.sde.marginal_prob_std(t0).reshape(b, 1, 1, 1)
                x = filtbackproj + jax.random.normal(init_key, shape) * std
            else:
                x = self.sde.prior_sampling(init_key, shape)
            if batch_sharding is not None:
                x = jax.lax.with_sharding_constraint(x, batch_sharding)

            def body(carry, step_data):
                x, _, key = carry
                t, t_prev, dfs = step_data
                key, sub = jax.random.split(key)
                tvec = jnp.full((b,), t)
                tpvec = jnp.full((b,), t_prev)
                x_next, x_mean = self._step(score_fn, x, sub, tvec, tpvec, dfs,
                                            trafo, rhs, observation, dc_sinv)
                if spec.corrector_steps > 0 and self.sde.prediction_type == "score":
                    key, csub = jax.random.split(key)
                    nll = (P.make_nloglik(trafo, observation)
                           if spec.method in ("naive", "dps") else None)
                    x_next = P.langevin_corrector(
                        score_fn, self.sde, x_next, csub, tvec, nloglik=nll,
                        datafitscale=dfs, penalty=spec.penalty,
                        corrector_steps=spec.corrector_steps,
                        snr=spec.corrector_snr)
                if gt is not None:
                    mse = jnp.mean((x_mean[0, ..., 0] - gt[0, ..., 0]) ** 2)
                    rng_ = jnp.max(gt) - jnp.min(gt)
                    psnr = 20 * jnp.log10(rng_) - 10 * jnp.log10(mse)
                else:
                    psnr = jnp.float32(0.0)
                return (x_next, x_mean, key), psnr

            init = (x, jnp.zeros_like(x), key)
            (x, x_mean, _), trace = jax.lax.scan(body, init,
                                                 (jnp.asarray(ts), jnp.asarray(tps),
                                                  jnp.asarray(dfs)))
            return x_mean, trace

        if self._compiled is None:
            self._compiled = jax.jit(run)
        return self._compiled

    def _reshard_batch(self):
        """device_put the per-image inputs with the batch sharding (no-op
        when already placed or when sampling unsharded)."""
        sh = getattr(self, "_batch_sharding", None)
        if sh is None:
            return
        b = self.spec.batch_size

        def shard_b(v):
            return (jax.device_put(v, sh)
                    if (v is not None and getattr(v, "ndim", 0) == 4
                        and v.shape[0] == b) else v)

        self.observation = shard_b(self.observation)
        self.rhs = shard_b(self.rhs)
        self.filtbackproj = shard_b(self.filtbackproj)

    def sample(self, key: jax.Array, return_trace: bool = False, mesh=None):
        """Run the full reverse diffusion; returns (x_mean, trace|None).

        With `mesh`, the batch axis is sharded over the mesh's 'data' axis —
        the multi-chip evaluation mode (SURVEY.md §2.10: conditional sampling
        is embarrassingly parallel across images; stack per-image
        observations along the batch axis).  batch_size must divide by the
        mesh size; parameters and the physics operator stay replicated and
        XLA/GSPMD keeps every step collective-free.
        """
        compiled = self.ensure_compiled(mesh=mesh)
        self._reshard_batch()      # new per-image inputs since last call
        x_mean, trace = compiled(key, self.score_params, self.ray_trafo,
                                 self.rhs, self.observation,
                                 self.filtbackproj, self.dc_sinv)
        return (x_mean, trace) if return_trace else (x_mean, None)


def get_standard_sampler(method: str, score_fn, sde, ray_trafo, observation,
                         *, num_steps: int = 1000, batch_size: int = 1,
                         im_shape=None, eps: float = 1e-3, penalty: float = 1.0,
                         gamma: float = 0.01, eta: float = 0.15, cg_iter: int = 5,
                         pct_chain_elapsed: float = 0.0, travel_length: int = 1,
                         travel_repeat: int = 1, early_stopping_pct=None,
                         ground_truth=None, filtbackproj=None,
                         score_apply=None, score_params=None,
                         add_corrector_step: bool = False,
                         corrector_snr: float = 0.16,
                         cg_precision="high", dc_mode="cg") -> DiffusionSampler:
    """Factory mirroring reference `get_standard_sampler`
    (exp_utils.py:123-223) with the same defaults and flags."""
    import math

    if im_shape is None:
        h, w = ray_trafo.model_im_shape
        im_shape = (h, w, 1)
    spec = SamplerSpec(
        method=method.lower(), num_steps=int(num_steps), batch_size=batch_size,
        im_shape=tuple(im_shape), eps=eps, penalty=float(penalty),
        gamma=float(gamma), eta=float(eta), cg_iter=int(cg_iter),
        start_time_step=math.ceil(float(pct_chain_elapsed) * int(num_steps)),
        travel_length=travel_length, travel_repeat=travel_repeat,
        early_stopping_pct=early_stopping_pct, use_simplified_eqn=True,
        corrector_steps=1 if add_corrector_step else 0,
        corrector_snr=corrector_snr, cg_precision=cg_precision,
        dc_mode=dc_mode)
    return DiffusionSampler(score_fn, sde, spec, ray_trafo, observation,
                            ground_truth=ground_truth, filtbackproj=filtbackproj,
                            score_apply=score_apply, score_params=score_params)

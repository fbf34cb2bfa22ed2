"""Round-4 perf pause: UNet-forward variants + DDS sampler overhead.

Run on the real chip during a training pause (~10 min):

  PYTHONPATH=. python scripts/pause_perf_r4.py

Measures, scan-amortized (one jit, `--iters` iterations, single value
fetch — the relay adds ~25 ms per dispatch that would otherwise pollute
sub-ms op timings):

1. UNet forward at 256²/374M for the 2x2 variant grid
   {fp32, bf16 weight storage} x {XLA conv, im2col matmul for <=32² convs}
   — hypotheses: bf16 storage halves per-forward HBM weight traffic
   (~0.9 ms of a 13.8 ms forward), im2col fixes the ~6% MFU XLA conv
   schedule at 8²/16².
2. The DDS step with the UNet replaced by a free function — the true
   CG(5)+Tweedie+DDIM overhead per step (bench r3: 16.4 ms/step vs
   13.8 ms UNet => ~2.6 ms unaccounted).
"""
import argparse
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--iters", default=50, type=int)
parser.add_argument("--reps", default=3, type=int)
args = parser.parse_args()

import jax
import jax.numpy as jnp

from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig
from diffusion_models_dev_project_tpu.ops.sde import VESDE
from diffusion_models_dev_project_tpu.physics.ray_trafo import (
    make_parallel_beam_trafo)
from diffusion_models_dev_project_tpu.sampling.engine import (
    get_standard_sampler)


def scan_time(name, step_fn, x0, params):
    @jax.jit
    def run(x, p):
        def body(c, _):
            return step_fn(c, p), ()
        c, _ = jax.lax.scan(body, x, None, length=args.iters)
        return c

    out = run(x0, params)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = np.inf
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = run(x0, params)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    ms = best / args.iters * 1e3
    print(f"{name:<52s} {ms:8.3f} ms", flush=True)
    return ms


def unet_variants():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 256, 256, 1), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    base = dict(image_size=256, model_channels=256,
                channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=1,
                attention_resolutions=(16,), num_heads=4,
                num_head_channels=64, use_scale_shift_norm=True,
                resblock_updown=True, dtype="bfloat16")
    cfg = UNetConfig(**base)
    model = UNetModel(cfg)
    params32 = jax.jit(model.init)(key, x, t)["params"]
    # one jitted program — an eager tree_map costs ~0.5 s/leaf on the relay
    params16 = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        p))(params32)
    cfg_mm = UNetConfig(**base, small_conv_matmul=1024)
    model_mm = UNetModel(cfg_mm)
    for label, m, p in [
        ("UNet fwd fp32-store, XLA conv (r3 baseline)", model, params32),
        ("UNet fwd bf16-store, XLA conv", model, params16),
        ("UNet fwd fp32-store, im2col<=32^2", model_mm, params32),
        ("UNet fwd bf16-store, im2col<=32^2", model_mm, params16),
    ]:
        scan_time(label, lambda xx, pp, mm=m: mm.apply(
            {"params": pp}, xx, t)[..., :1], x, p)


def sampler_overhead():
    sde = VESDE(sigma_min=0.01, sigma_max=100.0)
    trafo = make_parallel_beam_trafo((256, 256), 60)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 256), np.linspace(-1, 1, 256),
                         indexing="ij")
    gt = np.exp(-((xx ** 2 + yy ** 2) / 0.2)).astype(np.float32)[None, :, :, None]
    obs = trafo.apply(jnp.asarray(gt))
    # "free" score: a single scalar multiply stands in for the UNet so the
    # scan measures pure CG+Tweedie+DDIM cost
    sampler = get_standard_sampler(
        "dds", None, sde, trafo, obs, num_steps=args.iters * 2,
        im_shape=(256, 256, 1), gamma=0.01, eta=0.15, cg_iter=5,
        score_apply=lambda p, x, t: x * p, score_params=jnp.float32(1e-3),
        cg_precision="high")
    key = jax.random.PRNGKey(0)
    x, _ = sampler.sample(key)
    float(jnp.sum(x))
    best = np.inf
    for _ in range(args.reps):
        t0 = time.perf_counter()
        x, _ = sampler.sample(key)
        float(jnp.sum(x))
        best = min(best, time.perf_counter() - t0)
    ms = best / (args.iters * 2) * 1e3
    print(f"{'DDS step, free score (CG5+Tweedie+DDIM only)':<52s} "
          f"{ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    unet_variants()
    sampler_overhead()

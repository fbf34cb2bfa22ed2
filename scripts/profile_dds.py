"""Component-time attribution for the headline DDS step (VERDICT r2 item 8).

jax.profiler device traces are unreliable through the TPU relay, so this
times each component of the DDS step (bench.py's 374M configuration) as its
own jitted program with fetch-forced completion:

  - UNet forward alone (the dominant FLOPs)
  - projector apply / adjoint alone
  - the full 5-iter CG data-consistency solve
  - Tweedie + DDIM elementwise tail
  - the composed DDS step, and a scan of N steps (amortized)

Deltas between rows localize the ~3.7 ms/step of non-UNet time measured in
round 2 (BENCH.md).  Run at an eval pause (one TPU process at a time).

Usage: PYTHONPATH=. python scripts/profile_dds.py [--num_channels 256]
           [--cg_iter 5] [--scan_steps 100]
"""
import argparse
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--num_channels", default=256, type=int)
parser.add_argument("--cg_iter", default=5, type=int)
parser.add_argument("--scan_steps", default=100, type=int)
parser.add_argument("--reps", default=20, type=int)
args = parser.parse_args()

import jax
import jax.numpy as jnp

from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig
from diffusion_models_dev_project_tpu.ops.cg import cg
from diffusion_models_dev_project_tpu.ops.diffusion import ddim, tweedy
from diffusion_models_dev_project_tpu.ops.sde import VESDE
from diffusion_models_dev_project_tpu.physics.ray_trafo import make_parallel_beam_trafo
from diffusion_models_dev_project_tpu.sampling.predictors import dds_step, make_dc_op


def bench(name, fn, *a, reps=args.reps, div=1):
    out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))   # warmup + fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps / div * 1e3
    print(f"{name:<42s} {dt:8.3f} ms")
    return dt


def main():
    cfg = UNetConfig(image_size=256, model_channels=args.num_channels,
                     channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=1,
                     attention_resolutions=(16,), num_heads=4,
                     num_head_channels=64, use_scale_shift_norm=True,
                     resblock_updown=True, dtype="bfloat16")
    model = UNetModel(cfg)
    x = jnp.zeros((1, 256, 256, 1))
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, jnp.zeros((1,)))["params"]
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda s: jnp.asarray(rng.normal(0.0, 0.02, s.shape).astype(s.dtype)), shapes)

    sde = VESDE(sigma_min=0.01, sigma_max=100.0)
    trafo = make_parallel_beam_trafo((256, 256), 60)
    xim = jnp.asarray(rng.normal(0.3, 0.2, (1, 256, 256, 1)).astype(np.float32))
    t = jnp.full((1,), 0.5)
    obs = trafo.apply(xim)
    rhs = trafo.adjoint(obs)
    key = jax.random.PRNGKey(0)

    unet = jax.jit(lambda p, xx, tt: model.apply({"params": p}, xx, tt))
    t_unet = bench("UNet forward (bf16)", unet, params, xim, t)

    ap = jax.jit(lambda tr, xx: tr.apply(xx))
    adj = jax.jit(lambda tr, yy: tr.adjoint(yy))
    t_ap = bench("projector apply", ap, trafo, xim)
    t_ad = bench("projector adjoint", adj, trafo, obs)

    cgj = jax.jit(lambda tr, x0, r: cg(make_dc_op(tr, 0.01), x0, r,
                                       n_iter=args.cg_iter))
    t_cg = bench(f"CG x{args.cg_iter} (I+gAtA)", cgj, trafo, xim, xim + 0.01 * rhs)

    s = unet(params, xim, t)
    tdj = jax.jit(lambda ss, xx, xh, kk: ddim(sde, ss, xh, t, t - 1e-3, 0.15,
                                              kk, use_simplified_eqn=True))
    t_tail = bench("tweedie+ddim elementwise", tdj, s, xim, xim, key)

    step = jax.jit(lambda p, tr, xx, kk, r: dds_step(
        lambda a, b: model.apply({"params": p}, a, b), sde, xx, kk, t,
        t - 1e-3, r, tr, 0.01, 0.15, args.cg_iter))
    t_step = bench("full DDS step (single)", step, params, trafo, xim, key, rhs)

    def scan_fn(p, tr, xx, kk, r):
        def body(carry, _):
            xx, kk = carry
            kk, sub = jax.random.split(kk)
            xn, _ = dds_step(lambda a, b: model.apply({"params": p}, a, b),
                             sde, xx, sub, t, t - 1e-3, r, tr, 0.01, 0.15,
                             args.cg_iter)
            return (xn, kk), None
        (xx, _), _ = jax.lax.scan(body, (xx, kk), None, length=args.scan_steps)
        return xx
    scan_j = jax.jit(scan_fn)
    t_scan = bench(f"DDS scan /step (x{args.scan_steps})", scan_j, params,
                   trafo, xim, key, rhs, reps=3, div=args.scan_steps)

    print("-" * 54)
    print(f"{'UNet share of scan step':<42s} {100 * t_unet / t_scan:7.1f} %")
    print(f"{'CG share of scan step':<42s} {100 * t_cg / t_scan:7.1f} %")
    print(f"{'unattributed (fusion/overhead)':<42s} "
          f"{100 * (t_scan - t_unet - t_cg - t_tail) / t_scan:7.1f} %")


if __name__ == "__main__":
    main()

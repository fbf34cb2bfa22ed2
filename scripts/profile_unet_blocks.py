"""Block-level time attribution inside the flagship UNet forward (r4 perf pass).

Answers: of the ~16.5 ms 256-channel 256^2 forward (BENCH.md r3), how much
is GroupNorm+SiLU, how much is conv MXU work, how much is everything else?
Method: time (a) the full forward, (b) the forward with GroupNorm32 patched
to identity, (c) standalone GN+SiLU and conv3x3 at each hot feature-map
shape, each as its own jitted program with fetch-forced completion
(block_until_ready is unreliable through the relay — CLAUDE.md).

Usage: PYTHONPATH=. python scripts/profile_unet_blocks.py [--num_channels 256]
"""
import argparse
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--num_channels", default=256, type=int)
parser.add_argument("--reps", default=30, type=int)
parser.add_argument("--batch", default=1, type=int)
args = parser.parse_args()

import jax
import jax.numpy as jnp
import flax.linen as nn

import diffusion_models_dev_project_tpu.models.unet as unet_mod
from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig


def timeit(name, fn, *a, reps=args.reps):
    out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:<52s} {dt:8.3f} ms")
    return dt


def build(cfg):
    model = UNetModel(cfg)
    x = jnp.zeros((args.batch, cfg.image_size, cfg.image_size, 1), jnp.float32)
    t = jnp.zeros((args.batch,), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)["params"]
    fwd = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))
    return model, params, fwd, x, t


def main():
    cfg = UNetConfig(image_size=256, model_channels=args.num_channels,
                     channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=1,
                     attention_resolutions=(16,), num_heads=4,
                     num_head_channels=64, use_scale_shift_norm=True,
                     resblock_updown=True, dtype="bfloat16")

    model, params, fwd, x, t = build(cfg)
    t_full = timeit("UNet fwd (full)", fwd, params, x, t)

    # --- GN share: patch _group_norm32 to a pure cast (keeps param tree) ---
    orig_gn = unet_mod._group_norm32
    unet_mod._group_norm32 = lambda x, s, b, num_groups=32, eps=1e-5: x
    model2, params2, fwd2, _, _ = build(cfg)
    t_nogn = timeit("UNet fwd (GroupNorm -> identity)", fwd2, params2, x, t)
    unet_mod._group_norm32 = orig_gn

    # --- SiLU share too ---
    orig_silu = jax.nn.silu
    unet_mod.jax.nn.silu = lambda x: x
    try:
        model3, params3, fwd3, _, _ = build(cfg)
        t_nosilu = timeit("UNet fwd (SiLU -> identity)", fwd3, params3, x, t)
    finally:
        unet_mod.jax.nn.silu = orig_silu

    print(f"\nGN cost in-net      : {t_full - t_nogn:8.3f} ms "
          f"({100*(t_full-t_nogn)/t_full:.1f}% of fwd)")
    print(f"SiLU cost in-net    : {t_full - t_nosilu:8.3f} ms")

    # --- standalone pieces at the hot shapes -------------------------------
    C = args.num_channels
    shapes = [(args.batch, 256, 256, C), (args.batch, 128, 128, C),
              (args.batch, 64, 64, 2 * C), (args.batch, 32, 32, 2 * C),
              (args.batch, 16, 16, 4 * C), (args.batch, 8, 8, 4 * C)]
    print("\nstandalone GN+SiLU / conv3x3 per shape (bf16):")
    from diffusion_models_dev_project_tpu.models.unet import _group_norm32

    for shp in shapes:
        b, h, w, c = shp
        xx = jnp.ones(shp, jnp.bfloat16)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        gn = jax.jit(lambda x, s, b_: jax.nn.silu(_group_norm32(x, s, b_)))
        t_gn = timeit(f"  GN+SiLU {shp}", gn, xx, sc, bi)
        conv = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], dtype=jnp.bfloat16)
        cp = jax.jit(conv.init)(jax.random.PRNGKey(0), xx)
        cf = jax.jit(lambda p, x: conv.apply(p, x))
        t_cv = timeit(f"  conv3x3 {shp}", cf, cp, xx)
        flops = 2 * b * h * w * 9 * c * c
        print(f"    conv MFU ~{flops / (t_cv * 1e-3) / 197e12 * 100:.1f}%  "
              f"(ideal {flops/197e12*1e3:.3f} ms)")

    # --- GN+SiLU+conv chained (what a fused kernel would replace) ----------
    print("\nchained GN+SiLU+conv3x3 (one jit; XLA free to fuse):")
    for shp in shapes[:3]:
        b, h, w, c = shp
        xx = jnp.ones(shp, jnp.bfloat16)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        conv = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], dtype=jnp.bfloat16)
        cp = jax.jit(conv.init)(jax.random.PRNGKey(0), xx)
        chain = jax.jit(lambda p, x, s, b_: conv.apply(
            p, jax.nn.silu(_group_norm32(x, s, b_))))
        timeit(f"  GN+SiLU+conv {shp}", chain, cp, xx, sc, bi)


if __name__ == "__main__":
    main()

"""Block-level time attribution inside the flagship UNet forward (r4/r5 perf).

Answers: of the ~13.3 ms 256-channel 256^2 forward (BENCH.md r4), how much
is GroupNorm+SiLU, how much is conv MXU work, how much is everything else?
Method: every timing is ONE jitted program that chains `reps` executions
inside a `lax.scan` (output feeds the next input), so relay dispatch noise
is excluded (the r4 lesson — per-call timing over the tunnel measures the
relay, not the chip), with fetch-forced completion (`block_until_ready`
is unreliable through the relay — CLAUDE.md).

Params are passed as explicit jit ARGUMENTS, never closed over: closure
constants are serialized into the HLO shipped to the relay's remote_compile
endpoint, and a 374M-param closure broke the compile service with a
45-minute hang + broken pipe (observed r5).

Usage: PYTHONPATH=. python scripts/profile_unet_blocks.py [--num_channels 256]
       [--sections net,shapes,chain]
"""
import argparse
import time
import traceback

parser = argparse.ArgumentParser()
parser.add_argument("--num_channels", default=256, type=int)
parser.add_argument("--reps", default=10, type=int)
parser.add_argument("--batch", default=1, type=int)
parser.add_argument("--sections", default="net,shapes,chain")
parser.add_argument("--im_size", default=256, type=int)
parser.add_argument("--platform", default=None, help="force jax platform (cpu smoke)")
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)
import jax.numpy as jnp
import flax.linen as nn

import diffusion_models_dev_project_tpu.models.unet as unet_mod
from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig


def scan_time(name, fn, params, x0, reps=args.reps):
    """Time `fn(params, x) -> x-shaped output` chained `reps` times in ONE
    jitted program.  `params` is an explicit argument (see module docstring)."""

    @jax.jit
    def prog(p, x):
        def body(c, _):
            return fn(p, c).astype(c.dtype), None

        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c

    try:
        float(jnp.sum(prog(params, x0)))         # compile + warm, fetch-forced
        t0 = time.perf_counter()
        float(jnp.sum(prog(params, x0)))
        dt = (time.perf_counter() - t0) / reps * 1e3
    except Exception as e:  # fail soft: one broken timing must not kill the run
        print(f"{name:<52s} FAILED: {e}", flush=True)
        return float("nan")
    print(f"{name:<52s} {dt:8.3f} ms", flush=True)
    return dt


def build(cfg):
    model = UNetModel(cfg)
    x = jnp.zeros((args.batch, cfg.image_size, cfg.image_size, 1), jnp.float32)
    t = jnp.zeros((args.batch,), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)["params"]
    return model, params, x, t


def main():
    sections = set(args.sections.split(","))
    cfg = UNetConfig(image_size=args.im_size, model_channels=args.num_channels,
                     channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=1,
                     attention_resolutions=(16,), num_heads=4,
                     num_head_channels=64, use_scale_shift_norm=True,
                     resblock_updown=True, dtype="bfloat16")

    if "net" in sections:
        model, params, x, t = build(cfg)
        t_full = scan_time("UNet fwd (full)",
                           lambda p, xx: model.apply({"params": p}, xx, t),
                           params, x)

        # --- GN share: patch _group_norm32 to identity (keeps param tree) ---
        orig_gn = unet_mod._group_norm32
        unet_mod._group_norm32 = lambda x, s, b, num_groups=32, eps=1e-5: x
        try:
            model2, params2, _, _ = build(cfg)
            t_nogn = scan_time(
                "UNet fwd (GroupNorm -> identity)",
                lambda p, xx: model2.apply({"params": p}, xx, t), params2, x)
        finally:
            unet_mod._group_norm32 = orig_gn

        # --- SiLU share too ---
        orig_silu = jax.nn.silu
        unet_mod.jax.nn.silu = lambda x: x
        try:
            model3, params3, _, _ = build(cfg)
            t_nosilu = scan_time(
                "UNet fwd (SiLU -> identity)",
                lambda p, xx: model3.apply({"params": p}, xx, t), params3, x)
        finally:
            unet_mod.jax.nn.silu = orig_silu

        # --- attention share: drop attention blocks ---
        import dataclasses
        cfg_noattn = dataclasses.replace(cfg, attention_resolutions=())
        model4, params4, _, _ = build(cfg_noattn)
        t_noattn = scan_time(
            "UNet fwd (no attention blocks)",
            lambda p, xx: model4.apply({"params": p}, xx, t), params4, x)

        print(f"\nGN cost in-net      : {t_full - t_nogn:8.3f} ms "
              f"({100 * (t_full - t_nogn) / t_full:.1f}% of fwd)")
        print(f"SiLU cost in-net    : {t_full - t_nosilu:8.3f} ms")
        print(f"attention in-net    : {t_full - t_noattn:8.3f} ms", flush=True)

    # --- standalone pieces at the hot shapes -------------------------------
    C = args.num_channels
    S = args.im_size
    shapes = [(args.batch, S, S, C), (args.batch, S // 2, S // 2, C),
              (args.batch, S // 4, S // 4, 2 * C), (args.batch, S // 8, S // 8, 2 * C),
              (args.batch, S // 16, S // 16, 4 * C), (args.batch, S // 32, S // 32, 4 * C)]
    from diffusion_models_dev_project_tpu.models.unet import _group_norm32

    if "shapes" in sections:
        print("\nstandalone GN+SiLU / conv3x3 per shape (bf16):")
        for shp in shapes:
            b, h, w, c = shp
            xx = jnp.ones(shp, jnp.bfloat16)
            sc = jnp.ones((c,), jnp.float32)
            bi = jnp.zeros((c,), jnp.float32)
            t_gn = scan_time(f"  GN+SiLU {shp}",
                             lambda p, v: jax.nn.silu(_group_norm32(v, *p)),
                             (sc, bi), xx)
            conv = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=jnp.bfloat16)
            cp = jax.jit(conv.init)(jax.random.PRNGKey(0), xx)
            t_cv = scan_time(f"  conv3x3 {shp}",
                             lambda p, v: conv.apply(p, v), cp, xx)
            flops = 2 * b * h * w * 9 * c * c
            print(f"    conv MFU ~{flops / (t_cv * 1e-3) / 197e12 * 100:.1f}% "
                  f"(ideal {flops / 197e12 * 1e3:.3f} ms); "
                  f"GN+SiLU HBM-ideal {(3 * b * h * w * c * 2) / 819e9 * 1e3:.3f} ms",
                  flush=True)

    # --- GN+SiLU+conv chained (what a fused kernel would replace) ----------
    if "chain" in sections:
        print("\nchained GN+SiLU+conv3x3 (one jit; XLA free to fuse):")
        for shp in shapes[:3]:
            b, h, w, c = shp
            xx = jnp.ones(shp, jnp.bfloat16)
            sc = jnp.ones((c,), jnp.float32)
            bi = jnp.zeros((c,), jnp.float32)
            conv = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=jnp.bfloat16)
            cp = jax.jit(conv.init)(jax.random.PRNGKey(0), xx)
            scan_time(
                f"  GN+SiLU+conv {shp}",
                lambda p, v: conv.apply(p[0], jax.nn.silu(_group_norm32(v, p[1], p[2]))),
                (cp, sc, bi), xx)


if __name__ == "__main__":
    main()

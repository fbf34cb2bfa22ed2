"""Scan-amortized micro-profile of UNet-forward pieces (r4 perf pass).

The relay adds ~1 ms dispatch floor per jitted call, so standalone op
timings are noise (scripts/profile_unet_blocks.py measured GN+SiLUs at a
1.7-2.2 ms "cost" that in-net attribution shows is 0.5 ms total).  Here
every piece runs `--iters` times inside ONE jitted `lax.scan` (activation
carried, weights passed as jit ARGUMENTS — closing them over would bake
up to 1.5 GB of constants into the HLO, which wedges the relay's
remote_compile; same hazard as walnut_full_scale.py), with one value
fetch at the end — per-iteration time is then dispatch-free and directly
comparable to the analytic roofline (197 bf16 TFLOP/s, ~819 GB/s HBM on
v5e).

Usage: PYTHONPATH=. python scripts/profile_unet_scan.py [--num_channels 256]
"""
import argparse
import functools
import time

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--num_channels", default=256, type=int)
parser.add_argument("--iters", default=50, type=int)
parser.add_argument("--reps", default=3, type=int)
parser.add_argument("--batch", default=1, type=int)
parser.add_argument("--skip_full", action="store_true",
                    help="skip the full-forward row (slowest compile)")
args = parser.parse_args()

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffusion_models_dev_project_tpu.models.unet import (
    UNetModel, UNetConfig, _group_norm32)

PEAK_FLOPS = 197e12      # v5e bf16
HBM_BW = 819e9           # v5e HBM GB/s


def scan_time(name, step_fn, x0, params, flops=0, bytes_=0):
    """Time `step_fn(x, params)` scanned `iters` times in one jit."""

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
    extra = ""
    if flops:
        extra += f"  MFU {flops / (ms * 1e-3) / PEAK_FLOPS * 100:5.1f}%"
    if bytes_:
        extra += f"  BW {bytes_ / (ms * 1e-3) / HBM_BW * 100:5.1f}%"
    print(f"{name:<46s} {ms:8.4f} ms{extra}", flush=True)
    return ms


def main():
    C = args.num_channels
    B = args.batch
    key = jax.random.PRNGKey(0)

    # ---- full forward, scanned (the ground truth this decomposes) --------
    if not args.skip_full:
        cfg = UNetConfig(image_size=256, model_channels=C,
                         channel_mult=(1, 1, 2, 2, 4, 4), num_res_blocks=1,
                         attention_resolutions=(16,), num_heads=4,
                         num_head_channels=64, use_scale_shift_norm=True,
                         resblock_updown=True, dtype="bfloat16")
        model = UNetModel(cfg)
        x = jnp.zeros((B, 256, 256, 1), jnp.float32)
        t = jnp.zeros((B,), jnp.float32)
        params = jax.jit(model.init)(key, x, t)["params"]
        scan_time("UNet fwd (scanned)",
                  lambda xx, p: model.apply({"params": p}, xx, t)[..., :1],
                  x, params)

    # ---- per-shape conv3x3 / GN+SiLU / chains ----------------------------
    shapes = [(B, 256, 256, C), (B, 128, 128, C), (B, 64, 64, 2 * C),
              (B, 32, 32, 2 * C), (B, 16, 16, 4 * C), (B, 8, 8, 4 * C)]
    for shp in shapes:
        b, h, w, c = shp
        xx = jax.random.normal(key, shp, jnp.bfloat16)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)
        conv = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], dtype=jnp.bfloat16)
        cp = jax.jit(conv.init)(key, xx)
        fl = 2 * b * h * w * 9 * c * c
        by = 2 * (2 * b * h * w * c + 9 * c * c)
        scan_time(f"conv3x3 {shp}", lambda v, p, cv=conv: cv.apply(p, v),
                  xx, cp, flops=fl, bytes_=by)
        scan_time(f"GN+SiLU {shp}",
                  lambda v, p: jax.nn.silu(_group_norm32(v, p[0], p[1])),
                  xx, (sc, bi), bytes_=2 * 2 * b * h * w * c)
        scan_time(f"GN+SiLU+conv {shp}",
                  lambda v, p, cv=conv: cv.apply(
                      p[0], jax.nn.silu(_group_norm32(v, p[1], p[2]))),
                  xx, (cp, sc, bi), flops=fl, bytes_=by)

    # ---- attention at 16^2 (the only attention site at 256^2) ------------
    from diffusion_models_dev_project_tpu.models.unet import AttentionBlock, AttnSpec
    ch = 4 * C
    attn = AttentionBlock(AttnSpec(ch, ch // 64), dtype=jnp.bfloat16)
    xa = jax.random.normal(key, (B, 16, 16, ch), jnp.bfloat16)
    ap = jax.jit(attn.init)(key, xa)["params"]
    scan_time(f"attention 16x16x{ch}",
              lambda v, p: attn.apply({"params": p}, v), xa, ap)

    # ---- timestep-embedding MLP stack (per-ResBlock Dense) ---------------
    emb = jax.random.normal(key, (B, 4 * C), jnp.bfloat16)
    dense = nn.Dense(2 * ch, dtype=jnp.bfloat16)
    dp = jax.jit(dense.init)(key, emb)
    scan_time(f"emb Dense {4*C}->{2*ch}",
              lambda v, p: dense.apply(p, jax.nn.silu(v))[:, :4 * C],
              emb, dp)


if __name__ == "__main__":
    main()

"""Pallas conv3x3 vs XLA conv at the 256² UNet's hot shapes (r5 perf).

Method: r4 scan-amortization — each timing is ONE jitted program chaining
`reps` executions in a `lax.scan` (relay dispatch excluded), fetch-forced.
Weights are explicit jit arguments (never closure constants — the r5
remote-compile lesson).

Usage: PYTHONPATH=. python scripts/bench_conv3x3.py [--reps 50] [--platform cpu]
"""
import argparse
import time

parser = argparse.ArgumentParser()
parser.add_argument("--reps", default=50, type=int)
parser.add_argument("--platform", default=None, help="force platform (cpu smoke)")
parser.add_argument("--tile_h", default=16, type=int)
args = parser.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)
import jax.numpy as jnp

from diffusion_models_dev_project_tpu.ops.conv3x3 import conv3x3_same

SHAPES = [  # (B, H, W, Cin) -> Cout ; the flagship/bench UNet's hot levels
    (1, 256, 256, 256, 256),
    (1, 128, 128, 256, 256),
    (1, 64, 64, 512, 512),
    (1, 32, 32, 512, 512),
    (3, 256, 256, 256, 256),   # batched serving shape
]


def scan_time(name, fn, consts, x0, flops, reps=args.reps):
    @jax.jit
    def prog(c, x):
        def body(carry, _):
            return fn(c, carry).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, x, None, length=reps)
        return out

    try:
        float(jnp.sum(prog(consts, x0)))
        t0 = time.perf_counter()
        float(jnp.sum(prog(consts, x0)))
        dt = (time.perf_counter() - t0) / reps * 1e3
    except Exception as e:
        print(f"{name:<46s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None
    print(f"{name:<46s} {dt:8.3f} ms   {flops / dt / 1e9 * 1e3 / 197e3 * 100:5.1f}% MFU",
          flush=True)
    return dt


def main():
    for (b, h, w, cin, cout) in SHAPES:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = (jax.random.normal(k1, (b, h, w, cin), jnp.float32) * 0.1
             ).astype(jnp.bfloat16)
        kern = (jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.03
                ).astype(jnp.bfloat16)
        bias = jnp.zeros((cout,), jnp.bfloat16)
        flops = 2 * b * h * w * 9 * cin * cout
        shp = f"({b},{h},{w},{cin})"

        scan_time(f"XLA conv      {shp}",
                  lambda c, v: jax.lax.conv_general_dilated(
                      v, c[0], (1, 1), [(1, 1), (1, 1)],
                      dimension_numbers=("NHWC", "HWIO", "NHWC")) + c[1],
                  (kern, bias), x, flops)
        scan_time(f"pallas 9-shift {shp}",
                  lambda c, v: conv3x3_same(v, c[0], c[1], tile_h=args.tile_h),
                  (kern, bias), x, flops)


if __name__ == "__main__":
    main()

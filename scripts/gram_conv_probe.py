"""Probe: is the DFT-shear projector's Gram AᵀA a 2-D convolution?

For the parallel-beam Radon transform the continuous Gram is the shift-
invariant 1/|r| back-projection kernel.  The discrete pipeline
(physics/fft_radon.py) is exactly shift-covariant through the shears
(periodic sinc algebra) but the per-angle detector linear-interp sampling
matrix M is a fixed-grid operator, so MᵀM need not be Toeplitz.  This
script measures how far AᵀA deviates from conv(PSF_center, .) — if the
relative error is small, CG's 6 Gram applies per DDS step can be replaced
by one padded-DFT multiply (VERDICT r4 item 2: "fused Gram apply").

Run on CPU: PYTHONPATH=. python scripts/gram_conv_probe.py --size 64
"""
import argparse

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from diffusion_models_dev_project_tpu.physics.ray_trafo import make_parallel_beam_trafo


def gram(trafo, x):
    return trafo.adjoint(trafo.apply(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--angles", type=int, default=60)
    args = ap.parse_args()
    n = args.size
    trafo = make_parallel_beam_trafo((n, n), args.angles)
    g = jax.jit(lambda x: gram(trafo, x))

    # PSF from a centered delta (image grid has two "centers" for even n;
    # pick (n//2, n//2) and shift-test against it)
    c = n // 2
    delta = jnp.zeros((1, n, n, 1)).at[0, c, c, 0].set(1.0)
    psf = np.asarray(g(delta))[0, :, :, 0]

    # circular-conv transfer function on a 2n grid (linear conv support 2n-1)
    pad = 2 * n
    kern = np.zeros((pad, pad), np.float32)
    # place PSF so its center (c, c) sits at (0, 0)
    kern[: n, : n] = psf
    kern = np.roll(kern, (-c, -c), axis=(0, 1))
    H = np.fft.rfft2(kern)

    def conv_apply(x):
        xp = np.zeros((pad, pad), np.float32)
        xp[:n, :n] = x
        y = np.fft.irfft2(np.fft.rfft2(xp) * H, s=(pad, pad))
        return y[:n, :n]

    rng = np.random.default_rng(0)
    errs, shifts_err = [], []
    for trial in range(4):
        x = rng.standard_normal((n, n)).astype(np.float32)
        ref = np.asarray(g(jnp.asarray(x)[None, :, :, None]))[0, :, :, 0]
        approx = conv_apply(x)
        errs.append(np.abs(approx - ref).max() / np.abs(ref).max())
    # also: direct shifted-delta PSF comparison (diagnoses WHERE it breaks)
    for (dy, dx) in [(1, 0), (0, 1), (7, 3), (-20, 11), (30, -25)]:
        d2 = jnp.zeros((1, n, n, 1)).at[0, c + dy, c + dx, 0].set(1.0)
        p2 = np.asarray(g(d2))[0, :, :, 0]
        pred = conv_apply(np.asarray(d2)[0, :, :, 0])
        shifts_err.append(np.abs(p2 - pred).max() / np.abs(p2).max())
    print(f"size {n}, angles {args.angles}")
    print("random-x rel err (max-norm):", [f"{e:.2e}" for e in errs])
    print("shifted-delta rel err:", [f"{e:.2e}" for e in shifts_err])


if __name__ == "__main__":
    main()

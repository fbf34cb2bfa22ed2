"""Generate synthetic AAPM-style anatomy slices for the OOD config matrix.

The real AAPM LDCT L067 `.npy` slices (reference `src/dataset/aapm.py`)
are not downloadable in this environment, so the two-axis OOD protocol
(`--model_learned_on ellipses --dataset aapm`) is exercised on synthetic
chest-CT-like phantoms: body ellipse, two low-attenuation lung fields, a
bright spine ellipse, and random soft-tissue organs, lightly smoothed.
File naming follows the reference loader's float-prefix sort and fold
arithmetic (test = every 8th slice).

Usage: python scripts/make_synth_aapm.py [--out /tmp/aapm_synth] [--n 24]
       AAPM_DATA_PATH=<out> python run_conditional_sampling.py \
           --model_learned_on ellipses --dataset aapm ...

BENCH.md round 3 records 38.18 dB / 0.889 SSIM at eta=0.85 with the
shipped VESDE prior on these slices (seed 42).
"""
import argparse
import os

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--out", default="/tmp/aapm_synth")
parser.add_argument("--n", default=24, type=int)
parser.add_argument("--im_size", default=256, type=int)
parser.add_argument("--seed", default=42, type=int)


def main():
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    H = args.im_size
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32)
    cx = cy = H / 2
    s = H / 256.0   # geometry scales with resolution

    def ellipse(cx_, cy_, a, b, ang):
        ca, sa = np.cos(ang), np.sin(ang)
        X, Y = xx - cx_, yy - cy_
        return ((X * ca + Y * sa) / a) ** 2 + ((-X * sa + Y * ca) / b) ** 2 <= 1.0

    for k in range(args.n):
        img = np.zeros((H, H), np.float32)
        body = ellipse(cx, cy, (105 + rng.uniform(-8, 8)) * s,
                       (85 + rng.uniform(-8, 8)) * s, rng.uniform(-0.1, 0.1))
        img[body] = 0.35
        img[ellipse(cx + rng.uniform(-5, 5) * s,
                    cy + (55 + rng.uniform(-5, 5)) * s, 16 * s, 12 * s, 0)] = 0.95
        for sx in (-1, 1):
            img[ellipse(cx + (sx * 45 + rng.uniform(-6, 6)) * s,
                        cy + (-10 + rng.uniform(-6, 6)) * s,
                        (32 + rng.uniform(-5, 5)) * s,
                        (48 + rng.uniform(-6, 6)) * s,
                        sx * rng.uniform(0.1, 0.3))] = 0.08
        for _ in range(rng.integers(3, 7)):
            a, b = rng.uniform(8, 26, 2) * s
            m = ellipse(cx + rng.uniform(-60, 60) * s,
                        cy + rng.uniform(-45, 45) * s, a, b,
                        rng.uniform(0, np.pi))
            img[m & body] = np.clip(img[m & body] + rng.uniform(0.1, 0.3), 0, 1)
        ker = np.ones(3) / 3
        img = np.apply_along_axis(lambda r: np.convolve(r, ker, "same"), 0, img)
        img = np.apply_along_axis(lambda r: np.convolve(r, ker, "same"), 1, img)
        np.save(os.path.join(args.out, f"{100 + k}.npy"), img.astype(np.float32))
    print(f"wrote {args.n} slices to {args.out}")


if __name__ == "__main__":
    main()

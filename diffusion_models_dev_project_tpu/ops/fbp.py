"""Fourier ramp filtering for filtered back-projection, pure jnp.

Functional equivalent of the reference's `filter_sinogram`
(`/root/reference/src/physics/utils.py:11-33`, itself FFT math borrowed from
torch-radon): zero-pad the detector axis to a power of two, multiply the
spectrum by a ramp (|f|) window, inverse transform, crop and rescale by
pi / (2 * n_angles).  Runs entirely on device via `jnp.fft.rfft` so FBP can
live inside jitted sampling loops (the reference's ASTRA FDK does a host
round-trip per call, walnut_2d_ray_trafo.py:15-23).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["ramp_filter_sinogram", "fourier_filter"]


def fourier_filter(size: int, filter_name: str = "ramp") -> np.ndarray:
    """Frequency response of the reconstruction filter on an rfft grid."""
    f = np.fft.rfftfreq(size)
    ramp = 2.0 * np.abs(f)
    if filter_name == "ramp":
        resp = ramp
    elif filter_name == "shepp-logan":
        omega = np.pi * f
        resp = ramp * np.sinc(f)  # sinc(x) = sin(pi x)/(pi x)
        del omega
    elif filter_name == "cosine":
        resp = ramp * np.cos(np.pi * f / 2.0)
    elif filter_name == "hann":
        resp = ramp * (1.0 + np.cos(2.0 * np.pi * f)) / 2.0
    else:
        raise ValueError(f"unknown filter {filter_name!r}")
    return resp.astype(np.float32)


def ramp_filter_sinogram(sino: jnp.ndarray, filter_name: str = "ramp") -> jnp.ndarray:
    """Apply the ramp filter along the detector axis.

    `sino` is (B, A, D, C) channel-last; returns same shape/dtype.
    """
    b, a, d, c = sino.shape
    padded = max(64, int(2 ** np.ceil(np.log2(2 * d))))
    x = jnp.moveaxis(sino, 2, -1)                       # (B, A, C, D)
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, 0), (0, padded - d)))
    spec = jnp.fft.rfft(x, axis=-1)
    resp = jnp.asarray(fourier_filter(padded, filter_name))
    filt = jnp.fft.irfft(spec * resp, n=padded, axis=-1)[..., :d]
    filt = filt * (np.pi / (2.0 * a))
    return jnp.moveaxis(filt, -1, 2).astype(sino.dtype)

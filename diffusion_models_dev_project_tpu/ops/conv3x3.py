"""Pallas 3x3 stride-1 same-padding conv as 9 shifted MXU matmuls.

Motivation (BENCH.md r5): the 256² UNet forward is conv-bound — GroupNorm/
SiLU/attention together are ~0.6 ms of a ~13 ms forward — so the remaining
perf mass is XLA's conv efficiency at the big shapes ((1,256,256,256) is a
77-GFLOP conv, ideal 0.39 ms on a v5e MXU).  XLA's `conv_general_dilated`
at batch 1 leaves MXU occupancy on the table; this kernel expresses the
same conv as

    y[h, w, :] = bias + sum_{di,dj in 3x3} x[h+di-1, w+dj-1, :] @ K[di, dj]

with a row-tile of `x` (plus 1-row halo) staged once into VMEM and all nine
taps contracted from that single staged copy — arithmetic intensity ~9x an
HBM-streaming formulation.  fp32 accumulation, bf16 (or input-dtype) I/O.

Semantics match `jax.lax.conv_general_dilated(x, k, (1,1), [(1,1),(1,1)],
NHWC/HWIO)` exactly (zero padding 1); parameter layout is the same HWIO
kernel + bias as `nn.Conv`, so checkpoints are interchangeable
(models/unet.py `MatmulConv3x3` dispatches here above a size threshold).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_same"]


def _kernel(x_hbm, k_ref, b_ref, out_ref, xs, sem):
    """One (batch, row-tile) program: DMA the haloed row window, then nine
    shifted 3D matmuls accumulated in fp32."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    th = out_ref.shape[1]
    w = out_ref.shape[2]

    # Stage x[b, i*TH : i*TH+TH+2, :, :] (already H/W zero-padded by the
    # caller, so every window is in bounds) into VMEM once.
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * th, th + 2)], xs, sem)
    dma.start()
    dma.wait()

    acc = None
    for di in range(3):
        for dj in range(3):
            tap = jax.lax.dot_general(
                xs[di:di + th, dj:dj + w, :], k_ref[di * 3 + dj],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = tap if acc is None else acc + tap
    out_ref[0] = (acc + b_ref[0][None, None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h",))
def conv3x3_same(x, kernel, bias, tile_h: int = 16):
    """3x3 stride-1 zero-pad-1 conv, NHWC x HWIO -> NHWC.

    `tile_h` rows of output per grid step; H must be divisible by it (the
    UNet's power-of-two feature maps always are — callers guard)."""
    bsz, h, w, cin = x.shape
    feats = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, cin), kernel.shape
    assert h % tile_h == 0, (h, tile_h)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    kmat = kernel.reshape(9, cin, feats)

    grid = (bsz, h // tile_h)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),       # all 9 taps resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, feats),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, feats), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w + 2, cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, kmat, bias.reshape(1, feats).astype(jnp.float32))

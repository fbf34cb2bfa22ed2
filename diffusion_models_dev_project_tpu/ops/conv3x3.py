"""Pallas 3x3 stride-1 same-padding conv as 9 shifted MXU matmuls.

Motivation (BENCH.md r5): the 256² UNet forward is conv-bound — GroupNorm/
SiLU/attention together are ~0.6 ms of a ~13 ms forward — and XLA's batch-1
convs at the hot shapes run at 15-37% MFU ((1,256,256,256) measured
1.07 ms vs a 0.39 ms MXU ideal).  This kernel expresses the same conv as

    y[h, w, :] = bias + sum_{di,dj in 3x3} x[h+di-1, w+dj-1, :] @ K[di, dj]

with each row-tile of `x` staged into VMEM once (Pallas-pipelined
BlockSpecs) and all nine taps contracted from that staged copy — the halo
rows come from re-reading the neighbour row-blocks, and the tap shifts are
VALUE-level slices/concats (register relayouts), never unaligned memref
slices (Mosaic requires sublane-aligned ref slicing; a (TH+2, W+2, C)
scratch slice is structurally unalignable).  fp32 accumulation, input-dtype
I/O.

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


def _kernel(prev_ref, cur_ref, next_ref, k_ref, b_ref, out_ref):
    i = pl.program_id(1)
    n = pl.num_programs(1)
    th, w, cin = cur_ref.shape[1:]

    cur = cur_ref[0]
    # halo rows from the neighbour blocks; zeros at the image boundary
    # (the index maps clamp, so the loaded rows are valid but wrong there)
    up = jnp.where(i == 0, jnp.zeros((1, w, cin), cur.dtype),
                   prev_ref[0, th - 1:th])
    dn = jnp.where(i == n - 1, jnp.zeros((1, w, cin), cur.dtype),
                   next_ref[0, 0:1])
    zcol = jnp.zeros((th + 2, 1, cin), cur.dtype)
    xp = jnp.concatenate(
        [zcol, jnp.concatenate([up, cur, dn], axis=0), zcol], axis=1)

    feats = out_ref.shape[-1]
    acc = None
    for di in range(3):
        for dj in range(3):
            tap = jax.lax.dot_general(
                xp[di:di + th, dj:dj + w, :].reshape(th * w, cin),
                k_ref[di * 3 + dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = tap if acc is None else acc + tap
    out_ref[0] = (acc.reshape(th, w, feats)
                  + b_ref[0][None, None, :]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h",))
def conv3x3_same(x, kernel, bias, tile_h: int = 8):
    """3x3 stride-1 zero-pad-1 conv, NHWC x HWIO -> NHWC.

    `tile_h` rows of output per grid step; H must be divisible by it (the
    UNet's power-of-two feature maps always are — callers guard)."""
    bsz, h, w, cin = x.shape
    feats = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, cin), kernel.shape
    assert h % tile_h == 0, (h, tile_h)

    kmat = kernel.reshape(9, cin, feats)
    n_tiles = h // tile_h

    def _row_block(off):
        # neighbour row-block, clamped at the image boundary (the kernel
        # masks the clamped rows to zero)
        return pl.BlockSpec(
            (1, tile_h, w, cin),
            lambda b, i, off=off: (b, jnp.clip(i + off, 0, n_tiles - 1), 0, 0),
            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            _row_block(-1), _row_block(0), _row_block(+1),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # all 9 taps resident
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, feats),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, feats), x.dtype),
    )(x, x, x, kmat, bias.reshape(1, feats).astype(jnp.float32))

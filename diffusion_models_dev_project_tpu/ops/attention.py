"""Blockwise (flash) self-attention Pallas TPU kernel, ADM conventions.

At the reference workloads' 256² resolution, attention runs on 16×16 = 256
tokens and the plain einsum path (models/unet.py `AttentionBlock`) is
already fast.  This kernel exists for the scaling path (512²+ images →
1024+ tokens, SURVEY.md §5.7: "write the attention kernel blockwise
anyway"): online-softmax tiles over the sequence so the T×T score matrix is
never materialized in HBM.

Matches the ADM "legacy" attention semantics exactly
(`/root/reference/src/third_party_models/dds_unet/unet.py:330-360`):
q and k are EACH pre-scaled by 1/sqrt(sqrt(d)) and the softmax runs in
float32.

Layout: q, k, v are (B*heads, T, d).  Arbitrary T and d are accepted:
`flash_attention` zero-pads d to a multiple of 8 (exact — zero feature
columns add zero to every logit) and pads T up to a block-size multiple
with keys masked to -inf inside the kernel, then slices the output back.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "attention_reference"]


def attention_reference(q: jnp.ndarray, k: jnp.ndarray,
                        v: jnp.ndarray) -> jnp.ndarray:
    """Plain einsum path (the 256² default), for parity checks."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum("btc,bsc->bts", q * scale, k * scale)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    return jnp.einsum("bts,bsc->btc", w, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_kv: int, scale: float,
                  valid_t: int):
    """One (batch, q-block) program: stream k/v blocks with online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale          # (bq, d)
    T = k_ref.shape[1]
    bq, d = q.shape
    num_kv = T // block_kv

    def body(i, carry):
        acc, m, l = carry                             # (bq,d), (bq,1), (bq,1)
        kblk = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        vblk = v_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = jnp.dot(q, (kblk * scale).T,
                    preferred_element_type=jnp.float32)        # (bq, bkv)
        if valid_t < T:
            # mask key slots beyond the true sequence (T was padded up to a
            # block multiple); -1e30 keeps exp() exactly 0 without inf-inf
            cols = i * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_kv), 1)
            s = jnp.where(cols < valid_t, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, vblk,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 256, block_kv: int = 256,
                    interpret: bool = False) -> jnp.ndarray:
    """Blockwise attention; q/k/v (B, T, d) -> (B, T, d), any T and d."""
    b, t, d = q.shape
    # d-padding with zero feature columns is exact (adds 0 to every logit
    # and the sliced-off output columns are never read); the softmax scale
    # must stay 1/sqrt(sqrt(d_true)).
    scale = 1.0 / math.sqrt(math.sqrt(d))
    d_pad = -d % 8
    # T-padding: round up to a block multiple; padded KEY slots are masked
    # to -inf inside the kernel, padded QUERY rows compute garbage that the
    # final slice drops.
    block_q = min(block_q, _round_up(t, 8))
    block_kv = min(block_kv, _round_up(t, 8))
    t_pad = -t % (block_q * block_kv // math.gcd(block_q, block_kv))
    if d_pad or t_pad:
        pad = [(0, 0), (0, t_pad), (0, d_pad)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
    tp = t + t_pad
    kernel = functools.partial(_flash_kernel, block_kv=block_kv, scale=scale,
                               valid_t=t)
    out = pl.pallas_call(
        kernel,
        grid=(b, tp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d + d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, d + d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, d + d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d + d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tp, d + d_pad), q.dtype),
        interpret=interpret,
    )(q, k, v)
    if d_pad or t_pad:
        out = out[:, :t, :d]
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m

"""ADM ("guided-diffusion") score UNet, re-designed for TPU in Flax/NHWC.

Numerically matches the reference UNet
(`/root/reference/src/third_party_models/dds_unet/unet.py:398-671`, `nn.py`)
so that converted PyTorch checkpoints reproduce reference outputs:

- sinusoidal timestep embedding, cos-first, max_period 10000 (nn.py:103-121;
  the config's `model.max_period` is accepted but unused, matching the
  reference where `create_model` drops it, exp_utils.py:40-96),
- GroupNorm(32) always computed in float32 (`GroupNorm32`, nn.py:17-19),
- ResBlock with scale-shift (FiLM) conditioning, up/down variants, zero-init
  output conv (unet.py:143-257),
- AttentionBlock with *legacy* head ordering — heads split before q/k/v —
  and double-sqrt scaling with fp32 softmax (unet.py:330-360),
- skip-concat encoder/decoder with `resblock_updown`,
- `learn_sigma` models emit 2 channels; `__call__` returns channel 0 only
  (unet.py:668-671).

TPU-first choices: NHWC layout throughout (XLA:TPU's native conv layout),
attention as batched MXU matmuls, optional bfloat16 compute with fp32
normalization/softmax, and a spec-driven architecture walk
(`build_arch_spec`) shared with the checkpoint converter so the two can
never drift apart.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["UNetModel", "UNetConfig", "build_arch_spec", "timestep_embedding",
           "create_model_config"]


# ----------------------------------------------------------------- config
@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int = 256
    in_channels: int = 1
    out_channels: int = 1
    model_channels: int = 256
    num_res_blocks: int = 1
    attention_resolutions: Tuple[int, ...] = (16,)   # downsample rates!
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    dtype: str = "float32"          # compute dtype: "float32" | "bfloat16"
    # attention implementation: "einsum" | "flash" | "auto" (flash Pallas
    # kernel on TPU once the token count reaches 1024, i.e. 512^2 images)
    attention_impl: str = "auto"
    # 3x3 stride-1 convs whose spatial extent H*W is <= this threshold are
    # evaluated as ONE im2col matmul instead of XLA's conv (identical math &
    # params; see MatmulConv3x3).  XLA:TPU's conv at tiny spatial extents
    # (8², 16² inside the 256² UNet) runs far off the weight-bandwidth
    # roofline; 0 disables (always XLA conv).
    small_conv_matmul: int = 0
    # 3x3 stride-1 convs whose spatial extent H*W is >= this threshold run
    # as the Pallas 9-shifted-matmul kernel (ops/conv3x3.py): the haloed
    # row-tile of x is staged into VMEM once and all nine taps contract
    # from it.  bf16 compute only (fp32 parity paths keep XLA conv);
    # 0 disables.
    pallas_conv_min: int = 0
    # Test-time LoRA adaptation (reference lora.py:282-357): rank 0 disables.
    # When enabled, low-rank branches are added to every conv/dense inside
    # ResBlock/AttentionBlock modules of the included block groups; their
    # weights live in a separate 'lora' variable collection so the base
    # 'params' tree (and checkpoint conversion) is unchanged.
    lora_rank: int = 0
    lora_include_blocks: Tuple[str, ...] = (
        "input_blocks", "middle_block", "output_blocks", "out")

    @property
    def precision(self):
        """MXU precision for convs/matmuls.

        TPU matmul/conv units natively consume bfloat16; with float32 params
        the default precision silently rounds operands to bf16 (~5e-3 error
        on a single conv).  For fp32 checkpoint parity we therefore request
        HIGHEST (3-pass bf16 emulation); the bfloat16 fast path keeps the
        default single-pass MXU mode.
        """
        return jax.lax.Precision.HIGHEST if self.dtype == "float32" else None


def create_model_config(model_cfg) -> UNetConfig:
    """Build a UNetConfig from an ml_collections model config, mirroring the
    derivations of reference `create_model` (exp_utils.py:40-96):
    channel_mult from image size, attention_ds = image_size // res."""
    image_size = model_cfg.image_size
    channel_mult = getattr(model_cfg, "channel_mult", "")
    if channel_mult in ("", None):
        table = {512: (0.5, 1, 1, 2, 2, 4, 4), 256: (1, 1, 2, 2, 4, 4),
                 320: (1, 1, 2, 2, 4, 4), 128: (1, 1, 2, 3, 4), 64: (1, 2, 3, 4)}
        if image_size not in table:
            raise ValueError(f"unsupported image size: {image_size}")
        channel_mult = table[image_size]
    else:
        channel_mult = tuple(int(m) for m in str(channel_mult).split(","))
    attn_res = getattr(model_cfg, "attention_resolutions", "16")
    attention_ds = tuple(image_size // int(r) for r in str(attn_res).split(","))
    return UNetConfig(
        image_size=image_size,
        in_channels=model_cfg.in_channels,
        out_channels=model_cfg.out_channels,
        model_channels=model_cfg.num_channels,
        num_res_blocks=model_cfg.num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=getattr(model_cfg, "dropout", 0.0),
        channel_mult=channel_mult,
        num_heads=getattr(model_cfg, "num_heads", 1),
        num_head_channels=getattr(model_cfg, "num_head_channels", -1),
        num_heads_upsample=getattr(model_cfg, "num_heads_upsample", -1),
        use_scale_shift_norm=getattr(model_cfg, "use_scale_shift_norm", False),
        resblock_updown=getattr(model_cfg, "resblock_updown", False),
        dtype=getattr(model_cfg, "dtype", "float32"),
        attention_impl=getattr(model_cfg, "attention_impl", "auto"),
        small_conv_matmul=int(getattr(model_cfg, "small_conv_matmul", 0)),
        pallas_conv_min=int(getattr(model_cfg, "pallas_conv_min", 0)),
    )


# ----------------------------------------------------------------- specs
@dataclasses.dataclass(frozen=True)
class ResSpec:
    in_ch: int
    out_ch: int
    mode: Optional[str] = None          # None | "up" | "down"


@dataclasses.dataclass(frozen=True)
class AttnSpec:
    ch: int
    num_heads: int


@dataclasses.dataclass(frozen=True)
class SampleSpec:                        # standalone Up/Downsample layer
    ch: int
    out_ch: int
    mode: str                            # "up" | "down"
    use_conv: bool = True


@dataclasses.dataclass(frozen=True)
class ConvSpec:                          # plain 3x3 conv (stem)
    in_ch: int
    out_ch: int


def _heads_for(ch: int, cfg: UNetConfig, upsample: bool) -> int:
    if cfg.num_head_channels != -1:
        assert ch % cfg.num_head_channels == 0
        return ch // cfg.num_head_channels
    if upsample and cfg.num_heads_upsample != -1:
        return cfg.num_heads_upsample
    return cfg.num_heads


def build_arch_spec(cfg: UNetConfig):
    """Walk the ADM constructor logic (unet.py:483-619) once, producing the
    block structure used by both the Flax module and the torch converter.

    Returns (input_blocks, middle_block, output_blocks, out_ch0) where each
    *_blocks is a list of lists of specs (one inner list per
    TimestepEmbedSequential).
    """
    mc = cfg.model_channels
    ch = input_ch = int(cfg.channel_mult[0] * mc)
    input_blocks: List[List] = [[ConvSpec(cfg.in_channels, ch)]]
    input_block_chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers: List = [ResSpec(ch, int(mult * mc))]
            ch = int(mult * mc)
            if ds in cfg.attention_resolutions:
                layers.append(AttnSpec(ch, _heads_for(ch, cfg, False)))
            input_blocks.append(layers)
            input_block_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                input_blocks.append([ResSpec(ch, ch, mode="down")])
            else:
                input_blocks.append([SampleSpec(ch, ch, "down", cfg.conv_resample)])
            input_block_chans.append(ch)
            ds *= 2

    middle_block: List = [
        ResSpec(ch, ch),
        AttnSpec(ch, _heads_for(ch, cfg, False)),
        ResSpec(ch, ch),
    ]

    output_blocks: List[List] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_block_chans.pop()
            layers = [ResSpec(ch + ich, int(mc * mult))]
            ch = int(mc * mult)
            if ds in cfg.attention_resolutions:
                layers.append(AttnSpec(ch, _heads_for(ch, cfg, True)))
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append(ResSpec(ch, ch, mode="up"))
                else:
                    layers.append(SampleSpec(ch, ch, "up", cfg.conv_resample))
                ds //= 2
            output_blocks.append(layers)

    return input_blocks, middle_block, output_blocks, input_ch


# ----------------------------------------------------------------- pieces
def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, cos-first (reference nn.py:103-121)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _group_norm32(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                  num_groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over NHWC computed in float32 (reference GroupNorm32).

    TPU-shaped: stats come from per-channel spatial reductions (major-axis,
    layout friendly) combined across the group's channels — never a strided
    within-group reduction on the minor axis — and the normalization
    collapses to ONE fused multiply-add pass `x*a + b` (the naive reshaped
    formulation costs ~45% of the whole 256² UNet forward).
    """
    orig_dtype = x.dtype
    b, h, w, c = x.shape
    g, cg = num_groups, c // num_groups
    xf = x.astype(jnp.float32)
    m_c = jnp.mean(xf, axis=(1, 2))                     # (B, C)
    m2_c = jnp.mean(jnp.square(xf), axis=(1, 2))        # (B, C)
    m_g = jnp.mean(m_c.reshape(b, g, cg), axis=-1)      # (B, G)
    m2_g = jnp.mean(m2_c.reshape(b, g, cg), axis=-1)
    var_g = jnp.maximum(m2_g - jnp.square(m_g), 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    inv_c = jnp.repeat(inv_g, cg, axis=-1)              # (B, C)
    mean_c = jnp.repeat(m_g, cg, axis=-1)
    a = inv_c * scale.astype(jnp.float32)[None]
    bb = bias.astype(jnp.float32)[None] - mean_c * a
    out = xf * a[:, None, None, :] + bb[:, None, None, :]
    return out.astype(orig_dtype)


class GroupNorm32(nn.Module):
    channels: int
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return _group_norm32(x, scale, bias, self.num_groups)


def _conv(out_ch, kernel=3, stride=1, name=None, zero_init=False, dtype=jnp.float32,
          precision=None, small_matmul=0, pallas_min=0):
    init = nn.initializers.zeros_init() if zero_init else nn.initializers.lecun_normal()
    if (small_matmul or pallas_min) and kernel == 3 and stride == 1:
        return MatmulConv3x3(out_ch, threshold=int(small_matmul),
                             pallas_min=int(pallas_min),
                             zero_init=zero_init, name=name, dtype=dtype,
                             precision=precision)
    # stride-2 3x3 convs use explicit symmetric padding 1 (torch semantics);
    # XLA "SAME" pads asymmetrically for even inputs, which would break
    # checkpoint parity for the Downsample op (reference unet.py:124-140).
    if kernel > 1:
        pad = [(kernel // 2, kernel // 2)] * 2
    else:
        pad = "VALID"
    return nn.Conv(out_ch, (kernel, kernel), strides=(stride, stride), padding=pad,
                   kernel_init=init, name=name, dtype=dtype, precision=precision)


class MatmulConv3x3(nn.Module):
    """3x3 stride-1 conv that dispatches to an im2col matmul at small
    spatial extents (H*W <= `threshold`), else to XLA's conv.

    Parameter structure and math are identical to the nn.Conv that `_conv`
    otherwise builds (kernel HWIO + bias, zero padding 1), so checkpoints
    are interchangeable and golden torch-parity tests cover both paths.
    Rationale: XLA:TPU schedules the 8²/16² convs of the 256² UNet far off
    the weight-bandwidth roofline; a single (H·W, 9·Cin) x (9·Cin, Cout)
    dot keeps the MXU streaming the weight matrix instead
    (scripts/profile_unet_scan.py measurements, BENCH.md r4)."""

    features: int
    threshold: int = 0
    pallas_min: int = 0
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32
    precision: object = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        init = (nn.initializers.zeros_init() if self.zero_init
                else nn.initializers.lecun_normal())
        kernel = self.param("kernel", init, (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        b, h, w, _ = x.shape
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if (self.pallas_min and h * w >= self.pallas_min and cin >= 64
                and h % 16 == 0 and x.dtype == jnp.bfloat16):
            # big-shape bf16 fast path: Pallas 9-shifted-matmul kernel
            # (ops/conv3x3.py); fp32/parity configs never reach here.
            # tile_h scales down with cin to fit the pipelined row blocks
            # in VMEM (cin=512 at 256² OOMs 16 MB at tile_h=8 — BENCH.md r5)
            from ..ops.conv3x3 import conv3x3_same

            return conv3x3_same(x, kernel, bias,
                                tile_h=8 if cin <= 256 else 4)
        if h * w <= self.threshold:
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            # tap order (di, dj, cin) matches the row-major flatten of the
            # HWIO kernel below — exact conv semantics, zero padding 1
            cols = jnp.concatenate(
                [xp[:, i:i + h, j:j + w, :] for i in range(3)
                 for j in range(3)], axis=-1)
            out = jax.lax.dot_general(
                cols.reshape(b * h * w, 9 * cin),
                kernel.reshape(9 * cin, self.features),
                (((1,), (0,)), ((), ())), precision=self.precision)
            return out.reshape(b, h, w, self.features) + bias
        out = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision)
        return out + bias


def _upsample_nearest(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _lora_down_init(rank: int):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * (1.0 / rank)
    return init


class LoRAConv(nn.Module):
    """Low-rank conv branch: 1/r-normal down-conv (same geometry as the base
    conv) -> zero-init 1x1 up-conv, times a runtime `scale`
    (reference `LoraInjectedConv2d`, lora.py:53-116).  Weights live in the
    'lora' collection; with the zero-init up-conv the branch is an exact
    no-op at initialization.  The reference's inter-branch dropout is
    inactive in its usage (score.eval() during adaptation,
    samplers/utils.py:240) and is omitted."""

    features: int
    rank: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    precision: object = None

    @nn.compact
    def __call__(self, x, scale):
        kh, kw = self.kernel
        cin = x.shape[-1]
        rng = self.make_rng("lora") if self.is_initializing() else None
        down = self.variable(
            "lora", "down", _lora_down_init(self.rank), rng,
            (kh, kw, cin, self.rank))
        up = self.variable(
            "lora", "up", lambda *_: jnp.zeros((1, 1, self.rank, self.features),
                                               jnp.float32), None)
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)] if kh > 1 else "VALID"
        h = jax.lax.conv_general_dilated(
            x.astype(down.value.dtype), down.value,
            (self.stride, self.stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=self.precision)
        h = jax.lax.conv_general_dilated(
            h, up.value, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=self.precision)
        return h * scale


class LoRADense(nn.Module):
    """Low-rank dense branch (reference `LoraInjectedLinear`, lora.py:11-50;
    also covers the 1x1-conv1d attention projections, lora.py:119-195)."""

    features: int
    rank: int
    precision: object = None

    @nn.compact
    def __call__(self, x, scale):
        cin = x.shape[-1]
        rng = self.make_rng("lora") if self.is_initializing() else None
        down = self.variable("lora", "down", _lora_down_init(self.rank), rng,
                             (cin, self.rank))
        up = self.variable("lora", "up",
                           lambda *_: jnp.zeros((self.rank, self.features),
                                                jnp.float32), None)
        h = jnp.dot(x.astype(down.value.dtype), down.value,
                    precision=self.precision)
        h = jnp.dot(h, up.value, precision=self.precision)
        return h * scale


class ResBlock(nn.Module):
    """ADM residual block (reference unet.py:143-257)."""

    spec: ResSpec
    emb_ch: int
    dropout: float
    use_scale_shift_norm: bool
    dtype: jnp.dtype = jnp.float32
    precision: object = None
    lora_rank: int = 0
    small_conv_matmul: int = 0
    pallas_conv_min: int = 0

    @nn.compact
    def __call__(self, x, emb, *, deterministic: bool = True, lora_scale=1.0):
        s = self.spec
        r = self.lora_rank
        h = GroupNorm32(s.in_ch, name="norm1")(x)
        h = jax.nn.silu(h)
        if s.mode == "up":
            h = _upsample_nearest(h)
            x = _upsample_nearest(x)
        elif s.mode == "down":
            h = _avg_pool2(h)
            x = _avg_pool2(x)
        h1 = _conv(s.out_ch, name="conv1", dtype=self.dtype, precision=self.precision,
                   small_matmul=self.small_conv_matmul,
                   pallas_min=self.pallas_conv_min)(h)
        if r:
            h1 = h1 + LoRAConv(s.out_ch, r, name="conv1_lora",
                               precision=self.precision)(h, lora_scale)
        h = h1

        emb_in = jax.nn.silu(emb)
        emb_out = nn.Dense(2 * s.out_ch if self.use_scale_shift_norm else s.out_ch,
                           name="emb", dtype=self.dtype,
                           precision=self.precision)(emb_in)
        if r:
            emb_out = emb_out + LoRADense(emb_out.shape[-1], r, name="emb_lora",
                                          precision=self.precision)(emb_in, lora_scale)
        emb_out = emb_out[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(s.out_ch, name="norm2")(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32(s.out_ch, name="norm2")(h)
        h = jax.nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h2 = _conv(s.out_ch, name="conv2", zero_init=True, dtype=self.dtype,
                   precision=self.precision, small_matmul=self.small_conv_matmul,
                   pallas_min=self.pallas_conv_min)(h)
        if r:
            h2 = h2 + LoRAConv(s.out_ch, r, name="conv2_lora",
                               precision=self.precision)(h, lora_scale)
        h = h2

        if s.out_ch == s.in_ch:
            skip = x
        else:
            skip = nn.Conv(s.out_ch, (1, 1), name="skip", dtype=self.dtype, precision=self.precision)(x)
            if r:
                skip = skip + LoRAConv(s.out_ch, r, kernel=(1, 1), name="skip_lora",
                                       precision=self.precision)(x, lora_scale)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention with legacy head ordering (unet.py:260-360)."""

    spec: AttnSpec
    dtype: jnp.dtype = jnp.float32
    precision: object = None
    lora_rank: int = 0
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, *, lora_scale=1.0):
        s = self.spec
        r = self.lora_rank
        b, hgt, wid, c = x.shape
        heads = s.num_heads
        ch = c // heads
        hw = hgt * wid
        h = GroupNorm32(c, name="norm")(x).reshape(b, hw, c)
        qkv = nn.Dense(3 * c, name="qkv", dtype=self.dtype, precision=self.precision)(h)
        if r:
            qkv = qkv + LoRADense(3 * c, r, name="qkv_lora",
                                  precision=self.precision)(h, lora_scale)   # 1x1 conv == dense
        # legacy order: heads split BEFORE q/k/v (unet.py:330-356):
        # channel layout is [head][q|k|v][ch]
        qkv = qkv.reshape(b, hw, heads, 3 * ch)
        q, k, v = qkv[..., :ch], qkv[..., ch:2 * ch], qkv[..., 2 * ch:]
        impl = self.attention_impl
        if impl == "auto":
            impl = ("flash" if hw >= 1024 and jax.default_backend() == "tpu"
                    else "einsum")
        if impl == "flash":
            # blockwise Pallas kernel: T x T scores never hit HBM (512^2+)
            from ..ops.attention import flash_attention

            fold = lambda a: a.transpose(0, 2, 1, 3).reshape(b * heads, hw, ch)
            att = flash_attention(fold(q), fold(k), fold(v))
            att = att.reshape(b, heads, hw, ch).transpose(0, 2, 1, 3)
            att = att.reshape(b, hw, c)
        else:
            scale = 1.0 / math.sqrt(math.sqrt(ch))
            logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale,
                                precision=self.precision)
            weights = jax.nn.softmax(logits.astype(jnp.float32),
                                     axis=-1).astype(logits.dtype)
            att = jnp.einsum("bhts,bshc->bthc", weights, v,
                             precision=self.precision).reshape(b, hw, c)
        out = nn.Dense(c, name="proj", kernel_init=nn.initializers.zeros_init(),
                       dtype=self.dtype, precision=self.precision)(att)
        if r:
            out = out + LoRADense(c, r, name="proj_lora",
                                  precision=self.precision)(att, lora_scale)
        return x + out.reshape(b, hgt, wid, c)


class Sample(nn.Module):
    """Standalone Up/Downsample layer (unet.py:81-140)."""

    spec: SampleSpec
    dtype: jnp.dtype = jnp.float32
    precision: object = None
    small_conv_matmul: int = 0
    pallas_conv_min: int = 0

    @nn.compact
    def __call__(self, x):
        s = self.spec
        if s.mode == "up":
            x = _upsample_nearest(x)
            if s.use_conv:
                x = _conv(s.out_ch, name="conv", dtype=self.dtype,
                          precision=self.precision,
                          small_matmul=self.small_conv_matmul,
                          pallas_min=self.pallas_conv_min)(x)
            return x
        if s.use_conv:
            return _conv(s.out_ch, stride=2, name="conv", dtype=self.dtype,
                         precision=self.precision)(x)
        assert s.ch == s.out_ch
        return _avg_pool2(x)


# ----------------------------------------------------------------- model
class UNetModel(nn.Module):
    """The full UNet; input NHWC `(B, H, W, C)`, timesteps `(B,)`."""

    cfg: UNetConfig

    _LORA_GROUPS = {"in": "input_blocks", "mid": "middle_block",
                    "out": "output_blocks"}

    def _lora_rank_for(self, name: str) -> int:
        # LoRA rank for block `name`, honouring `lora_include_blocks`
        # (reference include_blocks filter, lora.py:274-297).
        if not self.cfg.lora_rank:
            return 0
        group = self._LORA_GROUPS[name.split("_")[0]]
        return self.cfg.lora_rank if group in self.cfg.lora_include_blocks else 0

    def _make(self, spec, name):
        dtype = jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32
        prec = self.cfg.precision
        if isinstance(spec, ResSpec):
            return ResBlock(spec, self.cfg.model_channels * 4, self.cfg.dropout,
                            self.cfg.use_scale_shift_norm, dtype=dtype,
                            precision=prec, lora_rank=self._lora_rank_for(name),
                            small_conv_matmul=self.cfg.small_conv_matmul,
                            pallas_conv_min=self.cfg.pallas_conv_min,
                            name=name)
        if isinstance(spec, AttnSpec):
            return AttentionBlock(spec, dtype=dtype, precision=prec,
                                  lora_rank=self._lora_rank_for(name),
                                  attention_impl=self.cfg.attention_impl,
                                  name=name)
        if isinstance(spec, SampleSpec):
            return Sample(spec, dtype=dtype, precision=prec,
                          small_conv_matmul=self.cfg.small_conv_matmul,
                          pallas_conv_min=self.cfg.pallas_conv_min, name=name)
        if isinstance(spec, ConvSpec):
            return _conv(spec.out_ch, name=name, dtype=dtype, precision=prec)
        raise TypeError(spec)

    @nn.compact
    def __call__(self, x, timesteps, *, deterministic: bool = True,
                 lora_scale=1.0):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        in_dtype = x.dtype
        input_blocks, middle_block, output_blocks, _ = build_arch_spec(cfg)

        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(cfg.model_channels * 4, name="time_dense_0", dtype=dtype,
                       precision=cfg.precision)(emb)
        emb = nn.Dense(cfg.model_channels * 4, name="time_dense_1", dtype=dtype,
                       precision=cfg.precision)(jax.nn.silu(emb))

        def call(layer, spec, h):
            if isinstance(spec, ResSpec):
                return layer(h, emb, deterministic=deterministic,
                             lora_scale=lora_scale)
            if isinstance(spec, AttnSpec):
                return layer(h, lora_scale=lora_scale)
            return layer(h)

        h = x.astype(dtype)
        hs = []
        for i, block in enumerate(input_blocks):
            for j, spec in enumerate(block):
                h = call(self._make(spec, f"in_{i}_{j}"), spec, h)
            hs.append(h)
        for j, spec in enumerate(middle_block):
            h = call(self._make(spec, f"mid_{j}"), spec, h)
        for i, block in enumerate(output_blocks):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, spec in enumerate(block):
                h = call(self._make(spec, f"out_{i}_{j}"), spec, h)

        h = h.astype(in_dtype)
        h = GroupNorm32(h.shape[-1], name="final_norm")(h)
        h = jax.nn.silu(h)
        h = _conv(cfg.out_channels, name="final_conv", zero_init=True,
                  precision=cfg.precision)(h)
        # learn_sigma models: return the mean channel only (unet.py:668-671)
        if cfg.out_channels == 2:
            return h[..., :1]
        return h


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


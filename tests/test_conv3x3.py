"""Pallas 3x3 conv kernel (ops/conv3x3.py): exact conv semantics.

Runs the TPU kernel in interpreter mode on the CPU mesh (tests/conftest.py
forces the cpu platform), against `lax.conv_general_dilated` as the oracle
— the same oracle the golden torch-parity tests pin the UNet convs to.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from diffusion_models_dev_project_tpu.ops.conv3x3 import conv3x3_same


def _oracle(x, k, b):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


@pytest.mark.parametrize("shape", [(1, 32, 32, 8, 16), (2, 64, 16, 16, 8),
                                   (1, 16, 48, 32, 32)])
def test_matches_xla_conv(shape):
    b, h, w, cin, cout = shape
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (b, h, w, cin), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (cout,), jnp.float32)
    ref = _oracle(x, kern, bias)
    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_same(x, kern, bias, tile_h=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_unet_dispatch_equivalence():
    """A bf16 UNet with pallas_conv_min set produces the same output as the
    XLA-conv UNet (same params), kernel interpreted on CPU."""
    import dataclasses

    from diffusion_models_dev_project_tpu.models.unet import (UNetConfig,
                                                              UNetModel)

    cfg = UNetConfig(image_size=64, model_channels=64,
                     channel_mult=(1, 2), num_res_blocks=1,
                     attention_resolutions=(), num_head_channels=32,
                     use_scale_shift_norm=True, resblock_updown=True,
                     dtype="bfloat16")
    model = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 1), jnp.float32)
    t = jnp.full((1,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    ref = model.apply({"params": params}, x, t)

    cfg_p = dataclasses.replace(cfg, pallas_conv_min=1024)
    with pltpu.force_tpu_interpret_mode():
        out = UNetModel(cfg_p).apply({"params": params}, x, t)
    # identical math up to fp32-accumulation association differences
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-2)
    assert float(jnp.max(jnp.abs(out - ref))) <= 2e-2

"""Analytic FLOP counter (utils/flops.py) against hand-computed cases."""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_models_dev_project_tpu.utils.flops import fn_flops


def test_dot_general():
    f = lambda a, b: a @ b
    flops = fn_flops(f, jnp.ones((8, 16)), jnp.ones((16, 32)))
    assert flops == 2 * 8 * 16 * 32


def test_conv():
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    flops = fn_flops(f, jnp.ones((2, 8, 8, 3)), jnp.ones((3, 3, 3, 5)))
    # 2 * |out| * cin * kh * kw
    assert flops == 2 * (2 * 8 * 8 * 5) * 3 * 9


def test_scan_multiplies():
    def f(x):
        w = jnp.ones((4, 4))
        return jax.lax.scan(lambda c, _: (c @ w, None), x, None, length=7)[0]
    flops = fn_flops(f, jnp.ones((4, 4)))
    assert flops == 7 * 2 * 4 * 4 * 4


def test_unet_forward_magnitude():
    """The 64² UNet forward must land in the right FLOPs ballpark (conv
    terms dominate; > 2·params is NOT required at small spatial size, but
    it must exceed the largest single conv)."""
    from diffusion_models_dev_project_tpu.models.unet import UNetModel, UNetConfig

    cfg = UNetConfig(image_size=64, in_channels=1, out_channels=1,
                     model_channels=32, num_res_blocks=1,
                     attention_resolutions=(16,), channel_mult=(1, 2),
                     num_heads=4, num_head_channels=8)
    model = UNetModel(cfg)
    x = jnp.zeros((1, 64, 64, 1))
    t = jnp.zeros((1,))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    flops = fn_flops(lambda v, xx, tt: model.apply(v, xx, tt), params, x, t)
    # largest single conv: 3x3, 32->32 at 64² = 2*64*64*32*32*9 ≈ 0.24 GF
    assert flops > 2 * 64 * 64 * 32 * 32 * 9
    assert flops < 1e12


def test_pallas_call_grid_multiplier():
    """pallas_call kernels compute ONE grid cell; the counter must scale by
    |grid| (BENCH.md r5: one-tile counting under-reported the 9-shift conv
    UNet's MFU 12.4% vs 41.7% actual)."""
    from diffusion_models_dev_project_tpu.ops.conv3x3 import conv3x3_same

    H, W, Cin, Cout = 64, 64, 32, 32
    x = jnp.zeros((1, H, W, Cin), jnp.float32)
    k = jnp.zeros((3, 3, Cin, Cout), jnp.float32)
    b = jnp.zeros((Cout,), jnp.float32)
    flops = fn_flops(lambda v: conv3x3_same(v, k, b, tile_h=8), x)
    assert flops == 2.0 * H * W * Cin * Cout * 9

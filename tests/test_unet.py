import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_models_dev_project_tpu.models import (
    UNetModel, UNetConfig, build_arch_spec, convert_torch_state_dict,
    convert_ema_state, timestep_embedding, torch_key_map)

from _reference import load_ref_unet

ref_unet = load_ref_unet()

TINY = UNetConfig(
    image_size=32, in_channels=1, out_channels=1, model_channels=32,
    num_res_blocks=1, attention_resolutions=(4,), channel_mult=(1, 2),
    num_heads=4, num_head_channels=8, use_scale_shift_norm=True,
    resblock_updown=True)


def _init(cfg, bs=2):
    model = UNetModel(cfg)
    x = jnp.zeros((bs, cfg.image_size, cfg.image_size, cfg.in_channels))
    t = jnp.ones((bs,)) * 0.5
    params = model.init(jax.random.PRNGKey(0), x, t)
    return model, params


def test_timestep_embedding_matches_convention():
    t = jnp.array([0.0, 1.0, 7.3])
    emb = timestep_embedding(t, 16)
    assert emb.shape == (3, 16)
    np.testing.assert_allclose(np.asarray(emb[0, :8]), np.ones(8), atol=1e-6)  # cos(0)
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), np.zeros(8), atol=1e-6)  # sin(0)


def test_unet_forward_shapes_and_zero_init():
    model, params = _init(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    out = model.apply(params, x, jnp.ones((2,)) * 0.3)
    assert out.shape == (2, 32, 32, 1)
    # zero-init final conv -> output is exactly 0 at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=0.0)


def test_unet_learn_sigma_slices_channel():
    cfg = UNetConfig(**{**TINY.__dict__, "out_channels": 2})
    model, params = _init(cfg)
    out = model.apply(params, jnp.ones((1, 32, 32, 1)), jnp.ones((1,)))
    assert out.shape == (1, 32, 32, 1)


def test_arch_spec_counts():
    inp, mid, outp, ch0 = build_arch_spec(TINY)
    # stem + per level (1 res[+attn]) + downs between levels
    assert len(inp) == 1 + 2 * TINY.num_res_blocks + 1
    assert len(mid) == 3
    assert len(outp) == len(TINY.channel_mult) * (TINY.num_res_blocks + 1)
    assert ch0 == 32


@pytest.mark.skipif(ref_unet is None, reason="reference torch UNet unavailable")
class TestTorchParity:
    def _torch_model(self, out_channels=1):
        import torch

        torch.manual_seed(0)
        m = ref_unet.UNetModel(
            image_size=32, in_channels=1, model_channels=32,
            out_channels=out_channels, num_res_blocks=1,
            attention_resolutions=(4,), dropout=0.0, channel_mult=(1, 2),
            num_classes=None, use_checkpoint=False, use_fp16=False,
            num_heads=4, num_head_channels=8, num_heads_upsample=-1,
            use_scale_shift_norm=True, resblock_updown=True,
            use_new_attention_order=False)
        m.eval()
        # randomize the zero-init weights too, to make the test discriminative
        with torch.no_grad():
            for name, p in m.named_parameters():
                if p.abs().sum() == 0:
                    p.add_(torch.randn_like(p) * 0.02)
        return m

    def test_key_map_covers_state_dict(self):
        m = self._torch_model()
        keys = {k for k, _, _ in torch_key_map(TINY)}
        assert keys == set(m.state_dict().keys())

    @pytest.mark.parametrize("out_channels", [1, 2])
    def test_forward_parity(self, out_channels):
        import torch

        m = self._torch_model(out_channels)
        cfg = UNetConfig(**{**TINY.__dict__, "out_channels": out_channels})
        params = {"params": convert_torch_state_dict(m.state_dict(), cfg)}
        model = UNetModel(cfg)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 1, 32, 32)).astype(np.float32)
        t = np.array([0.2, 0.8], dtype=np.float32)
        with torch.no_grad():
            ref_out = m(torch.from_numpy(x), torch.from_numpy(t)).numpy()
        ours = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
        ours = np.asarray(ours).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)

    def test_ema_conversion(self):
        import torch

        m = self._torch_model()
        shadow = [p.clone() for p in m.parameters()]
        ema_state = {"decay": 0.999, "num_updates": 10, "shadow_params": shadow}
        params = convert_ema_state(ema_state, TINY)
        direct = convert_torch_state_dict(m.state_dict(), TINY)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b), params, direct)


def test_create_model_config_matches_reference_derivations():
    """channel_mult-from-image-size table and attention_ds arithmetic
    (reference create_model, exp_utils.py:40-96)."""
    import ml_collections

    from diffusion_models_dev_project_tpu.models.unet import create_model_config

    def mk(image_size, channel_mult="", attn="16"):
        m = ml_collections.ConfigDict()
        m.image_size = image_size
        m.in_channels = 1
        m.out_channels = 1
        m.num_channels = 128
        m.num_res_blocks = 2
        m.attention_resolutions = attn
        m.channel_mult = channel_mult
        m.num_heads = 4
        m.num_head_channels = 64
        m.num_heads_upsample = -1
        m.use_scale_shift_norm = True
        m.resblock_updown = True
        return m

    assert create_model_config(mk(256)).channel_mult == (1, 1, 2, 2, 4, 4)
    assert create_model_config(mk(512)).channel_mult == (0.5, 1, 1, 2, 2, 4, 4)
    assert create_model_config(mk(128)).channel_mult == (1, 1, 2, 3, 4)
    assert create_model_config(mk(64)).channel_mult == (1, 2, 3, 4)
    # attention_resolutions "16,8" -> downsample rates image_size // res
    cfg = create_model_config(mk(256, attn="16,8"))
    assert cfg.attention_resolutions == (16, 32)
    # explicit channel_mult string wins over the table
    assert create_model_config(mk(256, channel_mult="1,2,4")).channel_mult == (1, 2, 4)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        create_model_config(mk(96))


def test_small_conv_matmul_forward_parity():
    """The im2col matmul path for small-spatial 3x3 convs is numerically
    the conv it replaces: same params, same forward (fp32, CPU exact up to
    reduction order).  threshold=32*32 flips EVERY 3x3 stride-1 conv of the
    32² TINY model onto the matmul path."""
    model, params = _init(TINY)
    cfg2 = UNetConfig(**{**TINY.__dict__, "small_conv_matmul": 32 * 32})
    model2 = UNetModel(cfg2)
    # identical param structure: the matmul module declares the same
    # kernel/bias params as nn.Conv
    p2 = model2.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                     jnp.ones((1,)))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 1))
    t = jnp.ones((2,)) * 0.4
    ref = model.apply(params, x, t)
    out = model2.apply(params, x, t)     # SAME params, new path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_create_model_config_threads_perf_fields():
    import ml_collections

    from diffusion_models_dev_project_tpu.models.unet import create_model_config

    m = ml_collections.ConfigDict()
    m.image_size = 256
    m.in_channels = 1
    m.out_channels = 1
    m.num_channels = 128
    m.num_res_blocks = 1
    m.attention_resolutions = "16"
    m.num_heads = 4
    m.num_head_channels = 64
    m.num_heads_upsample = -1
    m.use_scale_shift_norm = True
    m.resblock_updown = True
    m.channel_mult = ""
    m.attention_impl = "flash"
    m.small_conv_matmul = 1024
    cfg = create_model_config(m)
    assert cfg.attention_impl == "flash"
    assert cfg.small_conv_matmul == 1024
    # defaults when the fields are absent
    del m.attention_impl, m.small_conv_matmul
    cfg = create_model_config(m)
    assert cfg.attention_impl == "auto" and cfg.small_conv_matmul == 0

"""Smoke + behavior tests for the remaining backbones (UNet1d, ADM UNet, DiT,
WaveNet, DAC)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiodiffuser_tpu.models import (
    DAC,
    DiT,
    FineTuneAutoencoder,
    UNet1dBase,
    UNetModel,
    WaveNetNoise,
)

KEY = jax.random.key(0)


def test_unet1d_forward_and_zero_init():
    net = UNet1dBase(
        channels=16,
        cond_drop_prob=0.0,
        class_cond=True,
        num_classes=10,
        num_filters=16,
        window_length=5,
        stride=1,
        in_channels=1,
        multipliers=[1, 2, 2],
        factors=[2, 2],
        num_blocks=[1, 1],
        attentions=[False, True],
        attention_heads=2,
        attention_multiplier=2,
        resnet_groups=4,
        kernel_multiplier_downsample=2,
        use_nearest_upsample=False,
        use_skip_scale=True,
        use_attention_bottleneck=True,
    )
    x = jax.random.normal(KEY, (2, 64, 1))
    t = jnp.asarray([0.1, 0.9])
    classes = jnp.asarray([3, 5])
    variables = net.init(jax.random.key(1), x, t, classes=classes)
    out = net.apply(variables, x, t, classes=classes)
    assert out.shape == x.shape
    # zero-init WAVdec head
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet1d_nearest_upsample_and_factor1():
    net = UNet1dBase(
        channels=16,
        num_filters=16,
        window_length=3,
        stride=1,
        in_channels=2,
        multipliers=[1, 2],
        factors=[1],
        num_blocks=[1],
        attentions=[False],
        attention_heads=2,
        attention_multiplier=2,
        resnet_groups=4,
        kernel_multiplier_downsample=2,
        use_nearest_upsample=True,
        use_skip_scale=False,
        use_attention_bottleneck=False,
    )
    x = jax.random.normal(KEY, (1, 32, 2))
    t = jnp.asarray([0.5])
    variables = net.init(jax.random.key(2), x, t)
    out = net.apply(variables, x, t)
    assert out.shape == x.shape


def test_adm_unet_forward():
    net = UNetModel(
        image_size=32,
        in_channels=2,
        model_channels=32,
        out_channels=2,
        num_res_blocks=1,
        attention_resolutions="8",
        channel_mult=(1, 2),
        num_classes=10,
        num_heads=2,
    )
    x = jax.random.normal(KEY, (2, 32, 32, 2))
    t = jnp.asarray([0.2, 0.8])
    classes = jnp.asarray([0, 9])
    variables = net.init(jax.random.key(3), x, t, classes=classes)
    out = net.apply(variables, x, t, classes=classes)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero-init final conv


def test_adm_unet_checkpointing_grads():
    net = UNetModel(
        image_size=16,
        in_channels=2,
        model_channels=32,
        out_channels=2,
        num_res_blocks=1,
        attention_resolutions="8",
        channel_mult=(1, 2),
        num_classes=None,
        num_heads=2,
        use_checkpoint=True,
    )
    x = jax.random.normal(KEY, (1, 16, 16, 2))
    t = jnp.asarray([0.5])
    variables = net.init(jax.random.key(4), x, t)

    def loss(params):
        return jnp.mean(net.apply({"params": params}, x, t) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))


def test_dit_forward_2d_and_1d():
    net = DiT(
        input_size=[16, 8],
        patch_size=[2, 2],
        in_channels=2,
        hidden_size=32,
        depth=2,
        num_heads=2,
        label_cond=True,
        num_classes=10,
        cond_drop_prob=0.0,
    )
    x = jax.random.normal(KEY, (2, 16, 8, 2))
    t = jnp.asarray([0.1, 0.7])
    classes = jnp.asarray([2, 4])
    variables = net.init(jax.random.key(5), x, t, classes=classes)
    out = net.apply(variables, x, t, classes=classes)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # adaLN-zero final

    # 3-D input path
    net1d = DiT(
        input_size=[1, 16],
        patch_size=[1, 4],
        in_channels=2,
        hidden_size=32,
        depth=1,
        num_heads=2,
    )
    x1 = jax.random.normal(KEY, (2, 16, 2))
    v1 = net1d.init(jax.random.key(6), x1, t)
    out1 = net1d.apply(v1, x1, t)
    assert out1.shape == x1.shape


def test_wavenet_forward():
    net = WaveNetNoise(residual_channels=16, residual_layers=4, dilation_cycle=2)
    audio = jax.random.normal(KEY, (2, 256))
    t = jnp.asarray([10.0, 100.0])
    variables = net.init(jax.random.key(7), audio, t)
    out = net.apply(variables, audio, t)
    assert out.shape == audio.shape
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # zero-init output proj


def test_dac_roundtrip_shapes():
    dac = DAC(
        encoder_dim=8,
        encoder_rates=(2, 2),
        decoder_dim=32,
        decoder_rates=(2, 2),
        n_codebooks=2,
        codebook_size=16,
        codebook_dim=4,
    )
    audio = jax.random.normal(KEY, (2, 64, 1)) * 0.2
    variables = dac.init(jax.random.key(8), audio)
    out = dac.apply(variables, audio)
    assert out["audio"].shape == audio.shape
    assert out["codes"].shape == (2, 2, 16)  # hop = 2*2 -> T/4
    assert out["z"].shape[1] == 16
    assert np.isfinite(float(out["vq/commitment_loss"]))

    # from_codes roundtrip: re-decode the emitted codes to the same z_q
    z_q2, z_p, codes = dac.apply(
        variables, out["codes"], method=lambda m, c: m.quantizer.from_codes(c)
    )
    assert z_q2.shape == out["z"].shape


def test_dac_vae_head():
    vae = FineTuneAutoencoder(
        intermediate_embedding_size=[1024, 64], latent_dim=8
    )
    x = jax.random.normal(KEY, (2, 16, 1024)) * 0.1
    variables = vae.init(
        {"params": jax.random.key(9), "vae": jax.random.key(10)}, x, True
    )
    out, kl = vae.apply(
        variables, x, True, rngs={"vae": jax.random.key(11)}
    )
    assert out.shape == x.shape
    assert float(kl) >= 0

"""Coverage for the less-traveled conditioning paths: UNet2d parallel
condition-encoder branch, UNet1d inj_embeddings/inj_channels (diffae-style),
DiT text conditioning, qk-l2norm attention."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.models.attention import Attention
from audiodiffuser_tpu.models.dit import DiT
from audiodiffuser_tpu.models.unet1d import UNet1dBase
from audiodiffuser_tpu.models.unet2d import UNet2dBase


def test_unet2d_condition_block_branch():
    """use_condition_block + inj_channels runs the parallel encoder with CFG
    masking of the injected features (reference unet2d.py:927-939)."""
    net = UNet2dBase(
        dim=16,
        num_classes=0,
        dim_mults=[1, 2],
        channels=2,
        num_resnet_blocks=1,
        resnet_groups=4,
        layer_attns=[False, False],
        layer_cross_attns=[False, False],
        attn_heads=2,
        memory_efficient=True,
        use_condition_block=True,
        channel_infuse_mode="add",
    )
    x = jax.random.normal(jax.random.key(0), (2, 16, 8, 2))
    inj = jax.random.normal(jax.random.key(1), (2, 16, 8, 2))
    t = jnp.asarray([0.1, 0.9])
    variables = net.init(jax.random.key(2), x, t, inj_channels=inj)
    out = net.apply(variables, x, t, inj_channels=inj)
    assert out.shape == x.shape

    # injected features must influence the output (perturb params off zero)
    params = jax.tree.map(lambda a: a + 0.01, variables["params"])
    out_a = net.apply({"params": params}, x, t, inj_channels=inj)
    out_b = net.apply({"params": params}, x, t, inj_channels=jnp.zeros_like(inj))
    assert np.abs(np.asarray(out_a - out_b)).max() > 1e-7

    # with the CFG mask dropping every item, the output must be independent
    # of the injected values (zeros are injected at every stage)
    mask = jnp.ones(2, dtype=bool)
    out_d1 = net.apply({"params": params}, x, t, inj_channels=inj, cond_drop_mask=mask)
    out_d2 = net.apply(
        {"params": params}, x, t, inj_channels=inj * -3.0 + 1.0, cond_drop_mask=mask
    )
    np.testing.assert_allclose(np.asarray(out_d1), np.asarray(out_d2), atol=1e-6)


def test_unet2d_conv_infuse_mode():
    net = UNet2dBase(
        dim=16,
        num_classes=0,
        dim_mults=[1, 2],
        channels=2,
        num_resnet_blocks=1,
        resnet_groups=4,
        layer_attns=[False, False],
        layer_cross_attns=[False, False],
        attn_heads=2,
        memory_efficient=True,
        use_condition_block=True,
        channel_infuse_mode="conv",
    )
    x = jax.random.normal(jax.random.key(3), (1, 16, 8, 2))
    inj = jax.random.normal(jax.random.key(4), (1, 16, 8, 2))
    t = jnp.asarray([0.5])
    variables = net.init(jax.random.key(5), x, t, inj_channels=inj)
    assert "channel_cond_conv" in str(jax.tree_util.tree_structure(variables))
    out = net.apply(variables, x, t, inj_channels=inj)
    assert out.shape == x.shape


def test_unet1d_inj_embeddings_and_channels():
    net = UNet1dBase(
        channels=16,
        num_filters=16,
        window_length=4,
        stride=2,
        in_channels=1,
        multipliers=[1, 2],
        factors=[2],
        num_blocks=[1],
        attentions=[False],
        attention_heads=2,
        attention_multiplier=2,
        resnet_groups=4,
        kernel_multiplier_downsample=2,
        use_nearest_upsample=False,
        use_skip_scale=True,
        use_attention_bottleneck=False,
        use_condition_block=True,
    )
    x = jax.random.normal(jax.random.key(6), (2, 64, 1))
    t = jnp.asarray([0.2, 0.8])
    # diffae-style multiplicative gate; [B, 1, 1] broadcasts at every level
    inj_emb = jax.random.normal(jax.random.key(7), (2, 1, 1)) * 0.1 + 1.0
    inj_ch = jax.random.normal(jax.random.key(8), (2, 64, 1))
    variables = net.init(
        jax.random.key(9), x, t, inj_embeddings=inj_emb, inj_channels=inj_ch
    )
    out = net.apply(variables, x, t, inj_embeddings=inj_emb, inj_channels=inj_ch)
    assert out.shape == x.shape


def test_dit_text_conditioning_and_qk_l2norm():
    net = DiT(
        input_size=[8, 8],
        patch_size=[2, 2],
        in_channels=2,
        hidden_size=32,
        depth=1,
        num_heads=2,
        text_cond=True,
        text_embed_dim=16,
        max_text_len=4,
        use_qk_l2norm=True,
    )
    x = jax.random.normal(jax.random.key(10), (2, 8, 8, 2))
    t = jnp.asarray([0.3, 0.6])
    text = jax.random.normal(jax.random.key(11), (2, 3, 16))
    tmask = jnp.asarray([[1, 1, 1], [1, 0, 0]], dtype=bool)
    variables = net.init(
        jax.random.key(12), x, t, text_embeds=text, text_mask=tmask, cond_drop_prob=0.0
    )
    out = net.apply(
        variables, x, t, text_embeds=text, text_mask=tmask, cond_drop_prob=0.0
    )
    assert out.shape == x.shape
    # qk-l2norm learned scales exist
    flat = str(jax.tree_util.tree_structure(variables))
    assert "q_scale" in flat and "k_scale" in flat


def test_attention_cross_only_path():
    """Pure cross-attention (use_self_text_cond=False) with RoPE."""
    attn = Attention(dim=16, heads=2, context_dim=8, use_self_text_cond=False)
    x = jax.random.normal(jax.random.key(13), (2, 6, 16))
    ctx = jax.random.normal(jax.random.key(14), (2, 3, 8))
    variables = attn.init(jax.random.key(15), x, ctx)
    out = attn.apply(variables, x, ctx)
    assert out.shape == x.shape

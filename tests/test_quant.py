"""W8A8 int8 conv for the sampling fast path (ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.ops.quant import (
    int8_conv,
    quantize_activation,
    quantize_weight,
)


def test_weight_quant_roundtrip_error():
    w = jax.random.normal(jax.random.key(0), (3, 3, 16, 8)) * 0.3
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (8,)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(ws) - np.asarray(w))
    # symmetric absmax: error bounded by half an LSB per channel
    assert (err <= np.asarray(ws) * 0.5 + 1e-7).all()


def test_activation_quant_roundtrip_error():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 16))
    xq, xs = quantize_activation(x)
    err = np.abs(np.asarray(xq, np.float32) * float(xs) - np.asarray(x))
    assert (err <= float(xs) * 0.5 + 1e-7).all()


def test_int8_conv_close_to_fp():
    k1, k2 = jax.random.split(jax.random.key(2))
    x = jax.random.normal(k1, (2, 16, 8, 32), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 32, 32)) * 0.1
    bias = jnp.ones((32,)) * 0.05
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    got = int8_conv(x, w, bias)
    ref_n = np.asarray(ref)
    rms = np.sqrt(np.mean((np.asarray(got, np.float32) - ref_n) ** 2))
    scale_ref = np.sqrt(np.mean(ref_n**2))
    # W8A8 double-quant noise: ~1% relative RMS at these magnitudes
    assert rms / scale_ref < 0.03, (rms, scale_ref)


def test_int8_conv_ste_gradient_matches_fp_conv():
    k1, k2 = jax.random.split(jax.random.key(3))
    x = jax.random.normal(k1, (1, 8, 8, 16), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 16, 16)) * 0.1
    bias = jnp.zeros((16,))

    gq = jax.grad(lambda x, w: jnp.sum(int8_conv(x, w, bias) ** 2), argnums=(0, 1))
    # STE backward = the fp conv VJP applied to g = 2*y_q (the quantised
    # forward's cotangent), so compare against the fp VJP with that same g
    yq = int8_conv(x, w, bias)

    def fp_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bias

    _, vjp = jax.vjp(fp_conv, x, w)
    want = vjp(2.0 * yq)
    got = gq(x, w)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_block_int8_path_param_compat(monkeypatch):
    """ADT_INT8=1 must keep the Block param tree identical (ckpt interchange)
    and produce outputs close to the fp path."""
    from audiodiffuser_tpu.models.layers import Block

    x = jax.random.normal(jax.random.key(4), (2, 16, 8, 128), jnp.float32)
    blk = Block(128, groups=8)
    p_ref = blk.init(jax.random.key(5), x)
    y_ref = blk.apply(p_ref, x)

    monkeypatch.setenv("ADT_INT8", "1")
    p_q = blk.init(jax.random.key(5), x)
    # params tree identical (init additionally creates the calibration
    # stats collection, which checkpoints never store)
    assert jax.tree_util.tree_structure(
        p_ref["params"]
    ) == jax.tree_util.tree_structure(p_q["params"])
    y_q = blk.apply(p_ref, x)
    ref = np.asarray(y_ref, np.float32)
    rms = np.sqrt(np.mean((np.asarray(y_q, np.float32) - ref) ** 2))
    assert rms / (np.sqrt(np.mean(ref**2)) + 1e-9) < 0.03


def _mk_toy_task():
    from audiodiffuser_tpu.diffusion import EluDiffusion
    from audiodiffuser_tpu.models.unet2d import UNet2dBase
    from audiodiffuser_tpu.ops.distributions import LogNormalDistribution
    from audiodiffuser_tpu.ops.schedules import KarrasSchedule
    from audiodiffuser_tpu.samplers.edm import EDMSampler
    from audiodiffuser_tpu.tasks.diffusion_task import DiffusionSpecTask

    return DiffusionSpecTask(
        net=UNet2dBase(
            dim=128, num_classes=4, dim_mults=[1, 2], channels=2,
            num_resnet_blocks=1, resnet_groups=8,
            layer_attns=[False, False], layer_cross_attns=[False, False],
            memory_efficient=True,
        ),
        diffusion=EluDiffusion(sigma_data=0.2),
        sampler=EDMSampler(s_churn=0.0, num_steps=3, use_heun=False),
        noise_scheduler=KarrasSchedule(
            sigma_min=0.01, sigma_max=10.0, rho=7.0, num_steps=3
        ),
        noise_distribution=LogNormalDistribution(mean=-1.2, std=1.2),
        n_fft=62, hop_length=16, generated_frame_length=16,
        generated_sample_class=4,
    )


def test_static_scale_calibration_sampling(monkeypatch):
    """calibrate_int8_scales populates quant_scales; static-scale sampling
    runs and stays close to the bf16 samples."""
    monkeypatch.setenv("ADT_INT8", "1")
    import jax

    mk_task = _mk_toy_task
    task = mk_task()
    x0 = jnp.zeros((1, 32, 16, 2))
    params = task.net.init(
        jax.random.key(0), x0, jnp.zeros((1,)), classes=jnp.zeros((1,), jnp.int32)
    )["params"]

    # per-step calibration (the default): [S]-stacked scale leaves, one per
    # sigma-grid point, selected at sampling time by nearest-log-sigma
    task.calibrate_int8_scales(params, jax.random.key(1), batch=2)
    assert task.quant_scales is not None
    n_sig = int(task.sigmas.shape[0])
    leaves = jax.tree.leaves(task.quant_scales)
    assert leaves
    for s in leaves:
        assert s.shape == (n_sig,)
        assert float(jnp.min(s)) > 0

    classes = jnp.zeros((2,), jnp.int32)
    wav_static = task.make_sample_fn()(params, jax.random.key(2), classes)

    # global-static calibration (ADT_INT8_PER_STEP=0 path): scalar leaves
    task_glob = mk_task()
    task_glob.calibrate_int8_scales(params, jax.random.key(1), batch=2,
                                    per_step=False)
    assert all(s.ndim == 0 for s in jax.tree.leaves(task_glob.quant_scales))
    wav_glob = task_glob.make_sample_fn()(params, jax.random.key(2), classes)

    # dynamic-quant output (no static scales) as the comparison point
    task_dyn = mk_task()
    wav_dyn = task_dyn.make_sample_fn()(params, jax.random.key(2), classes)
    b = np.asarray(wav_dyn, np.float32)
    b_rms = np.sqrt(np.mean(b**2)) + 1e-9
    for wav in (wav_static, wav_glob):
        a = np.asarray(wav, np.float32)
        rms = np.sqrt(np.mean((a - b) ** 2)) / b_rms
        assert rms < 0.2, rms
    # per-step static scales should track the dynamic (per-call absmax)
    # reference at least as well as one global scale does
    err_step = np.sqrt(np.mean((np.asarray(wav_static, np.float32) - b) ** 2))
    err_glob = np.sqrt(np.mean((np.asarray(wav_glob, np.float32) - b) ** 2))
    assert err_step <= err_glob * 1.25, (err_step, err_glob)


def test_quantconv_param_tree_matches_nn_conv(monkeypatch):
    """QuantConv must expose kernel/bias like nn.Conv (checkpoint compat),
    match its output in fp mode, and quantize under ADT_INT8_ALL=1."""
    import flax.linen as nn

    from audiodiffuser_tpu.models.layers import QuantConv

    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 128))
    ref_mod = nn.Conv(128, (1, 1), name="c")
    q_mod = QuantConv(128, (1, 1), name="c")
    p_ref = ref_mod.init(jax.random.key(1), x)
    p_q = q_mod.init(jax.random.key(1), x)
    assert jax.tree_util.tree_structure(p_ref) == jax.tree_util.tree_structure(p_q)
    np.testing.assert_allclose(
        np.asarray(q_mod.apply(p_ref, x)), np.asarray(ref_mod.apply(p_ref, x)),
        rtol=1e-5, atol=1e-5,
    )

    monkeypatch.setenv("ADT_INT8", "1")
    monkeypatch.setenv("ADT_INT8_ALL", "1")
    y_q = q_mod.apply(p_ref, x)
    ref = np.asarray(ref_mod.apply(p_ref, x), np.float32)
    rms = np.sqrt(np.mean((np.asarray(y_q, np.float32) - ref) ** 2))
    assert 0 < rms / (np.sqrt(np.mean(ref**2)) + 1e-9) < 0.03


def test_calibration_covers_cfg_null_branch(monkeypatch):
    """Regression (round-5 soak post-mortem): calibrate_int8_scales must probe
    the CFG null-embedding branch. The original probe ran cond_scale=1.0 only,
    so the null branch's activation ranges never reached the scales; at
    serving (cond_scale=2.0) the per-step path clipped the null prediction
    and CFG amplified it (direct int8-vs-bf16 FAD 5477 vs 287 for the slack
    global scales — logs/soak_r04/fad_raw.json). Inflating the null embedding
    makes the toy net reproduce that saturation if the null branch is ever
    dropped from calibration again."""
    monkeypatch.setenv("ADT_INT8", "1")

    task = _mk_toy_task()
    x0 = jnp.zeros((1, 32, 16, 2))
    params = task.net.init(
        jax.random.key(0), x0, jnp.zeros((1,)), classes=jnp.zeros((1,), jnp.int32)
    )["params"]
    # make the null branch's activation ranges dominate every class branch:
    # a calibration that skips it must under-scale and saturate
    params = jax.tree_util.tree_map_with_path(
        lambda path, l: l * 30.0
        if any(getattr(k, "key", None) == "null_classes_emb" for k in path)
        else l,
        params,
    )
    inflated = [
        np.abs(np.asarray(l)).max()
        for path, l in jax.tree_util.tree_flatten_with_path(params)[0]
        if any(getattr(k, "key", None) == "null_classes_emb" for k in path)
    ]
    assert inflated and inflated[0] > 10.0  # inflation actually applied

    classes = jnp.zeros((2,), jnp.int32)

    # dynamic-quant (per-call absmax) CFG output is the ground truth the
    # static scales must track
    task_dyn = _mk_toy_task()
    wav_dyn = task_dyn.make_sample_fn(with_cond_scale=True)(
        params, jax.random.key(2), classes, 2.0
    )

    task.calibrate_int8_scales(params, jax.random.key(1), batch=2)
    wav_q = task.make_sample_fn(with_cond_scale=True)(
        params, jax.random.key(2), classes, 2.0
    )

    b = np.asarray(wav_dyn, np.float32)
    rms = np.sqrt(np.mean((np.asarray(wav_q, np.float32) - b) ** 2))
    assert rms / (np.sqrt(np.mean(b**2)) + 1e-9) < 0.2, rms

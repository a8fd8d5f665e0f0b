"""Golden tests for diffusion preconditioning coefficients and losses.

Expected values computed with independent float64 numpy closed forms (EDM
table 1 etc.), plus structural checks of denoise_fn/loss behavior with a
linear toy network.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.diffusion import (
    EluDiffusion,
    ReFlow,
    VDiffusion,
    VEDiffusion,
    VPDiffusion,
)

SIGMAS = np.array([0.002, 0.1, 1.0, 10.0, 80.0], dtype=np.float32)


def _identity_net(x, c_noise, **kw):
    return x


def test_edm_scale_weights_table1():
    d = EluDiffusion(sigma_data=0.5)
    c_skip, c_out, c_in, c_noise = d.get_scale_weights(jnp.asarray(SIGMAS), 4)
    s, sd = SIGMAS.astype(np.float64), 0.5
    np.testing.assert_allclose(
        np.asarray(c_skip).squeeze(), sd**2 / (s**2 + sd**2), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_out).squeeze(), s * sd / np.sqrt(sd**2 + s**2), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(c_in).squeeze(), 1.0 / np.sqrt(s**2 + sd**2), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(c_noise), 0.25 * np.log(s), rtol=1e-5)
    # EDM identity: c_skip^2 + c_out^2/sd^2 ... weight * c_out^2 == 1
    w = np.asarray(d.loss_weight(jnp.asarray(SIGMAS)))
    np.testing.assert_allclose(w * np.asarray(c_out).squeeze() ** 2, 1.0, rtol=1e-4)


def test_ve_scale_weights():
    d = VEDiffusion()
    c_skip, c_out, c_in, c_noise = d.get_scale_weights(jnp.asarray(SIGMAS), 3)
    assert c_skip == 1.0 and c_in == 1.0
    np.testing.assert_allclose(np.asarray(c_out).squeeze(), SIGMAS, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c_noise), np.log(0.5 * SIGMAS.astype(np.float64)), rtol=1e-4, atol=1e-5
    )


def test_vp_sigma_t_roundtrip():
    d = VPDiffusion(beta_min=0.1, beta_d=19.9, M=1000)
    t = jnp.linspace(1e-3, 1.0, 50)
    sig = d.t_to_sigma(t)
    t_back = d.sigma_to_t(sig)
    np.testing.assert_allclose(np.asarray(t_back), np.asarray(t), rtol=2e-3, atol=2e-4)
    c_skip, c_out, c_in, c_noise = d.get_scale_weights(jnp.asarray(SIGMAS), 4)
    s = SIGMAS.astype(np.float64)
    np.testing.assert_allclose(np.asarray(c_out).squeeze(), -s, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(c_in).squeeze(), 1 / np.sqrt(s**2 + 1), rtol=1e-5
    )


def test_edm_denoise_identity_net():
    """With net = identity, x_hat = c_skip*x + c_out*c_in*x must hold."""
    d = EluDiffusion(sigma_data=0.5, dynamic_threshold=0.0)
    x = jax.random.normal(jax.random.key(0), (3, 2, 8, 8)) * 0.1
    sig = jnp.asarray([0.5, 1.0, 2.0])
    got = d.denoise_fn(x, _identity_net, sigmas=sig, inference=False)
    c_skip, c_out, c_in, _ = d.get_scale_weights(sig, 4)
    expect = jnp.clip(c_skip * x + c_out * (c_in * x), -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-6)


def test_cfg_interpolation_matches_two_call():
    """Batched-CFG path == two sequential calls for a per-sample toy net."""

    def toy_net(x, c_noise, cond_drop_prob=0.0, cond_drop_mask=None, **kw):
        # "conditional" net output is x+1; null branch is x-1
        if cond_drop_mask is None:
            return x + 1.0 if cond_drop_prob == 0.0 else x - 1.0
        m = cond_drop_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x - 1.0, x + 1.0)

    d = VEDiffusion()
    x = jax.random.normal(jax.random.key(1), (4, 2, 4, 4))
    sig = jnp.full((4,), 1.0)
    got = d.denoise_fn(x, toy_net, sigmas=sig, inference=True, cond_scale=3.0)
    # two-call reference
    c_skip, c_out, c_in, c_noise = d.get_scale_weights(sig, 4)
    cond = (c_in * x) + 1.0
    null = (c_in * x) - 1.0
    pred = null + (cond - null) * 3.0
    expect = jnp.clip(c_skip * x + c_out * pred, -1, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-6)


def test_edm_loss_weight_normalisation():
    """Perfect denoiser -> zero loss; known-error denoiser -> weighted MSE."""
    d = EluDiffusion(sigma_data=0.5)
    x = jnp.ones((2, 1, 4, 4)) * 0.3
    sig = jnp.asarray([0.4, 2.0])
    noise = jax.random.normal(jax.random.key(2), x.shape)

    # net that inverts the preconditioning exactly: x_pred = (x_clean - c_skip x_noisy)/c_out
    def oracle(xin, c_noise, **kw):
        s = jnp.exp(c_noise * 4.0)
        c_skip, c_out, c_in, _ = d.get_scale_weights(s, x.ndim)
        x_noisy = xin / c_in
        return (x - c_skip * x_noisy) / c_out

    losses = d.loss(x, oracle, sig, noise=noise)
    np.testing.assert_allclose(np.asarray(losses), 0.0, atol=1e-8)


def test_vdiffusion_loss_and_denoise():
    d = VDiffusion()
    x = jax.random.normal(jax.random.key(3), (2, 2, 4, 4)) * 0.2
    t = jnp.asarray([0.3, 0.7])
    noise = jax.random.normal(jax.random.key(4), x.shape)

    # oracle v-net: v = alpha*eps - sigma*x  => zero loss
    def oracle(x_noisy, logsnr, **kw):
        a = jnp.sqrt(jax.nn.sigmoid(logsnr)).reshape(-1, 1, 1, 1)
        s = jnp.sqrt(jax.nn.sigmoid(-logsnr)).reshape(-1, 1, 1, 1)
        return a * noise - s * x

    losses = d.loss(x, oracle, t, noise=noise)
    np.testing.assert_allclose(np.asarray(losses), 0.0, atol=1e-6)


def test_vdiffusion_for_edm_returns_x0():
    d = VDiffusion(for_edm=True)
    x0 = jax.random.normal(jax.random.key(5), (2, 2, 4, 4)) * 0.2
    sigma_edm = jnp.asarray([0.5, 2.0])
    logsnr = -2.0 * jnp.log(sigma_edm)
    a = jnp.sqrt(jax.nn.sigmoid(logsnr)).reshape(-1, 1, 1, 1)
    s = jnp.sqrt(jax.nn.sigmoid(-logsnr)).reshape(-1, 1, 1, 1)
    eps = jax.random.normal(jax.random.key(6), x0.shape)
    # EDM-space state: x = x0 + sigma*eps; v-space state: alpha*x = a*x0+s*eps
    x_edm = x0 + sigma_edm.reshape(-1, 1, 1, 1) * eps

    def oracle(x_noisy, logsnr_in, **kw):
        return a * eps - s * x0

    got = d.denoise_fn(x_edm, oracle, sigmas=sigma_edm, inference=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x0), atol=1e-5)


def test_reflow_loss_and_edm_wrapper():
    d = ReFlow()
    x = jax.random.normal(jax.random.key(7), (2, 1, 8)) * 0.3
    t = jnp.asarray([0.25, 0.75])
    z1 = jax.random.normal(jax.random.key(8), x.shape)

    def oracle(zt, tt, **kw):
        return z1 - x

    losses = d.loss(x, oracle, t, noise=z1)
    np.testing.assert_allclose(np.asarray(losses), 0.0, atol=1e-7)

    # for_edm wrapper: sigma -> t=sigma/(1+sigma); x_edm*(1-t) = zt; returns x0
    d2 = ReFlow(for_edm=True)
    sigma = jnp.asarray([1.0, 3.0])
    tt = sigma / (1 + sigma)
    zt = (1 - tt.reshape(-1, 1, 1)) * x + tt.reshape(-1, 1, 1) * z1
    x_edm = zt / (1 - tt.reshape(-1, 1, 1))
    got = d2.denoise_fn(x_edm, oracle, sigmas=sigma, inference=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-5)


def test_loss_mask_weighting():
    """x_mask weights masked-out regions at 0.01 (EDM) in the loss
    (reference diffusion.py:80-83)."""
    d = EluDiffusion(sigma_data=0.5)
    x = jnp.ones((1, 1, 2, 2)) * 0.3
    sig = jnp.asarray([1.0])
    noise = jnp.ones_like(x)

    def bad_net(xin, c_noise, **kw):
        return jnp.zeros_like(xin)  # constant-wrong prediction

    full = d.loss(x, bad_net, sig, noise=noise)
    mask = jnp.zeros_like(x, dtype=bool)  # everything masked out
    masked = d.loss(x, bad_net, sig, noise=noise, x_mask=mask)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(full) * 0.01, rtol=1e-5)

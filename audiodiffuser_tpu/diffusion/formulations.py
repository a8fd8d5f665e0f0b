"""Diffusion formulations: training objectives + sigma-preconditioned denoisers.

Capability parity with the reference ``src/models/components/diffusion.py``
(Diffusion :15-97, VEDiffusion :99-133, VPDiffusion :136-218, EluDiffusion
:220-258, VDiffusion :260-365, ReFlow :367-442), redesigned for JAX:

- A *network* is any callable ``net(x, c_noise, *, cond_drop_prob=0.0,
  cond_drop_mask=None, key=None, **cond) -> prediction``. Flax backbones are
  bound to their params before reaching this layer, so everything here is a
  pure function of arrays.
- ``denoise_fn`` is the single seam between samplers and networks: it applies
  the formulation's preconditioning x_hat = c_skip*x + c_out*net(c_in*x,
  c_noise) (EDM eq. 7) and classifier-free-guidance interpolation.
- CFG at inference is evaluated as ONE batched network call (conditional and
  null halves concatenated on the batch axis) instead of two sequential calls —
  numerically identical for per-sample norms (Group/LayerNorm) and ~2x better
  MXU utilisation on TPU.
- ``loss`` takes an explicit PRNG key; the injected noise is derived from it so
  parity tests can substitute deterministic noise via ``noise=``.

Every loss returns per-sample losses of shape [B] like the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.utils import clip, extend_dim, to_batch

Network = Callable[..., jnp.ndarray]


def _cfg_apply(
    net: Network,
    x: jnp.ndarray,
    c_noise: jnp.ndarray,
    cond_scale: float,
    cfg_batched: bool = True,
    **cond: Any,
) -> jnp.ndarray:
    """Evaluate net with classifier-free guidance.

    cond_scale == 1 -> single conditional call. Otherwise the conditional and
    unconditional (null-embedding) branches are interpolated
    null + (cond - null) * cond_scale — evaluated as one concatenated batch
    (default; ~2x MXU utilisation) or as two sequential calls
    (``cfg_batched=False``; halves peak activation memory).
    """
    # the ==1.0 shortcut only applies to a CONCRETE scale: a traced
    # cond_scale (e.g. a guidance sweep jitted once over the scale argument)
    # always takes the general CFG path, which is linear in the scale
    if isinstance(cond_scale, (int, float)) and cond_scale == 1.0:
        return net(x, c_noise, cond_drop_prob=0.0, **cond)
    if not cfg_batched:
        x_pred = net(x, c_noise, cond_drop_prob=0.0, **cond)
        null_pred = net(x, c_noise, cond_drop_prob=1.0, **cond)
        return null_pred + (x_pred - null_pred) * cond_scale
    b = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    c2 = jnp.concatenate([c_noise, c_noise], axis=0) if jnp.ndim(c_noise) > 0 else c_noise
    cond2 = {}
    for k, v in cond.items():
        if isinstance(v, jnp.ndarray) and v.ndim > 0 and v.shape[0] == b:
            cond2[k] = jnp.concatenate([v, v], axis=0)
        else:
            cond2[k] = v
    drop_mask = jnp.concatenate(
        [jnp.zeros((b,), dtype=bool), jnp.ones((b,), dtype=bool)], axis=0
    )
    out = net(x2, c2, cond_drop_prob=0.0, cond_drop_mask=drop_mask, **cond2)
    x_pred, null_pred = out[:b], out[b:]
    return null_pred + (x_pred - null_pred) * cond_scale


def _sum_tail_dims(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def _loss_mask(x: jnp.ndarray, x_mask: Optional[jnp.ndarray], off_value: float) -> jnp.ndarray:
    if x_mask is None:
        return jnp.ones_like(x)
    m = x_mask.astype(x.dtype)
    return m + (1.0 - m) * off_value


@dataclass(frozen=True)
class Diffusion:
    """Base class: generic denoising-score-matching template (EDM-style).

    Subclasses define the preconditioning (``get_scale_weights``) and the
    noise-level loss weighting (``loss_weight``).
    """

    dynamic_threshold: float = 0.0
    # batched CFG (single doubled-batch net call) vs two sequential calls
    cfg_batched: bool = True

    # -- formulation-specific -------------------------------------------------
    def get_scale_weights(
        self, sigmas: jnp.ndarray, ex_dim: int
    ) -> Tuple[Any, Any, Any, jnp.ndarray]:
        raise NotImplementedError

    def loss_weight(self, sigmas: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # -- the seam used by every sampler --------------------------------------
    def denoise_fn(
        self,
        x_noisy: jnp.ndarray,
        net: Network,
        inference: bool = False,
        cond_scale: float = 1.0,
        sigmas: Optional[jnp.ndarray] = None,
        sigma: Optional[float] = None,
        **kwargs: Any,
    ) -> jnp.ndarray:
        batch_size = x_noisy.shape[0]
        sigmas = to_batch(batch_size, sigma=sigma, sigmas=sigmas)
        c_skip, c_out, c_in, c_noise = self.get_scale_weights(sigmas, x_noisy.ndim)

        if inference:
            x_pred = _cfg_apply(
                net, c_in * x_noisy, c_noise, cond_scale, self.cfg_batched, **kwargs
            )
        else:
            x_pred = net(c_in * x_noisy, c_noise, **kwargs)

        x_denoised = c_skip * x_noisy + c_out * x_pred
        return clip(x_denoised, dynamic_threshold=self.dynamic_threshold)

    # -- training loss --------------------------------------------------------
    def loss(
        self,
        x: jnp.ndarray,
        net: Network,
        sigmas: jnp.ndarray,
        key: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
        x_mask: Optional[jnp.ndarray] = None,
        **kwargs: Any,
    ) -> jnp.ndarray:
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        sigmas_padded = extend_dim(sigmas, x.ndim)
        x_noisy = x + sigmas_padded * noise
        mask = _loss_mask(x, x_mask, 0.01)
        x_denoised = self.denoise_fn(x_noisy, net, sigmas=sigmas, inference=False, **kwargs)
        losses = _sum_tail_dims((x_denoised - x) ** 2 * mask)
        n_el = math.prod(x.shape[1:])
        return losses * self.loss_weight(sigmas) / n_el

    # Allow hydra-style `diffusion(x, net, sigmas, ...)` call for loss.
    def __call__(self, x, net, sigmas, **kwargs):
        return self.loss(x, net, sigmas, **kwargs)


@dataclass(frozen=True)
class VEDiffusion(Diffusion):
    """Variance-exploding: c_skip=1, c_out=sigma, c_in=1, c_noise=log(sigma/2)."""

    def get_scale_weights(self, sigmas, ex_dim):
        c_noise = jnp.log(0.5 * sigmas)
        sig = extend_dim(sigmas, ex_dim)
        return 1.0, sig, 1.0, c_noise

    def loss_weight(self, sigmas):
        return 1.0 / sigmas**2


@dataclass(frozen=True)
class VPDiffusion(Diffusion):
    """Variance-preserving in EDM's reformulation (beta_d, beta_min, M)."""

    beta_min: float = 0.1
    beta_d: float = 19.9
    M: float = 1000.0

    def t_to_sigma(self, t):
        return jnp.sqrt(jnp.exp(0.5 * self.beta_d * t**2 + self.beta_min * t) - 1.0)

    def sigma_to_t(self, sigmas):
        return (
            jnp.sqrt(self.beta_min**2 + 2.0 * self.beta_d * jnp.log(1.0 + sigmas**2))
            - self.beta_min
        ) / self.beta_d

    def get_scale_weights(self, sigmas, ex_dim):
        c_noise = (self.M - 1.0) * self.sigma_to_t(sigmas)
        sig = extend_dim(sigmas, ex_dim)
        c_skip = 1.0
        c_out = -sig
        c_in = 1.0 / jnp.sqrt(sig**2 + 1.0)
        return c_skip, c_out, c_in, c_noise

    def loss_weight(self, sigmas):
        return 1.0 / sigmas**2

    def loss(
        self,
        x,
        net,
        sigmas,
        key=None,
        noise=None,
        x_mask=None,
        **kwargs,
    ):
        # Training draws t ~ dist; convert to sigma first (reference :185-218).
        sigmas = self.t_to_sigma(sigmas)
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        sigmas_padded = extend_dim(sigmas, x.ndim)
        x_noisy = x + sigmas_padded * noise
        mask = _loss_mask(x, x_mask, 0.1)
        x_denoised = self.denoise_fn(x_noisy, net, sigmas=sigmas, inference=False, **kwargs)
        losses = _sum_tail_dims((x_denoised - x) ** 2 * mask)
        n_el = math.prod(x.shape[1:])
        return losses * self.loss_weight(sigmas) / n_el


@dataclass(frozen=True)
class EluDiffusion(Diffusion):
    """EDM (arXiv:2206.00364) preconditioning with sigma_data (table 1)."""

    sigma_data: float = 0.5

    def get_scale_weights(self, sigmas, ex_dim):
        sd = self.sigma_data
        c_noise = 0.25 * jnp.log(sigmas)
        sig = extend_dim(sigmas, ex_dim)
        c_skip = sd**2 / (sig**2 + sd**2)
        c_out = sig * sd / jnp.sqrt(sd**2 + sig**2)
        c_in = 1.0 / jnp.sqrt(sig**2 + sd**2)
        return c_skip, c_out, c_in, c_noise

    def loss_weight(self, sigmas):
        sd = self.sigma_data
        return (sigmas**2 + sd**2) / (sigmas * sd) ** 2


@dataclass(frozen=True)
class VDiffusion(Diffusion):
    """v-objective (simple diffusion): net predicts v = alpha*eps - sigma*x.

    ``for_edm=True`` wraps the v-net so EDM x0-samplers can drive it: the
    incoming EDM sigma is mapped to logSNR, the state rescaled by alpha, and
    the v-prediction converted to an x0 estimate.
    """

    logsnr_min: float = -15.0
    logsnr_max: float = 15.0
    shift: float = 0.0
    for_edm: bool = False

    def shifted_cosine_transform(self, t):
        t_min = math.atan(math.exp(-0.5 * self.logsnr_max))
        t_max = math.atan(math.exp(-0.5 * self.logsnr_min))
        return -2.0 * jnp.log(jnp.tan(t_min + t * (t_max - t_min))) + 2.0 * self.shift

    def sigma_to_logsnr(self, sigma):
        return -2.0 * jnp.log(sigma)

    def v_to_x0(self, x_noisy, v_pred, alphat, sigmat):
        return alphat * x_noisy - sigmat * v_pred

    def v_to_eps(self, x_noisy, v_pred, alphat, sigmat):
        return sigmat * x_noisy + alphat * v_pred

    def denoise_fn(
        self,
        x_noisy,
        net,
        inference=False,
        cond_scale=1.0,
        sigmas=None,
        sigma=None,
        **kwargs,
    ):
        batch_size = x_noisy.shape[0]
        sigmas = to_batch(batch_size, sigma=sigma, sigmas=sigmas)

        alphat = sigmat = None
        if self.for_edm:
            logsnr = self.sigma_to_logsnr(sigmas)
            sigmat = jnp.sqrt(jax.nn.sigmoid(-logsnr))
            alphat = jnp.sqrt(jax.nn.sigmoid(logsnr))
            x_noisy = x_noisy * extend_dim(alphat, x_noisy.ndim)
            sigmas = logsnr

        if inference:
            v_pred = _cfg_apply(
                net, x_noisy, sigmas, cond_scale, self.cfg_batched, **kwargs
            )
        else:
            v_pred = net(x_noisy, sigmas, **kwargs)

        if self.for_edm:
            return self.v_to_x0(
                x_noisy,
                v_pred,
                extend_dim(alphat, x_noisy.ndim),
                extend_dim(sigmat, x_noisy.ndim),
            )
        return v_pred

    def loss(
        self,
        x,
        net,
        sigmas,
        key=None,
        noise=None,
        x_mask=None,
        **kwargs,
    ):
        # sigmas here is t in [0, 1] drawn from the training distribution.
        logsnr_t = self.shifted_cosine_transform(sigmas)
        alpha_t = extend_dim(jnp.sqrt(jax.nn.sigmoid(logsnr_t)), x.ndim)
        sigma_t = extend_dim(jnp.sqrt(jax.nn.sigmoid(-logsnr_t)), x.ndim)

        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        x_noisy = alpha_t * x + sigma_t * noise
        mask = _loss_mask(x, x_mask, 0.1)

        v_pred = self.denoise_fn(x_noisy, net, sigmas=logsnr_t, inference=False, **kwargs)
        eps_pred = self.v_to_eps(x_noisy, v_pred, alpha_t, sigma_t)

        snr = jnp.minimum(jnp.exp(logsnr_t), 5.0)
        weight = extend_dim(1.0 / (1.0 + snr), x.ndim)

        losses = _sum_tail_dims(weight * (eps_pred - noise) ** 2 * mask)
        n_el = math.prod(x.shape[1:])
        return losses / n_el


@dataclass(frozen=True)
class ReFlow(Diffusion):
    """Rectified flow: z_t = (1-t) x + t z1, net predicts velocity z1 - x.

    ``for_edm=True`` maps EDM sigma -> t = sigma/(sigma+1) and converts the
    velocity prediction into an x0 estimate for EDM samplers.
    """

    for_edm: bool = False

    def sigma_to_t(self, t):
        return t / (t + 1.0)

    def v_to_x0(self, x_noisy, v_pred, sigmas):
        return x_noisy - v_pred * sigmas

    def v_to_eps(self, x_noisy, v_pred, sigmas):
        return x_noisy + v_pred * (1.0 - sigmas)

    def denoise_fn(
        self,
        x_noisy,
        net,
        inference=False,
        cond_scale=1.0,
        sigmas=None,
        sigma=None,
        **kwargs,
    ):
        batch_size = x_noisy.shape[0]
        sigmas = to_batch(batch_size, sigma=sigma, sigmas=sigmas)

        if self.for_edm:
            sigmas = self.sigma_to_t(sigmas)
            x_noisy = x_noisy * (1.0 - extend_dim(sigmas, x_noisy.ndim))

        if inference:
            x_pred = _cfg_apply(
                net, x_noisy, sigmas, cond_scale, self.cfg_batched, **kwargs
            )
        else:
            x_pred = net(x_noisy, sigmas, **kwargs)

        if self.for_edm:
            x_pred = self.v_to_x0(x_noisy, x_pred, extend_dim(sigmas, x_noisy.ndim))
        return x_pred

    def loss(
        self,
        x,
        net,
        sigmas,
        key=None,
        noise=None,
        x_mask=None,
        **kwargs,
    ):
        t = sigmas
        t_padded = extend_dim(t, x.ndim)
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        z1 = noise
        zt = (1.0 - t_padded) * x + t_padded * z1
        vtheta = self.denoise_fn(zt, net, sigmas=t, inference=False, **kwargs)
        losses = jnp.mean((z1 - x - vtheta) ** 2, axis=tuple(range(1, x.ndim)))
        return losses

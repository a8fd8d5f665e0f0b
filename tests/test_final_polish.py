"""Final additive coverage: stochastic reproducibility across families, FAD
directory iteration, config to_dict round trip."""

import jax
import jax.numpy as jnp
import numpy as np

from audiodiffuser_tpu.ops import KarrasSchedule


def _oracle(x, sigma=None, cond_scale=1.0):
    sig = jnp.asarray(sigma)
    sig = sig.reshape((-1,) + (1,) * (x.ndim - 1)) if sig.ndim > 0 else sig
    return (sig**2 * 0.2 + 0.3**2 * x) / (0.3**2 + sig**2)


def test_sde_and_vsampler_reproducible_under_jit():
    from audiodiffuser_tpu.samplers.stochastic import DPMPPSDESampler
    from audiodiffuser_tpu.samplers.vobj import VSampler

    noise = jax.random.normal(jax.random.key(0), (2, 8))
    sig = KarrasSchedule(0.01, 10.0, num_steps=12)()

    sde = DPMPPSDESampler(num_steps=12)
    f = jax.jit(lambda n, k: sde(n, _oracle, sig, key=k))
    a = np.asarray(f(noise, jax.random.key(1)))
    b = np.asarray(f(noise, jax.random.key(1)))
    c = np.asarray(f(noise, jax.random.key(2)))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0

    def vobj_oracle(x, sigma=None, cond_scale=1.0):
        lam = jnp.asarray(sigma)
        lam = lam.reshape((-1,) + (1,) * (x.ndim - 1)) if lam.ndim > 0 else lam
        alpha = jnp.sqrt(jax.nn.sigmoid(lam))
        s = jnp.sqrt(jax.nn.sigmoid(-lam))
        x0 = (alpha * 0.09 * x + s**2 * 0.2) / (alpha**2 * 0.09 + s**2)
        return (alpha * x - x0) / s

    t = jnp.linspace(1.0, 0.0, 13)[:-1]
    vs = VSampler(num_steps=12, shift=0.0)
    g = jax.jit(lambda n, k: vs(n, vobj_oracle, t, key=k))
    a = np.asarray(g(noise, jax.random.key(3)))
    b = np.asarray(g(noise, jax.random.key(3)))
    np.testing.assert_array_equal(a, b)


def test_fad_between_dirs(tmp_path):
    from audiodiffuser_tpu.data.sc09 import save_wav
    from audiodiffuser_tpu.evaluation.fad import fad_between_dirs

    rng = np.random.default_rng(0)
    for d in ("a", "b"):
        (tmp_path / d).mkdir()
        for i in range(4):
            save_wav(
                str(tmp_path / d / f"x{i}.wav"),
                (rng.standard_normal(8000) * 0.1).astype(np.float32),
                16000,
            )
    fad = fad_between_dirs(tmp_path / "a", tmp_path / "b")
    assert np.isfinite(fad) and fad >= 0
    # self-distance ~ 0
    assert fad_between_dirs(tmp_path / "a", tmp_path / "a") < 1e-6


def test_config_to_dict_roundtrip():
    from audiodiffuser_tpu.config import Config

    cfg = Config.wrap({"a": {"b": [1, {"c": 2}]}, "d": "x"})
    d = cfg.to_dict()
    assert isinstance(d, dict) and not isinstance(d, Config)
    assert d["a"]["b"][1]["c"] == 2
    assert cfg.a.b[1].c == 2

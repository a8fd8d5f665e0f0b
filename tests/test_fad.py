"""FAD harness tests: zero self-distance, ordering, embedder shapes."""

import numpy as np

from audiodiffuser_tpu.evaluation.fad import (
    LogMelEmbedder,
    compute_fad,
    frechet_distance,
    gaussian_stats,
    mel_filterbank,
)


def test_frechet_distance_identities():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 8))
    mu, s = gaussian_stats(x)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-6
    # shifted mean -> distance ~= ||shift||^2
    d = frechet_distance(mu, s, mu + 2.0, s)
    assert abs(d - 4.0 * 8) < 1.0


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(16000, 512, 64)
    assert fb.shape == (64, 257)
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()


def test_embedder_shapes():
    emb = LogMelEmbedder()
    out = emb(np.random.default_rng(1).standard_normal((2, 16000)))
    assert out.ndim == 2 and out.shape[1] == 64 * 8


def test_fad_orders_similarity():
    rng = np.random.default_rng(2)
    t = np.arange(16000) / 16000

    def tones(n, f0):
        return np.stack(
            [np.sin(2 * np.pi * (f0 + 20 * i) * t) * 0.3 for i in range(n)]
        )

    real = [tones(16, 400)]
    similar = [tones(16, 410)]
    noise = [rng.standard_normal((16, 16000)) * 0.3]

    fad_similar = compute_fad(real, similar)
    fad_noise = compute_fad(real, noise)
    assert fad_similar < fad_noise
    assert compute_fad(real, real) < 1e-4

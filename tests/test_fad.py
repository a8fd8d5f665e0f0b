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


def test_dir_stats_cache_roundtrip(tmp_path):
    """dir_stats memoises (mu, sigma) per cache_key and ignores stale keys."""
    from audiodiffuser_tpu.data.sc09 import save_wav
    from audiodiffuser_tpu.evaluation.fad import dir_stats, fad_between_dirs

    rng = np.random.default_rng(3)
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    for i in range(6):
        save_wav(str(a / f"{i}.wav"), rng.standard_normal(8000).astype(np.float32) * 0.1, 16000)
        save_wav(str(b / f"{i}.wav"), rng.standard_normal(8000).astype(np.float32) * 0.1, 16000)

    mu1, s1 = dir_stats(a, cache_key="k1")
    cache = a / ".fad_stats_k1.npz"
    assert cache.exists()
    mu2, s2 = dir_stats(a, cache_key="k1")  # cache hit
    np.testing.assert_array_equal(mu1, mu2)
    np.testing.assert_array_equal(s1, s2)
    # a poisoned cache under a DIFFERENT key must not be read
    np.savez(a / ".fad_stats_other.npz", mu=mu1 + 100, sigma=s1)
    mu3, _ = dir_stats(a, cache_key="k1")
    np.testing.assert_array_equal(mu1, mu3)
    # cached and uncached FAD agree
    f_cached = fad_between_dirs(a, b, cache_key="k1")
    f_fresh = fad_between_dirs(a, b)
    assert abs(f_cached - f_fresh) < 1e-6


def test_dir_stats_cache_invalidated_by_regeneration(tmp_path):
    """Regenerating samples in place (same filenames) must invalidate the
    cached stats — an eval re-run writes over test_*.wav and the FAD must
    reflect the new distribution, not the stale cache."""
    import os
    import time

    from audiodiffuser_tpu.data.sc09 import save_wav
    from audiodiffuser_tpu.evaluation.fad import dir_stats

    rng = np.random.default_rng(5)
    d = tmp_path / "gen"
    d.mkdir()
    for i in range(4):
        save_wav(str(d / f"{i}.wav"), rng.standard_normal(8000).astype(np.float32) * 0.1, 16000)
    mu1, _ = dir_stats(d, cache_key="k")

    # overwrite with a very different distribution (same file names); nudge
    # mtimes forward explicitly so the check is robust to coarse clocks
    for i in range(4):
        save_wav(str(d / f"{i}.wav"), (rng.standard_normal(8000) * 0.1 + 0.5).astype(np.float32), 16000)
        t = time.time() + 5
        os.utime(d / f"{i}.wav", (t, t))
    mu2, _ = dir_stats(d, cache_key="k")
    assert np.abs(mu1 - mu2).max() > 1e-3  # recomputed, not served stale

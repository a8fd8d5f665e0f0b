"""Learned FAD embedder (VGGish architecture) and its FAD integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiodiffuser_tpu.evaluation.embedder import (
    PATCH_FRAMES,
    VGGish,
    VGGishEmbedder,
    log_mel_patches,
)
from audiodiffuser_tpu.evaluation.fad import compute_fad


def test_log_mel_patch_shapes():
    # 1 s @ 16 kHz -> one 96x64 patch
    p = log_mel_patches(jnp.zeros((3, 16000)))
    assert p.shape == (3, PATCH_FRAMES, 64)
    # 2 s -> two patches per clip
    p = log_mel_patches(jnp.zeros((2, 32000)))
    assert p.shape == (4, PATCH_FRAMES, 64)
    # short clip pads to one patch
    p = log_mel_patches(jnp.zeros((1, 4000)))
    assert p.shape == (1, PATCH_FRAMES, 64)


def test_vggish_forward_and_classifier():
    model = VGGish(num_classes=10, width_mult=0.125)
    patches = jnp.zeros((2, PATCH_FRAMES, 64))
    params = model.init(jax.random.key(0), patches)["params"]
    emb, logits = model.apply({"params": params}, patches)
    assert emb.shape == (2, 128)
    assert logits.shape == (2, 10)
    # full-width layer names match the VGGish checkpoint layout
    names = set(params.keys())
    assert {"conv1_1", "conv2_1", "conv3_1", "conv3_2", "conv4_1",
            "conv4_2", "fc1_1", "fc1_2", "fc2", "classifier"} <= names


def test_embedder_fad_discriminates():
    """A briefly-trained embedder must separate distinct audio distributions
    far more than same-distribution splits."""
    import optax

    rng = np.random.default_rng(0)
    t = np.arange(8000) / 16000.0

    def toneset(f0, n):
        return np.stack([
            np.sin(2 * np.pi * f0 * rng.uniform(0.9, 1.1) * t).astype(np.float32)
            for _ in range(n)
        ])

    xa, xb = toneset(300.0, 24), toneset(1200.0, 24)
    audio = np.concatenate([xa, xb])
    labels = np.array([0] * 24 + [1] * 24)

    model = VGGish(num_classes=2, width_mult=0.125)
    patches = log_mel_patches(jnp.asarray(audio))
    params = model.init(jax.random.key(1), patches[:1])["params"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            _, logits = model.apply({"params": p}, patches)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.asarray(labels)
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(30):
        params, opt, loss = step(params, opt)

    emb = VGGishEmbedder(params, width_mult=0.125, num_classes=2)
    same = compute_fad([xa[::2]], [xa[1::2]], emb)
    diff = compute_fad([xa], [xb], emb)
    assert diff > 10 * same, (same, diff)


def test_embedder_save_load_roundtrip(tmp_path):
    import orbax.checkpoint as ocp

    from audiodiffuser_tpu.evaluation.embedder import load_embedder

    model = VGGish(num_classes=0, width_mult=0.125)
    patches = jnp.zeros((1, PATCH_FRAMES, 64))
    params = model.init(jax.random.key(2), patches)["params"]
    ckpt = tmp_path / "emb"
    ocp.PyTreeCheckpointer().save(
        str(ckpt), {"params": jax.device_get(params), "width_mult": 0.125}
    )
    emb = load_embedder(str(ckpt))
    out = emb(np.zeros((2, 16000), np.float32))
    assert out.shape == (2, 128)


def test_eval_quality_cache_roundtrip(tmp_path):
    """embed_and_classify_cached memoises per directory and invalidates on
    wav-content change (the round-4 quality report embeds the same 10k-wav
    real corpus from 17 subprocess invocations without this)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parents[1] / "scripts"))
    from eval_quality import embed_and_classify_cached

    from audiodiffuser_tpu.data.sc09 import save_wav

    d = tmp_path / "wavs"
    d.mkdir()
    rng = np.random.default_rng(0)
    files = []
    for i in range(4):
        f = d / f"test_{i % 2}_{i}.wav"
        save_wav(str(f), rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
        files.append(f)

    model = VGGish(num_classes=10, width_mult=0.125)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, PATCH_FRAMES, 64))
    )["params"]

    emb1, pred1 = embed_and_classify_cached(d, files, model, params, "k1", batch=2)
    cache = d / ".quality_emb_k1.npz"
    assert cache.exists()

    # cache hit: serve the stored values even if the npz is tampered with
    z = dict(np.load(cache))
    np.savez(cache, emb=z["emb"] + 100.0, pred=z["pred"], dir_fp=z["dir_fp"])
    emb2, _ = embed_and_classify_cached(d, files, model, params, "k1", batch=2)
    assert np.allclose(emb2, emb1 + 100.0)

    # regenerating a wav in place invalidates the fingerprint -> recompute
    import os
    import time

    save_wav(str(files[0]), rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
    now = time.time() + 2
    os.utime(files[0], (now, now))
    emb3, pred3 = embed_and_classify_cached(d, files, model, params, "k1", batch=2)
    assert not np.allclose(emb3, emb1 + 100.0)
    assert pred3.shape == pred1.shape

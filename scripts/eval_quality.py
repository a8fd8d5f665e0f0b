#!/usr/bin/env python
"""Conditional-quality report for generated SC09 samples.

Beyond the scalar FAD (scripts/compute_fad.py), this reports the three
quality views that matter for a *class-conditional* generator:

  * overall FAD (generated vs real) in the learned embedder space,
  * per-class FAD (generated class k vs real class k),
  * classifier accuracy: the FAD embedder is trained as an SC09 classifier
    (scripts/train_embedder.py), so its predicted class on each generated
    clip vs the class it was conditioned on measures whether conditioning
    is actually honoured (the reference offers no such harness; its eval is
    sample dumps only — src/models/diffunet_complex_module.py:230-266).

Generated filenames follow the task's ``test_<classidx>_<idx>.wav``
convention; real SC09 filenames carry the class word prefix (``Zero_*``).

Usage:
    python scripts/eval_quality.py --samples DIR --real DIR \
        --embedder-ckpt CKPT_DIR [--json]
"""
import argparse
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

CLASSES = ["Zero", "One", "Two", "Three", "Four",
           "Five", "Six", "Seven", "Eight", "Nine"]


def class_of(path: Path) -> int:
    """Class index from either naming convention; -1 if unknown."""
    stem = path.stem
    for i, word in enumerate(CLASSES):
        if stem.startswith(word + "_") or stem == word:
            return i
    parts = stem.split("_")
    if len(parts) >= 2 and parts[0] in ("test", "val", "sample"):
        try:
            return int(parts[1])
        except ValueError:
            return -1
    return -1


def _ckpt_fingerprint(path) -> str:
    import hashlib

    h = hashlib.sha256()
    for f in sorted(Path(path).rglob("*")):
        if f.is_file():
            h.update(f.name.encode())
            h.update(f.read_bytes())
    return h.hexdigest()[:16]


def embed_and_classify_cached(dirpath, files, embedder_model, params,
                              cache_key, batch: int = 64):
    """Like embed_and_classify, memoised on disk per directory.

    The quality report runs this script once per eval leg (16+ subprocess
    invocations in the round-4 soak), and every invocation embeds the SAME
    10k-wav real corpus — ~17x redundant work on a single-CPU box. Cache the
    clip-pooled embeddings + predictions in ``<dir>/.quality_emb_<key>.npz``
    keyed by the embedder-checkpoint fingerprint, invalidated by the same
    content fingerprint the FAD stats cache uses (``fad._dir_fingerprint``).
    """
    from audiodiffuser_tpu.evaluation.fad import _dir_fingerprint

    cache = Path(dirpath) / f".quality_emb_{cache_key}.npz" if cache_key else None
    fp = _dir_fingerprint(dirpath) if cache is not None else None
    if cache is not None and cache.exists():
        z = np.load(cache)
        if "dir_fp" in z and str(z["dir_fp"]) == fp:
            return z["emb"], z["pred"]
    emb, pred = embed_and_classify(files, embedder_model, params, batch)
    if cache is not None:
        tmp = cache.with_name(cache.name + ".tmp.npz")
        np.savez(tmp, emb=emb, pred=pred, dir_fp=fp)
        os.replace(tmp, cache)
    return emb, pred


def embed_and_classify(files, embedder_model, params, batch: int = 64):
    """-> (embeddings [N,D] pooled per clip, predicted class [N])."""
    import jax
    import jax.numpy as jnp

    from audiodiffuser_tpu.data.sc09 import load_wav
    from audiodiffuser_tpu.evaluation.embedder import log_mel_patches

    @jax.jit
    def fwd(audio):
        emb, logits = embedder_model.apply(
            {"params": params}, log_mel_patches(audio)
        )
        # log_mel_patches yields patches-per-clip; pool back to clips
        n_clip = audio.shape[0]
        emb = emb.reshape(n_clip, -1, emb.shape[-1]).mean(axis=1)
        logits = logits.reshape(n_clip, -1, logits.shape[-1]).mean(axis=1)
        return emb, jnp.argmax(logits, axis=-1)

    embs, preds = [], []
    T = 16000
    for i in range(0, len(files), batch):
        chunk = files[i : i + batch]
        wavs = np.zeros((len(chunk), T), np.float32)
        for j, f in enumerate(chunk):
            _, w = load_wav(str(f))
            w = np.asarray(w, np.float32).reshape(-1)[:T]
            wavs[j, : len(w)] = w
        e, p = fwd(wavs)
        embs.append(np.asarray(e))
        preds.append(np.asarray(p))
    return np.concatenate(embs), np.concatenate(preds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", required=True)
    ap.add_argument("--real", required=True)
    ap.add_argument("--embedder-ckpt", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--platform", default=os.environ.get("JAX_PLATFORMS", ""))
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import orbax.checkpoint as ocp

    from audiodiffuser_tpu.evaluation.embedder import VGGish
    from audiodiffuser_tpu.evaluation.fad import frechet_distance, gaussian_stats

    restored = ocp.PyTreeCheckpointer().restore(
        str(Path(args.embedder_ckpt).absolute())
    )
    params = restored["params"]
    model = VGGish(num_classes=10, width_mult=float(restored.get("width_mult", 1.0)))

    fake = sorted(p for p in Path(args.samples).rglob("*.wav"))
    real = sorted(p for p in Path(args.real).rglob("*.wav"))
    if not fake or not real:
        raise SystemExit("empty --samples or --real directory")

    fake_cls = np.array([class_of(p) for p in fake])
    real_cls = np.array([class_of(p) for p in real])

    cache_key = _ckpt_fingerprint(args.embedder_ckpt)
    fake_emb, fake_pred = embed_and_classify_cached(
        args.samples, fake, model, params, cache_key, args.batch
    )
    real_emb, real_pred = embed_and_classify_cached(
        args.real, real, model, params, cache_key, args.batch
    )

    out = {}
    out["n_samples"] = len(fake)
    out["fad"] = round(
        frechet_distance(*gaussian_stats(real_emb), *gaussian_stats(fake_emb)), 2
    )
    labeled = fake_cls >= 0
    if labeled.any():
        out["cond_accuracy"] = round(
            float((fake_pred[labeled] == fake_cls[labeled]).mean()), 4
        )
        acc_pc = {}
        for k in range(10):
            mk = fake_cls == k
            if mk.any():
                acc_pc[CLASSES[k]] = round(
                    float((fake_pred[mk] == k).mean()), 4
                )
        if acc_pc:
            out["accuracy_per_class"] = acc_pc
    # embedder sanity: its accuracy on the real set (should be ~1.0)
    real_labeled = real_cls >= 0
    if real_labeled.any():
        out["real_accuracy"] = round(
            float((real_pred[real_labeled] == real_cls[real_labeled]).mean()), 4
        )
    per_class = {}
    for k in range(10):
        fk, rk = fake_emb[fake_cls == k], real_emb[real_cls == k]
        # covariance needs enough rows to be meaningful
        if len(fk) >= 32 and len(rk) >= 32:
            per_class[CLASSES[k]] = round(
                frechet_distance(*gaussian_stats(rk), *gaussian_stats(fk)), 2
            )
    if per_class:
        out["fad_per_class"] = per_class
        out["fad_per_class_mean"] = round(
            float(np.mean(list(per_class.values()))), 2
        )

    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()

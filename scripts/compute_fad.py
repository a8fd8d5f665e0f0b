#!/usr/bin/env python
"""Frechet Audio Distance between two directories of wav files.

Usage:
    python scripts/compute_fad.py --real DIR --fake DIR
        [--embedder logmel|vggish] [--embedder-ckpt CKPT_DIR]

``--embedder vggish`` uses the learned VGGish-architecture embedder trained
by scripts/train_embedder.py (evaluation/embedder.py). FAD values are only
comparable under the same embedder checkpoint; the checkpoint fingerprint is
printed alongside the score.
"""
import argparse
import hashlib
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))


def _ckpt_fingerprint(path: str) -> str:
    h = hashlib.sha256()
    for f in sorted(Path(path).rglob("*")):
        if f.is_file():
            h.update(f.name.encode())
            h.update(f.read_bytes())
    return h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", required=True)
    ap.add_argument("--fake", required=True)
    ap.add_argument("--embedder", choices=["logmel", "vggish"], default="logmel")
    ap.add_argument("--embedder-ckpt", default=None)
    # Default the embedder to CPU unconditionally (not via JAX_PLATFORMS —
    # this machine's site config pins that to the remote-TPU tunnel): the
    # VGGish forward over a full corpus is only ~1.7 GFLOP/clip (minutes on
    # host), while the tunnel pays a per-call transfer cost that dominates
    # wall clock and leaks host memory in the tunnel client (observed >80 GB
    # RSS over a 10k-clip corpus). --platform overrides explicitly.
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    ap.add_argument(
        "--no-cache",
        action="store_true",
        help="disable the per-directory embedding-stats cache "
        "(.fad_stats_<embedder-fingerprint>.npz)",
    )
    args = ap.parse_args()

    embedder = None
    fingerprint = "logmel-builtin"
    if args.embedder == "vggish":
        if not args.embedder_ckpt:
            ap.error("--embedder vggish requires --embedder-ckpt")
        import jax

        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        from audiodiffuser_tpu.evaluation.embedder import load_embedder

        embedder = load_embedder(args.embedder_ckpt)
        fingerprint = _ckpt_fingerprint(args.embedder_ckpt)

    from audiodiffuser_tpu.evaluation.fad import fad_between_dirs

    cache_key = None if args.no_cache else f"{args.embedder}-{fingerprint}"
    fad = fad_between_dirs(args.real, args.fake, embedder, cache_key=cache_key)
    if args.json:
        print(json.dumps({"fad": round(fad, 4), "embedder": args.embedder,
                          "embedder_fingerprint": fingerprint}))
    else:
        print(f"FAD: {fad:.4f}  (embedder={args.embedder}, ckpt={fingerprint})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""FAD scale anchors for interpreting the soak eval grid.

The learned-embedder FAD is only comparable to itself, so the grid's
floor-ratio numbers need anchors to be honest (VERDICT r04 asks for an
analysis when best-leg/floor exceeds ~10x):

  * matched-n floor: FAD between two DISJOINT real splits at the eval
    leg's sample count (8192 vs 2048) — the ratio denominator the legs
    should actually be compared against (the 10240-vs-1280 floor mixes a
    different n into the estimate),
  * white-noise anchor: FAD(real, white noise) — where spectrally garbage
    audio sits in this embedder space; generated legs are graded by where
    they fall between the matched-n floor and this anchor.

Writes one JSON line; intended to be merged into fad_raw.json context by
soak_quality_report.

Usage:
    python scripts/fad_anchors.py --data /tmp/sc09_soak_r03 \
        --embedder-ckpt /tmp/soak_r04/embedder [--n 2048] [--json]
"""
import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--embedder-ckpt", required=True)
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from audiodiffuser_tpu.data.sc09 import load_wav, save_wav
    from audiodiffuser_tpu.evaluation.embedder import load_embedder
    from audiodiffuser_tpu.evaluation.fad import (
        fad_between_dirs,
        frechet_distance,
        dir_stats,
    )

    embedder = load_embedder(args.embedder_ckpt)
    train = Path(args.data) / "train"
    wavs = sorted(train.glob("*.wav"))
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(wavs))
    hold = set(perm[: args.n].tolist())

    with tempfile.TemporaryDirectory() as td:
        a = Path(td) / "split_a"  # the large remainder
        b = Path(td) / "split_b"  # matched-n holdout
        noise = Path(td) / "noise"
        for d in (a, b, noise):
            d.mkdir()
        for i, w in enumerate(wavs):
            (b if i in hold else a).joinpath(w.name).symlink_to(w)
        # white noise at the corpus's nominal level, same count/length
        sr, ref = load_wav(str(wavs[0]))
        for i in range(args.n):
            x = rng.standard_normal(len(ref)).astype(np.float32) * 0.1
            save_wav(str(noise / f"noise_{i}.wav"), x, sr)

        floor_matched = fad_between_dirs(str(a), str(b), embedder)
        fad_noise = fad_between_dirs(str(a), str(noise), embedder)

    out = {
        "matched_n_floor_8192_vs_2048": round(floor_matched, 4),
        "white_noise_anchor": round(fad_noise, 4),
        "n": args.n,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()

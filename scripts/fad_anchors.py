#!/usr/bin/env python
"""FAD scale anchors for interpreting the soak eval grid.

The learned-embedder FAD is only comparable to itself, so the grid's
floor-ratio numbers need anchors to be honest (VERDICT r04 asks for an
analysis when best-leg/floor exceeds ~10x):

  * matched-n floor: FAD between two DISJOINT real splits at the eval leg's
    sample count. Splits are CLASS-STRATIFIED: the embedder is an SC09
    classifier, so the between-class distances dominate the space and a
    random subset's class-proportion wobble inflates the mean term by an
    order of magnitude (measured: random 8192-vs-2048 splits score 22-75
    across seeds, stratified ~10 — 2026-08-19 diagnostic). Both the valid
    set and every generated leg are exactly class-balanced, so the
    stratified floor is the right comparison.
  * same-distribution 2048-vs-2048 floor: the yardstick for the direct
    int8-vs-bf16 gate FAD, which compares two 2048-sample sets.
  * white-noise anchor: FAD(real, white noise) — where spectrally garbage
    audio sits in this embedder space; generated legs are graded by where
    they fall between the matched-n floor and this anchor.

Usage:
    python scripts/fad_anchors.py --data /tmp/sc09_soak_r03 \
        --embedder-ckpt /tmp/soak_r04/embedder [--n 2048] [--out FILE]
"""
import argparse
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

CLASSES = ["Zero", "One", "Two", "Three", "Four",
           "Five", "Six", "Seven", "Eight", "Nine"]


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
    from audiodiffuser_tpu.evaluation.fad import fad_between_dirs

    embedder = load_embedder(args.embedder_ckpt)
    train = Path(args.data) / "train"
    by_class = defaultdict(list)
    for w in sorted(train.glob("*.wav")):
        k = next((i for i, word in enumerate(CLASSES)
                  if w.name.startswith(word + "_")), -1)
        by_class[k].append(w)
    rng = np.random.default_rng(0)
    per_cls = args.n // len(CLASSES)

    # stratified disjoint pools: holdout_b (n), holdout_c (n), rest
    b_files, c_files, rest = [], [], []
    for k, files in sorted(by_class.items()):
        p = rng.permutation(len(files))
        b_files += [files[i] for i in p[:per_cls]]
        c_files += [files[i] for i in p[per_cls:2 * per_cls]]
        rest += [files[i] for i in p[2 * per_cls:]]

    def linkdir(td, name, files):
        d = Path(td) / name
        d.mkdir()
        for f in files:
            (d / f.name).symlink_to(f)
        return str(d)

    with tempfile.TemporaryDirectory() as td:
        a = linkdir(td, "rest", rest)
        b = linkdir(td, "hold_b", b_files)
        c = linkdir(td, "hold_c", c_files)
        noise = Path(td) / "noise"
        noise.mkdir()
        sr, ref = load_wav(str(b_files[0]))
        for i in range(args.n):
            x = rng.standard_normal(len(ref)).astype(np.float32) * 0.1
            save_wav(str(noise / f"noise_{i}.wav"), x, sr)

        floor_matched = fad_between_dirs(a, b, embedder)
        same_dist = fad_between_dirs(b, c, embedder)
        fad_noise = fad_between_dirs(a, str(noise), embedder)

    out = {
        "matched_n_floor_stratified": round(floor_matched, 4),
        "same_dist_floor_2048_vs_2048": round(same_dist, 4),
        "white_noise_anchor": round(fad_noise, 4),
        "n": args.n,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Calibrate the int8 serving gate's FAD threshold at matched sample size.

The gate (bench.py:_int8_gate_default, acceptance phase 6) compares the
direct int8-vs-bf16 FAD — a 2048-vs-2048 estimate — against 2x the
10240-vs-1280 real-vs-real floor. FAD estimates grow as sample count
shrinks (the covariance terms are biased upward at small n), so the right
yardstick for a 2048-vs-2048 comparison is a 2048-vs-2048 SAME-distribution
floor, measured here on two disjoint real train splits with the same
patch-level embedder granularity the gate uses.

Output: one JSON line with
  same_dist_floor_2048_vs_2048 — expected direct FAD when the two sample
      sets come from the same distribution (i.e. when int8 is transparent).

Usage:
    python scripts/fad_gate_calibration.py --data /tmp/sc09_soak_r03 \
        --embedder-ckpt /tmp/soak_r04/embedder [--out FILE]
"""
import argparse
import json
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from audiodiffuser_tpu.evaluation.embedder import load_embedder
    from audiodiffuser_tpu.evaluation.fad import fad_between_dirs

    embedder = load_embedder(args.embedder_ckpt)
    train = Path(args.data) / "train"
    wavs = sorted(train.glob("*.wav"))
    assert len(wavs) >= 2 * args.n, f"need {2 * args.n} clips, have {len(wavs)}"
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(wavs))

    with tempfile.TemporaryDirectory() as td:
        a, b = Path(td) / "a", Path(td) / "b"
        a.mkdir(), b.mkdir()
        for i in perm[: args.n]:
            (a / wavs[i].name).symlink_to(wavs[i])
        for i in perm[args.n : 2 * args.n]:
            (b / wavs[i].name).symlink_to(wavs[i])
        floor = fad_between_dirs(str(a), str(b), embedder)

    out = {"same_dist_floor_2048_vs_2048": round(floor, 4), "n": args.n}
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()

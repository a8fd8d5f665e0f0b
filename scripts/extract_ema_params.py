#!/usr/bin/env python
"""Extract the in-state EMA params from a full training checkpoint.

The round-4 soak's power-function EMA *snapshot series* lived in /tmp and
was lost when the machine was recycled; what survives in-repo are full
TrainState checkpoints (`last`, `last_epoch180_insurance`), whose
``ema_state`` holds the live EMA accumulators — the same tensors the
snapshot writer (training/trainer.py:895-907) serialises as fp16 param
trees.  This script materialises those accumulators as snapshot-format
directories (``ema_prof-<std>_<step>``) so the FAD-trend tooling can add
real mid-training quality points without the lost series.

Host-side only (JAX_PLATFORMS=cpu recommended): the checkpoint is restored
without a template and never touches an accelerator.

Usage:
  python scripts/extract_ema_params.py --ckpt logs/soak_r04/state/last \
      --outdir /tmp/soak_r04/trendpts [--stds 0.100]
"""
import argparse
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
ROOT = Path(__file__).parents[1]
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--stds", default="0.100",
                    help="comma list of profile stds to extract")
    args = ap.parse_args()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    raw = ckpt.restore(str(Path(args.ckpt).absolute()))
    step = int(np.asarray(raw["step"]))
    emas = raw["ema_state"]["emas"]
    # profile stds: the flagship phema config trains the reference's
    # power-function profiles; ema_state stores one accumulator per std in
    # the same order PowerFunctionEMA.get zips them. Infer count from state.
    want = [s.strip() for s in args.stds.split(",")]
    # PowerFunctionEMA default stds (training/ema.py): read from the state
    # size — 1 accumulator means a single profile, label it with the first
    # requested std; N accumulators are labelled by canonical order.
    from audiodiffuser_tpu.training.ema import PowerFunctionEMA

    stds = list(PowerFunctionEMA().stds)[: len(emas)]
    if len(emas) == 1 and len(want) == 1:
        stds = [float(want[0])]
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for std, ema in zip(stds, emas):
        if f"{std:.3f}" not in [f"{float(w):.3f}" for w in want]:
            continue
        half = jax.tree.map(lambda p: np.asarray(p, np.float16), ema)
        path = outdir / f"ema_prof-{std:.3f}_{step}"
        ckpt.save(path, half, force=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Post-hoc EMA reconstruction CLI.

Capability parity with the reference ``scripts/reconstruct_phema.py``: scan
an ``ema_snapshots`` directory for ``ema_prof-<std>_<step>`` checkpoints,
solve the least-squares mixing coefficients (EDM2 Algorithm 3), and write
``recon_phema-<std>_<step>`` checkpoints for the requested output stds.

Snapshots here are orbax checkpoints of EMA parameter pytrees (written by
the trainer) instead of the reference's fp16 module pickles.

Usage:
    python scripts/reconstruct_phema.py --indir <run>/ema_snapshots \
        --outstd 0.150[,0.075,...] [--outdir DIR] [--outstep N]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from pathlib import Path

ROOT = Path(__file__).parent.parent
sys.path.insert(0, str(ROOT))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

_SNAP_RE = re.compile(r"ema_prof-(\d+\.\d+)_(\d+)$")


def list_input_snapshots(indir: Path):
    """[(step, std, path)] sorted by step (reference :45-66)."""
    out = []
    for p in sorted(indir.iterdir()):
        m = _SNAP_RE.search(p.name)
        if m and p.is_dir():
            out.append((int(m.group(2)), float(m.group(1)), p))
    out.sort()
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--indir", required=True, help="ema_snapshots directory")
    ap.add_argument(
        "--outstd",
        required=True,
        help="comma-separated target relative stds, e.g. 0.150 or 0.05,0.1,0.15",
    )
    ap.add_argument("--outdir", default=None, help="output directory (default: indir)")
    ap.add_argument("--outstep", type=int, default=None, help="target step (default: last)")
    args = ap.parse_args(argv)

    import numpy as np
    import orbax.checkpoint as ocp

    from audiodiffuser_tpu.training.ema import reconstruct_posthoc

    indir = Path(args.indir)
    outdir = Path(args.outdir or args.indir)
    out_stds = [float(s) for s in args.outstd.split(",")]

    entries = list_input_snapshots(indir)
    if not entries:
        raise SystemExit(f"no ema_prof-<std>_<step> snapshots found in {indir}")
    print(f"found {len(entries)} snapshots "
          f"(steps {entries[0][0]}..{entries[-1][0]}, "
          f"stds {sorted(set(e[1] for e in entries))})")

    ckpt = ocp.PyTreeCheckpointer()
    snapshots = [
        (step, std, ckpt.restore(str(path.absolute())))
        for step, std, path in entries
    ]

    out_step = args.outstep or entries[-1][0]
    results = reconstruct_posthoc(snapshots, out_stds, out_step)

    outdir.mkdir(parents=True, exist_ok=True)
    for std, tree in results:
        path = outdir / f"recon_phema-{std:.3f}_{out_step}"
        half = __import__("jax").tree.map(lambda p: np.asarray(p, np.float16), tree)
        ckpt.save(str(path.absolute()), half, force=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

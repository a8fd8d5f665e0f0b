#!/usr/bin/env python
"""FAD-vs-training-items trend over the EMA snapshots of a soak run.

Generates a small conditional sample set (default 256 clips, 32-step Heun —
the headline workload at reduced count) from each power-function EMA
snapshot a training run left behind, computes learned-embedder FAD for each
against the real training split, and writes a markdown table. The trend
shows how sample quality converges with training items — the per-snapshot
FADs are noisier than the 2048-sample eval legs (small-sample covariance),
but the *shape* of the curve is the evidence: still falling = undertrained,
flat = converged.

Each eval runs in its own subprocess (eval.py) so a TPU-worker crash can't
wedge the sweep; FAD runs on CPU (compute_fad defaults) with the
dir-stats cache making the real-side embedding a one-time cost.

Usage:
  python scripts/fad_trend.py --work /tmp/soak_r03 --data /tmp/sc09_soak_r03 \
      --out logs/soak_r03/TREND.md [--samples 256] [--max-snapshots 10]
"""
import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).parents[1]


def run_eval(snapshot, ckpt, data, outdir, samples, experiment, overrides=()):
    cmd = [
        sys.executable, str(ROOT / "eval.py"),
        f"experiment={experiment}",
        f"data.data_dir={data}",
        f"ckpt_path={ckpt}",
        f"model.ema_ckpt_path={snapshot}",
        f"model.total_test_samples={samples}",
        "data.batch_size=128",
        f"paths.output_dir={outdir}",
        *overrides,
    ]
    p = subprocess.run(cmd, capture_output=True, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-2000:] + "\n")
    return p.returncode == 0


def run_fad(real, fake, embedder):
    cmd = [sys.executable, str(ROOT / "scripts/compute_fad.py"),
           "--real", str(real), "--fake", str(fake),
           "--embedder", "vggish", "--embedder-ckpt", str(embedder),
           "--json"]
    p = subprocess.run(cmd, capture_output=True, text=True)
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line).get("fad")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--max-snapshots", type=int, default=10)
    ap.add_argument("--batch-items", type=int, default=32,
                    help="train batch size, to convert steps to items")
    ap.add_argument(
        "--experiment",
        default="sc09_inference/diffunet_complex_sc09_phema_eval_heun")
    ap.add_argument(
        "-o", "--override", action="append", default=[],
        help="extra eval.py config overrides (e.g. model.sampler.cond_scale=2.0)")
    ap.add_argument(
        "--point", action="append", default=[],
        help="step:samples_dir — use an ALREADY-GENERATED sample set as a "
             "trend point instead of generating from an EMA snapshot "
             "(fallback when the snapshot series is gone; the round-4 soak "
             "lost /tmp between rounds)")
    ap.add_argument(
        "--metrics-csv", default=None,
        help="training metrics.csv; embeds the val-loss trajectory as "
             "convergence evidence alongside the FAD points")
    args = ap.parse_args()

    work, data = Path(args.work), Path(args.data)
    ckpt = work / "train" / "checkpoints" / "last"
    embedder = work / "embedder"

    if args.point:
        rows = []
        for spec in args.point:
            step_s, _, d = spec.partition(":")
            step = int(step_s)
            fad = run_fad(data / "train", Path(d), embedder)
            rows.append((step, step * args.batch_items, fad))
            print(f"point step={step} dir={d} fad={fad}")
        rows.sort()
        write_report(args, rows, std="0.100", points_mode=True)
        return

    snaps = sorted(
        work.glob("train/ema_snapshots/ema_prof-*"),
        key=lambda p: int(re.search(r"_(\d+)$", p.name).group(1)),
    )
    # one profile std is enough for the trend; prefer the widest available
    by_std = {}
    for s in snaps:
        std = re.match(r"ema_prof-([\d.]+)_", s.name).group(1)
        by_std.setdefault(std, []).append(s)
    std = sorted(by_std)[-1]
    snaps = by_std[std]
    if len(snaps) > args.max_snapshots:
        stride = (len(snaps) - 1) / (args.max_snapshots - 1)
        snaps = [snaps[round(i * stride)] for i in range(args.max_snapshots)]

    rows = []
    for s in snaps:
        step = int(re.search(r"_(\d+)$", s.name).group(1))
        outdir = work / "trend" / s.name
        samples_dir = outdir / "test_samples"
        have = len(list(samples_dir.glob("*.wav"))) if samples_dir.is_dir() else 0
        if have < args.samples:
            ok = run_eval(s, ckpt, data, outdir, args.samples, args.experiment,
                          args.override)
            if not ok:
                print(f"# eval failed for {s.name}; skipping")
                continue
        fad = run_fad(data / "train", samples_dir, embedder)
        rows.append((step, step * args.batch_items, fad))
        print(f"{s.name}: step={step} fad={fad}")
    write_report(args, rows, std=std, points_mode=False)


def val_loss_rows(metrics_csv):
    """(step, val_loss) pairs from the trainer's csv (val rows set column
    'val/loss'; header names the columns)."""
    try:
        header, *lines = Path(metrics_csv).read_text().strip().splitlines()
        cols = header.split(",")
        si, vi = cols.index("step"), cols.index("val/loss")
    except (OSError, ValueError):
        return []
    out = []
    for line in lines:
        f = line.split(",")
        if len(f) > vi and f[vi]:
            out.append((int(float(f[si])), float(f[vi])))
    return out


def write_report(args, rows, std, points_mode):
    out = [
        "# FAD vs training items (EMA trend)",
        "",
    ]
    if points_mode:
        out += [
            "Trend points from in-state EMA accumulators of the surviving",
            "full checkpoints plus the step-87500 post-hoc reconstruction",
            "(the per-snapshot series was lost with /tmp at the round",
            "boundary — scripts/extract_ema_params.py documents the",
            "recovery). Learned-embedder (VGGish SC09 classifier) FAD vs",
            "the real training split; 512-sample mid-run legs are",
            "upward-biased vs the 2048-sample final legs — read the shape.",
        ]
    else:
        out += [
            f"{args.samples}-sample 32-step-Heun legs from power-function EMA",
            f"snapshots (profile std {std}); learned-embedder",
            "(VGGish SC09 classifier) FAD vs the real training split. Small-sample",
            "FAD is upward-biased vs the 2048-sample legs; read the shape.",
        ]
    out += [
        "",
        "| step | items seen | FAD |",
        "|---|---|---|",
    ]
    for step, items, fad in rows:
        fads = f"{fad:.1f}" if isinstance(fad, (int, float)) else "err"
        out.append(f"| {step} | {items:,} | {fads} |")
    if args.metrics_csv:
        vl = val_loss_rows(args.metrics_csv)
        if vl:
            out += [
                "",
                "## Validation-loss trajectory (every validation epoch)",
                "",
                "| step | val loss |",
                "|---|---|",
            ]
            stride = max(len(vl) // 12, 1)
            kept = vl[::stride]
            if kept[-1] != vl[-1]:
                kept.append(vl[-1])
            for step, loss in kept:
                out.append(f"| {step} | {loss:.4f} |")
    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    outp.write_text("\n".join(out) + "\n")
    print(f"wrote {outp}")


if __name__ == "__main__":
    main()

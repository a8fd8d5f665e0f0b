#!/usr/bin/env python
"""Collect acceptance-soak artifacts into one summary JSON.

Reads the soak work dir produced by scripts/acceptance_soak.sh: training
metrics (loss trajectory, throughput, resume point), per-eval FAD numbers
from logs/soak_r02/fad_raw.txt, and checkpoint/snapshot inventory.
"""
import argparse
import csv
import json
import re
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fad-json", default=None,
                    help="r04-style fad_raw.json to embed (replaces the "
                         "legacy logs/soak_r02/fad_raw.txt scrape)")
    args = ap.parse_args()
    work = Path(args.work)
    out = Path(args.out)

    summary = {}

    mcsv = work / "train" / "csv" / "metrics.csv"
    if mcsv.exists():
        rows = list(csv.DictReader(open(mcsv)))
        losses = [
            (int(float(r["step"])), float(r["train/loss"]))
            for r in rows
            if r.get("train/loss")
        ]
        vals = [
            (int(float(r["step"])), float(r["val/loss"]))
            for r in rows
            if r.get("val/loss")
        ]
        ips = [float(r["train/items_per_sec"]) for r in rows if r.get("train/items_per_sec")]
        # epoch-throughput rows logged right after a kill/resume cover only
        # the post-resume wall clock and can be wildly inflated (a 12k
        # items/s row was observed in the r04 soak); exclude anything >3x or
        # <1/3 the median from the mean and report how many were dropped
        med = sorted(ips)[len(ips) // 2] if ips else None
        clean = [v for v in ips if med and med / 3 <= v <= med * 3]
        summary["train"] = {
            "steps": losses[-1][0] if losses else 0,
            "first_loss": losses[0][1] if losses else None,
            "last_loss": losses[-1][1] if losses else None,
            "best_val_loss": min(v for _, v in vals) if vals else None,
            "median_items_per_sec": med,
            "mean_items_per_sec_clean": (
                sum(clean) / len(clean) if clean else None
            ),
            "throughput_rows_excluded_as_restart_artifacts": len(ips) - len(clean),
        }

    snaps = sorted((work / "train" / "ema_snapshots").glob("ema_prof*"))
    summary["ema_snapshots"] = len(snaps)
    summary["phema_recon"] = [p.name for p in sorted(work.glob("phema/recon_phema-*"))]
    summary["checkpoints"] = sorted(
        p.name for p in (work / "train" / "checkpoints").glob("*")
    )

    evals = {}
    for d in sorted(work.glob("eval_*")):
        wavs = list((d / "test_samples").glob("*.wav"))
        evals[d.name] = {"n_samples": len(wavs)}
    summary["evals"] = evals

    if args.fad_json and Path(args.fad_json).exists():
        summary["fad"] = json.loads(Path(args.fad_json).read_text())
    else:
        fad_raw = Path("logs/soak_r02/fad_raw.txt")
        if fad_raw.exists():
            fads = {}
            for line in fad_raw.read_text().splitlines():
                m = re.match(r'\{"(\w+)": (\{.*\})\},?', line.strip())
                if m:
                    fads[m.group(1)] = json.loads(m.group(2))
            summary["fad"] = fads

    out.write_text(json.dumps(summary, indent=2) + "\n")
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Assemble the round-3 soak quality report (FAD + conditional accuracy).

Runs scripts/eval_quality.py over every ``eval_*/test_samples`` directory in
the soak work dir, plus the real-vs-real control and the direct
int8-vs-bf16 gate at the 32-Heun headline leg, and writes a markdown table.

Usage:
    python scripts/soak_quality_report.py --work /tmp/soak_r03 \
        --data /tmp/sc09_soak_r03 --out logs/soak_r03/QUALITY.md
"""
import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).parents[1]


def run_quality(samples, real, embedder, platform):
    cmd = [sys.executable, str(ROOT / "scripts/eval_quality.py"),
           "--samples", str(samples), "--real", str(real),
           "--embedder-ckpt", str(embedder), "--json"]
    if platform:
        cmd += ["--platform", platform]
    p = subprocess.run(cmd, capture_output=True, text=True)
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    return {"error": (p.stderr or "no output").strip()[-400:]}


def run_fad(real, fake, embedder, platform):
    cmd = [sys.executable, str(ROOT / "scripts/compute_fad.py"),
           "--real", str(real), "--fake", str(fake),
           "--embedder", "vggish", "--embedder-ckpt", str(embedder), "--json"]
    if platform:
        cmd += ["--platform", platform]
    p = subprocess.run(cmd, capture_output=True, text=True)
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line).get("fad")
    return None


def leg_samples_per_sec(leg_dir):
    """End-to-end generation rate logged by trainer.test (includes the jit
    compile and wav writes — steady-state numbers live in bench.py)."""
    csv = Path(leg_dir) / "csv" / "metrics.csv"
    if not csv.is_file():
        return None
    try:
        header, *rows = csv.read_text().strip().splitlines()
        col = header.split(",").index("test/samples_per_sec")
        for row in reversed(rows):
            v = row.split(",")[col]
            if v:
                return float(v)
    except (ValueError, IndexError):
        return None
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default="")
    ap.add_argument("--fad-json", default=None,
                    help="fad_raw.json from the soak phase 6 (supplies the "
                         "winning cond_scale and the direct int8 gate value)")
    args = ap.parse_args()

    work, data = Path(args.work), Path(args.data)
    embedder = work / "embedder"
    real = data / "train"

    fad_raw = {}
    if args.fad_json and Path(args.fad_json).is_file():
        fad_raw = json.loads(Path(args.fad_json).read_text())

    rows = []
    control = run_quality(data / "valid", real, embedder, args.platform)
    rows.append(("real valid vs train (control floor)", control, None))
    for d in sorted(work.glob("eval_*")):
        samples = d / "test_samples"
        if samples.is_dir():
            rows.append((d.name, run_quality(samples, real, embedder, args.platform),
                         leg_samples_per_sec(d)))

    # direct int8-vs-bf16 gate at the headline leg: prefer the per-step-
    # calibrated leg's value, then the phase-6 global-static one, else
    # compute it over whichever naming scheme (r03/r04) is on disk
    direct = fad_raw.get("direct_int8ps_vs_bf16_heun32",
                         fad_raw.get("direct_int8_vs_bf16_heun32"))
    seed_control = fad_raw.get("direct_bf16_seedB_vs_A")
    best_cs = fad_raw.get("best_cond_scale")
    if direct is None:
        if best_cs is not None:
            heun_bf16 = work / f"eval_heun32_cfg{best_cs}" / "test_samples"
            heun_int8 = work / "eval_heun32_int8" / "test_samples"
        else:
            heun_bf16 = work / "eval_heun_32" / "test_samples"
            heun_int8 = work / "eval_heun_32_int8" / "test_samples"
        if heun_bf16.is_dir() and heun_int8.is_dir():
            direct = run_fad(heun_bf16, heun_int8, embedder, args.platform)

    floor = control.get("fad")
    out = ["# Soak quality report", "",
           "Learned-embedder (VGGish SC09 classifier) metrics over the",
           "2048-sample eval legs. `cond_acc` = classifier accuracy of the",
           "generated samples against their conditioning class; `samples/s` =",
           "end-to-end generation rate for the leg (single chip, INCLUDES jit",
           "compile and wav writes — steady-state throughput is bench.py's",
           "number).", ""]
    if best_cs is not None:
        out += [f"Winning guidance from the 32-Heun cond_scale sweep: "
                f"**cond_scale={best_cs}**", ""]
    out.append("| leg | FAD | x floor | per-class FAD (mean) | cond_acc | samples/s |")
    out.append("|---|---|---|---|---|---|")
    for name, r, sps in rows:
        ratio = (
            f"{r['fad'] / floor:.1f}x"
            if floor and isinstance(r.get("fad"), (int, float))
            else "—"
        )
        out.append(
            f"| {name} | {r.get('fad', 'err')} | {ratio} | "
            f"{r.get('fad_per_class_mean', '—')} | "
            f"{r.get('cond_accuracy', '—')} | "
            f"{f'{sps:.2f}' if sps else '—'} |"
        )
    out.append("")
    # full 10-class breakdown on the winning 32-Heun leg: proves CFG
    # conditioning controls the class per-digit, not just in aggregate
    # (reference's class-conditional harness: diffunet_complex_module.py:230-266)
    if best_cs is not None:
        win_name = f"eval_heun32_cfg{best_cs}"
        win = next((r for name, r, _ in rows if name == win_name), None)
        if win and (win.get("fad_per_class") or win.get("accuracy_per_class")):
            fpc = win.get("fad_per_class", {})
            apc = win.get("accuracy_per_class", {})
            out += [f"## Per-class breakdown — winning leg `{win_name}`", "",
                    "| class | FAD (class-k vs real class-k) | cond accuracy |",
                    "|---|---|---|"]
            for cls in ["Zero", "One", "Two", "Three", "Four",
                        "Five", "Six", "Seven", "Eight", "Nine"]:
                out.append(f"| {cls} | {fpc.get(cls, '—')} | "
                           f"{apc.get(cls, '—')} |")
            out.append("")
    # NFE-frontier verdict vs the 32-Heun winner (VERDICT r04 item 3: one
    # table of FAD + samples/sec, and PFDiff either beats the headline at
    # matched FAD or is marked quality-negative). Patch-level fad_raw values
    # and the per-leg end-to-end samples/s from the table rows.
    win_key = f"eval_heun32_cfg{best_cs}" if best_cs is not None else None
    win_fad = fad_raw.get(win_key)
    if isinstance(win_fad, (int, float)):
        win_sps = next((s for n, _, s in rows if n == win_key and s), None)
        out += ["## NFE frontier vs the 32-Heun headline", "",
                f"Headline leg `{win_key}`: FAD {win_fad}"
                + (f", {win_sps:.2f} samples/s (end-to-end)" if win_sps else "")
                + ".", "",
                "| leg | FAD | vs headline FAD | samples/s | speedup |",
                "|---|---|---|---|---|"]
        for name, _, sps in rows:
            f = fad_raw.get(name)
            if name == win_key or not isinstance(f, (int, float)) \
                    or "cfg" in name or "emastd" in name or "trend" in name:
                continue
            rel = f / win_fad
            spd = (sps / win_sps) if (sps and win_sps) else None
            out.append(f"| {name} | {f} | {rel:.2f}x | "
                       f"{f'{sps:.2f}' if sps else '—'} | "
                       f"{f'{spd:.2f}x' if spd else '—'} |")
        pf = {n: fad_raw.get(n) for n in ("eval_pf_16", "eval_pf_32")}
        better = [n for n, f in pf.items()
                  if isinstance(f, (int, float)) and f <= win_fad]
        if any(isinstance(f, (int, float)) for f in pf.values()):
            out += ["", "**PFDiff verdict:** "
                    + (f"{', '.join(sorted(better))} reach(es) the headline's "
                       "FAD or better at higher throughput — PFDiff raises "
                       "samples/sec at matched quality."
                       if better else
                       "no PFDiff leg reaches the headline FAD — "
                       "quality-negative at these NFEs."), ""]
    # FAD-scale anchors (scripts/fad_anchors.py): the learned-embedder FAD
    # is only comparable to itself, so position the legs between a
    # matched-n real-vs-real floor and a white-noise upper anchor instead
    # of quoting raw floor ratios alone (VERDICT r04: analyse when
    # best/floor > ~10x).
    anchors_p = work / "fad_anchors.json"
    if anchors_p.is_file():
        try:
            anchors = json.loads(anchors_p.read_text())
        except json.JSONDecodeError:
            anchors = {}
        mfloor = anchors.get("matched_n_floor_stratified")
        noise = anchors.get("white_noise_anchor")
        same_dist = anchors.get("same_dist_floor_2048_vs_2048")
        # anchors use fad.dir_stats granularity, same as fad_raw.json —
        # position those leg values between them (the eval_quality table
        # above coincides: the embedder yields one patch per 1-s clip)
        leg_fads = {k: v for k, v in fad_raw.items()
                    if k.startswith("eval_") and isinstance(v, (int, float))}
        if mfloor and noise and leg_fads:
            out += ["## FAD scale: how to read these numbers", "",
                    "The embedder is a from-scratch SC09 classifier "
                    "(scripts/train_embedder.py), not the literature's "
                    "VGGish, so absolute FAD values are not comparable to "
                    "published SC09 numbers — only positions between "
                    "anchors measured in the SAME embedder space are. "
                    "Anchor splits are class-stratified: in a classifier "
                    "embedding space a random subset's class-proportion "
                    "wobble alone inflates FAD by an order of magnitude "
                    "(measured 22-75 vs ~10 stratified), and both the valid "
                    "set and every generated leg are exactly balanced.", "",
                    f"- matched-n real-vs-real floor (stratified 8192 vs "
                    f"2048 disjoint train clips): **{mfloor}**",
                    f"- same-distribution 2048-vs-2048 floor (the direct "
                    f"int8-vs-bf16 gate's yardstick): **{same_dist}**",
                    f"- white-noise anchor (real vs 2048 white-noise clips): "
                    f"**{noise}**", "",
                    "| leg | FAD | % of the floor->noise span |",
                    "|---|---|---|"]
            span = noise - mfloor
            for name, f in sorted(leg_fads.items(), key=lambda kv: kv[1]):
                pos = 100.0 * (f - mfloor) / span if span > 0 else float("nan")
                out.append(f"| {name} | {f} | {pos:.1f}% |")
            out.append("")
    if direct is not None and (floor or seed_control):
        # gate rule mirrors bench.py:_int8_gate_default — seed-control
        # threshold (pre-registered before the per-step leg was scored)
        # when available, 2x-real-floor fallback otherwise
        if isinstance(seed_control, (int, float)) and seed_control > 0:
            bar, rule = 1.5 * seed_control, (
                f"1.5x the seed-to-seed bf16 control ({seed_control})")
        else:
            bar, rule = 2 * floor, f"2x the real-vs-real floor ({floor})"
        verdict = "ACCEPT" if direct <= bar else "REJECT"
        out.append(
            f"Direct int8-vs-bf16 FAD at 32-Heun: **{direct}** vs {rule} "
            f"-> int8 serving gate (threshold {bar:.2f}): **{verdict}**"
        )
        int8_real = fad_raw.get("eval_heun32_int8ps",
                                fad_raw.get("eval_heun32_int8"))
        win_real = fad_raw.get(f"eval_heun32_cfg{best_cs}") if best_cs else None
        if isinstance(int8_real, (int, float)) and isinstance(
                win_real, (int, float)):
            out += ["",
                    f"Corroboration against real data: int8-vs-real FAD "
                    f"{int8_real} vs bf16-vs-real {win_real} "
                    f"({int8_real / win_real:.2f}x) — the gate decision is "
                    "driven by a real distribution shift, not by the "
                    "2048-sample estimator noise (same-distribution "
                    "2048-vs-2048 floor above)."]
    outp = Path(args.out)
    outp.parent.mkdir(parents=True, exist_ok=True)
    outp.write_text("\n".join(out) + "\n")
    print(f"wrote {outp}")
    for line in out:
        print(line)


if __name__ == "__main__":
    main()

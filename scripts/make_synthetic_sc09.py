#!/usr/bin/env python
"""Generate a structured synthetic SC09 dataset (class-distinguishable).

The build image has no real SC09 audio, so lifecycle/acceptance runs use
synthetic spoken-digit stand-ins: each class is a distinct formant pattern —
a per-class fundamental with 2 class-specific "formant" band resonances,
amplitude envelope, vibrato and noise, varied per utterance — enough
structure that a classifier embedder reaches high accuracy and FAD behaves
sensibly (real-vs-real small, real-vs-wrong-class large). On real hardware
point --data-dir at the actual SC09 corpus instead.

Usage: python scripts/make_synthetic_sc09.py OUT_DIR [--per-class 64]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

from audiodiffuser_tpu.data.sc09 import save_wav

CLASSES = ["Zero", "One", "Two", "Three", "Four",
           "Five", "Six", "Seven", "Eight", "Nine"]
SR = 16000
T = 16000

# per-class (f0, formant1, formant2) Hz — spread across the band
SPEC = [
    (110, 500, 1500), (130, 700, 1100), (150, 400, 2200), (170, 900, 1800),
    (190, 600, 2600), (105, 1100, 2000), (125, 800, 3000), (145, 350, 1300),
    (165, 1000, 2400), (185, 550, 3200),
]


def synth(cls: int, rng: np.random.Generator) -> np.ndarray:
    f0, fm1, fm2 = SPEC[cls]
    f0 = f0 * rng.uniform(0.9, 1.1)
    t = np.arange(T) / SR
    # vibrato-modulated harmonic source
    vib = 1.0 + 0.02 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
    src = np.zeros(T)
    for k in range(1, 12):
        src += np.sin(2 * np.pi * k * f0 * vib * t + rng.uniform(0, 2 * np.pi)) / k
    # class formants: band-passed resonances of the source
    spec = np.fft.rfft(src)
    freqs = np.fft.rfftfreq(T, 1 / SR)
    gain = np.zeros_like(freqs)
    for fc, bw, g in ((fm1, 150, 1.0), (fm2, 250, 0.7)):
        fc = fc * rng.uniform(0.95, 1.05)
        gain += g * np.exp(-0.5 * ((freqs - fc) / bw) ** 2)
    voiced = np.fft.irfft(spec * (0.15 + gain), T)
    # amplitude envelope: attack / sustain / release, random onset
    onset = rng.uniform(0.05, 0.25)
    dur = rng.uniform(0.35, 0.6)
    env = np.exp(-0.5 * ((t - onset - dur / 2) / (dur / 2.2)) ** 2)
    noise = rng.standard_normal(T) * 0.01
    audio = voiced * env + noise
    return (0.7 * audio / np.max(np.abs(audio) + 1e-9)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--per-class", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    splits = {"train": args.per_class, "valid": max(args.per_class // 8, 2),
              "test": max(args.per_class // 8, 2)}
    for split, n in splits.items():
        d = Path(args.out) / split
        d.mkdir(parents=True, exist_ok=True)
        for cls, name in enumerate(CLASSES):
            for i in range(n):
                save_wav(str(d / f"{name}_{split}_{i}.wav"), synth(cls, rng), SR)
    print(f"wrote synthetic SC09 to {args.out} ({splits})")


if __name__ == "__main__":
    main()

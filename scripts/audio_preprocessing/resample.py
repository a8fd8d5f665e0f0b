#!/usr/bin/env python
"""Batch resample a wav tree to 16 kHz mono.

Capability parity with the reference scripts/audio_preprocessing/resample.py
(ffmpeg/soxr), implemented with scipy polyphase resampling so no external
binaries are required.

Usage: python resample.py SRC_DIR DST_DIR [--sr 16000]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

from tqdm import tqdm

from audiodiffuser_tpu.data.audio_utils import load_audio, resample
from audiodiffuser_tpu.data.sc09 import save_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--sr", type=int, default=16000)
    args = ap.parse_args()

    files = sorted(Path(args.src).rglob("*.wav"))
    print(f"{len(files)} files")
    for f in tqdm(files):
        audio, sr = load_audio(str(f))
        audio = resample(audio, sr, args.sr)
        out = Path(args.dst) / f.relative_to(args.src)
        out.parent.mkdir(parents=True, exist_ok=True)
        save_wav(str(out), audio, args.sr)


if __name__ == "__main__":
    main()

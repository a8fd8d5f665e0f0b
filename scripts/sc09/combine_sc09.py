#!/usr/bin/env python
"""Build an SC09 transcript folder: copy wavs flat + write per-file .txt
transcripts from the filename prefix (parity with the reference
scripts/sc09/combine_sc09.py; the optional sox-concat merge is implemented
with numpy concatenation).

Usage: python combine_sc09.py SRC_DIR DST_DIR [--merge N]
"""
import argparse
import random
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

import numpy as np
from tqdm import tqdm

from audiodiffuser_tpu.data.audio_utils import load_audio
from audiodiffuser_tpu.data.sc09 import save_wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--merge", type=int, default=0,
                    help="if >0, also write N random 3-word concatenations")
    args = ap.parse_args()

    dst = Path(args.dst)
    dst.mkdir(parents=True, exist_ok=True)
    wavs = sorted(Path(args.src).rglob("*.wav"))

    for f in tqdm(wavs, desc="copy+transcribe"):
        trans = f.name.split("_")[0].lower()
        (dst / f.name.replace(".wav", ".txt")).write_text(trans)
        shutil.copy(f, dst)

    for i in tqdm(range(args.merge), desc="merge"):
        picks = random.sample(wavs, 3)
        trans = " ".join(p.name.split("_")[0].lower() for p in picks)
        parts = []
        sr = 16000
        for p in picks:
            audio, sr = load_audio(str(p))
            parts.append(audio)
        merged = np.concatenate(parts)
        save_wav(str(dst / f"{i}.wav"), merged, sr)
        (dst / f"{i}.txt").write_text(trans)


if __name__ == "__main__":
    main()

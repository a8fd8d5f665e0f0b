#!/usr/bin/env python
"""Batch reformat an audio tree to mono 16-bit wav, preserving the last
directory level.

Capability parity with the reference scripts/audio_preprocessing/reformat.py
(ffmpeg `-ac 1` mp3->wav conversion keeping `<parent>/<name>.wav`): uses
ffmpeg when available for compressed inputs (mp3/mp4/flac/ogg), falls back to
scipy for wav inputs so the common case needs no external binary.

Usage: python reformat.py SRC_DIR DST_DIR [--input-format mp3]
"""
import argparse
import shutil
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[2]))

from tqdm import tqdm


def reformat_file(src: Path, dst: Path, input_format: str) -> None:
    dst.parent.mkdir(parents=True, exist_ok=True)
    if input_format == "wav" or shutil.which("ffmpeg") is None:
        if input_format != "wav":
            raise RuntimeError(
                f"ffmpeg not available; cannot decode .{input_format} inputs"
            )
        from audiodiffuser_tpu.data.audio_utils import load_audio
        from audiodiffuser_tpu.data.sc09 import save_wav

        audio, sr = load_audio(str(src))
        if audio.ndim > 1:  # downmix to mono like ffmpeg -ac 1
            audio = audio.mean(axis=-1)
        save_wav(str(dst), audio, sr)
        return
    proc = subprocess.run(
        ["ffmpeg", "-y", "-i", str(src), "-ac", "1", str(dst)],
        capture_output=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg failed on {src}: {proc.stderr.decode()[-400:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--input-format", default="mp3")
    args = ap.parse_args()

    files = sorted(Path(args.src).rglob(f"*.{args.input_format}"))
    print(f"{len(files)} files")
    for f in tqdm(files):
        # keep <parent dir>/<name>.wav like the reference (reformat.py:17-20)
        out = Path(args.dst) / f.parent.name / f.with_suffix(".wav").name
        reformat_file(f, out, args.input_format)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Frechet Audio Distance between two directories of wav files.

Usage: python scripts/compute_fad.py --real DIR --fake DIR
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

from audiodiffuser_tpu.evaluation.fad import fad_between_dirs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", required=True)
    ap.add_argument("--fake", required=True)
    args = ap.parse_args()
    fad = fad_between_dirs(args.real, args.fake)
    print(f"FAD: {fad:.4f}")


if __name__ == "__main__":
    main()

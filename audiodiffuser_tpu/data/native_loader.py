"""ctypes bindings for the native WAV batch decoder (native/wavio.c).

The shared library is built on first use with the system compiler
(``cc -O3 -shared -fPIC``); if the toolchain or build fails, callers fall
back to the scipy decode path transparently (``Collator`` stays the
behavioral contract — random-crop/zero-pad to ``audio_len``).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libwavio.so"
_LIB = None
_BUILD_FAILED = False


def _build() -> bool:
    for cc in ("cc", "gcc", "g++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH), str(_NATIVE_DIR / "wavio.c")],
                check=True,
                capture_output=True,
            )
            return True
        except (OSError, subprocess.CalledProcessError):
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None:
        return _LIB
    if _BUILD_FAILED:
        return None
    if not _SO_PATH.exists():
        if not _build():
            _BUILD_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        _BUILD_FAILED = True
        return None
    lib.wavio_load.restype = ctypes.c_int
    lib.wavio_load.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.wavio_num_frames.restype = ctypes.c_int64
    lib.wavio_num_frames.argtypes = [ctypes.c_char_p]
    lib.wavio_load_batch.restype = ctypes.c_int
    lib.wavio_load_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


def num_frames(path: str) -> int:
    lib = get_lib()
    n = lib.wavio_num_frames(str(path).encode())
    if n < 0:
        raise IOError(f"wavio_num_frames({path}) -> {n}")
    return int(n)


def load(path: str, target_len: int, crop_start: int = 0) -> np.ndarray:
    """Decode one file to float32 [target_len] (crop+pad)."""
    lib = get_lib()
    out = np.empty(target_len, np.float32)
    rc = lib.wavio_load(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len,
        crop_start,
    )
    if rc < 0:
        raise IOError(f"wavio_load({path}) -> {rc}")
    return out


def load_batch(
    paths: Sequence[str], target_len: int, crop_starts: Sequence[int]
) -> np.ndarray:
    """Decode a batch into one contiguous [B, target_len] buffer."""
    lib = get_lib()
    b = len(paths)
    out = np.empty((b, target_len), np.float32)
    blob = b"\0".join(str(p).encode() for p in paths) + b"\0"
    starts = np.asarray(crop_starts, np.int64)
    rc = lib.wavio_load_batch(
        blob,
        b,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc < 0:
        raise IOError(f"wavio_load_batch -> {rc}")
    return out

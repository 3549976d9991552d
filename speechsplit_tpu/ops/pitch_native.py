"""ctypes binding for the native (C++) host-side pitch tracker.

``native/rapt.cc`` implements the same NCCF+Viterbi algorithm as the
on-device tracker (ops/pitch.py); this wrapper builds the shared library
on first use (g++, cached next to the source) and exposes a numpy API.
Use it from host data workers that preprocess without a TPU attached; the
device path is :func:`speechsplit_tpu.ops.pitch.track_pitch`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "librapt.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    src = os.path.join(_NATIVE_DIR, "rapt.cc")
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-std=c++17", "-fPIC",
            "-shared", src, "-o", _LIB_PATH,
        ],
        check=True,
        capture_output=True,
    )


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_NATIVE_DIR, "rapt.cc"))
            ):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rapt_track.restype = ctypes.c_int
            lib.rapt_track.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # x
                ctypes.c_long,                   # n
                ctypes.c_int,                    # fs
                ctypes.c_int,                    # hop
                ctypes.c_float,                  # lo
                ctypes.c_float,                  # hi
                ctypes.POINTER(ctypes.c_float),  # out
                ctypes.c_long,                   # n_frames
            ]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def track_pitch_native(
    x: np.ndarray,
    *,
    sample_rate: int = 16000,
    hop: int = 256,
    lo: float = 50.0,
    hi: float = 600.0,
) -> np.ndarray:
    """log-F0 of one waveform on the host CPU.

    x: [N] float32. Returns [N//hop + 1] natural-log F0 with -1e10 at
    unvoiced frames — the same contract as the device tracker and the
    reference's RAPT usage (make_spect_f0.py:64-65).
    """
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    n_frames = len(x) // hop + 1
    out = np.empty(n_frames, np.float32)
    rc = lib.rapt_track(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(x)),
        ctypes.c_int(sample_rate),
        ctypes.c_int(hop),
        ctypes.c_float(lo),
        ctypes.c_float(hi),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(n_frames),
    )
    if rc != 0:
        raise RuntimeError(f"rapt_track failed with code {rc}")
    return out

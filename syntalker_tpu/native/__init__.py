"""ctypes bindings for the native host-side data ops (audio_ops.cpp).

Compiled lazily with g++ on first use (cached next to the source); every
entry point has a numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger("syntalker")

_SRC = Path(__file__).parent / "audio_ops.cpp"
_LIB = Path(__file__).parent / "_audio_ops.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_LIB)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        lib.rolling_max_abs_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.peak_pick_f32.restype = ctypes.c_int64
        lib.peak_pick_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.window_gather_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        return lib
    except Exception as e:
        log.warning(f"native audio ops unavailable, using numpy fallbacks: {e}")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        _lib = _build()
        _tried = True
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rolling_max_abs(x: np.ndarray, window: int = 1024) -> np.ndarray:
    """O(n) amplitude envelope (native) with numpy fallback."""
    x = np.ascontiguousarray(x, np.float32)
    lib = get_lib()
    if lib is None:
        if len(x) < window:
            return np.full(len(x), np.abs(x).max() if len(x) else 0.0, np.float32)
        win = np.lib.stride_tricks.sliding_window_view(np.abs(x), window)
        env = win.max(axis=1)
        return np.pad(env, (0, window - 1), mode="edge").astype(np.float32)
    out = np.empty_like(x)
    lib.rolling_max_abs_f32(_fptr(x), len(x), window, _fptr(out))
    return out


def peak_pick(
    env: np.ndarray, *, pre_max: int, post_max: int, pre_avg: int,
    post_avg: int, delta: float, wait: int,
) -> np.ndarray:
    env = np.ascontiguousarray(env, np.float32)
    lib = get_lib()
    if lib is None:
        from syntalker_tpu.data.audio import peak_pick as _np_peak_pick

        return _np_peak_pick(
            env, pre_max=pre_max, post_max=post_max, pre_avg=pre_avg,
            post_avg=post_avg, delta=delta, wait=wait,
        )
    out = np.empty(len(env), np.int64)
    n = lib.peak_pick_f32(
        _fptr(env), len(env), pre_max, post_max, pre_avg, post_avg,
        ctypes.c_float(delta), wait,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n].copy()


def window_gather(src: np.ndarray, starts: np.ndarray, length: int) -> np.ndarray:
    """(n, dim) + window starts -> (num, length, dim), zero-padded tails."""
    src = np.ascontiguousarray(src, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    lib = get_lib()
    if lib is None:
        num = len(starts)
        out = np.zeros((num, length, src.shape[1]), np.float32)
        for w, s in enumerate(starts):
            avail = max(0, min(length, len(src) - s))
            out[w, :avail] = src[s : s + avail]
        return out
    out = np.empty((len(starts), length, src.shape[1]), np.float32)
    lib.window_gather_f32(
        _fptr(src), src.shape[0], src.shape[1],
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(starts), length, _fptr(out),
    )
    return out

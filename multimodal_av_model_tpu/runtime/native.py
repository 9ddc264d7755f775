"""ctypes bindings for the native host-ops library, with NumPy fallbacks.

The library is compiled on first use (g++ -O3, cached next to the source);
every entry point has a pure-NumPy fallback so the framework works without a
compiler.  ``HAVE_NATIVE`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "hostops.cpp")
_LOCK = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> str | None:
    out = os.path.join(tempfile.gettempdir(), "mmav_hostops",
                       f"hostops-{os.path.getmtime(_SRC):.0f}.so")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", out + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
        return out
    except (subprocess.SubprocessError, OSError):
        return None


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _LOCK:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        i64, i32p, f32p = ctypes.c_int64, \
            np.ctypeslib.ndpointer(np.int32, flags="C"), \
            np.ctypeslib.ndpointer(np.float32, flags="C")
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C")
        lib.levenshtein_i32.restype = i64
        lib.levenshtein_i32.argtypes = [i32p, i64, i32p, i64]
        lib.resize_bilinear_f32.restype = None
        lib.resize_bilinear_f32.argtypes = [f32p, f32p, i64, i64, i64, i64, i64]
        lib.pcm16_to_f32.restype = None
        lib.pcm16_to_f32.argtypes = [i16p, f32p, i64, i64]
        lib.resample_linear_f32.restype = None
        lib.resample_linear_f32.argtypes = [f32p, i64, f32p, i64,
                                            ctypes.c_double, ctypes.c_double]
        lib.mix_and_mask_f32.restype = i64
        lib.mix_and_mask_f32.argtypes = [f32p, i64, f32p, i64, f32p, i32p, i32p]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


# -- public API (native with fallback) ----------------------------------------

def levenshtein(a, b) -> int:
    """Edit distance between two int sequences (or strings)."""
    if isinstance(a, str):
        a = [ord(c) for c in a]
    if isinstance(b, str):
        b = [ord(c) for c in b]
    a32 = np.ascontiguousarray(a, dtype=np.int32)
    b32 = np.ascontiguousarray(b, dtype=np.int32)
    lib = _load()
    if lib is not None:
        return int(lib.levenshtein_i32(a32, len(a32), b32, len(b32)))
    from ..ops.metrics import levenshtein_py

    return levenshtein_py(a32.tolist(), b32.tolist())


def resize_bilinear(images: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2 INTER_LINEAR resize over the trailing two axes (f32)."""
    images = np.ascontiguousarray(images, dtype=np.float32)
    lead = images.shape[:-2]
    in_h, in_w = images.shape[-2:]
    count = int(np.prod(lead)) if lead else 1
    flat = images.reshape(count, in_h, in_w)
    out = np.empty((count, out_h, out_w), np.float32)
    lib = _load()
    if lib is not None:
        lib.resize_bilinear_f32(flat, out, count, in_h, in_w, out_h, out_w)
    else:
        from ..data.pipeline import _resize_bilinear_np

        out = _resize_bilinear_np(flat, out_h, out_w)
    return out.reshape(*lead, out_h, out_w)


def pcm16_to_f32(pcm: np.ndarray, channels: int = 1) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    frames = len(pcm) // channels
    lib = _load()
    if lib is not None:
        out = np.empty(frames, np.float32)
        lib.pcm16_to_f32(pcm, out, frames, channels)
        return out
    audio = pcm.astype(np.float32) / 32768.0
    if channels > 1:
        audio = audio.reshape(-1, channels).mean(axis=1)
    return audio


def resample_linear(audio: np.ndarray, in_rate: float, out_rate: float) -> np.ndarray:
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    n_out = int(round(len(audio) * out_rate / in_rate))
    lib = _load()
    if lib is not None:
        out = np.empty(n_out, np.float32)
        lib.resample_linear_f32(audio, len(audio), out, n_out, in_rate, out_rate)
        return out
    idx = np.arange(n_out) * (in_rate / out_rate)
    lo = np.minimum(idx.astype(np.int64), len(audio) - 1)
    hi = np.minimum(lo + 1, len(audio) - 1)
    frac = (idx - lo).astype(np.float32)
    return audio[lo] + (audio[hi] - audio[lo]) * frac


def mix_and_mask(a1: np.ndarray, a2: np.ndarray):
    """Native two-speaker mix + masks (dataset/multi_speaker_dataset.py:26-45
    semantics); returns ``(mixed, mask1, mask2)``."""
    a1 = np.ascontiguousarray(a1, dtype=np.float32)
    a2 = np.ascontiguousarray(a2, dtype=np.float32)
    lib = _load()
    if lib is None:
        from ..data.mixing import mix_pair

        mixed, m1, m2 = mix_pair(a1, a2)
        return mixed, m1.astype(np.int32), m2.astype(np.int32)
    n = max(len(a1), len(a2))
    mixed = np.empty(n, np.float32)
    m1 = np.empty(n, np.int32)
    m2 = np.empty(n, np.int32)
    lib.mix_and_mask_f32(a1, len(a1), a2, len(a2), mixed, m1, m2)
    return mixed, m1, m2

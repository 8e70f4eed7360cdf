"""ctypes bindings for the native audio-ingest library (audioio.cpp, shipped inside the package).

The reference framework's host-side audio path is native (libsndfile via
soundfile + ffmpeg; reference mlx_audio/audio_io.py) — this module is the
TPU framework's equivalent. It exposes:

- ``resample_poly(x, up, down)`` — scipy.signal.resample_poly-compatible
  Kaiser polyphase resampling (float32, frames-first, optional channels).
- ``wav_decode(buf)`` — RIFF/WAVE demux + PCM→float32 conversion.
- ``wav_encode_pcm16(x, sample_rate)`` — float32 → complete PCM-16 WAV image.

The shared library is looked up next to this file; if missing it is built
on first use with g++ (cached). Callers must check :func:`available` and
fall back to the pure-Python/scipy paths when it returns False (no
compiler, unsupported platform) — audio_io.py and utils.py do this.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from math import gcd
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "resample_poly",
    "wav_decode",
    "wav_encode_pcm16",
]

_LIB_NAME = "libaudioio.so"
_SRC = Path(__file__).resolve().parent / "audioio.cpp"
_LIB_PATH = Path(__file__).resolve().parent / _LIB_NAME

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    if not _SRC.exists():
        return False
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-fPIC", "-shared",
        "-std=c++17", "-o", str(_LIB_PATH), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        if lib.aio_abi_version() != 1:
            return None

        lib.aio_resample_out_len.restype = ctypes.c_long
        lib.aio_resample_out_len.argtypes = [ctypes.c_long] * 3
        lib.aio_resample_poly_f32.restype = ctypes.c_long
        lib.aio_resample_poly_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_void_p,
        ]
        lib.aio_wav_info.restype = ctypes.c_int
        lib.aio_wav_info.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
        ]
        lib.aio_wav_decode.restype = ctypes.c_int
        lib.aio_wav_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.aio_wav_encode_pcm16.restype = ctypes.c_long
        lib.aio_wav_encode_pcm16.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native library is loaded (building it if needed)."""
    return _load() is not None


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """Polyphase resample along axis 0 (scipy resample_poly semantics).

    x: float32 (n,) or (n, channels). up/down need not be reduced.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio library unavailable")
    g = gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    squeeze = x.ndim == 1
    x2 = np.ascontiguousarray(
        x[:, None] if squeeze else x, dtype=np.float32)
    n_in, ch = x2.shape
    n_out = lib.aio_resample_out_len(n_in, up, down)
    out = np.empty((n_out, ch), np.float32)
    r = lib.aio_resample_poly_f32(
        x2.ctypes.data, n_in, ch, up, down, out.ctypes.data)
    if r != n_out:
        raise RuntimeError(f"native resample failed (code {r})")
    return out[:, 0] if squeeze else out


def wav_decode(buf: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (float32 (frames, channels), sample_rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio library unavailable")
    b = np.frombuffer(buf, np.uint8)
    rate = ctypes.c_int()
    ch = ctypes.c_int()
    frames = ctypes.c_long()
    bits = ctypes.c_int()
    tag = ctypes.c_int()
    off = ctypes.c_long()
    r = lib.aio_wav_info(
        b.ctypes.data, len(b), ctypes.byref(rate), ctypes.byref(ch),
        ctypes.byref(frames), ctypes.byref(bits), ctypes.byref(tag),
        ctypes.byref(off))
    if r != 0:
        raise ValueError(f"not a decodable WAV (code {r})")
    out = np.empty((frames.value, ch.value), np.float32)
    r = lib.aio_wav_decode(
        b.ctypes.data, len(b), off.value, frames.value, ch.value,
        bits.value, tag.value, out.ctypes.data)
    if r != 0:
        raise ValueError(f"unsupported WAV sample format (code {r})")
    return out, rate.value


def wav_encode_pcm16(x: np.ndarray, sample_rate: int) -> bytes:
    """float32 (n,) or (n, ch) → complete PCM-16 WAV file bytes."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audioio library unavailable")
    x2 = np.ascontiguousarray(
        x[:, None] if x.ndim == 1 else x, dtype=np.float32)
    n_frames, ch = x2.shape
    total = lib.aio_wav_encode_pcm16(None, n_frames, ch, sample_rate, None)
    out = np.empty(total, np.uint8)
    lib.aio_wav_encode_pcm16(
        x2.ctypes.data, n_frames, ch, sample_rate, out.ctypes.data)
    return out.tobytes()

"""ctypes wrapper for the libav import/export shim (native/libav_decode.cpp).

The reference's front door is "decode any FFmpeg-readable file" by linking
the FFmpeg libraries directly (app.cpp:12-17, 624-741).  WAV/FLAC/MP3/Ogg
decode through this repo's own native decoders; this shim covers the long
tail (AAC/M4A, Opus, WMA, ...) wherever the system has libavformat — with
no ffmpeg *binary* required.  It is optional: `try_load()` returns None and
import falls back cleanly when the shared object or its libav dependencies
are absent.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_LIB_NAME = "libmelonix_av.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_tried = False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.mlxav_open.argtypes = [ctypes.c_char_p]
    lib.mlxav_open.restype = ctypes.c_void_p
    lib.mlxav_rate.argtypes = [ctypes.c_void_p]
    lib.mlxav_rate.restype = ctypes.c_int
    lib.mlxav_channels.argtypes = [ctypes.c_void_p]
    lib.mlxav_channels.restype = ctypes.c_int
    lib.mlxav_read.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
    ]
    lib.mlxav_read.restype = ctypes.c_longlong
    lib.mlxav_close.argtypes = [ctypes.c_void_p]
    lib.mlxav_close.restype = None
    lib.mlxav_last_error.argtypes = []
    lib.mlxav_last_error.restype = ctypes.c_char_p
    lib.mlxav_encode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.mlxav_encode.restype = ctypes.c_int
    return lib


def try_load() -> ctypes.CDLL | None:
    """Load the shim once; None if it (or libav) is unavailable."""
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        here = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        for cand in (os.path.join(here, "native", _LIB_NAME), _LIB_NAME):
            try:
                _lib = _bind(ctypes.CDLL(cand))
                break
            except OSError:
                continue
        return _lib


def _last_error(lib: ctypes.CDLL) -> str:
    msg = lib.mlxav_last_error()
    return msg.decode("utf-8", "replace") if msg else "unknown libav error"


def decode(path: str, *, mono: bool = True) -> tuple[np.ndarray, int]:
    """Decode any libav-readable file -> (float32, native rate).

    Streaming reads into a growing list of chunks — container duration
    estimates (VBR) are not trusted for sizing.  Raises ValueError on any
    failure (fail-soft contract, app.cpp:628-694).
    """
    lib = try_load()
    if lib is None:
        raise ValueError("libav shim unavailable")
    handle = lib.mlxav_open(path.encode())
    if not handle:
        raise ValueError(f"libav: {_last_error(lib)}")
    try:
        rate = lib.mlxav_rate(handle)
        channels = lib.mlxav_channels(handle)
        CHUNK = 1 << 18  # frames per read
        buf = np.empty(CHUNK * channels, np.float32)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        parts: list[np.ndarray] = []
        while True:
            got = lib.mlxav_read(handle, ptr, CHUNK)
            if got < 0:
                raise ValueError(f"libav: {_last_error(lib)}")
            if got == 0:
                break
            parts.append(buf[: got * channels].copy())
    finally:
        lib.mlxav_close(handle)
    if not parts:
        raise ValueError("libav: stream decoded to zero samples")
    x = np.concatenate(parts)
    if channels > 1:
        x = x.reshape(-1, channels)
        if mono:
            x = x.mean(axis=1).astype(np.float32)
    return x, rate


def encode(path: str, x: np.ndarray, rate: int) -> None:
    """Encode float32 (n,) or (n, ch) to ``path``; codec/container from the
    extension (AAC-in-MP4 for .m4a, Opus for .opus, Vorbis for .ogg, ...).
    Added capability — the reference only exports WAV (save-wav.cpp)."""
    lib = try_load()
    if lib is None:
        raise ValueError("libav shim unavailable")
    x = np.asarray(x, np.float32)
    channels = 1 if x.ndim == 1 else int(x.shape[1])
    flat = np.ascontiguousarray(x.reshape(-1))
    rc = lib.mlxav_encode(
        path.encode(),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(flat) // channels,
        int(rate),
        channels,
    )
    if rc != 0:
        raise ValueError(f"libav encode: {_last_error(lib)}")

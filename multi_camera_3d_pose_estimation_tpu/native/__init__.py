"""ctypes bindings for the native media runtime (libmediadec.so).

C++ libav demux/decode with a background prefetch thread (see
mediadec.cpp).  Built on first import with the in-tree Makefile; if the
toolchain or libav is unavailable, `load_mediadec()` returns None and
callers (io.frames / sync.audio) fall back to cv2 / stdlib paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmediadec.so")
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile libmediadec.so in-tree; returns success."""
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libmediadec.so"],
            check=True,
            capture_output=True,
            text=True,
        )
        return os.path.exists(_SO)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load_mediadec():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.md_open.restype = ctypes.c_void_p
    lib.md_open.argtypes = [ctypes.c_char_p]
    lib.md_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.md_read_frames.restype = ctypes.c_int
    lib.md_read_frames.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    lib.md_start_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.md_next_frames.restype = ctypes.c_int
    lib.md_next_frames.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
    ]
    lib.md_close.argtypes = [ctypes.c_void_p]
    lib.md_read_audio.restype = ctypes.c_longlong
    lib.md_read_audio.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib

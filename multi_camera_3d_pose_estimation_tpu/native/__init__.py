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


def _cache_build_dir() -> str:
    """User-writable build dir for installs whose site-packages is read-only
    (e.g. a root-owned venv).  XDG cache convention; keyed by package version
    so upgrades rebuild."""
    from multi_camera_3d_pose_estimation_tpu import __version__

    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "mc3d-pose-tpu", __version__, "native")


def build(force: bool = False) -> bool:
    """Compile libmediadec.so; returns success.

    Builds in-tree when the package directory is writable; otherwise copies
    the sources to a per-user cache dir and builds there (ADVICE r3: a
    pip-installed package in read-only site-packages must still get a decode
    path when a toolchain + libav are present).  `_SO` is updated to point at
    whichever artifact exists.
    """
    global _SO
    src = os.path.join(_DIR, "mediadec.cpp")
    if os.path.exists(_SO) and not force:
        # Stale-artifact guard: rebuild when the source is newer than the
        # library (make's dependency rule decides; a no-op when current).
        try:
            if os.path.getmtime(_SO) >= os.path.getmtime(src):
                return True
        except OSError:
            return True
    build_dir = _DIR
    if not os.access(_DIR, os.W_OK):
        build_dir = _cache_build_dir()
        try:
            os.makedirs(build_dir, exist_ok=True)
            import shutil

            for name in ("mediadec.cpp", "Makefile"):
                shutil.copy2(os.path.join(_DIR, name), os.path.join(build_dir, name))
        except OSError:
            return False
        cached = os.path.join(build_dir, "libmediadec.so")
        if (os.path.exists(cached) and not force
                and os.path.getmtime(cached) >= os.path.getmtime(src)):
            _SO = cached
            return True
    try:
        subprocess.run(
            ["make", "-C", build_dir, "libmediadec.so"],
            check=True,
            capture_output=True,
            text=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    built = os.path.join(build_dir, "libmediadec.so")
    if os.path.exists(built):
        _SO = built
        return True
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
    try:
        lib.mda_open.restype = ctypes.c_void_p
        lib.mda_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
        lib.mda_info.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.mda_next_block.restype = ctypes.c_int
        lib.mda_next_block.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        lib.mda_close.argtypes = [ctypes.c_void_p]
    except AttributeError:
        # A stale cached library without the block assembler still serves
        # the per-camera decode path; callers feature-check with hasattr.
        pass
    lib.md_remux_with_audio.restype = ctypes.c_int
    lib.md_remux_with_audio.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def remux_with_audio(video_in: str, out_path: str, samples, sample_rate: int) -> None:
    """Write ``out_path`` = video stream of ``video_in`` (stream-copied, no
    re-encode) + a mono pcm_s16le track of ``samples`` (float [-1, 1]).

    Container PCM needs no real encoder, so this works in minimal libav
    builds — it exists to synthesize audio-bearing .mov/.mp4 fixtures for
    the audio-sync path (reference synchronize_videos.py:203).  Raises if
    the native library is unavailable or the mux fails.
    """
    import numpy as np

    lib = load_mediadec()
    if lib is None:
        raise RuntimeError("native mediadec library unavailable")
    arr = np.ascontiguousarray(np.asarray(samples, np.float32))
    rc = lib.md_remux_with_audio(
        str(video_in).encode(), str(out_path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_longlong(arr.size), int(sample_rate),
    )
    if rc != 0:
        raise RuntimeError(f"md_remux_with_audio failed with code {rc}")

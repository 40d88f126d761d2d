"""Frame IO: video readers, generators, batched device prefetch.

Host glue feeding device-resident frame tensors (SURVEY.md §2.2 maps the
reference's `cv2 VideoCapture` + frame generator, utils.py:849-909, to
"host-side decode feeding device-resident batched frame tensors").

Three tiers:
- `VideoReader` — one video; native libav path (background decode thread,
  `native/mediadec.cpp`) with cv2 fallback.
- `frame_generator` / `load_frames` — reference-shaped per-timestep
  generators over N synchronized videos (BGR, like cv2 — the color
  convention the reference's pipeline assumes at utils.py:860-864).
- `BatchedFramePipeline` — the TPU hot path: per-camera prefetch threads
  fill (block, C, H, W, 3) uint8 host blocks while the PREVIOUS block runs
  on device; `jax.device_put` overlaps H2D with decode (double buffering).
"""

from __future__ import annotations

import ctypes
import os
import threading
from queue import Queue

import numpy as np

from ..native import load_mediadec

__all__ = [
    "VideoReader",
    "frame_generator",
    "load_frames",
    "load_image_frames",
    "write_keypoints_to_disk",
    "BatchedFramePipeline",
]


class VideoReader:
    """Sequential RGB frame reader: native libav first, cv2 fallback.

    ``read_block(n)`` returns (m, H, W, 3) uint8 RGB (m ≤ n; 0 rows = EOF).
    ``bgr=True`` flips channels to match the reference's cv2 convention.
    """

    def __init__(self, path: str, prefetch: int = 16, bgr: bool = False):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self.path = path
        self.bgr = bgr
        self._lib = load_mediadec()
        self._handle = None
        self._cap = None
        if self._lib is not None:
            self._handle = self._lib.md_open(path.encode())
        if self._handle:
            w = ctypes.c_int()
            h = ctypes.c_int()
            fps = ctypes.c_double()
            nf = ctypes.c_longlong()
            self._lib.md_info(self._handle, w, h, fps, nf)
            self.width, self.height = w.value, h.value
            self.fps = fps.value
            self.n_frames = int(nf.value)
            if prefetch > 0:
                self._lib.md_start_prefetch(self._handle, prefetch)
            self._prefetching = prefetch > 0
        else:
            import cv2

            self._cap = cv2.VideoCapture(path)
            if not self._cap.isOpened():
                raise IOError(f"cannot open video: {path}")
            self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            self.fps = float(self._cap.get(cv2.CAP_PROP_FPS))
            self.n_frames = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def read_block(self, n: int) -> np.ndarray:
        if self._handle:
            buf = np.empty((n, self.height, self.width, 3), np.uint8)
            frame_bytes = self.height * self.width * 3
            got = 0
            if self._prefetching:
                # md_next_frames pops whatever the ring has (≥1 unless EOF);
                # keep draining until the block is full or the stream ends.
                while got < n:
                    ptr = ctypes.cast(
                        buf.ctypes.data + got * frame_bytes,
                        ctypes.POINTER(ctypes.c_ubyte),
                    )
                    m = self._lib.md_next_frames(self._handle, ptr, n - got)
                    if m == 0:
                        break
                    got += m
            else:
                ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
                got = self._lib.md_read_frames(self._handle, ptr, n)
            out = buf[:got]
        else:
            import cv2

            frames = []
            for _ in range(n):
                ok, frame = self._cap.read()
                if not ok:
                    break
                frames.append(frame[..., ::-1])  # cv2 gives BGR; store RGB
            out = (
                np.stack(frames)
                if frames
                else np.empty((0, self.height, self.width, 3), np.uint8)
            )
        return out[..., ::-1] if self.bgr else out

    def __iter__(self):
        while True:
            block = self.read_block(1)
            if block.shape[0] == 0:
                return
            yield block[0]

    def close(self):
        if self._handle:
            self._lib.md_close(self._handle)
            self._handle = None
        if self._cap is not None:
            self._cap.release()
            self._cap = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def frame_generator(video_paths, bgr: bool = True):
    """Yield ``[frame_cam0, frame_cam1, ...]`` per timestep until any video
    ends — reference `frame_generator` semantics (utils.py:849-877),
    including its BGR frames."""
    readers = [VideoReader(p, bgr=bgr) for p in video_paths]
    try:
        while True:
            frames = []
            for r in readers:
                block = r.read_block(1)
                if block.shape[0] == 0:
                    return
                frames.append(block[0])
            yield frames
    finally:
        for r in readers:
            r.close()


def load_frames(video_paths=None, frames_folder=None, bgr: bool = True):
    """Reference `load_frames` (utils.py:904-909): generator over videos, or
    a jpg-sequence folder (``frame<i>.jpg`` naming, utils.py:879-899)."""
    if video_paths is not None:
        return frame_generator(video_paths, bgr=bgr)
    if frames_folder is not None:
        return load_image_frames(frames_folder, bgr=bgr)
    raise ValueError("provide video_paths or frames_folder")


def load_image_frames(frames_folder: str, bgr: bool = True):
    """Generator over ``frame<i>.jpg`` files in index order."""
    import cv2

    names = [n for n in os.listdir(frames_folder) if n.startswith("frame")]
    order = sorted(names, key=lambda n: int("".join(c for c in n if c.isdigit()) or 0))
    for name in order:
        img = cv2.imread(os.path.join(frames_folder, name))
        if img is None:
            continue
        yield [img if bgr else img[..., ::-1]]


def write_keypoints_to_disk(path: str, keypoints) -> None:
    """Text dump, one line per frame of flattened keypoints (reference
    utils.py:830-845's save format)."""
    arr = np.asarray(keypoints)
    with open(path, "w") as f:
        for row in arr.reshape(arr.shape[0], -1):
            f.write(" ".join(f"{v}" for v in row) + "\n")


class BatchedFramePipeline:
    """Multi-camera block reader with background host decode + H2D overlap.

    Yields (block_size, n_cams, H, W, 3) uint8 blocks already on device
    (``device_put`` while the next block decodes on the host thread).  The
    last partial block is zero-padded with its true length reported, so
    downstream jit shapes stay static.
    """

    def __init__(self, video_paths, block_size: int = 16, device=None,
                 queue_depth: int = 2, stage_to_device: bool = True,
                 native_assembler: bool = True):
        # Native multi-camera block assembler (VERDICT r4 #1,
        # native/mediadec.cpp::mda_*): each camera's decoder thread writes
        # sws_scale RGB straight into its strided slice of the
        # (B, C, H, W, 3) block — zero extra copies, no GIL, all cameras
        # concurrent.  Falls back to per-camera VideoReader + Python
        # assembly when the library (or the videos) can't serve it.
        self._asm = None
        self._asm_lib = None
        self.readers = []
        if native_assembler and all(os.path.exists(str(p)) for p in video_paths):
            lib = load_mediadec()
            if lib is not None and hasattr(lib, "mda_open"):
                arr = (ctypes.c_char_p * len(video_paths))(
                    *[str(p).encode() for p in video_paths]
                )
                handle = lib.mda_open(arr, len(video_paths))
                if handle:
                    self._asm = handle
                    self._asm_lib = lib
                    w = ctypes.c_int()
                    h = ctypes.c_int()
                    fps = ctypes.c_double()
                    nf = ctypes.c_longlong()
                    lib.mda_info(handle, w, h, fps, nf)
                    self.height, self.width = h.value, w.value
        if self._asm is None:
            self.readers = [VideoReader(p) for p in video_paths]
            hw = {(r.height, r.width) for r in self.readers}
            if len(hw) != 1:
                raise ValueError(f"cameras disagree on frame size: {hw}")
            self.height, self.width = hw.pop()
        self.block_size = block_size
        self.n_cams = len(video_paths)
        self.device = device
        # ``stage_to_device=False`` yields HOST blocks (uint8 numpy) —
        # for consumers that substitute their own device buffers (the
        # `bench.py stream_device` H2D-isolation mode) or stage later.
        self.stage_to_device = bool(stage_to_device)
        self._q: Queue = Queue(maxsize=queue_depth)
        self._closing = False
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        B = self.block_size
        if self._asm is not None:
            lib, handle = self._asm_lib, self._asm
            while not self._closing:
                out = np.empty(
                    (B, self.n_cams, self.height, self.width, 3), np.uint8
                )
                n = lib.mda_next_block(
                    handle,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                    B,
                )
                if n == 0:
                    self._q.put(None)
                    return
                if n < B:
                    out[n:] = 0  # pad only the one partial tail block
                self._q.put((out, n))
                if n < B:
                    self._q.put(None)
                    return
            return
        while True:
            blocks = [r.read_block(B) for r in self.readers]
            n = min(b.shape[0] for b in blocks)
            if n == 0:
                self._q.put(None)
                return
            out = np.zeros((B, self.n_cams, self.height, self.width, 3), np.uint8)
            for c, b in enumerate(blocks):
                out[:n, c] = b[:n]
            self._q.put((out, n))
            if n < B:
                self._q.put(None)
                return

    def __iter__(self):
        import jax

        while True:
            item = self._q.get()
            if item is None:
                return
            host_block, n = item
            if not self.stage_to_device:
                yield host_block, n
                continue
            dev_block = (
                jax.device_put(host_block, self.device)
                if self.device is not None
                else jax.device_put(host_block)
            )
            yield dev_block, n

    def close(self):
        # Shutdown handshake: the producer thread may be blocked in
        # `mda_next_block` (decoding) or in `Queue.put` (queue full) —
        # freeing the native handle under it would be a use-after-free.
        # Flag it down, drain the queue until it exits, then free.
        self._closing = True
        import time as _time
        from queue import Empty

        deadline = _time.monotonic() + 10.0
        while self._thread.is_alive() and _time.monotonic() < deadline:
            try:
                self._q.get(timeout=0.05)
            except Empty:
                pass
        if self._asm is not None and not self._thread.is_alive():
            self._asm_lib.mda_close(self._asm)
            self._asm = None
        for r in self.readers:
            r.close()

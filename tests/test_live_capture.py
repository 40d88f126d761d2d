"""Live capture sources with an injected fake camera (no hardware).

Covers the reference's interactive capture loops re-designed as
`acquisition.live` (utils.py:59-127 mono, utils.py:256-342 stereo, and
the sync pick synchronize_videos.py:142-193) — gating, cooldown-free fast
path, failure modes, and headless sync passthrough.
"""

import numpy as np
import pytest

from multi_camera_3d_pose_estimation_tpu.acquisition import (
    LiveCaptureSource,
    LiveStereoCaptureSource,
    live_sync_frame_picker,
)
from multi_camera_3d_pose_estimation_tpu.calib.checkerboard import (
    create_checkerboard_image,
)

ROWS, COLS = 4, 5


def _board_frame():
    """A frame containing a detectable (ROWS, COLS) inner-corner board.

    (ROWS+1, COLS+1) squares have (ROWS, COLS) inner corners."""
    canvas, _k = create_checkerboard_image(ROWS + 1, COLS + 1, 200, 160)
    return np.stack([canvas] * 3, -1).astype(np.uint8)


def _noise_frame(rng):
    return rng.integers(0, 255, (160, 200, 3), dtype=np.uint8)


class FakeCapture:
    """cv2.VideoCapture stand-in fed from a per-device frame list."""

    frames_by_device: dict = {}

    def __init__(self, device):
        self.frames = list(FakeCapture.frames_by_device[device])
        self.i = 0
        self.released = False

    def isOpened(self):
        return True

    def read(self):
        if self.i >= len(self.frames):
            return False, None
        f = self.frames[self.i]
        self.i += 1
        return True, f

    def release(self):
        self.released = True


def test_live_capture_collects_n_frames():
    rng = np.random.default_rng(0)
    FakeCapture.frames_by_device = {0: [_noise_frame(rng) for _ in range(5)]}
    src = LiveCaptureSource({"camA": 0}, n_frames=3, cooldown_s=0.0,
                            capture_factory=FakeCapture)
    frames = src("camA")
    assert len(frames) == 3
    assert frames[0].shape == (160, 200, 3)


def test_live_capture_checkerboard_gating():
    """Non-board frames are skipped; only detectable ones are kept."""
    rng = np.random.default_rng(1)
    board = _board_frame()
    seq = [_noise_frame(rng), board, _noise_frame(rng), board, board]
    FakeCapture.frames_by_device = {1: seq}
    src = LiveCaptureSource({"camB": 1}, n_frames=3, cooldown_s=0.0,
                            rows=ROWS, columns=COLS, require_checkerboard=True,
                            capture_factory=FakeCapture)
    frames = src("camB")
    assert len(frames) == 3
    for f in frames:
        np.testing.assert_array_equal(f, board)


def test_live_capture_insufficient_frames_raises():
    rng = np.random.default_rng(2)
    FakeCapture.frames_by_device = {0: [_noise_frame(rng)] * 4}
    src = LiveCaptureSource({"camA": 0}, n_frames=10, cooldown_s=0.0,
                            capture_factory=FakeCapture)
    with pytest.raises(RuntimeError, match="4/10"):
        src("camA")


def test_live_stereo_pairs_gated_on_both_views():
    rng = np.random.default_rng(3)
    board = _board_frame()
    # Device 0 always shows the board; device 1 alternates — only ticks
    # where BOTH see it survive.
    FakeCapture.frames_by_device = {
        0: [board] * 6,
        1: [board, _noise_frame(rng), board, _noise_frame(rng), board, board],
    }
    src = LiveStereoCaptureSource({"a": 0, "b": 1}, rows=ROWS, columns=COLS,
                                  n_pairs=3, cooldown_s=0.0,
                                  capture_factory=FakeCapture)
    pairs = src("a", "b")
    assert len(pairs) == 3
    for f0, f1 in pairs:
        np.testing.assert_array_equal(f0, board)
        np.testing.assert_array_equal(f1, board)


def test_live_capture_feeds_real_calibration(tmp_path):
    """LiveCaptureSource → configure_cameras intrinsics, end to end."""
    import cv2

    from multi_camera_3d_pose_estimation_tpu.calib.checkerboard import (
        board_object_points,
    )

    # Render the board under several homographies (synthetic camera views).
    board = _board_frame()
    rng = np.random.default_rng(4)
    views = []
    for _ in range(10):
        h, w = board.shape[:2]
        jitter = rng.uniform(-12, 12, (4, 2)).astype(np.float32)
        src_pts = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
        dst_pts = src_pts * 0.7 + 30 + jitter
        H = cv2.getPerspectiveTransform(src_pts, dst_pts)
        views.append(cv2.warpPerspective(board, H, (w, h),
                                         borderValue=(255, 255, 255)))
    FakeCapture.frames_by_device = {0: views}
    src = LiveCaptureSource({"camA": 0}, n_frames=8, cooldown_s=0.0,
                            rows=ROWS, columns=COLS, require_checkerboard=True,
                            capture_factory=FakeCapture)

    from multi_camera_3d_pose_estimation_tpu.cli.configure import (
        calibrate_intrinsics_from_images,
    )

    rmse, K, dist, n_used = calibrate_intrinsics_from_images(
        src("camA"), ROWS, COLS, 2.5
    )
    assert np.asarray(K).shape == (3, 3) and np.isfinite(np.asarray(K)).all()
    assert K[0, 0] > 0 and K[1, 1] > 0
    assert np.isfinite(rmse) and n_used >= 3


def test_sync_picker_headless_passthrough(monkeypatch, tmp_path):
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    out = live_sync_frame_picker(["a.mp4", "b.mp4"], [12, 30])
    assert out == [12, 30]

"""Multi-camera recording + live capture (L1 acquisition layer)."""

from .record import record_from_cameras, identify_cameras, select_webcam_names
from .live import LiveCaptureSource, LiveStereoCaptureSource, live_sync_frame_picker

__all__ = [
    "record_from_cameras",
    "identify_cameras",
    "select_webcam_names",
    "LiveCaptureSource",
    "LiveStereoCaptureSource",
    "live_sync_frame_picker",
]

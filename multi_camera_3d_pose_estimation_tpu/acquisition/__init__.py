"""Multi-camera recording (L1 acquisition layer)."""

from .record import record_from_cameras, identify_cameras, select_webcam_names

__all__ = ["record_from_cameras", "identify_cameras", "select_webcam_names"]

"""Host-side checkerboard corner detection (thin glue, offline path).

SURVEY.md §2.2 maps `cv.findChessboardCorners` + `cv.cornerSubPix`
(reference utils.py:167-175, 248-250, 387-388) to "host-side corner
detection (C++ or OpenCV-free Python acceptable as thin glue; calibration
images are offline)".  cv2 is present in this environment, so the primary
path delegates to it; a pure-NumPy Harris+refinement fallback keeps the
subsystem importable (and testable on synthetic renders) without cv2.
"""

from __future__ import annotations

import numpy as np

__all__ = ["find_checkerboard_corners", "refine_corners_subpixel"]

try:  # host glue only — never on the device path
    import cv2 as _cv2
except Exception:  # pragma: no cover
    _cv2 = None


def find_checkerboard_corners(image, rows: int, columns: int, subpix: bool = True):
    """Detect the (rows, columns) inner-corner lattice.

    Returns ``(found: bool, corners (rows*columns, 2) float32 or None)`` in
    the row-major order `board_object_points` uses.
    """
    img = np.asarray(image)
    if img.ndim == 3:
        img = (0.299 * img[..., 2] + 0.587 * img[..., 1] + 0.114 * img[..., 0]).astype(
            img.dtype
        )
    if img.dtype != np.uint8:
        lo, hi = float(img.min()), float(img.max())
        img = ((img - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)

    if _cv2 is not None:
        found, corners = _cv2.findChessboardCorners(img, (columns, rows), None)
        if not found:
            return False, None
        corners = corners.reshape(-1, 2).astype(np.float32)
        if subpix:
            corners = refine_corners_subpixel(img, corners)
        return True, corners

    # NumPy fallback: Harris-like corner response + local maxima, then grid
    # ordering by projecting onto the two dominant directions.  Adequate for
    # clean synthetic boards; real captures should use the cv2 path.
    # MEASURED on photo-realistic renders (perspective tilt + lighting
    # gradient + defocus + sensor noise,
    # tests/test_calibration.py::test_corner_detection_accuracy_photoreal…):
    # the raw Harris picks drift onto texture/noise and the ordered grid
    # can be garbage (~170 px mean error observed) — far below cv2's
    # sub-pixel result on the same image.  A silently wrong grid poisons
    # the whole calibration, so the fallback VALIDATES its lattice and
    # honestly returns found=False when it is not checkerboard-shaped.
    corners = _harris_corners(img, rows * columns)
    if corners is None or len(corners) < rows * columns:
        return False, None
    ordered = _order_grid(corners[: rows * columns], rows, columns)
    if not _grid_is_plausible(ordered, rows, columns):
        return False, None
    return True, ordered.astype(np.float32)


def _grid_is_plausible(ordered: np.ndarray, rows: int, columns: int,
                       spacing_tol: float = 0.5, align_tol: float = 0.9
                       ) -> bool:
    """Checkerboard-lattice sanity check for the fallback detector.

    A (mildly) perspective-projected lattice has, along every row, step
    vectors that are near-parallel (cosine > ``align_tol``) with spacing
    varying smoothly (each step within ``spacing_tol``·median of the
    row's median step); same along columns.  Noise-driven Harris picks
    fail this decisively (measured: garbage grids score cosines < 0.5).
    """
    g = ordered.reshape(rows, columns, 2)

    def consistent(steps: np.ndarray) -> bool:
        # steps: (..., n_steps, 2) along one axis.
        norms = np.linalg.norm(steps, axis=-1)
        if np.any(norms < 1e-6):
            return False
        med = np.median(norms)
        if np.any(np.abs(norms - med) > spacing_tol * med):
            return False
        unit = steps / norms[..., None]
        mean_dir = unit.reshape(-1, 2).mean(0)
        mean_dir /= max(np.linalg.norm(mean_dir), 1e-9)
        return bool(np.all(unit @ mean_dir > align_tol))

    return consistent(np.diff(g, axis=1)) and consistent(np.diff(g, axis=0))


def refine_corners_subpixel(gray: np.ndarray, corners: np.ndarray, win: int = 11):
    """Sub-pixel corner refinement (cv2.cornerSubPix window (11, 11),
    matching reference utils.py:175's convention)."""
    if _cv2 is not None:
        term = (_cv2.TERM_CRITERIA_EPS + _cv2.TERM_CRITERIA_MAX_ITER, 30, 0.001)
        c = corners.reshape(-1, 1, 2).astype(np.float32)
        _cv2.cornerSubPix(gray, c, (win, win), (-1, -1), term)
        return c.reshape(-1, 2)
    return corners  # fallback: detection-resolution corners


def _harris_corners(gray: np.ndarray, k: int):
    g = gray.astype(np.float64)
    gy, gx = np.gradient(g)
    Ixx, Iyy, Ixy = gx * gx, gy * gy, gx * gy

    def box(a, r=2):
        c = np.cumsum(np.cumsum(np.pad(a, r + 1), 0), 1)
        n = 2 * r + 1
        return (
            c[n:, n:] - c[:-n, n:] - c[n:, :-n] + c[:-n, :-n]
        )[: a.shape[0], : a.shape[1]]

    Sxx, Syy, Sxy = box(Ixx), box(Iyy), box(Ixy)
    R = (Sxx * Syy - Sxy**2) - 0.04 * (Sxx + Syy) ** 2
    R[R < 0.01 * R.max()] = 0
    # Non-max suppression on a coarse grid.
    ys, xs = np.unravel_index(np.argsort(R, axis=None)[::-1], R.shape)
    picked = []
    for y, x in zip(ys, xs):
        if R[y, x] == 0:
            break
        if all((y - py) ** 2 + (x - px) ** 2 > 36 for py, px in picked):
            picked.append((y, x))
        if len(picked) >= k:
            break
    if len(picked) < k:
        return None
    return np.array([[x, y] for y, x in picked], np.float64)


def _order_grid(pts: np.ndarray, rows: int, columns: int):
    c = pts - pts.mean(0)
    _, _, Vt = np.linalg.svd(c, full_matrices=False)
    u = c @ Vt[0]
    v = c @ Vt[1]
    order = np.lexsort((u, np.round(v / (np.ptp(v) / max(rows - 1, 1) + 1e-9))))
    return pts[order]

"""Variable-length trace support (BASELINE.json config 5 stretch).

The parity pipeline forces every trace to exactly ``seq_length`` points,
which up-samples short gestures and down-samples long ones. This module
keeps each trace's natural resolution instead: resample at a fixed arc-length
step, cap at ``max_len``, pad to the static shape, and carry a validity
mask. Static shapes + masks keep everything jit/scan-friendly (no dynamic
shapes reach XLA); the transformer generator consumes the mask as an
attention mask and the masked losses ignore padding.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .parse import RawGesture
from .preprocess import _resample_trace


def normalize_gesture_variable(
    raw: RawGesture,
    max_len: int = 128,
    arc_step: float = 0.02,
    min_len: int = 8,
) -> Tuple[np.ndarray, int]:
    """Normalize one trace at its natural resolution.

    The number of points is ``clip(ceil(arc_length / arc_step), min_len,
    max_len)`` — long gestures get more points (up to the cap), short ones
    fewer, instead of everything being forced to the same length.

    Returns (padded (max_len, 3) float32 array, true length). Padding rows
    repeat the last valid point (keeps downstream diffs finite); consumers
    must use the mask.
    """
    pts64 = raw.points
    if len(pts64) < 2:
        return np.zeros((max_len, 3), dtype=np.float32), 0

    points = np.empty((len(pts64), 3), dtype=np.float32)
    points[:, 0] = (pts64[:, 0] / raw.keyb_width) * 2.0 - 1.0
    points[:, 1] = (pts64[:, 1] / raw.keyb_height) * 2.0 - 1.0
    points[:, 2] = pts64[:, 2]

    start, end = points[0, 2], points[-1, 2]
    duration = end - start
    if duration > 0:
        points[:, 2] = (points[:, 2] - start) / duration
    else:
        points[:, 2] = np.linspace(0, 1, len(points))

    arc = float(np.sqrt(np.diff(points[:, :2], axis=0) ** 2 @ np.ones(2)).sum())
    n = int(np.clip(np.ceil(arc / arc_step), min_len, max_len))

    resampled = _resample_trace(points, n) if len(points) != n else points[:n]
    padded = np.empty((max_len, 3), dtype=np.float32)
    padded[:n] = resampled
    padded[n:] = resampled[n - 1]
    return padded, n


def length_mask(lengths: np.ndarray, max_len: int) -> np.ndarray:
    """(N,) true lengths → (N, max_len) float32 {0,1} validity mask."""
    return (np.arange(max_len)[None, :] < np.asarray(lengths)[:, None]).astype(np.float32)

"""Savitzky-Golay derivative filtering as one precomputed linear map.

The reference calls scipy.signal.savgol_filter(deriv=3) per gesture per axis
(/root/reference/src/gan/evaluation.py:363-373). The filter (including
scipy's default mode='interp' edge handling, which refits the boundary
windows) is linear in the input, so for a fixed sequence length it is one
(L, L) matrix — applied to a whole gesture batch as a single MXU matmul.
"""

from __future__ import annotations

from functools import lru_cache
from math import factorial

import jax.numpy as jnp
import numpy as np


def savgol_coeffs(window: int, polyorder: int, deriv: int) -> np.ndarray:
    """Least-squares filter taps: w[i] weights x[t - half + i] in the deriv-th
    derivative of the windowed polynomial fit, evaluated at the center."""
    half = window // 2
    pos = np.arange(window) - half
    design = np.vander(pos, polyorder + 1, increasing=True)     # (window, p+1)
    pinv = np.linalg.pinv(design)                               # (p+1, window)
    return pinv[deriv] * factorial(deriv)


@lru_cache(maxsize=16)
def savgol_matrix(seq_length: int, window: int, polyorder: int, deriv: int) -> np.ndarray:
    """(L, L) matrix M with (M @ x) == scipy savgol_filter(x, mode='interp')."""
    assert window % 2 == 1 and window <= seq_length
    half = window // 2
    M = np.zeros((seq_length, seq_length))

    # Interior rows: the stationary filter taps.
    taps = savgol_coeffs(window, polyorder, deriv)
    for t in range(half, seq_length - half):
        M[t, t - half : t + half + 1] = taps

    # Edge rows (mode='interp'): fit one polynomial to the first/last window
    # samples and evaluate its derivative at the edge positions.
    pos = np.arange(window)
    design = np.vander(pos, polyorder + 1, increasing=True)
    pinv = np.linalg.pinv(design)                               # coeffs from samples
    # derivative evaluation row at position t: sum_j c_j * j!/(j-d)! * t^(j-d)
    dmat = np.zeros((seq_length, polyorder + 1))
    for j in range(deriv, polyorder + 1):
        dmat[:, j] = (factorial(j) / factorial(j - deriv)) * (
            np.arange(seq_length, dtype=float) ** (j - deriv)
        )
    head_eval = dmat[:half] @ pinv                              # (half, window)
    M[:half, :window] = head_eval

    tail_pos = np.arange(seq_length - window, seq_length, dtype=float)
    dmat_tail = np.zeros((half, polyorder + 1))
    for j in range(deriv, polyorder + 1):
        dmat_tail[:, j] = (factorial(j) / factorial(j - deriv)) * (
            (tail_pos[-half:] - (seq_length - window)) ** (j - deriv)
        )
    M[-half:, -window:] = dmat_tail @ pinv
    return M


def batched_savgol_jerk(
    gestures: jnp.ndarray, window: int = 21, polyorder: int = 3
) -> jnp.ndarray:
    """Mean Savitzky-Golay jerk magnitude per gesture — the reference's
    'jerk' metric (evaluation.py:364-373) for a whole batch at once.

    gestures: (B, L, >=2); returns (B,). Sequences shorter than the window
    would be 0 in the reference; static shapes make that a caller concern.
    """
    L = gestures.shape[1]
    M = jnp.asarray(savgol_matrix(L, window, polyorder, 3), jnp.float32)
    d3 = jnp.einsum("tl,bld->btd", M, gestures[:, :, :2])        # (B, L, 2)
    return jnp.sqrt(jnp.sum(d3 * d3, axis=-1)).mean(axis=1)

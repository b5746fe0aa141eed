"""Pallas TPU kernel for batched exact DTW.

Same row-sweep-with-scans math as ``ops.dtw._dtw_from_cost`` (see its
docstring for the derivation), hand-lowered so that the entire recurrence for
a tile of pairs runs inside one kernel with every operand VMEM-resident:

  * coordinates are passed as four (P, L) planes (x/y coords of both
    sequences) — (sublane, lane)-aligned for L = 128;
  * cost rows are materialized on the fly (no (L, L) cost matrix in memory);
  * cumsum / cummin are log-depth shift-and-combine ladders on the lane axis;
  * the only sequential dimension is the L-row loop.

Grid: one program per tile of ``pair_tile`` pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Plain Python float — a jnp scalar here would be a captured constant inside
# the Pallas kernel trace, which pallas_call rejects.
_BIG = 1e30


def _shift_right(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    """Shift lanes right by static s, filling with ``fill``."""
    P = x.shape[0]
    pad = jnp.full((P, s), fill, x.dtype)
    return jnp.concatenate([pad, x[:, : x.shape[1] - s]], axis=1)


def _lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    L = x.shape[1]
    s = 1
    while s < L:
        x = x + _shift_right(x, s, 0.0)
        s *= 2
    return x


def _lane_cummin(x: jnp.ndarray) -> jnp.ndarray:
    L = x.shape[1]
    s = 1
    while s < L:
        x = jnp.minimum(x, _shift_right(x, s, _BIG))
        s *= 2
    return x


def _dtw_kernel(*refs, seq_len: int, n_dims: int):
    # refs: n_dims (P, L) planes of the first sequence, then n_dims planes
    # of the second, then the output ref. Plane count is static, so the
    # feature loop fully unrolls (D ∈ {2, 3}: x, y and optionally t).
    out_ref = refs[-1]
    x_planes = [r[:] for r in refs[:n_dims]]
    y_planes = [r[:] for r in refs[n_dims:2 * n_dims]]

    P, L = y_planes[0].shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)

    def cost_row(i):
        # Extract lane i of the first sequence with a one-hot reduction —
        # Mosaic cannot prove alignment for an unaligned dynamic lane slice.
        mask = (lane == i).astype(jnp.float32)
        sq = None
        for xp, yp in zip(x_planes, y_planes):
            c = jnp.sum(xp * mask, axis=1, keepdims=True)     # (P, 1)
            d = c - yp
            sq = d * d if sq is None else sq + d * d
        return jnp.sqrt(sq)                                   # (P, L)

    # Row 0: only left-moves → prefix sums of the first cost row.
    d0 = _lane_cumsum(cost_row(0))

    def body(i, d_prev):
        c = cost_row(i)
        m = jnp.minimum(d_prev, _shift_right(d_prev, 1, _BIG))
        s = _lane_cumsum(c)
        u = m - _shift_right(s, 1, 0.0)
        return s + _lane_cummin(u)

    d_last = jax.lax.fori_loop(1, seq_len, body, d0)
    out_ref[:] = d_last[:, seq_len - 1 :]


@functools.partial(jax.jit, static_argnames=("pair_tile", "interpret"))
def dtw_pairs_pallas(x: jnp.ndarray, y: jnp.ndarray, pair_tile: int = 256,
                     interpret: bool = False) -> jnp.ndarray:
    """DTW distances for aligned pairs via the Pallas kernel.

    x, y: (P, L, D) float32 with D ∈ {2, 3} → (P,). Pairs are padded to a
    multiple of ``pair_tile``; L should be lane-friendly (128 here).
    ``interpret`` runs the kernel in the Pallas interpreter (CPU testing).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, L, D = x.shape
    if D not in (2, 3):
        raise ValueError(f"Pallas DTW kernel supports D in (2, 3); got D={D}")
    n_tiles = -(-P // pair_tile)
    padded = n_tiles * pair_tile
    if padded != P:
        pad = jnp.zeros((padded - P, L, D), x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
        y = jnp.concatenate([y, pad], axis=0)

    planes = tuple(x[:, :, d] for d in range(D)) + tuple(y[:, :, d] for d in range(D))

    in_spec = pl.BlockSpec((pair_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_dtw_kernel, seq_len=L, n_dims=D),
        out_shape=jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        grid=(n_tiles,),
        in_specs=[in_spec] * (2 * D),
        out_specs=pl.BlockSpec((pair_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*planes)
    return out[:P, 0]


def pallas_dtw_available() -> bool:
    """TPU backend + not disabled via WGG_DISABLE_PALLAS_DTW (shared
    predicate: ops/tpu_platform.py)."""
    from .tpu_platform import pallas_enabled

    return pallas_enabled("WGG_DISABLE_PALLAS_DTW")

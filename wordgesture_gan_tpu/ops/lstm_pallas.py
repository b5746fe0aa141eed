"""Pallas TPU kernel for the LSTM recurrence (forward only) — experimental.

Status (measured on v5e, B=512/H=48/L=128, in-scan timing): neither
variant beats the XLA scan with unroll=4 (~2.9 ms per 4-layer BiLSTM
forward): the batch-tiled variant runs ~10 ms (grid programs serialize on
the single core, multiplying sequential steps), and the single-program
DMA-pipelined variant (below) runs ~11 ms — the lane-alignment padding
inflates the per-step stream 2.67x and the pipeline is DMA-bound at this
tiny hidden size (H=48). Both are numerically exact (max diff 0.0 on
device) and kept as validated building blocks for larger-H variants, but
the generator's production path stays the XLA scan.

Layout: input projections ``x @ W_ih + b`` stay bulk XLA matmuls (MXU); the
kernel runs only the time recurrence with the hidden-to-hidden weight
VMEM-resident, sequence as the leading (untiled, dynamically indexable) axis.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp


def _lstm_recurrence_kernel(xproj_ref, whh_ref, out_ref, *, seq_len: int, hidden: int):
    """xproj: (L, TB, 4H) input projections (+both biases); whh: (H, 4H);
    out: (L, TB, H) hidden states."""
    TB = xproj_ref.shape[1]

    def step(t, carry):
        h, c = carry
        gates = xproj_ref[t] + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * hidden : 1 * hidden])
        f = jax.nn.sigmoid(gates[:, 1 * hidden : 2 * hidden])
        g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[:, 3 * hidden : 4 * hidden])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        out_ref[t] = h
        return (h, c)

    h0 = jnp.zeros((TB, hidden), jnp.float32)
    jax.lax.fori_loop(0, seq_len, step, (h0, h0))


@functools.partial(jax.jit, static_argnames=("hidden", "batch_tile", "interpret"))
def lstm_recurrence_pallas(
    x_proj: jnp.ndarray,       # (B, L, 4H)
    w_hh: jnp.ndarray,         # (H, 4H)
    hidden: int,
    batch_tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the recurrence for one LSTM direction: (B, L, 4H) → (B, L, H)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, G = x_proj.shape
    n_tiles = -(-B // batch_tile)
    padded = n_tiles * batch_tile
    if padded != B:
        x_proj = jnp.concatenate(
            [x_proj, jnp.zeros((padded - B, L, G), x_proj.dtype)], axis=0
        )

    xp = jnp.swapaxes(x_proj, 0, 1)        # (L, padded, 4H) — seq leading

    out = pl.pallas_call(
        functools.partial(_lstm_recurrence_kernel, seq_len=L, hidden=hidden),
        out_shape=jax.ShapeDtypeStruct((L, padded, hidden), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((L, batch_tile, G), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_hh.shape[0], G), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, batch_tile, hidden), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w_hh)
    return jnp.swapaxes(out, 0, 1)[:B]      # (B, L, H)


def bilstm_apply_pallas(layers: List[Dict], x: jnp.ndarray, hidden: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Stacked BiLSTM forward with Pallas recurrences: (B, L, D) → (B, L, 2H).

    Same math as ``models.layers.bilstm_apply`` (gate order i,f,g,o; zero
    initial state; per-direction flips)."""
    h = x
    for layer in layers:
        outs = []
        for name, reverse in (("fwd", False), ("bwd", True)):
            cell = layer[name]
            hi = jnp.flip(h, axis=1) if reverse else h
            x_proj = hi @ cell["w_ih"] + (cell["b_ih"] + cell["b_hh"])
            hs = lstm_recurrence_pallas(x_proj, cell["w_hh"], hidden, interpret=interpret)
            outs.append(jnp.flip(hs, axis=1) if reverse else hs)
        h = jnp.concatenate(outs, axis=-1)
    return h


def pallas_lstm_available() -> bool:
    from .tpu_platform import pallas_enabled

    return pallas_enabled("WGG_DISABLE_PALLAS_LSTM")


# ---------------------------------------------------------------------------
# DMA-pipelined single-program variant
# ---------------------------------------------------------------------------
#
# One program owns the whole batch; x_proj timesteps stream HBM → VMEM with
# double-buffered async copies overlapping the recurrence compute, and hidden
# states stream back out the same way. No batch tiling → the sequential step
# count stays at L.


_LANE = 128


def _lstm_dma_kernel(xproj_hbm, whh_ref, out_hbm, x_buf, o_buf, in_sem, out_sem,
                     *, seq_len: int, batch: int):
    """Gate-padded layout: hidden padded to 128 lanes, gates to 4×128 = 512,
    so every DMA slice and gate split is lane-aligned. Padding lanes carry
    exact zeros through the recurrence (their gates are sigmoid(0)·0)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = _LANE
    # The epilogue drains timesteps L-2 and L-1; L=1 would wait on a DMA
    # that was never started (device hang, not an error).
    assert seq_len >= 2

    def copy_in(slot, t):
        return pltpu.make_async_copy(xproj_hbm.at[t], x_buf.at[slot], in_sem.at[slot])

    def copy_out(slot, t):
        return pltpu.make_async_copy(o_buf.at[slot], out_hbm.at[t], out_sem.at[slot])

    copy_in(0, 0).start()

    def step(t, carry):
        h, c = carry
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < seq_len)
        def _():
            copy_in(jax.lax.rem(t + 1, 2), t + 1).start()

        copy_in(slot, t).wait()
        gates = x_buf[slot] + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)

        # The slot's previous output DMA (for timestep t-2) must land before
        # overwriting the staging buffer.
        @pl.when(t >= 2)
        def _():
            copy_out(slot, t - 2).wait()

        o_buf[slot] = h
        copy_out(slot, t).start()
        return (h, c)

    h0 = jnp.zeros((batch, H), jnp.float32)
    jax.lax.fori_loop(0, seq_len, step, (h0, h0))

    # Drain the last two in-flight output copies.
    copy_out(jax.lax.rem(seq_len - 2, 2), seq_len - 2).wait()
    copy_out(jax.lax.rem(seq_len - 1, 2), seq_len - 1).wait()


def _pad_gates(x_proj: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """(…, 4H) → (…, 4·128): each gate block padded to its own lane slot."""
    parts = x_proj.reshape(*x_proj.shape[:-1], 4, hidden)
    pad = [(0, 0)] * (parts.ndim - 1) + [(0, _LANE - hidden)]
    return jnp.pad(parts, pad).reshape(*x_proj.shape[:-1], 4 * _LANE)


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def lstm_recurrence_pallas_dma(
    x_proj: jnp.ndarray,       # (B, L, 4H)
    w_hh: jnp.ndarray,         # (H, 4H)
    hidden: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-program DMA-pipelined recurrence: (B, L, 4H) → (B, L, H)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, _G = x_proj.shape
    xp = _pad_gates(jnp.swapaxes(x_proj, 0, 1), hidden)       # (L, B, 512)
    whh = jnp.pad(_pad_gates(w_hh, hidden), ((0, _LANE - hidden), (0, 0)))  # (128, 512)

    out = pl.pallas_call(
        functools.partial(_lstm_dma_kernel, seq_len=L, batch=B),
        out_shape=jax.ShapeDtypeStruct((L, B, _LANE), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x_proj stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),         # w_hh resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),    # streamed out
        scratch_shapes=[
            pltpu.VMEM((2, B, 4 * _LANE), jnp.float32),
            pltpu.VMEM((2, B, _LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, whh)
    return jnp.swapaxes(out[:, :, :hidden], 0, 1)


def bilstm_apply_pallas_dma(layers: List[Dict], x: jnp.ndarray, hidden: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Stacked BiLSTM forward using the DMA-pipelined recurrence."""
    h = x
    for layer in layers:
        outs = []
        for name, reverse in (("fwd", False), ("bwd", True)):
            cell = layer[name]
            hi = jnp.flip(h, axis=1) if reverse else h
            x_proj = hi @ cell["w_ih"] + (cell["b_ih"] + cell["b_hh"])
            hs = lstm_recurrence_pallas_dma(x_proj, cell["w_hh"], hidden, interpret=interpret)
            outs.append(jnp.flip(hs, axis=1) if reverse else hs)
        h = jnp.concatenate(outs, axis=-1)
    return h

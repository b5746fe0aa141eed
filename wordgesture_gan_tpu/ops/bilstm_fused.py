"""Fused whole-stack BiLSTM forward as a single Pallas TPU kernel.

The generator's 4-layer bidirectional recurrence (reference
src/gan/models.py:114-120) dominates the two-cycle train step: 10 of its 12
applications per step are inference-only (critics train against
stop_gradient'd fakes), and under XLA each application pays ~1 µs of fixed
per-scan-step cost × 4 layers × 2 directions (measured on v5e; see
models/layers.py notes). This kernel runs the ENTIRE stack — all layers,
both directions — inside one Pallas program:

  * feature-major layout with the batch in the lane dimension: a (192, B)
    gate tile wastes zero lanes at any B multiple of 128, where the old
    batch-minor attempt padded H=48 → 128 lanes (2.67x traffic);
  * one program, not a batch-tiled grid — grid programs serialize on the
    single TPU core and multiply the sequential step count (measured 10 ms);
  * the forward and time-reversed cells advance together in each loop
    iteration, two independent dependency chains that interleave on the
    MXU/VPU;
  * inter-layer activations stream through HBM with double-buffered async
    copies (in-flight DMA hides the ~200 KB/step behind compute); layer 1's
    prototype input and static-z gate base are fully VMEM-resident.

Forward/inference only: the differentiated path (the joint G+E step) keeps
the XLA scan, whose VJP the compiler handles. Numerics: matmuls accumulate
in float32 on the MXU, gate nonlinearities run in float32, hidden states are
carried and stored in the compute dtype.

Measured design limits (v5e, B=512, H=48, L=128 — negative results recorded
so they are not retried):
  * The kernel is THROUGHPUT-bound, not latency-bound: lane-tiling G latent
    draws against one prototype batch into a single launch (proto tiled G×
    along lanes, streamed from HBM) ran 5.6-6.5 ms for G=10 vs 5.3 ms for 10
    sequential launches at every chunk width tried (512/1024/2048 lanes) —
    wider gate tiles cost proportionally more VPU/MXU time, so there is no
    fixed per-launch overhead worth amortizing. The multi-z variant was
    removed after measurement.
  * bf16 gate nonlinearities (hand-written tanh-based sigmoid; fp32 cell
    accumulation) measured 0.51 ms vs 0.52-0.58 ms — noise-level gain for a
    5e-3 accuracy loss; kept fp32.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp


_LANE = 128


def _kernel(proto_ref, base1_ref, wseq1_ref, whh_ref, wseq_ref, bias_ref,
            hs_ref, in_buf, out_buf, in_sem, out_sem,
            *, seq_len: int, hidden: int, num_layers: int, dtype):
    """See `fused_bilstm_fwd` for shapes. hs_ref (HBM): (layers, L, 2H, B) —
    every layer's [fwd ‖ bwd] hidden states; layer k+1 streams layer k's rows
    back in while writing its own."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = hidden
    L = seq_len
    B = proto_ref.shape[-1]
    assert L >= 2
    f32 = jnp.float32

    def gates_nonlin(g, c):
        i = jax.nn.sigmoid(g[0 * H:1 * H])
        f = jax.nn.sigmoid(g[1 * H:2 * H])
        gg = jnp.tanh(g[2 * H:3 * H])
        o = jax.nn.sigmoid(g[3 * H:4 * H])
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        return h, c

    for k in range(num_layers):
        # -- input DMA plumbing (layers >= 1 stream the previous layer) --
        def copy_in(slot, t, rt, k=k):
            # Both directions' input slices for one step: x_t for fwd,
            # x_{L-1-t} for bwd, each (2H, B) from the previous layer.
            return (
                pltpu.make_async_copy(hs_ref.at[k - 1, t], in_buf.at[slot, 0],
                                      in_sem.at[slot, 0]),
                pltpu.make_async_copy(hs_ref.at[k - 1, rt], in_buf.at[slot, 1],
                                      in_sem.at[slot, 1]),
            )

        def copy_out(slot, t, rt, k=k):
            return (
                pltpu.make_async_copy(out_buf.at[slot, 0], hs_ref.at[k, t, 0:H],
                                      out_sem.at[slot, 0]),
                pltpu.make_async_copy(out_buf.at[slot, 1], hs_ref.at[k, rt, H:2 * H],
                                      out_sem.at[slot, 1]),
            )

        if k > 0:
            for d in copy_in(0, 0, L - 1):
                d.start()

        def step(t, carry, k=k):
            h_f, c_f, h_b, c_b = carry
            rt = L - 1 - t
            slot = jax.lax.rem(t, 2)

            if k == 0:
                # Layer 1: 2-dim prototype input via VPU broadcast (outer
                # products, no MXU for K=2); the static-z projection lives in
                # base1 (loop-invariant). proto is (L, 16, B) — time on the
                # leading (untiled, dynamically indexable) axis, the two
                # coordinates in sublane-padded rows 0 and 1; the coordinate
                # split happens on the loaded value, not the ref.
                pt_f = proto_ref[t].astype(f32)                 # (16, B)
                pt_b = proto_ref[rt].astype(f32)
                g_f = (base1_ref[0]
                       + wseq1_ref[0, 0].astype(f32)[:, None] * pt_f[0:1]
                       + wseq1_ref[0, 1].astype(f32)[:, None] * pt_f[1:2])
                g_b = (base1_ref[1]
                       + wseq1_ref[1, 0].astype(f32)[:, None] * pt_b[0:1]
                       + wseq1_ref[1, 1].astype(f32)[:, None] * pt_b[1:2])
            else:
                @pl.when(t + 1 < L)
                def _():
                    for d in copy_in(jax.lax.rem(t + 1, 2), t + 1, rt - 1):
                        d.start()
                for d in copy_in(slot, t, rt):
                    d.wait()
                x_f = in_buf[slot, 0]
                x_b = in_buf[slot, 1]
                g_f = (jax.lax.dot(wseq_ref[k - 1, 0], x_f,
                                   preferred_element_type=f32)
                       + bias_ref[k - 1, 0].astype(f32))
                g_b = (jax.lax.dot(wseq_ref[k - 1, 1], x_b,
                                   preferred_element_type=f32)
                       + bias_ref[k - 1, 1].astype(f32))

            g_f = g_f + jax.lax.dot(whh_ref[k, 0], h_f, preferred_element_type=f32)
            g_b = g_b + jax.lax.dot(whh_ref[k, 1], h_b, preferred_element_type=f32)

            h_f32, c_f = gates_nonlin(g_f, c_f)
            h_b32, c_b = gates_nonlin(g_b, c_b)
            h_f = h_f32.astype(dtype)
            h_b = h_b32.astype(dtype)

            # Stage + stream out (must not overwrite an in-flight slot).
            @pl.when(t >= 2)
            def _():
                for d in copy_out(slot, t - 2, rt + 2):
                    d.wait()

            out_buf[slot, 0] = h_f
            out_buf[slot, 1] = h_b
            for d in copy_out(slot, t, rt):
                d.start()
            return (h_f, c_f, h_b, c_b)

        z_h = jnp.zeros((H, B), dtype)
        z_c = jnp.zeros((H, B), f32)
        jax.lax.fori_loop(0, L, step, (z_h, z_c, z_h, z_c))

        # Drain this layer's last two output slots before the next layer
        # (or the caller) reads them.
        for t in (L - 2, L - 1):
            for d in copy_out(jax.lax.rem(t, 2), t, L - 1 - t):
                d.wait()


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def _fused_call(proto_t, base1, wseq1, whh, wseq, bias, hidden: int,
                interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_layers = whh.shape[0]
    L = proto_t.shape[0]
    B = proto_t.shape[2]
    dtype = whh.dtype

    hs = pl.pallas_call(
        functools.partial(_kernel, seq_len=L, hidden=hidden,
                          num_layers=num_layers, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((num_layers, L, 2 * hidden, B), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # proto (L, 16, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base1 (2, 4H, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wseq1 (2, 2, 4H)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whh (layers, 2, 4H, H)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wseq (layers-1, 2, 4H, 2H)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (layers-1, 2, 4H, 1)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # hs streamed via DMA
        scratch_shapes=[
            pltpu.VMEM((2, 2, 2 * hidden, B), dtype),    # in_buf
            pltpu.VMEM((2, 2, hidden, B), dtype),        # out_buf
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(proto_t, base1, wseq1, whh, wseq, bias)
    return hs[num_layers - 1]                             # (L, 2H, B)


def _prep_proto(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """(Bp, L, 2) → (L, 16, Bp): time leading (dynamically indexable), coords
    in sublane-padded rows 0-1 (Mosaic needs static sublane offsets)."""
    proto_t = jnp.transpose(x, (1, 2, 0))                        # (L, 2, Bp)
    return jnp.pad(proto_t, ((0, 0), (0, 14), (0, 0))).astype(dtype)


def _prep_base1(layers: List[Dict], static: jnp.ndarray, base_dtype) -> jnp.ndarray:
    """Static-z gate base per direction, feature-major: (2, 4H, Bp)."""
    l0 = layers[0]
    return jnp.stack([
        (static @ l0["fwd"]["w_ih"][2:] + l0["fwd"]["b_ih"] + l0["fwd"]["b_hh"]).T,
        (static @ l0["bwd"]["w_ih"][2:] + l0["bwd"]["b_ih"] + l0["bwd"]["b_hh"]).T,
    ]).astype(base_dtype)


def _prep_weights(layers: List[Dict], hidden: int, dtype):
    """(wseq1, whh, wseq, bias) in kernel (feature-major) layout."""
    l0 = layers[0]
    wseq1 = jnp.stack([l0["fwd"]["w_ih"][:2], l0["bwd"]["w_ih"][:2]]).astype(dtype)
    # -> (2 dirs, 2 coords, 4H)
    whh = jnp.stack([
        jnp.stack([layer["fwd"]["w_hh"].T, layer["bwd"]["w_hh"].T])
        for layer in layers]).astype(dtype)
    if len(layers) > 1:
        wseq = jnp.stack([
            jnp.stack([layer["fwd"]["w_ih"].T, layer["bwd"]["w_ih"].T])
            for layer in layers[1:]]).astype(dtype)
        bias = jnp.stack([
            jnp.stack([layer["fwd"]["b_ih"] + layer["fwd"]["b_hh"],
                       layer["bwd"]["b_ih"] + layer["bwd"]["b_hh"]])
            for layer in layers[1:]])[..., None].astype(jnp.float32)
    else:
        # Never read for a single layer; zero-size leading dims break the
        # interpreter's block-shape math, so pass a 1-size dummy instead.
        wseq = jnp.zeros((1, 2, 4 * hidden, 2 * hidden), dtype)
        bias = jnp.zeros((1, 2, 4 * hidden, 1), jnp.float32)
    return wseq1, whh, wseq, bias


def fused_bilstm_fwd(layers: List[Dict], x: jnp.ndarray, hidden: int,
                     static: jnp.ndarray, dtype=jnp.bfloat16,
                     interpret: bool = False) -> jnp.ndarray:
    """Inference-only fused BiLSTM stack: (B, L, 2) + static (B, Dz) → (B, L, 2H).

    Same math as ``models.layers.bilstm_apply(layers, x, hidden, static=...)``
    (gate order i,f,g,o; zero initial state; w_ih rows ordered [seq | static])
    with float32 gate nonlinearities. Batch is padded to a lane multiple."""
    B, L, D = x.shape
    assert D == 2, "fused kernel supports the generator's (x, y) prototype input"
    dtype = jnp.dtype(dtype)

    pad = (-B) % _LANE
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, L, D), x.dtype)], axis=0)
        static = jnp.concatenate(
            [static, jnp.zeros((pad, static.shape[1]), static.dtype)], axis=0)

    proto_t = _prep_proto(x, dtype)
    base1 = _prep_base1(layers, static, jnp.float32)
    wseq1, whh, wseq, bias = _prep_weights(layers, hidden, dtype)

    h_last = _fused_call(proto_t, base1, wseq1, whh, wseq, bias,
                         hidden=hidden, interpret=interpret)     # (L, 2H, Bp)
    return jnp.transpose(h_last, (2, 0, 1))[:B]                  # (B, L, 2H)


def fused_bilstm_available() -> bool:
    """Kernel eligibility: a TPU-ish backend and not explicitly disabled
    (shared predicate: ops/tpu_platform.py)."""
    from .tpu_platform import pallas_enabled

    return pallas_enabled("WGG_DISABLE_PALLAS_LSTM")


def fused_single_device() -> bool:
    """The single shared gate for BOTH fused generator paths (inference and
    training VJP): an eligible TPU backend AND exactly one device — Pallas
    custom calls are not auto-partitioned by pjit, so multi-device meshes
    keep the XLA scan. Keeping one predicate prevents the two paths'
    eligibility rules from drifting apart."""
    try:
        return fused_bilstm_available() and len(jax.devices()) == 1
    except Exception:  # pragma: no cover
        return False

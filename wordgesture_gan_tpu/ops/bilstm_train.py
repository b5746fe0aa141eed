"""Fused BiLSTM training kernels: forward with residuals + backward-through-time.

The inference kernel (ops/bilstm_fused.py) removed the XLA scan from the
critic loop's frozen-generator forwards; this module removes it from the
DIFFERENTIATED forwards too — the joint G+E step's two generator
applications, whose scan VJP dominates the two-cycle train step (measured
3.5 ms each at B=512 bf16 even with full remat, ~45% of the step).

Design (mirrors the inference kernel's layout rules — feature-major tiles,
batch in lanes, both directions advancing together):

  * TRAIN FORWARD (`_fwd_kernel`): same recurrence as inference, but every
    (layer, direction, step) writes a combined (6H, B) residual row —
    [h | c | i | f | g | o] — streamed to HBM. The residuals are exactly
    what the backward needs; nothing is recomputed from scratch.
  * BACKWARD (`_bwd_kernel`): one program sweeping layers top→bottom. For
    each layer both directions run their reverse-time recurrences together
    (the forward direction walks positions L-1→0 while the reversed
    direction walks 0→L-1, so the two streams touch mirror rows, like the
    forward kernel). Per step: reconstruct gate gradients from the stored
    activations, accumulate dW_hh / dW_ih / db on the MXU (contractions
    over the batch lane axis), carry dh via W_hh·dgates, and stream the
    input-gradient rows to HBM ping-pong buffers that become the next
    (lower) layer's incoming dY. The static-z projection's gradient uses
    the per-layer gate-gradient sum: dz = W_z · Σ_t dgates.
  * All gradient arithmetic is float32; residuals are stored in the compute
    dtype (matching what the XLA remat path would reconstruct from).

Integration is a `jax.custom_vjp` (`bilstm_fused_train`) used by the
generator's differentiated path on a single TPU device; gradients were
validated against `jax.grad` of the XLA scan in interpret mode
(tests/test_bilstm_train.py).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp

from .bilstm_fused import (
    _LANE,
    _prep_base1,
    _prep_proto,
    _prep_weights,
    fused_single_device,
)


# ---------------------------------------------------------------------------
# Training forward: inference recurrence + (6H, B) residual rows
# ---------------------------------------------------------------------------


def _fwd_kernel(proto_ref, base1_ref, wseq1_ref, whh_ref, wseq_ref, bias_ref,
                res_ref, out_buf, in_buf, in_sem, out_sem,
                *, seq_len: int, hidden: int, num_layers: int, dtype):
    """res_ref (HBM): (layers, 2, L, 6H, B) — rows [0:H]=h, [H:2H]=c,
    [2H:6H]=post-activation gates (i, f, g, o)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = hidden
    L = seq_len
    B = proto_ref.shape[-1]
    assert L >= 2
    f32 = jnp.float32

    for k in range(num_layers):
        def copy_in(slot, t, rt, k=k):
            # Layer input rows at positions t (fwd) and rt (bwd): the lower
            # layer's [h_f | h_b], assembled from its per-direction planes.
            return (
                pltpu.make_async_copy(res_ref.at[k - 1, 0, t, 0:H],
                                      in_buf.at[slot, 0, 0:H], in_sem.at[slot, 0, 0]),
                pltpu.make_async_copy(res_ref.at[k - 1, 1, t, 0:H],
                                      in_buf.at[slot, 0, H:2 * H], in_sem.at[slot, 0, 1]),
                pltpu.make_async_copy(res_ref.at[k - 1, 0, rt, 0:H],
                                      in_buf.at[slot, 1, 0:H], in_sem.at[slot, 1, 0]),
                pltpu.make_async_copy(res_ref.at[k - 1, 1, rt, 0:H],
                                      in_buf.at[slot, 1, H:2 * H], in_sem.at[slot, 1, 1]),
            )

        def copy_out(slot, t, rt, k=k):
            return (
                pltpu.make_async_copy(out_buf.at[slot, 0], res_ref.at[k, 0, t],
                                      out_sem.at[slot, 0]),
                pltpu.make_async_copy(out_buf.at[slot, 1], res_ref.at[k, 1, rt],
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
                pt_f = proto_ref[t].astype(f32)
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
                g_f = (jax.lax.dot(wseq_ref[k - 1, 0], in_buf[slot, 0],
                                   preferred_element_type=f32)
                       + bias_ref[k - 1, 0].astype(f32))
                g_b = (jax.lax.dot(wseq_ref[k - 1, 1], in_buf[slot, 1],
                                   preferred_element_type=f32)
                       + bias_ref[k - 1, 1].astype(f32))

            g_f = g_f + jax.lax.dot(whh_ref[k, 0], h_f, preferred_element_type=f32)
            g_b = g_b + jax.lax.dot(whh_ref[k, 1], h_b, preferred_element_type=f32)

            @pl.when(t >= 2)
            def _():
                for d in copy_out(slot, t - 2, rt + 2):
                    d.wait()

            def write_dir(dd, g, c):
                i = jax.nn.sigmoid(g[0 * H:1 * H])
                f = jax.nn.sigmoid(g[1 * H:2 * H])
                gg = jnp.tanh(g[2 * H:3 * H])
                o = jax.nn.sigmoid(g[3 * H:4 * H])
                c = f * c + i * gg
                h32 = o * jnp.tanh(c)
                h = h32.astype(dtype)
                out_buf[slot, dd, 0:H] = h
                out_buf[slot, dd, H:2 * H] = c.astype(dtype)
                out_buf[slot, dd, 2 * H:3 * H] = i.astype(dtype)
                out_buf[slot, dd, 3 * H:4 * H] = f.astype(dtype)
                out_buf[slot, dd, 4 * H:5 * H] = gg.astype(dtype)
                out_buf[slot, dd, 5 * H:6 * H] = o.astype(dtype)
                return h, c

            h_f, c_f = write_dir(0, g_f, c_f)
            h_b, c_b = write_dir(1, g_b, c_b)

            for d in copy_out(slot, t, rt):
                d.start()
            return (h_f, c_f, h_b, c_b)

        z_h = jnp.zeros((H, B), dtype)
        z_c = jnp.zeros((H, B), f32)
        jax.lax.fori_loop(0, L, step, (z_h, z_c, z_h, z_c))

        for t in (L - 2, L - 1):
            for d in copy_out(jax.lax.rem(t, 2), t, L - 1 - t):
                d.wait()


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def _fwd_call(proto_t, base1, wseq1, whh, wseq, bias, hidden: int,
              interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_layers = whh.shape[0]
    L = proto_t.shape[0]
    B = proto_t.shape[2]
    dtype = whh.dtype

    res = pl.pallas_call(
        functools.partial(_fwd_kernel, seq_len=L, hidden=hidden,
                          num_layers=num_layers, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((num_layers, 2, L, 6 * hidden, B), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # proto (L, 16, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # base1 (2, 4H, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wseq1 (2, 2, 4H)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whh (layers, 2, 4H, H)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wseq (layers-1, 2, 4H, 2H)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (layers-1, 2, 4H, 1)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 6 * hidden, B), dtype),    # out_buf
            pltpu.VMEM((2, 2, 2 * hidden, B), dtype),    # in_buf
            pltpu.SemaphoreType.DMA((2, 2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(proto_t, base1, wseq1, whh, wseq, bias)
    return res


# ---------------------------------------------------------------------------
# Backward-through-time
# ---------------------------------------------------------------------------


def _bwd_kernel(res_ref, dy_ref, proto_ref, z_ref, whh_m_ref, wseq_m_ref, wstat_ref,
                wp_m_ref,
                dwhh_ref, dwih_ref, dwp_ref, dwz_ref, dbias_ref, dz_ref,
                dpf_ref, dpb_ref,
                res_buf, xin_buf, dpout_buf, dgsum, dacc,
                res_sem, xin_sem, dpout_sem, dy_sem,
                *, seq_len: int, hidden: int, num_layers: int, dtype):
    """Reverse sweep. Shapes:
      res_ref  (layers, 2, L, 6H, B)  forward residuals (HBM)
      dy_ref   (L, 2H, B)             loss gradient w.r.t. the stack output
      whh_m_ref (layers, 2, H, 4H)    model-layout recurrent weights
      wseq_m_ref(layers-1, 2, 2H, 4H) model-layout input weights (layers ≥ 1)
      wstat_ref (2, Dz, 4H)           static-z rows of layer 0's w_ih
      wp_m_ref  (2, 16, 4H)           prototype rows of layer 0's w_ih (rows
                                      2:16 zero-padded)
      outputs: dwhh (layers, 2, H, 4H), dwih (layers-1, 2, 2H, 4H),
               dwp (2, 16, 4H), dwz (2, Dz, 4H), dbias (layers, 2, 4H, 1),
               dz (Dz, B), and the prototype-gradient streams dpf/dpb
               (L, 16, B).

    Inter-layer gradient flow never touches HBM: ``dacc`` is a VMEM
    ping-pong pair of (L, 2H, B) accumulators. dY is DMA'd into dacc[0]
    once up front, so the top layer reads it exactly like every lower layer
    reads its predecessor's accumulated input gradients; layer k adds its
    two per-direction input-gradient contributions into the write buffer
    in place (each position receives exactly two — dxf at sweep index
    L-1-x, dxb at index x — so the first touch assigns, the second adds).
    This replaced four HBM (L, 2H, B) ping-pong streams plus 6 DMA
    issues/step (4 dyin reads + 2 dxout writes); measured ~0.3 ms off the
    fwd+bwd pair at B=512 bf16.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H = hidden
    L = seq_len
    B = res_ref.shape[-1]
    assert L >= 2
    f32 = jnp.float32
    one = jnp.float32(1.0)

    # Preload dY into accumulator 0 (the top layer's read buffer).
    pltpu.make_async_copy(dy_ref, dacc.at[0], dy_sem).start()
    pltpu.make_async_copy(dy_ref, dacc.at[0], dy_sem).wait()

    for k in range(num_layers - 1, -1, -1):
        # Ping-pong: layer k reads the accumulator its successor wrote
        # (dacc[0] holds dY for the top layer) and accumulates into the
        # other one.
        ridx = (num_layers - 1 - k) % 2
        widx = 1 - ridx

        def pos(d, u):
            # Direction d's residual position at sweep iteration u.
            return L - 1 - u if d == 0 else u

        def copy_res(slot, u, k=k):
            # Residual rows for both directions at their iteration-u positions.
            return (
                pltpu.make_async_copy(res_ref.at[k, 0, pos(0, u)],
                                      res_buf.at[slot, 0], res_sem.at[slot, 0]),
                pltpu.make_async_copy(res_ref.at[k, 1, pos(1, u)],
                                      res_buf.at[slot, 1], res_sem.at[slot, 1]),
            )

        def copy_xin(slot, u, k=k):
            # Layer input rows (lower layer's [h_f | h_b]) at pos(d, u),
            # for the dW_ih accumulation. Layers >= 1 only.
            t, p = pos(0, u), pos(1, u)
            return (
                pltpu.make_async_copy(res_ref.at[k - 1, 0, t, 0:H],
                                      xin_buf.at[slot, 0, 0:H], xin_sem.at[slot, 0, 0]),
                pltpu.make_async_copy(res_ref.at[k - 1, 1, t, 0:H],
                                      xin_buf.at[slot, 0, H:2 * H], xin_sem.at[slot, 0, 1]),
                pltpu.make_async_copy(res_ref.at[k - 1, 0, p, 0:H],
                                      xin_buf.at[slot, 1, 0:H], xin_sem.at[slot, 1, 0]),
                pltpu.make_async_copy(res_ref.at[k - 1, 1, p, 0:H],
                                      xin_buf.at[slot, 1, H:2 * H], xin_sem.at[slot, 1, 1]),
            )

        def copy_dpout(slot, u):
            # Layer-0 prototype-gradient rows: fwd at t, bwd at p.
            t, p = pos(0, u), pos(1, u)
            return (
                pltpu.make_async_copy(dpout_buf.at[slot, 0], dpf_ref.at[t],
                                      dpout_sem.at[slot, 0]),
                pltpu.make_async_copy(dpout_buf.at[slot, 1], dpb_ref.at[p],
                                      dpout_sem.at[slot, 1]),
            )

        # Zero this layer's accumulators.
        dgsum[0] = jnp.zeros((4 * H, B), f32)
        dgsum[1] = jnp.zeros((4 * H, B), f32)
        if k > 0:
            dwih_ref[k - 1, 0] = jnp.zeros((2 * H, 4 * H), f32)
            dwih_ref[k - 1, 1] = jnp.zeros((2 * H, 4 * H), f32)
        else:
            dwp_ref[0] = jnp.zeros((16, 4 * H), f32)
            dwp_ref[1] = jnp.zeros((16, 4 * H), f32)
        dwhh_ref[k, 0] = jnp.zeros((H, 4 * H), f32)
        dwhh_ref[k, 1] = jnp.zeros((H, 4 * H), f32)

        # Prologue: residual row for u=0 (synchronous), xin for u=0.
        for d in copy_res(0, 0):
            d.start()
        for d in copy_res(0, 0):
            d.wait()
        if k > 0:
            for d in copy_xin(0, 0):
                d.start()

        def step(u, carry, k=k, ridx=ridx, widx=widx):
            dh_f, dc_f, dh_b, dc_b = carry
            slot = jax.lax.rem(u, 2)
            nslot = jax.lax.rem(u + 1, 2)
            t, p = pos(0, u), pos(1, u)

            # Prefetch next iteration's rows (the residual row doubles as
            # this iteration's "previous internal step" row).
            @pl.when(u + 1 < L)
            def _():
                for d in copy_res(nslot, u + 1):
                    d.start()
                if k > 0:
                    for d in copy_xin(nslot, u + 1):
                        d.start()

            # Incoming dY for this step: direction d's H-row half at its
            # pos(d, u), straight out of the read accumulator (VMEM).
            dy_f = dacc[ridx, t, 0:H].astype(f32)
            dy_b = dacc[ridx, p, H:2 * H].astype(f32)

            # Gate-gradient reconstruction needs c_prev (previous internal
            # step) — that's the row being prefetched; wait for it now.
            @pl.when(u + 1 < L)
            def _():
                for d in copy_res(nslot, u + 1):
                    d.wait()
            valid_prev = jnp.where(u + 1 < L, one, jnp.float32(0.0))

            def dir_step(dd, dh_c, dc_c):
                row = res_buf[slot, dd]
                c_t = row[H:2 * H].astype(f32)
                i = row[2 * H:3 * H].astype(f32)
                f = row[3 * H:4 * H].astype(f32)
                g = row[4 * H:5 * H].astype(f32)
                o = row[5 * H:6 * H].astype(f32)
                prow = res_buf[nslot, dd]
                h_prev = prow[0:H].astype(f32) * valid_prev
                c_prev = prow[H:2 * H].astype(f32) * valid_prev

                dh = dh_c + (dy_f if dd == 0 else dy_b)
                tanh_c = jnp.tanh(c_t)
                do_ = dh * tanh_c
                dc = dc_c + dh * o * (one - tanh_c * tanh_c)
                dgates = jnp.concatenate([
                    dc * g * i * (one - i),
                    dc * c_prev * f * (one - f),
                    dc * i * (one - g * g),
                    do_ * o * (one - o),
                ], axis=0)                                     # (4H, B) f32

                dc_next = dc * f
                dh_next = jax.lax.dot(whh_m_ref[k, dd].astype(f32), dgates,
                                      preferred_element_type=f32)

                dgsum[dd] += dgates
                dwhh_ref[k, dd] += jax.lax.dot_general(
                    h_prev, dgates, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)                # (H, 4H)
                return dgates, dh_next, dc_next

            dg_f, dh_f, dc_f = dir_step(0, dh_f, dc_f)
            dg_b, dh_b, dc_b = dir_step(1, dh_b, dc_b)

            # dW_ih accumulation + input-gradient streaming.
            if k > 0:
                for d in copy_xin(slot, u):
                    d.wait()
                dwih_ref[k - 1, 0] += jax.lax.dot_general(
                    xin_buf[slot, 0].astype(f32), dg_f, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)                # (2H, 4H)
                dwih_ref[k - 1, 1] += jax.lax.dot_general(
                    xin_buf[slot, 1].astype(f32), dg_b, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)

                # Input-gradient contributions, accumulated in the write
                # buffer in place. Position t also receives a dxb
                # contribution at sweep index t (= L-1-u); position p also
                # receives a dxf contribution at index p (= u). Whichever
                # lands first assigns, the other adds; at an odd-L middle
                # step (t == p) the dxf write below executes first.
                dxf = jax.lax.dot(
                    wseq_m_ref[k - 1, 0].astype(f32), dg_f,
                    preferred_element_type=f32).astype(dtype)  # (2H, B)
                dxb = jax.lax.dot(
                    wseq_m_ref[k - 1, 1].astype(f32), dg_b,
                    preferred_element_type=f32).astype(dtype)
                zero = jnp.zeros((), dtype)
                dacc[widx, t] = dxf + jnp.where(2 * u <= L - 1, zero,
                                                dacc[widx, t])
                dacc[widx, p] = dxb + jnp.where(2 * u < L - 1, zero,
                                                dacc[widx, p])
            else:
                pt_f = proto_ref[t].astype(f32)                # (16, B)
                pt_b = proto_ref[p].astype(f32)
                dwp_ref[0] += jax.lax.dot_general(
                    pt_f, dg_f, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)                # (16, 4H)
                dwp_ref[1] += jax.lax.dot_general(
                    pt_b, dg_b, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)

                # Prototype gradient: dx_t = W_proto · dgates, streamed per
                # direction (rows 2:16 of wp_m are zero → zero rows).
                @pl.when(u >= 2)
                def _():
                    for d in copy_dpout(slot, u - 2):
                        d.wait()
                dpout_buf[slot, 0] = jax.lax.dot(
                    wp_m_ref[0].astype(f32), dg_f,
                    preferred_element_type=f32).astype(dtype)  # (16, B)
                dpout_buf[slot, 1] = jax.lax.dot(
                    wp_m_ref[1].astype(f32), dg_b,
                    preferred_element_type=f32).astype(dtype)
                for d in copy_dpout(slot, u):
                    d.start()

            return (dh_f, dc_f, dh_b, dc_b)

        z0 = jnp.zeros((H, B), f32)
        jax.lax.fori_loop(0, L, step, (z0, z0, z0, z0))

        if k == 0:
            for u in (L - 2, L - 1):
                for d in copy_dpout(jax.lax.rem(u, 2), u):
                    d.wait()

        # Layer epilogue: bias gradient (b_ih and b_hh receive the same sum)
        # and, for layer 0, the static-z weight/input gradients.
        dbias_ref[k, 0] = jnp.sum(dgsum[0], axis=1, keepdims=True)
        dbias_ref[k, 1] = jnp.sum(dgsum[1], axis=1, keepdims=True)
        if k == 0:
            dwz_ref[0] = jax.lax.dot_general(
                z_ref[...].astype(f32), dgsum[0], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                    # (Dz, 4H)
            dwz_ref[1] = jax.lax.dot_general(
                z_ref[...].astype(f32), dgsum[1], (((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            dz_ref[...] = (
                jax.lax.dot(wstat_ref[0].astype(f32), dgsum[0],
                            preferred_element_type=f32)
                + jax.lax.dot(wstat_ref[1].astype(f32), dgsum[1],
                              preferred_element_type=f32))     # (Dz, B)


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def _bwd_call(res, dy_t, proto_t, z_t, whh_m, wseq_m, wstat, wp_m, hidden: int,
              interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_layers, _, L, _, B = res.shape
    H = hidden
    Dz = wstat.shape[1]
    dtype = res.dtype
    f32 = jnp.float32

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, seq_len=L, hidden=H,
                          num_layers=num_layers, dtype=dtype),
        out_shape=(
            jax.ShapeDtypeStruct((num_layers, 2, H, 4 * H), f32),      # dwhh
            jax.ShapeDtypeStruct((max(num_layers - 1, 1), 2, 2 * H, 4 * H), f32),  # dwih
            jax.ShapeDtypeStruct((2, 16, 4 * H), f32),                 # dwp
            jax.ShapeDtypeStruct((2, Dz, 4 * H), f32),                 # dwz
            jax.ShapeDtypeStruct((num_layers, 2, 4 * H, 1), f32),      # dbias
            jax.ShapeDtypeStruct((Dz, B), f32),                        # dz
            jax.ShapeDtypeStruct((L, 16, B), dtype),                   # dpf
            jax.ShapeDtypeStruct((L, 16, B), dtype),                   # dpb
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # res
            pl.BlockSpec(memory_space=pl.ANY),       # dy (L, 2H, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # proto (L, 16, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # z (Dz, B)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # whh_m
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wseq_m
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wstat
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wp_m
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 6 * hidden, B), dtype),     # res_buf
            pltpu.VMEM((2, 2, 2 * hidden, B), dtype),     # xin_buf
            pltpu.VMEM((2, 2, 16, B), dtype),             # dpout_buf
            pltpu.VMEM((2, 4 * hidden, B), f32),          # dgsum
            pltpu.VMEM((2, L, 2 * hidden, B), dtype),     # dacc
            pltpu.SemaphoreType.DMA((2, 2)),              # res_sem
            pltpu.SemaphoreType.DMA((2, 2, 2)),           # xin_sem
            pltpu.SemaphoreType.DMA((2, 2)),              # dpout_sem
            pltpu.SemaphoreType.DMA(()),                  # dy_sem
        ],
        # The dacc ping-pong pair alone is ~2·L·2H·B·itemsize (25 MB at
        # B=512 bf16) — past the default 16 MB scoped-vmem cap, well inside
        # the chip's 128 MB VMEM. Budget: dacc + the small double buffers
        # + headroom for compiler temporaries.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(res, dy_t, proto_t, z_t, whh_m, wseq_m, wstat, wp_m)
    return outs[:6] + (outs[6], outs[7])


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _prep_model_weights(layers: List[Dict], dtype):
    """Model-layout weights for the backward: (whh_m, wseq_m, wstat, wp_m)."""
    whh_m = jnp.stack([
        jnp.stack([layer["fwd"]["w_hh"], layer["bwd"]["w_hh"]])
        for layer in layers]).astype(dtype)                   # (layers, 2, H, 4H)
    if len(layers) > 1:
        wseq_m = jnp.stack([
            jnp.stack([layer["fwd"]["w_ih"], layer["bwd"]["w_ih"]])
            for layer in layers[1:]]).astype(dtype)           # (layers-1, 2, 2H, 4H)
    else:
        hidden = layers[0]["fwd"]["w_hh"].shape[0]
        wseq_m = jnp.zeros((1, 2, 2 * hidden, 4 * hidden), dtype)
    wstat = jnp.stack([layers[0]["fwd"]["w_ih"][2:],
                       layers[0]["bwd"]["w_ih"][2:]]).astype(dtype)  # (2, Dz, 4H)
    wp_m = jnp.stack([
        jnp.pad(layers[0]["fwd"]["w_ih"][:2], ((0, 14), (0, 0))),
        jnp.pad(layers[0]["bwd"]["w_ih"][:2], ((0, 14), (0, 0))),
    ]).astype(dtype)                                          # (2, 16, 4H)
    return whh_m, wseq_m, wstat, wp_m


def bilstm_train_apply(layers, x, static, hidden: int, dtype=jnp.bfloat16,
                       interpret: bool = False):
    """Differentiable fused BiLSTM stack: (B, L, 2) + static (B, Dz) → (B, L, 2H).

    Same math as ``models.layers.bilstm_apply`` with the scan replaced by the
    Pallas forward/backward pair above; parameters/gradients stay float32 and
    every primal input — the layer weights, the static code, AND the sequence
    input x — receives a true cotangent. Batch padding to a lane multiple
    happens here, OUTSIDE the custom_vjp, so the pad/crop transposes are
    XLA's."""
    B, L, D = x.shape
    assert D == 2
    pad = (-B) % _LANE
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, L, D), x.dtype)], axis=0)
        static = jnp.concatenate(
            [static, jnp.zeros((pad, static.shape[1]), static.dtype)], axis=0)
    y = _train_core(layers, x, static, hidden, jnp.dtype(dtype).name, interpret)
    return y[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _train_core(layers, x, static, hidden: int, dtype_name: str,
                interpret: bool):
    y, _ = _fwd_with_res(layers, x, static, hidden, dtype_name, interpret)
    return y


def _fwd_with_res(layers, x, static, hidden, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    proto_t = _prep_proto(x, dtype)
    base1 = _prep_base1(layers, static, jnp.float32)
    wseq1, whh, wseq, bias = _prep_weights(layers, hidden, dtype)

    res = _fwd_call(proto_t, base1, wseq1, whh, wseq, bias,
                    hidden=hidden, interpret=interpret)
    # y: last layer's h rows, (layers, 2, L, 6H, B) → (B, L, 2H)
    h_both = res[-1, :, :, 0:hidden, :]                       # (2, L, H, B)
    y = jnp.concatenate([h_both[0], h_both[1]], axis=1)       # (L, 2H, B)
    y = jnp.transpose(y, (2, 0, 1))
    return y, (res, proto_t, static, layers)


def _train_fwd(layers, x, static, hidden, dtype_name, interpret):
    return _fwd_with_res(layers, x, static, hidden, dtype_name, interpret)


def _train_bwd(hidden, dtype_name, interpret, residuals, dy):
    res, proto_t, static_p, layers = residuals
    dtype = jnp.dtype(dtype_name)
    num_layers, _, L, _, Bp = res.shape

    dy_t = jnp.transpose(dy.astype(dtype), (1, 2, 0))         # (L, 2H, Bp)
    z_t = jnp.transpose(static_p, (1, 0)).astype(dtype)       # (Dz, Bp)
    whh_m, wseq_m, wstat, wp_m = _prep_model_weights(layers, dtype)

    dwhh, dwih, dwp, dwz, dbias, dz, dpf, dpb = _bwd_call(
        res, dy_t, proto_t, z_t, whh_m, wseq_m, wstat, wp_m,
        hidden=hidden, interpret=interpret)

    dlayers = []
    for k in range(num_layers):
        cells = {}
        for d, name in ((0, "fwd"), (1, "bwd")):
            if k == 0:
                w_ih = jnp.concatenate([dwp[d, 0:2], dwz[d]], axis=0)
            else:
                w_ih = dwih[k - 1, d]
            b = dbias[k, d, :, 0]
            cells[name] = {"w_ih": w_ih, "w_hh": dwhh[k, d],
                           "b_ih": b, "b_hh": b}
        dlayers.append(cells)

    dstatic = jnp.transpose(dz, (1, 0))                       # (Bp, Dz)
    # Prototype gradient: per-direction streams summed, coord rows sliced.
    dx = jnp.transpose((dpf + dpb)[:, 0:2, :], (2, 0, 1)).astype(jnp.float32)
    return dlayers, dx, dstatic


_train_core.defvjp(_train_fwd, _train_bwd)


def fused_train_available() -> bool:
    """Alias of the shared single-device gate (bilstm_fused.fused_single_device)."""
    return fused_single_device()

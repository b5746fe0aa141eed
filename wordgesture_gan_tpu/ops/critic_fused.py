"""Fused Pallas kernel for the temporal critic's WGAN update gradients.

The critic inner loop takes 10 critic updates per train step (n_critic=5 ×
two critics, reference utils.py:68-109), and profiling showed the XLA
lowering of each update — conv stack forward ×2, backward, pooling
transposes — costs ~0.7 ms/step-iteration of mostly *launch latency*:
~5.2 ms/step for the 20 forwards plus ~1.9 ms for the 10 backwards at
B=512 bf16 on v5e, an order of magnitude above the conv stack's compute
floor (~0.1 ms). This module collapses each critic update's entire
loss-and-gradient computation into ONE Pallas program per scored half.

Three structural facts make a direct gradient kernel trivial compared to a
generic VJP:

  * the critic update needs NO input gradients — ``real`` is data and the
    fakes are ``stop_gradient``'d (reference utils.py:70-109 trains critics
    on detached samples), so the backward stops at the weights;
  * the features are unused (feature matching only happens in the joint
    G+E step), so only scores are needed;
  * the WGAN critic loss is mean(fake) − mean(real)
    (src/gan/losses.py:26-58), so the score cotangent is the constant
    ±1/B — the backward can start from a literal.

Partition of work:

  * XLA (around the kernel): conv1 as one im2col matmul (K·C_in = 15 is
    too narrow a lane dimension to waste a kernel block on), the batched
    spectral-norm power iteration (`layers.batched_spectral_normalize`)
    with its σ-gradient chain via ``jax.vjp``, dW1 from the kernel's dh1,
    and the clip+Adam update.
  * Pallas kernel (`_critic_kernel`): conv2 → conv3 → adaptive-avg-pool →
    channel-major flatten → 3-layer MLP forward, then the full backward to
    (dW2, db2, dW3, db3, dM1..3, dbm1..3, dh1). Convolutions run as
    per-tap shifted matmuls on the MXU (rows = (sample, position) pairs,
    lanes = channels); row shifts mask the per-sample boundary. All
    matmul accumulation is float32; activations and propagated cotangents
    are kept in the compute dtype, mirroring the XLA mixed-precision path.

Grid: ``(2 × sub,)`` — programs 0..sub−1 process the real half, the rest
the fake half (per-half weight blocks via the index map: the reference
scores the two halves with *different* σ estimates, torch spectral_norm
advancing u on every forward). Gradients accumulate across the sub
batch-tiles of a half in revisited output blocks.

Used by ``train/gan_step._critic_update`` on a single TPU device
(`fused_critic_available`); the XLA path remains for CPU/multi-chip and
for the MLP critic. Gradients are validated against ``jax.grad`` of the
XLA path in interpret mode (tests/test_critic_fused.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.layers import batched_spectral_normalize, leaky_relu


def _shift_rows(x: jnp.ndarray, d: int, pos: jnp.ndarray, L: int) -> jnp.ndarray:
    """A[r] = x[r - d] where both rows belong to the same length-L sample,
    else 0. ``pos`` is (N, 1) int32 = row position within its sample."""
    N, C = x.shape
    if d == 0:
        return x
    if d > 0:
        sh = jnp.concatenate([jnp.zeros((d, C), x.dtype), x[: N - d]], axis=0)
        m = pos >= d
    else:
        sh = jnp.concatenate([x[-d:], jnp.zeros((-d, C), x.dtype)], axis=0)
        m = pos < L + d
    # 0/1-multiply instead of a select: Mosaic's i1 vectors carry the layout
    # of the comparison's operands, and a bf16-valued select over an
    # int32-derived mask trips "Invalid relayout".
    return sh * m.astype(x.dtype)


def _conv_fwd(h_in, w2d, bias2d, K: int, pad: int, pos, L, dtype):
    """Per-tap shifted matmuls: rows (sample·position), lanes channels.
    ``bias2d`` is (1, C_out). Rounding points mirror the XLA path exactly
    (bf16 conv: f32 accumulation over all taps, ONE rounding, then a
    bf16 bias add) — keeping them identical keeps the LeakyReLU masks'
    signs identical, which the backward's correctness tolerance relies on
    (a near-zero pre-activation whose sign flips between paths changes
    that element's gradient by 5×)."""
    Ci = h_in.shape[1]
    acc = jnp.zeros((h_in.shape[0], w2d.shape[1]), jnp.float32)
    for t in range(K):
        a = _shift_rows(h_in, pad - t, pos, L)
        acc = acc + jnp.dot(a, w2d[t * Ci:(t + 1) * Ci].astype(dtype),
                            preferred_element_type=jnp.float32)
    return _lrelu(acc.astype(dtype) + bias2d.astype(dtype))


def _conv_bwd(d_out, h_in, w2d, K: int, pad: int, pos, L, dtype):
    """(dW rows stacked per tap (K·Ci, Co) f32, d_in (N, Ci) in dtype —
    w.r.t. the post-activation input)."""
    Ci = h_in.shape[1]
    dws = []
    d_in = jnp.zeros((h_in.shape[0], Ci), jnp.float32)
    for t in range(K):
        a = _shift_rows(h_in, pad - t, pos, L)
        dws.append(jax.lax.dot_general(
            a, d_out, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dsh = _shift_rows(d_out, t - pad, pos, L)
        d_in = d_in + jnp.dot(dsh, w2d[t * Ci:(t + 1) * Ci].astype(dtype).T,
                              preferred_element_type=jnp.float32)
    return jnp.concatenate(dws, axis=0), d_in.astype(dtype)


def _lrelu(x):
    """layers.leaky_relu without a vector select: max(x, 0.2·x) ≡ lrelu for
    slope < 1. v5e Mosaic rejects bf16 vector cmpf and mixed-layout i1
    selects, so the arithmetic runs in f32 and rounds once (vs XLA's bf16
    slope product — a last-ulp difference covered by the bf16 noise-band
    test)."""
    xf = x.astype(jnp.float32)
    return jnp.maximum(xf, xf * 0.2).astype(x.dtype)


def _lrelu_mask(post_act):
    """d lrelu/dx recovered from the POST-activation sign (lrelu preserves
    sign; slope 1 at exactly 0). All-f32 — compare, branches, result — so
    the i1 select keeps one layout."""
    return jnp.where(post_act.astype(jnp.float32) < 0, 0.2, 1.0)


def _critic_kernel(h1_ref, w2_ref, w3_ref, m1_ref, m2_ref, m3_ref,
                   b2_ref, b3_ref, bm1_ref, bm2_ref, bm3_ref,
                   sum_ref, dh1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref,
                   dm1_ref, dbm1_ref, dm2_ref, dbm2_ref, dm3_ref, dbm3_ref,
                   *, batch_tile: int, seq_len: int, n_half: int, sub: int,
                   k2: int, p2: int, k3: int, p3: int, bins: int, dtype):
    import jax.experimental.pallas as pl

    L = seq_len
    TB = batch_tile
    N = TB * L
    chunk = L // bins
    f32 = jnp.float32

    i = pl.program_id(0)
    first = (i % sub) == 0
    sign = jnp.where(i < sub, -1.0, 1.0) / jnp.asarray(n_half, f32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) % L

    h1 = h1_ref[:]                                   # (N, C1) dtype
    w2 = w2_ref[0]                                   # (k2·C1, C2) f32
    w3 = w3_ref[0]
    m1 = m1_ref[0]
    m2 = m2_ref[0]
    m3 = m3_ref[0]

    # ---------------- forward ----------------
    h2 = _conv_fwd(h1, w2, b2_ref[:], k2, p2, pos, L, dtype)       # (N, C2)
    h3 = _conv_fwd(h2, w3, b3_ref[:], k3, p3, pos, L, dtype)       # (N, C3)
    C3 = h3.shape[1]

    # Adaptive-avg-pool + flatten + first MLP layer, WITHOUT materializing
    # the (TB, bins·C3) flat tensor: Mosaic cannot reshape sublanes into
    # lanes, so the flatten is decomposed into per-bin row-slices of M1
    # (whose rows were already permuted outside the kernel to the
    # position-major order): a1 = Σ_j pooled_j @ M1p[j·C3:(j+1)·C3].
    # Every reshape below touches only sublane dims; lanes stay C3.
    h3_3d = h3.reshape(TB, L, C3)
    pooled_js = [
        jnp.mean(h3_3d[:, j * chunk:(j + 1) * chunk, :].astype(f32), axis=1
                 ).astype(dtype)
        for j in range(bins)
    ]                                                              # bins × (TB, C3)

    # MLP: same rounding points as XLA's sn_dense (bf16 matmul rounded,
    # then bf16 bias add) so the activation masks match the XLA path.
    mm = lambda a, w: jnp.dot(a, w.astype(dtype),
                              preferred_element_type=f32).astype(dtype)
    a1_acc = jnp.zeros((TB, m1.shape[1]), f32)
    for j in range(bins):
        a1_acc = a1_acc + jnp.dot(
            pooled_js[j], m1[j * C3:(j + 1) * C3].astype(dtype),
            preferred_element_type=f32)
    a1 = _lrelu(a1_acc.astype(dtype) + bm1_ref[:].astype(dtype))  # (TB, H1)
    a2 = _lrelu(mm(a1, m2) + bm2_ref[:].astype(dtype))         # (TB, H2)
    s = (mm(a2, m3) + bm3_ref[:].astype(dtype)).astype(f32)        # (TB, 1)

    # ---------------- backward (cotangent = sign per score) ----------------
    ds = jnp.full((TB, 1), sign, f32)

    dm3 = jax.lax.dot_general(a2, ds.astype(dtype), (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)          # (H2, 1)
    dbm3 = jnp.sum(ds, axis=0, keepdims=True)                      # (1, 1)
    da2 = (jnp.dot(ds.astype(dtype), m3.astype(dtype).T,
                   preferred_element_type=f32) * _lrelu_mask(a2).astype(f32)
           ).astype(dtype)

    dm2 = jax.lax.dot_general(a1, da2, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dbm2 = jnp.sum(da2.astype(f32), axis=0, keepdims=True)
    da1 = (jnp.dot(da2, m2.astype(dtype).T, preferred_element_type=f32)
           * _lrelu_mask(a1).astype(f32)).astype(dtype)

    dm1 = jnp.concatenate([
        jax.lax.dot_general(pooled_js[j], da1, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
        for j in range(bins)
    ], axis=0)                                                     # (F, H1)
    dbm1 = jnp.sum(da1.astype(f32), axis=0, keepdims=True)

    dh3 = jnp.concatenate([
        jnp.broadcast_to(
            (jnp.dot(da1, m1[j * C3:(j + 1) * C3].astype(dtype).T,
                     preferred_element_type=f32) / chunk)[:, None, :],
            (TB, chunk, C3))
        for j in range(bins)
    ], axis=1).reshape(N, C3)                                      # (N, C3) f32
    dh3 = (dh3 * _lrelu_mask(h3).astype(f32)).astype(dtype)

    db3 = jnp.sum(dh3.astype(f32), axis=0, keepdims=True)
    dw3, dh2 = _conv_bwd(dh3, h2, w3, k3, p3, pos, L, dtype)
    dh2 = (dh2.astype(f32) * _lrelu_mask(h2)).astype(dtype)

    db2 = jnp.sum(dh2.astype(f32), axis=0, keepdims=True)
    dw2, dh1 = _conv_bwd(dh2, h1, w2, k2, p2, pos, L, dtype)

    dh1_ref[:] = dh1                                 # d(post-act conv1 out)

    def acc(ref, val, lead_idx=True):
        v = val[None] if lead_idx else val

        @pl.when(first)
        def _():
            ref[:] = v

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] = ref[:] + v

    # Score sums: one (2, 1) block revisited by every program (a (1, 1)
    # block would violate the (8, 128)-divisibility rule); accumulate into
    # the program's half via a one-hot row mask.
    half_onehot = (jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0)
                   == i // sub).astype(f32)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = jnp.zeros((2, 1), f32)

    sum_ref[:] = sum_ref[:] + half_onehot * jnp.sum(s)
    acc(dw2_ref, dw2)
    acc(db2_ref, db2)
    acc(dw3_ref, dw3)
    acc(db3_ref, db3)
    acc(dm1_ref, dm1)
    acc(dbm1_ref, dbm1)
    acc(dm2_ref, dm2)
    acc(dbm2_ref, dbm2)
    acc(dm3_ref, dm3)
    acc(dbm3_ref, dbm3)


@functools.partial(
    jax.jit,
    static_argnames=("n_half", "seq_len", "bins", "k2", "p2", "k3", "p3",
                     "dtype", "interpret"))
def _kernel_call(h1, w2, w3, m1, m2, m3, b2, b3, bm1, bm2, bm3,
                 *, n_half: int, seq_len: int, bins: int,
                 k2: int, p2: int, k3: int, p3: int, dtype, interpret: bool):
    """h1: (2·n_half·L, C1) both halves' conv1 activations; weights are
    (2, …) per-half spectral-normalized matrices; biases (1, O) shared.
    Returns (score sums (2,1) f32, dh1, per-half dW/db f32 tensors)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = seq_len
    C1 = h1.shape[1]
    C2, C3 = w2.shape[2], w3.shape[2]
    F, H1, H2 = m1.shape[1], m1.shape[2], m2.shape[2]

    # Batch tile: cap rows per program so in-kernel f32 temporaries plus
    # the double-buffered block windows stay under the 128 MB VMEM
    # (TB=256 measured 128.75M — 766K over); a half must split evenly.
    TB = n_half
    sub = 1
    while TB > 128 and TB % 2 == 0:
        TB //= 2
        sub *= 2
    N = TB * L

    half_ix = lambda i: (i // sub, 0, 0)
    shared_ix = lambda i: (0, 0)
    specs = dict(
        in_specs=[
            pl.BlockSpec((N, C1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2 * C1, C2), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k3 * C2, C3), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, H1), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1, H2), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2, 1), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2), shared_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C3), shared_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1), shared_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2), shared_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), shared_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2 * C1, C2), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C2), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k3 * C2, C3), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C3), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, H1), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H1), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H1, H2), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H2), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H2, 1), half_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), half_ix, memory_space=pltpu.VMEM),
        ],
    )
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((2, 1), f32),                 # per-half Σ scores
        jax.ShapeDtypeStruct(h1.shape, h1.dtype),          # dh1
        jax.ShapeDtypeStruct((2, k2 * C1, C2), f32),
        jax.ShapeDtypeStruct((2, 1, C2), f32),
        jax.ShapeDtypeStruct((2, k3 * C2, C3), f32),
        jax.ShapeDtypeStruct((2, 1, C3), f32),
        jax.ShapeDtypeStruct((2, F, H1), f32),
        jax.ShapeDtypeStruct((2, 1, H1), f32),
        jax.ShapeDtypeStruct((2, H1, H2), f32),
        jax.ShapeDtypeStruct((2, 1, H2), f32),
        jax.ShapeDtypeStruct((2, H2, 1), f32),
        jax.ShapeDtypeStruct((2, 1, 1), f32),
    ]
    kern = functools.partial(
        _critic_kernel, batch_tile=TB, seq_len=L, n_half=n_half, sub=sub,
        k2=k2, p2=p2, k3=k3, p3=p3, bins=bins, dtype=jnp.dtype(dtype))
    return pl.pallas_call(
        kern,
        grid=(2 * sub,),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
        **specs,
    )(h1, w2, w3, m1, m2, m3, b2, b3, bm1, bm2, bm3)


def _im2col(x: jnp.ndarray, K: int, pad: int) -> jnp.ndarray:
    """(M, L, C) → (M·L, K·C) patches, tap-major (matches the WIO conv
    weight's (kernel·in_ch, out_ch) flattening)."""
    M, L, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    cols = [xp[:, t:t + L, :] for t in range(K)]
    return jnp.concatenate(cols, axis=2).reshape(M * L, K * C)


def critic_temporal_loss_and_grads(
    params: Dict, state: Dict, real: jnp.ndarray, fake: jnp.ndarray,
    conv_spec: Tuple, bins: int, fused: bool, dtype,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Dict, Dict]:
    """WGAN critic loss + full weight-gradient pytree + new sn state for the
    temporal critic, with the hot path in the fused Pallas kernel.

    Semantics match ``jax.value_and_grad`` of the XLA
    ``disc_apply``-based loss to float tolerance, including the σ-gradient
    through spectral normalization (computed by ``jax.vjp`` over
    ``batched_spectral_normalize``) and the reference's power-iteration
    schedule: ``fused=False`` normalizes the two halves with successive u
    advances (torch advances u on every training forward), ``fused=True``
    scores both with one.
    """
    B, L, _ = real.shape
    conv_ps, mlp_ps = params["convs"], params["mlp"]
    n_conv = len(conv_ps)
    us = list(state["convs"]) + list(state["mlp"]) + [state["out"]]
    raw_ws = tuple([p["w"].reshape(-1, p["w"].shape[-1]) for p in conv_ps]
                   + [p["w"] for p in mlp_ps] + [params["out"]["w"]])

    def norm(ws):
        return batched_spectral_normalize(list(ws), us, True)

    (ws_a, us1), pb_a = jax.vjp(norm, raw_ws)
    zero_us = [jnp.zeros_like(u) for u in us1]
    if fused:
        ws_b, us_new = ws_a, us1

        def backprop(dws_a, dws_b):
            (d,) = pb_a(([a + b for a, b in zip(dws_a, dws_b)], zero_us))
            return d
    else:
        def norm2(ws):
            return batched_spectral_normalize(list(ws), us1, True)

        (ws_b, us_new), pb_b = jax.vjp(norm2, raw_ws)

        def backprop(dws_a, dws_b):
            (da,) = pb_a((list(dws_a), zero_us))
            (db,) = pb_b((list(dws_b), zero_us))
            return tuple(a + b for a, b in zip(da, db))

    # conv1 in XLA: one im2col matmul per half (K·C_in = 15 lanes).
    k1, p1 = conv_spec[0][2], conv_spec[0][3]
    patches = _im2col(jnp.concatenate([real, fake]), k1, p1).astype(dtype)
    NL = B * L
    b1 = conv_ps[0]["b"].astype(dtype)
    h1 = jnp.concatenate([
        leaky_relu(patches[:NL] @ ws_a[0].astype(dtype) + b1),
        leaky_relu(patches[NL:] @ ws_b[0].astype(dtype) + b1),
    ])

    # The reference flattens the pooled map channel-major (torch flattens
    # (B, C, bins) row-major); the kernel flattens position-major. The
    # difference is a static row permutation of M1, applied here so the
    # kernel needs no transpose: kernel row j·C3 + c ↔ reference row
    # c·bins + j.
    import numpy as _np

    C3 = conv_spec[2][1]
    F = bins * C3
    perm = _np.array([(r % C3) * bins + r // C3 for r in range(F)])
    inv_perm = _np.array([(o % bins) * C3 + o // bins for o in range(F)])

    stack = lambda idx: jnp.stack([ws_a[idx], ws_b[idx]])
    row2d = lambda v: v.reshape(1, -1)
    sums, dh1, dw2, db2, dw3, db3, dm1p, dbm1, dm2, dbm2, dm3, dbm3 = _kernel_call(
        h1, stack(1), stack(2),
        jnp.stack([ws_a[3][perm], ws_b[3][perm]]), stack(4), stack(5),
        row2d(conv_ps[1]["b"]), row2d(conv_ps[2]["b"]),
        row2d(mlp_ps[0]["b"]), row2d(mlp_ps[1]["b"]), row2d(params["out"]["b"]),
        n_half=B, seq_len=L, bins=bins,
        k2=conv_spec[1][2], p2=conv_spec[1][3],
        k3=conv_spec[2][2], p3=conv_spec[2][3],
        dtype=jnp.dtype(dtype), interpret=interpret)
    dm1 = dm1p[:, inv_perm, :]

    loss = (sums[1, 0] - sums[0, 0]) / B

    # dW1 from the kernel's d(post-act h1): mask conv1's LeakyReLU, then the
    # same im2col contraction per half.
    dh1 = dh1 * jnp.where(h1 < 0, jnp.asarray(0.2, dh1.dtype),
                          jnp.asarray(1.0, dh1.dtype))
    dot_rows = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw1_a = dot_rows(patches[:NL], dh1[:NL])
    dw1_b = dot_rows(patches[NL:], dh1[NL:])
    db1 = jnp.sum(dh1.astype(jnp.float32), axis=0)

    dws_a = (dw1_a, dw2[0], dw3[0], dm1[0], dm2[0], dm3[0])
    dws_b = (dw1_b, dw2[1], dw3[1], dm1[1], dm2[1], dm3[1])
    draw = backprop(dws_a, dws_b)

    def conv_grad(i):
        return {"w": draw[i].reshape(conv_ps[i]["w"].shape),
                "b": (db1 if i == 0 else (db2 if i == 1 else db3).sum(0)[0])}

    grads = {
        "convs": [conv_grad(i) for i in range(n_conv)],
        "mlp": [
            {"w": draw[n_conv], "b": dbm1.sum(0)[0]},
            {"w": draw[n_conv + 1], "b": dbm2.sum(0)[0]},
        ],
        "out": {"w": draw[n_conv + 2], "b": dbm3.sum(0)[0]},
    }
    new_state = {"convs": us_new[:n_conv], "mlp": us_new[n_conv:-1],
                 "out": us_new[-1]}
    return loss, grads, new_state


def fused_critic_available() -> bool:
    """OPT-IN (``WGG_ENABLE_PALLAS_CRITIC=1``) on a single TPU device.

    Unlike the fused generator kernels this one is not yet a production
    win: measured at B=512 bf16 on v5e it REGRESSES the train step 13.5 →
    22.2 ms (~0.85 ms per critic update vs XLA's ~0.5 in-step). The
    gradients are exactly right (tests/test_critic_fused.py) but the
    execution model loses: VMEM forces sub=4 batch tiles → 8 sequential
    grid programs per update, each paying ~50 narrow-lane (64/32-channel)
    VPU passes for the shift/mask temporaries, while XLA's conv lowering
    runs layout-optimized convs and pipelines the 10 independent critic
    updates against the generator kernels. Known headroom if revisited:
    output-side tap shifts (1 big dot instead of K small), packing the
    D1+D2 pair channel-wise to fill all 128 lanes, and VMEM-conscious
    buffer reuse to reach TB≥256."""
    import os

    try:
        from .tpu_platform import tpu_backend

        flag = os.environ.get("WGG_ENABLE_PALLAS_CRITIC", "").strip().lower()
        enabled = flag not in ("", "0", "false", "no", "off")
        return enabled and tpu_backend() and len(jax.devices()) == 1
    except Exception:  # pragma: no cover
        return False

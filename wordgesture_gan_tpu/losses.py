"""Loss functions — pure jnp functions (reference /root/reference/src/gan/losses.py
and src/contrastive/model.py:124-189)."""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp


# --- WGAN (reference losses.py:18-58) --------------------------------------


def wgan_critic_loss(real_scores: jnp.ndarray, fake_scores: jnp.ndarray) -> jnp.ndarray:
    """E[D(fake)] - E[D(real)] — minimized by the critic."""
    return fake_scores.mean() - real_scores.mean()


def wgan_generator_loss(fake_scores: jnp.ndarray) -> jnp.ndarray:
    """-E[D(fake)] — minimized by the generator."""
    return -fake_scores.mean()


# --- Pix2PixHD feature matching (reference losses.py:61-93) -----------------


def feature_matching_loss(real_features: List[jnp.ndarray], fake_features: List[jnp.ndarray]) -> jnp.ndarray:
    """Mean over layers of per-layer L1 between critic features, each layer
    additionally normalized by its per-sample element count. Real features
    are detached (stop_gradient) as in the reference."""
    total = 0.0
    for real, fake in zip(real_features, fake_features):
        per_sample_elems = real.size // real.shape[0]
        # Features may arrive bf16 under mixed precision; the L1 reduction
        # over ~1e5 elements must accumulate in fp32.
        diff = fake.astype(jnp.float32) - jax.lax.stop_gradient(real).astype(jnp.float32)
        l1 = jnp.abs(diff).mean()
        total = total + l1 / per_sample_elems
    return total / len(real_features)


# --- Reconstruction / latent / KLD (reference losses.py:96-175) -------------


def reconstruction_loss(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    """Mean L1 over (x, y, t)."""
    return jnp.abs(fake - real).mean()


def latent_encoding_loss(z_original: jnp.ndarray, z_recovered: jnp.ndarray) -> jnp.ndarray:
    """BicycleGAN latent recovery: mean L1 between drawn and re-encoded z."""
    return jnp.abs(z_recovered - z_original).mean()


def kl_divergence_loss(mu: jnp.ndarray, log_var: jnp.ndarray) -> jnp.ndarray:
    """-0.5 * sum(1 + log_var - mu^2 - exp(log_var)) averaged over the batch."""
    kld = -0.5 * jnp.sum(1 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=1)
    return kld.mean()


# --- Timing-dynamics auxiliaries (repo addition, no reference equivalent) ----
#
# The plain L1 reconstruction treats the time channel as 128 near-equal
# absolute values (mean increment 1/127), so the Δt *pattern* — the tempo
# warp that drives the reference's velocity/speed/time-delta correlation
# metrics (/root/reference/src/gan/evaluation.py:157-294) — contributes
# almost nothing to the loss. After arc-length-uniform resampling |Δxy| is
# ~constant per gesture, so those three metrics are dominated by the Δt
# pattern; these terms supervise it directly in cycle 2.


def time_delta_loss(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    """Mean L1 between per-segment time increments, scaled by (L-1) so a
    uniform-clock output against a strongly warped target costs O(1)."""
    L = real.shape[1]
    dtr = jnp.diff(real[:, :, 2], axis=1)
    dtf = jnp.diff(fake[:, :, 2], axis=1)
    return ((L - 1) * jnp.abs(dtf - dtr)).mean()


def speed_profile_loss(real: jnp.ndarray, fake: jnp.ndarray,
                       eps: float = 1e-4) -> jnp.ndarray:
    """1 − mean per-pair Pearson correlation of the |v| profiles — the
    differentiable twin of ops/stats.speed_profile_correlation (without the
    metric's percentile clip, which is not usefully differentiable). ``eps``
    floors Δt so pause segments don't explode the gradient."""

    def speeds(g: jnp.ndarray) -> jnp.ndarray:
        d = jnp.diff(g[:, :, :2], axis=1)
        seg = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        dt = jnp.maximum(jnp.diff(g[:, :, 2], axis=1), eps)
        return seg / dt

    sr, sf = speeds(real), speeds(fake)
    srm = sr - sr.mean(axis=1, keepdims=True)
    sfm = sf - sf.mean(axis=1, keepdims=True)
    num = (srm * sfm).sum(axis=1)
    den = jnp.sqrt((srm * srm).sum(axis=1) * (sfm * sfm).sum(axis=1) + 1e-8)
    return (1.0 - num / den).mean()


def time_delta_corr_loss(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    """1 − mean per-pair Pearson correlation of the Δt patterns — the
    differentiable twin of ops/stats.time_delta_correlation (which is
    unclipped, so this IS the metric up to the validity filter). The L1
    twin (time_delta_loss) supervises the Δt *magnitudes*; this one
    supervises the Δt *shape*, which is what the eval metric measures —
    a generator can match every increment to 1e-3 absolute and still
    correlate at 0 if the residual pattern is flat."""
    dtr = jnp.diff(real[:, :, 2], axis=1)
    dtf = jnp.diff(fake[:, :, 2], axis=1)
    rm = dtr - dtr.mean(axis=1, keepdims=True)
    fm = dtf - dtf.mean(axis=1, keepdims=True)
    num = (rm * fm).sum(axis=1)
    den = jnp.sqrt((rm * rm).sum(axis=1) * (fm * fm).sum(axis=1) + 1e-12)
    return (1.0 - num / den).mean()


def mode_seeking_loss(fake_a: jnp.ndarray, fake_b: jnp.ndarray,
                      z_a: jnp.ndarray, z_b: jnp.ndarray,
                      eps: float = 1e-5) -> jnp.ndarray:
    """MSGAN mode-seeking regularizer (Mao et al., CVPR 2019): minimize
    d(z_a, z_b) / d(G(z_a), G(z_b)) per sample, i.e. demand that distinct
    latents produce proportionally distinct gestures. Directly attacks the
    precision-high/recall-low mode-coverage failure: a generator that maps
    a wide z-ball onto a narrow output manifold pays O(1/eps) here. The
    latent distances are stop-gradient'd so the pressure lands on the
    generator's output diversity, not on shrinking the latent geometry."""
    d_fake = jnp.abs(fake_a - fake_b).mean(axis=(1, 2))
    d_z = jax.lax.stop_gradient(jnp.abs(z_a - z_b).mean(axis=1))
    return (d_z / (d_fake + eps)).mean()


# Masked twins for the variable-length path (train/masked_step.py): same
# semantics restricted to segments whose BOTH endpoints are valid. A
# "segment" i is (point i, point i+1), so the segment weight is
# mask[:, 1:] * mask[:, :-1]; padded positions contribute exactly zero to
# every sum, keeping the fixed-length and masked losses numerically equal
# on an all-valid batch.


def _segment_weights(mask: jnp.ndarray) -> jnp.ndarray:
    return mask[:, 1:] * mask[:, :-1]


def _masked_pearson(a: jnp.ndarray, b: jnp.ndarray, w: jnp.ndarray,
                    eps: float) -> jnp.ndarray:
    """Per-row Pearson correlation over weighted (0/1) segments."""
    n = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
    am = (a - (a * w).sum(axis=1, keepdims=True) / n) * w
    bm = (b - (b * w).sum(axis=1, keepdims=True) / n) * w
    num = (am * bm).sum(axis=1)
    den = jnp.sqrt((am * am).sum(axis=1) * (bm * bm).sum(axis=1) + eps)
    return num / den


def masked_time_delta_loss(real: jnp.ndarray, fake: jnp.ndarray,
                           mask: jnp.ndarray) -> jnp.ndarray:
    """time_delta_loss over valid segments. The fixed version's (L-1)·mean
    equals the per-row SUM of |Δt_fake − Δt_real|; the masked version keeps
    that sum semantics, so both cost O(1) for a real warp mismatch."""
    w = _segment_weights(mask)
    d = jnp.abs(jnp.diff(fake[:, :, 2], axis=1) - jnp.diff(real[:, :, 2], axis=1))
    return (w * d).sum(axis=1).mean()


def masked_speed_profile_loss(real: jnp.ndarray, fake: jnp.ndarray,
                              mask: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """speed_profile_loss over valid segments (1 − masked Pearson of |v|)."""

    def speeds(g: jnp.ndarray) -> jnp.ndarray:
        d = jnp.diff(g[:, :, :2], axis=1)
        seg = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        dt = jnp.maximum(jnp.diff(g[:, :, 2], axis=1), eps)
        return seg / dt

    w = _segment_weights(mask)
    corr = _masked_pearson(speeds(real), speeds(fake), w, 1e-8)
    return (1.0 - corr).mean()


def masked_time_delta_corr_loss(real: jnp.ndarray, fake: jnp.ndarray,
                                mask: jnp.ndarray) -> jnp.ndarray:
    """time_delta_corr_loss over valid segments (1 − masked Pearson of Δt)."""
    w = _segment_weights(mask)
    dtr = jnp.diff(real[:, :, 2], axis=1)
    dtf = jnp.diff(fake[:, :, 2], axis=1)
    return (1.0 - _masked_pearson(dtr, dtf, w, 1e-12)).mean()


def diversity_hinge_loss(fake_a: jnp.ndarray, fake_b: jnp.ndarray,
                         margin: float) -> jnp.ndarray:
    """Hinged conditional-diversity loss: penalize a pair of generations
    from two independent prior draws only while their mean-L1 distance is
    BELOW ``margin``, scale-free in the margin.

    This is the bounded replacement for ``mode_seeking_loss``: the MSGAN
    ratio d(z)/d(G(z)) keeps paying the generator for unbounded output
    spread, which measured as precision 0.981→0.172 at λ_ms=1 on this
    model (runs/r5_eval_ms1.log). The hinge instead demands the generator's
    within-word spread reach the corpus's measured within-word spread
    (``data.pipeline.within_word_diversity``) and then SHUTS OFF — no
    incentive to scribble past the real data's own conditional diversity.
    """
    d = jnp.abs(fake_a - fake_b).mean(axis=(1, 2))
    return (jax.nn.relu(margin - d) / margin).mean()


# --- Supervised contrastive (reference src/contrastive/model.py:124-189) ----


def supervised_contrastive_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """SupCon (Khosla et al. 2020) over L2-normalized embeddings.

    Same-label pairs (minus self) are positives; the log-softmax denominator
    excludes self; rows without positives contribute 0 through the
    clamp-to-1 divisor, matching the reference."""
    B = embeddings.shape[0]
    sim = embeddings @ embeddings.T / temperature
    same = (labels[:, None] == labels[None, :]).astype(sim.dtype)
    eye = jnp.eye(B, dtype=sim.dtype)
    pos_mask = same - eye

    logits = sim - jax.lax.stop_gradient(sim.max(axis=1, keepdims=True))
    exp_logits = jnp.exp(logits) * (1.0 - eye)
    log_prob = logits - jnp.log(exp_logits.sum(axis=1, keepdims=True) + 1e-8)

    pos_count = jnp.clip(pos_mask.sum(axis=1), min=1.0)
    mean_log_prob = (pos_mask * log_prob).sum(axis=1) / pos_count
    return -mean_log_prob.mean()

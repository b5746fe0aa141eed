"""FID feature-space tests (VERDICT round-2 weak #1).

Root cause of the observed "FID 0.0000 while L2/DTW differ": the
paper/reference FID autoencoder's decoder broadcasts the latent to every
timestep with no positional signal (reference models.py:426-445), so it can
only emit a CONSTANT trace. Its reconstruction L1 is therefore bounded below
by the per-gesture mean absolute deviation (~0.25 on synthetic data), and
the encoder is only trained to embed each gesture's central point — FID in
that feature space is near-blind to shape and timing.

The framework's ``fid_feature_mode="positional"`` (configs.py) feeds the
decoder a time ramp; same encoder topology and feature dimension, but the
encoder must now embed actual gesture shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cross_impl_utils import make_gesture_arrays
from wordgesture_gan_tpu.configs import EvaluationConfig, ModelConfig
from wordgesture_gan_tpu.metrics.fid import (
    encode_features,
    fid_from_features,
    train_fid_autoencoder,
)
from wordgesture_gan_tpu.models.gan import autoencoder_decode, autoencoder_init

L = 32
MC = ModelConfig(seq_length=L)


def _floor(data):
    return float(np.abs(data - np.median(data, axis=1, keepdims=True)).mean())


def test_paper_decoder_emits_constant_trace():
    """Architectural property: the paper decoder's output is identical at
    every timestep (no positional input) — the documented reconstruction
    floor follows directly."""
    params = autoencoder_init(jax.random.PRNGKey(0), MC, 32, positional=False)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    out = np.asarray(autoencoder_decode(params, z, L))
    np.testing.assert_allclose(out, np.broadcast_to(out[:, :1, :], out.shape), atol=0)


def test_positional_decoder_varies_over_time():
    params = autoencoder_init(jax.random.PRNGKey(0), MC, 32, positional=True)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    out = np.asarray(autoencoder_decode(params, z, L))
    assert np.abs(out - out[:, :1, :]).max() > 1e-3


@pytest.fixture(scope="module")
def trained_aes():
    real, _, train = make_gesture_arrays(1024, L, seed=3)
    cfg_paper = EvaluationConfig(fid_autoencoder_epochs=150, fid_feature_mode="paper")
    cfg_pos = EvaluationConfig(fid_autoencoder_epochs=150, fid_feature_mode="positional")
    p_paper, l_paper = train_fid_autoencoder(train, MC, cfg_paper, verbose=False)
    p_pos, l_pos = train_fid_autoencoder(train, MC, cfg_pos, verbose=False)
    return real, train, (p_paper, l_paper), (p_pos, l_pos)


def test_paper_mode_hits_constant_floor(trained_aes):
    """The paper AE converges TO the constant-trace floor — it is not
    underfit, it is architecturally capped (torch reference measured at the
    same 0.25 plateau on identical data)."""
    _, train, (_, l_paper), _ = trained_aes
    floor = _floor(train)
    assert l_paper >= floor - 0.03
    assert l_paper <= floor + 0.1


def test_positional_mode_beats_floor(trained_aes):
    """The positional AE reconstructs sequences: final L1 well under the
    constant floor."""
    _, train, (_, l_paper), (_, l_pos) = trained_aes
    assert l_pos < 0.75 * _floor(train)
    assert l_pos < l_paper


def test_positional_fid_detects_shape_change(trained_aes):
    """Degeneracy regression for the round-2 "FID 0.0000 while L2/DTW
    differ" failure. The fake set scales every gesture about its per-channel
    median (×1.3): medians are untouched — exactly the statistic the paper
    feature space is trained on — while the spatial spread distribution
    shifts. The positional feature space must light up strongly relative to
    its same-distribution baseline."""
    real, _, _, (p_pos, _) = trained_aes

    fake = real.copy()
    med = np.median(fake, axis=1, keepdims=True)
    fake[:, :, :2] = np.clip(med[:, :, :2] + 1.3 * (fake[:, :, :2] - med[:, :, :2]), -1, 1)

    half = len(real) // 2

    def ratio(params):
        f_a = encode_features(params, real[:half])
        f_b = encode_features(params, real[half:])
        f_fake = encode_features(params, fake[:half])
        baseline = fid_from_features(f_a, f_b)     # same distribution
        detected = fid_from_features(f_a, f_fake)  # spread-shifted
        return detected / max(baseline, 1e-9), baseline, detected

    r_pos, b_pos, d_pos = ratio(p_pos)
    assert r_pos > 5.0, (b_pos, d_pos)

"""Variable-length trace support (BASELINE config 5): data, masks, masked
train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
from wordgesture_gan_tpu.data.parse import RawGesture
from wordgesture_gan_tpu.data.variable_length import (
    length_mask,
    normalize_gesture_variable,
)
from wordgesture_gan_tpu.train.masked_step import (
    gan_train_step_masked,
    masked_reconstruction_loss,
)
from wordgesture_gan_tpu.train.state import init_gan_state


def _raw(n_pts, scale=1.0):
    rng = np.random.default_rng(n_pts)
    xs = np.cumsum(rng.uniform(5, 20, n_pts)) * scale + 100
    ys = 150 + 30 * np.sin(np.linspace(0, 3, n_pts))
    ts = np.cumsum(rng.integers(5, 30, n_pts)).astype(float)
    return RawGesture(np.column_stack([xs, ys, ts]), 1080.0, 360.0)


def test_variable_resampling_scales_with_length():
    short, n_short = normalize_gesture_variable(_raw(10, scale=0.2), max_len=128)
    long, n_long = normalize_gesture_variable(_raw(200, scale=3.0), max_len=128)
    assert short.shape == long.shape == (128, 3)
    assert n_short < n_long <= 128
    # padding repeats the last valid point
    np.testing.assert_array_equal(short[n_short:], np.tile(short[n_short - 1], (128 - n_short, 1)))
    # valid region is a sane trace
    assert np.isfinite(short).all()
    assert short[:n_short, 2].min() >= 0 and short[:n_short, 2].max() <= 1


def test_length_mask():
    m = length_mask(np.array([2, 4]), 5)
    np.testing.assert_array_equal(m, [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])


def test_masked_reconstruction_ignores_padding():
    real = jnp.ones((2, 8, 3))
    fake = jnp.zeros((2, 8, 3))
    mask = jnp.asarray(length_mask(np.array([4, 8]), 8))
    loss = float(masked_reconstruction_loss(real, fake, mask))
    assert loss == pytest.approx(1.0)
    # corrupting only padded rows changes nothing
    fake2 = fake.at[0, 6:].set(99.0)
    assert float(masked_reconstruction_loss(real, fake2, mask)) == pytest.approx(1.0)


def test_masked_train_step_runs_and_updates():
    mcfg = ModelConfig(seq_length=32, latent_dim=8, enc_hidden_dims=(24, 16),
                       disc_hidden_dims=(24, 16), generator_type="transformer",
                       tfm_d_model=16, tfm_num_heads=2, tfm_num_layers=2)
    tcfg = TrainingConfig(batch_size=4, n_critic=1)
    state = init_gan_state(0, mcfg, tcfg)

    rng = np.random.default_rng(0)
    B, L = 4, 32
    lengths = np.array([12, 20, 32, 7])
    batch = {
        "gesture": jnp.asarray(rng.uniform(-1, 1, (B, L, 3)), jnp.float32),
        "prototype": jnp.asarray(rng.uniform(-1, 1, (B, L, 3)), jnp.float32),
        "mask": jnp.asarray(length_mask(lengths, L)),
    }
    step = jax.jit(lambda s, b, lr: gan_train_step_masked(s, b, lr, mcfg, tcfg))
    new_state, metrics = step(state, batch, jnp.float32(2e-4))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    changed = sum(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state["g"]["params"]),
                        jax.tree.leaves(new_state["g"]["params"]))
    )
    assert changed > 0


def test_masked_step_rejects_non_transformer():
    mcfg = ModelConfig(seq_length=32, latent_dim=8, enc_hidden_dims=(24, 16),
                       disc_hidden_dims=(24, 16), generator_type="bilstm")
    tcfg = TrainingConfig(batch_size=2, n_critic=1)
    state = init_gan_state(0, mcfg, tcfg)
    batch = {
        "gesture": jnp.zeros((2, 32, 3)),
        "prototype": jnp.zeros((2, 32, 3)),
        "mask": jnp.ones((2, 32)),
    }
    with pytest.raises(AssertionError):
        gan_train_step_masked(state, batch, jnp.float32(1e-4), mcfg, tcfg)


def test_variable_dataset_end_to_end(synthetic_zip):
    """zip → variable-length loader → split → one masked training epoch:
    lengths vary, prototypes are token-aligned, losses finite, params move."""
    import jax
    import jax.numpy as jnp

    from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
    from wordgesture_gan_tpu.data.variable_length import (
        create_variable_split,
        load_variable_dataset_from_zip,
    )
    from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
    from wordgesture_gan_tpu.train.masked_step import (
        gan_train_epoch_masked,
        make_epoch_batches_masked,
    )
    from wordgesture_gan_tpu.train.state import init_gan_state

    kb = QWERTYKeyboard()
    mcfg = ModelConfig(seq_length=64, generator_type="transformer",
                       tfm_d_model=16, tfm_num_heads=2, tfm_num_layers=2,
                       latent_dim=8, enc_hidden_dims=(24, 16), disc_hidden_dims=(24, 16))
    tcfg = TrainingConfig(batch_size=8, n_critic=2)

    by_word, _ = load_variable_dataset_from_zip(
        synthetic_zip, kb, max_len=mcfg.seq_length, verbose=False)
    assert by_word
    train_ds, test_ds = create_variable_split(by_word, kb, max_len=mcfg.seq_length,
                                              verbose=False)
    assert len(train_ds) > 8
    assert train_ds.gestures.shape[1:] == (mcfg.seq_length, 3)
    assert train_ds.lengths.min() >= 8
    assert len(np.unique(train_ds.lengths)) > 1, "lengths should vary"

    # Prototype padding repeats the last valid token.
    i = int(np.argmin(train_ds.lengths))
    n = int(train_ds.lengths[i])
    if n < mcfg.seq_length:
        np.testing.assert_array_equal(train_ds.prototypes[i, n:],
                                      np.broadcast_to(train_ds.prototypes[i, n - 1],
                                                      (mcfg.seq_length - n, 3)))

    state = init_gan_state(0, mcfg, tcfg)
    batches = make_epoch_batches_masked(
        jax.random.PRNGKey(0),
        jnp.asarray(train_ds.gestures), jnp.asarray(train_ds.prototypes),
        jnp.asarray(train_ds.masks()), tcfg.batch_size)
    epoch = jax.jit(lambda s, eb, lr: gan_train_epoch_masked(s, eb, lr, mcfg, tcfg))
    new_state, traces = epoch(state, batches, jnp.float32(2e-4))
    assert np.isfinite(np.asarray(traces["cycle2_rec"])).all()
    changed = sum(not np.allclose(a, b) for a, b in
                  zip(jax.tree.leaves(state["g"]["params"]),
                      jax.tree.leaves(new_state["g"]["params"])))
    assert changed > 0


def test_generate_variable_gestures_respects_mask():
    import jax
    import numpy as np

    from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
    from wordgesture_gan_tpu.train.state import init_gan_state
    from wordgesture_gan_tpu.train.variable_loop import generate_variable_gestures

    mcfg = ModelConfig(seq_length=32, generator_type="transformer",
                       tfm_d_model=16, tfm_num_heads=2, tfm_num_layers=2,
                       latent_dim=8, enc_hidden_dims=(24, 16), disc_hidden_dims=(24, 16))
    state = init_gan_state(0, mcfg, TrainingConfig(batch_size=4, n_critic=1))

    rng = np.random.default_rng(0)
    n = 10
    protos = rng.uniform(-1, 1, (n, 32, 3)).astype(np.float32)
    lengths = rng.integers(8, 33, n)
    masks = (np.arange(32)[None, :] < lengths[:, None]).astype(np.float32)

    out = generate_variable_gestures(state, protos, masks, mcfg, seed=1)
    assert out.shape == (n, 32, 3)
    assert np.isfinite(out).all()
    # Padding positions are zeroed; valid positions are generally not.
    for i in range(n):
        assert np.all(out[i, lengths[i]:] == 0.0)
    assert np.any(out[:, :8] != 0.0)

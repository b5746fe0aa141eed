"""Contrastive workload tests: SupCon loss, sampler, training loop, eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from wordgesture_gan_tpu.configs import ContrastiveConfig
from wordgesture_gan_tpu.data.contrastive import (
    ContrastiveArrays,
    augment_with_minimum_jerk,
    create_contrastive_datasets,
    sample_epoch_batches,
)
from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
from wordgesture_gan_tpu.losses import supervised_contrastive_loss


@pytest.fixture(scope="module")
def toy_gestures_by_word():
    """Separable synthetic gestures: per-word min-jerk + small noise."""
    kb = QWERTYKeyboard()
    rng = np.random.default_rng(0)
    words = ["hello", "world", "water", "thing", "sound", "point", "house",
             "light", "mother", "earth", "round", "paper"]
    out = {}
    for w in words:
        base = kb.get_minimum_jerk_trajectory(w, 128)
        out[w] = [
            (base + rng.normal(0, 0.01, base.shape)).astype(np.float32) for _ in range(4)
        ]
    return out


def test_supcon_loss_reference_semantics():
    """Same-label clusters tight on the sphere → low loss; shuffled labels →
    higher loss. Cross-check against a direct per-row computation."""
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(8, 16))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])

    loss = float(supervised_contrastive_loss(jnp.asarray(emb), jnp.asarray(labels), 0.07))

    # direct reference computation (mirrors src/contrastive/model.py:140-189)
    sim = emb @ emb.T / 0.07
    mask = (labels[:, None] == labels[None, :]).astype(float) - np.eye(8)
    logits = sim - sim.max(axis=1, keepdims=True)
    exp_l = np.exp(logits) * (1 - np.eye(8))
    log_prob = logits - np.log(exp_l.sum(axis=1, keepdims=True) + 1e-8)
    mean_lp = (mask * log_prob).sum(axis=1) / np.clip(mask.sum(axis=1), 1, None)
    ref = -mean_lp.mean()
    assert loss == pytest.approx(ref, rel=1e-5)


def test_supcon_clustered_lower_than_random():
    key = jax.random.PRNGKey(0)
    labels = jnp.repeat(jnp.arange(8), 4)
    centers = jax.random.normal(key, (8, 32))
    centers /= jnp.linalg.norm(centers, axis=1, keepdims=True)
    tight = jnp.repeat(centers, 4, axis=0)
    rand = jax.random.normal(jax.random.PRNGKey(1), (32, 32))
    rand /= jnp.linalg.norm(rand, axis=1, keepdims=True)
    assert float(supervised_contrastive_loss(tight, labels)) < float(
        supervised_contrastive_loss(rand, labels)
    )


def test_contrastive_arrays_filters_small_words(toy_gestures_by_word):
    data = dict(toy_gestures_by_word)
    data["xx"] = [np.zeros((128, 3), np.float32)]   # only 1 gesture → dropped
    arrays = ContrastiveArrays.from_gestures_by_word(data, min_gestures_per_word=2,
                                                     verbose=False)
    assert "xx" not in arrays.unique_words
    assert len(arrays) == sum(len(v) for v in toy_gestures_by_word.values())
    # labels consistent with words
    for idx in range(len(arrays)):
        assert arrays.labels[idx] == arrays.unique_words.index(arrays.words[idx])


def test_sampler_batch_structure(toy_gestures_by_word):
    import random
    arrays = ContrastiveArrays.from_gestures_by_word(toy_gestures_by_word, verbose=False)
    batches = sample_epoch_batches(arrays, batch_words=4, gestures_per_word=2,
                                   rng=random.Random(0))
    assert batches.shape == (3, 8)       # 12 words // 4
    for row in batches:
        labels = arrays.labels[row]
        # exactly 4 words, each twice → guaranteed positive pairs
        vals, counts = np.unique(labels, return_counts=True)
        assert len(vals) == 4
        assert (counts == 2).all()
        # no duplicate gesture indices within a batch
        assert len(set(row.tolist())) == len(row)


def test_sampler_raises_when_too_few_words(toy_gestures_by_word):
    arrays = ContrastiveArrays.from_gestures_by_word(toy_gestures_by_word, verbose=False)
    with pytest.raises(ValueError):
        sample_epoch_batches(arrays, batch_words=100, gestures_per_word=2)


def test_split_and_augmentation(toy_gestures_by_word):
    kb = QWERTYKeyboard()
    train, test = create_contrastive_datasets(
        toy_gestures_by_word, train_ratio=0.75, seed=3,
        augment_min_jerk=True, keyboard=kb, min_jerk_augmentations=2,
        verbose=False,
    )
    assert set(train.unique_words).isdisjoint(test.unique_words)
    # each train word gained 2 synthetic positives: 4 real + 2 aug
    for w in train.unique_words:
        assert len(train.word_to_indices[w]) == 6
    for w in test.unique_words:
        assert len(test.word_to_indices[w]) == 4


def test_training_learns_separable_data(toy_gestures_by_word):
    from wordgesture_gan_tpu.train.contrastive_loop import (
        centroid_recall,
        embed_gestures,
        train_contrastive,
    )

    cfg = ContrastiveConfig(batch_words=4, gestures_per_word=2, num_epochs=8,
                            learning_rate=2e-3)
    train, test = create_contrastive_datasets(toy_gestures_by_word, 0.75, seed=3,
                                              verbose=False)
    state, history = train_contrastive(train, test, cfg, num_epochs=8, seed=0,
                                       checkpoint_dir=None, eval_every=100,
                                       verbose=False)
    assert history["train_loss"][-1] < history["train_loss"][0]

    emb = embed_gestures(state, test.gestures, cfg)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)
    metrics = centroid_recall(emb, test.words)
    assert metrics["recall@1"] >= 0.5     # separable toy data


def test_evaluate_recall_and_map():
    from wordgesture_gan_tpu.eval.contrastive_eval import evaluate_recall

    # two perfect clusters → everything 1.0
    emb = np.array([[1, 0], [1, 0], [0, 1], [0, 1]], dtype=np.float32)
    labels = np.array([0, 0, 1, 1])
    res = evaluate_recall(emb, labels, k_values=(1, 3))
    assert res["recall@1"] == 1.0
    assert res["mAP"] == pytest.approx(1.0)

    # adversarial: nearest neighbor is the wrong class
    emb2 = np.array([[1, 0], [0.9, 0.1], [0.8, 0.2], [0, 1]], dtype=np.float32)
    emb2 /= np.linalg.norm(emb2, axis=1, keepdims=True)
    labels2 = np.array([0, 1, 0, 1])
    res2 = evaluate_recall(emb2, labels2, k_values=(1,))
    assert res2["recall@1"] < 1.0


@pytest.mark.multichip
def test_sharded_contrastive_epoch_matches_single_device():
    """The data-parallel contrastive epoch (batch-index axis sharded over an
    8-device mesh, store/state replicated) must reproduce the single-device
    epoch: SupCon's similarity matrix and BatchNorm's batch moments are
    global reductions XLA implements with collectives under jit."""
    from wordgesture_gan_tpu.parallel import batch_sharding, create_mesh, replicate
    from wordgesture_gan_tpu.train.contrastive_loop import (
        contrastive_train_epoch,
        init_contrastive_state,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(8)

    cfg = ContrastiveConfig(batch_words=8, gestures_per_word=2)
    state = init_contrastive_state(0, cfg)
    rng = np.random.default_rng(3)
    n = 64
    gestures = jnp.asarray(rng.normal(size=(n, cfg.seq_length, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, n), jnp.int32)
    batch_idx = jnp.asarray(rng.integers(0, n, (3, 16)), jnp.int32)

    epoch = jax.jit(lambda s, bi, g, l: contrastive_train_epoch(
        s, g, l, bi, (1e-3, 1e-5, 30), cfg))
    ref_state, ref_losses = epoch(state, batch_idx, gestures, labels)

    sh_state, sh_losses = epoch(
        replicate(mesh, state),
        jax.device_put(batch_idx, batch_sharding(mesh, batch_axis=1)),
        replicate(mesh, gestures),
        replicate(mesh, labels),
    )

    np.testing.assert_allclose(np.asarray(ref_losses), np.asarray(sh_losses), atol=1e-5)
    # Cross-device reductions reorder float sums; Adam's rsqrt amplifies the
    # last-ulp differences (same tolerance as the GAN sharded-step test).
    for a, b in zip(jax.tree.leaves(ref_state), jax.tree.leaves(sh_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

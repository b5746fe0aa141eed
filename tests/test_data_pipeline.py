"""End-to-end data pipeline tests on the synthetic swipelogs zip."""

import numpy as np
import pytest

from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
from wordgesture_gan_tpu.data import (
    create_train_test_split,
    load_dataset_from_zip,
)
from wordgesture_gan_tpu.keyboard import QWERTYKeyboard


@pytest.fixture(scope="module")
def loaded(synthetic_zip):
    kb = QWERTYKeyboard()
    gestures, protos = load_dataset_from_zip(
        synthetic_zip, kb, ModelConfig(), TrainingConfig(), use_cache=False, verbose=False
    )
    return gestures, protos


def test_load_dataset_shapes(loaded):
    gestures, protos = loaded
    assert len(gestures) > 10
    assert set(gestures) == set(protos)
    for word, gs in gestures.items():
        assert len(gs) <= TrainingConfig().max_samples_per_word
        for g in gs:
            assert g.shape == (128, 3)
            # clip against float64 bounds promotes (same as reference
            # data.py:413); split arrays cast back to float32
            # canonical clip range
            assert g[:, 0].min() >= -1 and g[:, 0].max() <= 1
            assert g[:, 1].min() >= -1 and g[:, 1].max() <= 1
            assert g[:, 2].min() >= 0 and g[:, 2].max() <= 1
        assert protos[word].shape == (128, 3)


def test_canonical_alignment_recovers_keys(loaded):
    """Synthetic traces are min-jerk paths through key centers rendered in
    pixels; after canonical alignment, gesture start points should land near
    the first letter's key center."""
    gestures, _ = loaded
    kb = QWERTYKeyboard()
    errs = []
    for word, gs in gestures.items():
        c = kb.get_key_center(word[0])
        if c is None:
            continue
        for g in gs:
            errs.append(np.linalg.norm(g[0, :2] - np.array(c)))
    assert np.median(errs) < 0.15


def test_cache_roundtrip(synthetic_zip, tmp_path):
    import shutil
    zip_copy = tmp_path / "swipelogs.zip"
    shutil.copy(synthetic_zip, zip_copy)
    kb = QWERTYKeyboard()
    g1, p1 = load_dataset_from_zip(str(zip_copy), kb, use_cache=True, verbose=False)
    caches = list(tmp_path.glob(".cache_*"))
    assert len(caches) == 1
    g2, p2 = load_dataset_from_zip(str(zip_copy), kb, use_cache=True, verbose=False)
    assert set(g1) == set(g2)
    for w in g1:
        assert len(g1[w]) == len(g2[w])
        np.testing.assert_array_equal(g1[w][0], g2[w][0])
        np.testing.assert_array_equal(p1[w], p2[w])


def test_split_no_word_overlap(loaded):
    gestures, protos = loaded
    train, test = create_train_test_split(gestures, protos, 0.8, seed=42, verbose=False)
    assert set(train.words).isdisjoint(set(test.words))
    assert len(train) + len(test) == sum(len(v) for v in gestures.values())
    assert train.gestures.shape[1:] == (128, 3)
    assert train.prototypes.shape == train.gestures.shape
    # deterministic given the seed
    train2, test2 = create_train_test_split(gestures, protos, 0.8, seed=42, verbose=False)
    assert train.words == train2.words
    np.testing.assert_array_equal(train.gestures, train2.gestures)
    # item API parity
    item = train[0]
    assert set(item) == {"gesture", "prototype", "word"}


def test_split_matches_reference_partition(loaded):
    """The word-level partition uses the same seeded stdlib shuffle as the
    reference (data.py:464-473), so given identical inputs the train/test
    word sets must match the reference's split exactly."""
    import sys
    from pathlib import Path
    if not Path("/root/reference").exists():
        pytest.skip("reference not available")
    sys.path.insert(0, "/root/reference")
    try:
        from src.shared.data import create_train_test_split as ref_split
        gestures, protos = loaded
        ours_train, ours_test = create_train_test_split(gestures, protos, 0.8, seed=42, verbose=False)
        ref_train, ref_test = ref_split(gestures, protos, 0.8, seed=42)
        assert set(ours_train.words) == set(ref_train.words)
        assert set(ours_test.words) == set(ref_test.words)
    finally:
        sys.path.remove("/root/reference")


def test_array_loader_parity(loaded):
    from wordgesture_gan_tpu.data import create_data_loaders
    gestures, protos = loaded
    from wordgesture_gan_tpu.data import create_train_test_split
    train, test = create_train_test_split(gestures, protos, 0.8, seed=42, verbose=False)
    train_loader, test_loader = create_data_loaders(train, test, batch_size=32)
    n_seen = 0
    for batch in train_loader:
        assert batch["gesture"].shape == (32, 128, 3)   # drop_last
        assert len(batch["word"]) == 32
        n_seen += 32
    assert n_seen == (len(train) // 32) * 32
    # test loader keeps the tail batch and original order
    batches = list(test_loader)
    total = sum(len(b["word"]) for b in batches)
    assert total == len(test)
    np.testing.assert_array_equal(batches[0]["gesture"][0], test.gestures[0])


def test_malformed_file_is_skipped_not_poisoning(tmp_path):
    """A log file with keyb_width=0 produces non-finite coordinates; the
    per-file guard must skip that file (reference data.py:379-399) instead of
    poisoning the whole dataset with NaNs."""
    import zipfile
    from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
    from wordgesture_gan_tpu.data import load_dataset_from_zip
    from wordgesture_gan_tpu.data.synthetic import generate_log_content, load_word_list

    kb = QWERTYKeyboard()
    # Enough good data that key-position inference (>=10 samples/letter)
    # succeeds without the bad file.
    good = generate_log_content(kb, load_word_list(None, 50), np.random.default_rng(0),
                                n_sentences=60, words_per_sentence=5)
    bad = "\n".join([
        "header",
        "s0 1000 0 360 touchstart 10.0 20.0 1 1 0 hello 0",   # keyb_width=0
        "s0 1010 0 360 touchmove 11.0 21.0 1 1 0 hello 0",
        "s0 1020 0 360 touchend 12.0 22.0 1 1 0 hello 0",
    ])
    zpath = tmp_path / "mixed.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("good.log", good)
        zf.writestr("bad.log", bad)

    gestures, _ = load_dataset_from_zip(str(zpath), kb, use_cache=False, verbose=False)
    assert gestures, "good file should still load"
    for word, gs in gestures.items():
        for g in gs:
            assert np.isfinite(g).all(), f"NaN leaked into {word}"


def test_time64_fixes_epoch_timestamp_collapse():
    """The parity path narrows epoch-ms timestamps to float32 before the
    duration subtraction (reference data.py:267-277): at ~1.6e12 the float32
    spacing is 131 s, so a 1-second gesture collapses to duration 0 and gets
    a uniform time ramp. time64=True preserves the true timing profile."""
    import numpy as np

    from wordgesture_gan_tpu.data.parse import RawGesture
    from wordgesture_gan_tpu.data.preprocess import normalize_gesture

    n, L = 24, 16
    u = np.linspace(0, 1, n)
    ts = 1.6e12 + 1000.0 * u**2           # quadratic (slow->fast) 1s gesture
    pts = np.column_stack([
        np.linspace(100, 900, n), np.linspace(100, 300, n), ts
    ]).astype(np.float64)
    raw = RawGesture(points=pts, keyb_width=1080.0, keyb_height=360.0)

    g32 = normalize_gesture(raw, L)
    g64 = normalize_gesture(raw, L, time64=True)

    ramp = np.linspace(0, 1, L, dtype=np.float32)
    np.testing.assert_allclose(g32[:, 2], ramp, atol=1e-5)      # collapsed
    assert np.abs(g64[:, 2] - ramp).max() > 0.1                 # preserved
    # xy channels are identical in both modes.
    np.testing.assert_array_equal(g32[:, :2], g64[:, :2])
    # The preserved profile is the quadratic warp (sampled on the uniform
    # arc grid of a straight-line trace).
    np.testing.assert_allclose(g64[:, 2], ramp**2, atol=1e-3)


def test_epoch_clock_zip_roundtrip(tmp_path):
    """Epoch-clock synthetic zips (the realistic default) reproduce the
    reference's float32 collapse on the parity path: every gesture's time
    channel equals what an INDEX-ramp clock would give (true dt destroyed;
    what survives arc-length resampling is raw point density, not velocity).
    time64 recovers materially different timing."""
    import zipfile

    import numpy as np

    from wordgesture_gan_tpu.data.parse import RawGesture, parse_log_file
    from wordgesture_gan_tpu.data.preprocess import normalize_gesture
    from wordgesture_gan_tpu.data.synthetic import write_synthetic_swipelogs_zip

    zp = tmp_path / "z.zip"
    write_synthetic_swipelogs_zip(str(zp), n_users=4, seed=1, n_sentences=3,
                                  words_per_sentence=4, max_vocab=40)

    collapsed, total, deltas = 0, 0, []
    with zipfile.ZipFile(zp) as zf:
        for member in zf.namelist():
            parsed = parse_log_file(zf.read(member).decode("utf-8", "ignore"))
            for gs in parsed.values():
                for raw in gs:
                    assert raw.points[0, 2] > 1e12      # epoch-ms clock
                    g32 = normalize_gesture(raw, 32)
                    ramp_pts = raw.points.copy()
                    ramp_pts[:, 2] = np.arange(len(ramp_pts))
                    g_ramp = normalize_gesture(
                        RawGesture(ramp_pts, raw.keyb_width, raw.keyb_height), 32)
                    total += 1
                    if np.allclose(g32[:, 2], g_ramp[:, 2], atol=1e-6):
                        collapsed += 1
                    g64 = normalize_gesture(raw, 32, time64=True)
                    deltas.append(np.abs(g64[:, 2] - g32[:, 2]).max())

    assert total > 20
    assert collapsed / total > 0.95            # collapse reproduced bit-for-bit
    assert np.median(deltas) > 0.01            # time64 recovers real timing

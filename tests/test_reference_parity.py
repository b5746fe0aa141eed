"""Bit-equivalence tests against the reference implementation.

These tests import the reference package read-only from /root/reference and
compare our preprocessing/geometry outputs against it. They are skipped when
the reference checkout is absent (e.g. in CI on a clean clone) — the rest of
the suite covers the same semantics standalone.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, str(REF))
    import src.shared.keyboard as ref_keyboard
    import src.shared.data as ref_data
    yield ref_keyboard, ref_data
    sys.path.remove(str(REF))


@pytest.fixture(scope="module")
def kb():
    from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
    return QWERTYKeyboard()


def test_key_centers_bit_equal(ref, kb):
    ref_kb = ref[0].QWERTYKeyboard()
    for letter in "qwertyuiopasdfghjklzxcvbnm":
        assert kb.get_key_center(letter) == ref_kb.get_key_center(letter)


@pytest.mark.parametrize("word", ["hello", "world", "the", "aa", "it's", "qp", "minimum"])
@pytest.mark.parametrize("n", [128, 64])
def test_prototype_bit_equal(ref, kb, word, n):
    ref_kb = ref[0].QWERTYKeyboard()
    ours = kb.get_word_prototype(word, n)
    theirs = ref_kb.get_word_prototype(word, n)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("word", ["hello", "when", "qp", "minimum"])
def test_key_indices_equal(ref, kb, word):
    ref_kb = ref[0].QWERTYKeyboard()
    np.testing.assert_array_equal(kb.get_key_indices(word, 128), ref_kb.get_key_indices(word, 128))


@pytest.mark.parametrize("word", ["hello", "world", "gesture"])
def test_min_jerk_noiseless_bit_equal(ref, kb, word):
    ref_kb = ref[0].QWERTYKeyboard()
    ours = kb.get_minimum_jerk_trajectory(word, 128, include_midpoints=True, offset_std=0.0)
    theirs = ref_kb.get_minimum_jerk_trajectory(word, 128, include_midpoints=True, offset_std=0.0)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def _make_raw_gesture(rng, n_pts=37, kb_w=1080.0, kb_h=360.0):
    xs = np.cumsum(rng.uniform(-30, 50, n_pts)) + 200
    ys = 150 + 80 * np.sin(np.linspace(0, 3, n_pts)) + rng.normal(0, 5, n_pts)
    ts = np.cumsum(rng.integers(5, 40, n_pts)).astype(float) + 12345
    return xs, ys, ts, kb_w, kb_h


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_pts", [5, 37, 128, 300])
def test_normalize_gesture_bit_equal(ref, seed, n_pts):
    from wordgesture_gan_tpu.data.parse import RawGesture
    from wordgesture_gan_tpu.data.preprocess import normalize_gesture

    rng = np.random.default_rng(seed)
    xs, ys, ts, kb_w, kb_h = _make_raw_gesture(rng, n_pts)

    ref_points = [
        {"x": float(x), "y": float(y), "t": int(t), "keyb_width": kb_w, "keyb_height": kb_h}
        for x, y, t in zip(xs, ys, ts)
    ]
    theirs = ref[1].normalize_gesture(ref_points, 128)

    raw = RawGesture(np.column_stack([xs, ys, ts.astype(int)]).astype(np.float64), kb_w, kb_h)
    ours = normalize_gesture(raw, 128)
    np.testing.assert_array_equal(ours, theirs)


def test_normalize_gesture_degenerate_bit_equal(ref):
    from wordgesture_gan_tpu.data.parse import RawGesture
    from wordgesture_gan_tpu.data.preprocess import normalize_gesture

    # all points identical → zero arc length fallback
    pts = [{"x": 100.0, "y": 50.0, "t": 1000 + i, "keyb_width": 500.0, "keyb_height": 200.0}
           for i in range(5)]
    theirs = ref[1].normalize_gesture(pts, 128)
    raw = RawGesture(np.array([[100.0, 50.0, 1000 + i] for i in range(5)]), 500.0, 200.0)
    ours = normalize_gesture(raw, 128)
    np.testing.assert_array_equal(ours, theirs)

    # zero duration → uniform time ramp
    pts = [{"x": 100.0 + 10 * i, "y": 50.0, "t": 1000, "keyb_width": 500.0, "keyb_height": 200.0}
           for i in range(4)]
    theirs = ref[1].normalize_gesture(pts, 128)
    raw = RawGesture(np.array([[100.0 + 10 * i, 50.0, 1000] for i in range(4)]), 500.0, 200.0)
    ours = normalize_gesture(raw, 128)
    np.testing.assert_array_equal(ours, theirs)


def test_parser_equivalence(ref):
    from wordgesture_gan_tpu.data.parse import parse_log_file
    from wordgesture_gan_tpu.data.synthetic import write_synthetic_swipelogs_zip
    import zipfile, tempfile, os

    with tempfile.TemporaryDirectory() as d:
        zpath = os.path.join(d, "s.zip")
        write_synthetic_swipelogs_zip(zpath, n_users=2, seed=3, n_sentences=3,
                                      words_per_sentence=3, max_vocab=50)
        with zipfile.ZipFile(zpath) as zf:
            content = zf.read(zf.namelist()[0]).decode()

    ours = parse_log_file(content)
    theirs = ref[1].parse_log_file(content)

    assert set(ours.keys()) == set(theirs.keys())
    for word in ours:
        assert len(ours[word]) == len(theirs[word])
        for raw, ref_pts in zip(ours[word], theirs[word]):
            assert len(raw.points) == len(ref_pts)
            for (x, y, t), rp in zip(raw.points, ref_pts):
                assert x == rp["x"] and y == rp["y"] and t == rp["t"]
            assert raw.keyb_width == ref_pts[0]["keyb_width"]
            assert raw.keyb_height == ref_pts[0]["keyb_height"]


def test_canonical_transform_equivalence(ref, kb):
    from wordgesture_gan_tpu.data.preprocess import (
        apply_canonical_transform, compute_canonical_transform, infer_key_positions,
    )

    rng = np.random.default_rng(0)
    # synthetic gestures whose start/end points are near scaled key positions
    gestures_by_word = {}
    for word in ["hello", "world", "water", "thing", "sound", "point", "mother",
                 "earth", "round", "house", "light", "paper", "music", "query"]:
        centers = kb.get_key_centers_for_word(word)
        gs = []
        for _ in range(12):
            g = np.zeros((128, 3), dtype=np.float32)
            path = np.linspace(centers[0], centers[-1], 128)
            g[:, :2] = (path * 0.8 + 0.1 + rng.normal(0, 0.01, (128, 2))).astype(np.float32)
            g[:, 2] = np.linspace(0, 1, 128)
            gs.append(g)
        gestures_by_word[word] = gs

    ours_pos = infer_key_positions(gestures_by_word)
    theirs_pos = ref[1].infer_key_positions(gestures_by_word)
    assert set(ours_pos) == set(theirs_pos)
    for k in ours_pos:
        np.testing.assert_array_equal(ours_pos[k], theirs_pos[k])

    ref_kb = ref[0].QWERTYKeyboard()
    ours_t = compute_canonical_transform(ours_pos, kb)
    theirs_t = ref[1].compute_canonical_transform(theirs_pos, ref_kb)
    for k in ours_t:
        np.testing.assert_allclose(ours_t[k], theirs_t[k], rtol=1e-12)

    g = gestures_by_word["hello"][0]
    np.testing.assert_array_equal(
        apply_canonical_transform(g, ours_t), ref[1].apply_canonical_transform(g, theirs_t)
    )

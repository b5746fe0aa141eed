"""Keyboard geometry, prototype, and minimum-jerk tests (reference
semantics: /root/reference/src/shared/keyboard.py)."""

import numpy as np
import pytest

from wordgesture_gan_tpu.keyboard import (
    MinimumJerkModel,
    QWERTYKeyboard,
    generate_minimum_jerk_trajectory,
    generate_minimum_jerk_trajectory_fitted,
    minimum_jerk_quintic,
)


@pytest.fixture(scope="module")
def kb():
    return QWERTYKeyboard()


def test_key_centers_layout(kb):
    # q is top-left, p top-right, m bottom-right-ish
    qx, qy = kb.get_key_center("q")
    px, py = kb.get_key_center("p")
    assert qy == py == pytest.approx(-1 + 0.5 * 2 / 3)
    assert qx == pytest.approx(-0.9 + 0.5 * 0.18)
    assert px == pytest.approx(0.9 - 0.5 * 0.18)
    # middle row y = 0, bottom row y = 1/3... rows: y = -1+(r+.5)*2/3
    assert kb.get_key_center("a")[1] == pytest.approx(0.0)
    assert kb.get_key_center("z")[1] == pytest.approx(2 / 3)
    assert kb.get_key_center("?") is None


def test_prototype_shape_and_time(kb):
    proto = kb.get_word_prototype("hello", 128)
    assert proto.shape == (128, 3)
    assert proto.dtype == np.float32
    np.testing.assert_allclose(proto[:, 2], np.linspace(0, 1, 128), atol=1e-6)
    # starts at h key, ends at o key
    np.testing.assert_allclose(proto[0, :2], kb.get_key_center("h"), atol=1e-6)
    np.testing.assert_allclose(proto[-1, :2], kb.get_key_center("o"), atol=1e-6)


def test_prototype_arclength_uniform(kb):
    proto = kb.get_word_prototype("when", 128)
    seg = np.linalg.norm(np.diff(proto[:, :2], axis=0), axis=1)
    # uniform arc-length spacing: chord lengths are equal except where a
    # sample pair straddles a polyline corner (chord < arc there)
    assert np.median(np.abs(seg - np.median(seg))) < 1e-5
    assert seg.max() <= np.median(seg) * (1 + 1e-3)


def test_prototype_single_letter_and_empty(kb):
    p = kb.get_word_prototype("aa", 16)   # both keys at same position
    assert np.allclose(p[:, 0], kb.get_key_center("a")[0])
    p2 = kb.get_word_prototype("''", 16)  # no valid keys
    assert np.allclose(p2, 0)


def test_prototype_skips_nonletters(kb):
    assert np.allclose(kb.get_word_prototype("it's", 64), kb.get_word_prototype("its", 64))


def test_key_indices(kb):
    idx = kb.get_key_indices("hello", 128)
    assert idx[0] == 0 and idx[-1] == 127
    assert np.all(np.diff(idx) >= 0)
    proto = kb.get_word_prototype("hello", 128)
    centers = kb.get_key_centers_for_word("hello")
    # prototype points at key indices should be near those key centers
    for i, c in zip(idx, centers):
        assert np.linalg.norm(proto[i, :2] - c) < 0.05


def test_min_jerk_quintic_boundaries():
    t = np.array([0.0, 0.5, 1.0])
    s = minimum_jerk_quintic(t)
    np.testing.assert_allclose(s, [0.0, 0.5, 1.0], atol=1e-12)


def test_min_jerk_two_point():
    pts = np.array([[0.0, 0.0], [1.0, 0.0]])
    traj = generate_minimum_jerk_trajectory(pts, num_points=64, include_midpoints=True)
    assert traj.shape == (64, 3)
    np.testing.assert_allclose(traj[0], [0, 0, 0], atol=1e-7)
    np.testing.assert_allclose(traj[-1], [1, 0, 1], atol=1e-6)
    # time = tau, position = quintic(tau)
    np.testing.assert_allclose(traj[:, 0], minimum_jerk_quintic(traj[:, 2]), atol=1e-5)


def test_min_jerk_multi_point_properties(kb):
    centers = kb.get_key_centers_for_word("hello")
    traj = generate_minimum_jerk_trajectory(centers, num_points=128)
    assert traj.shape == (128, 3)
    # endpoint interpolation
    np.testing.assert_allclose(traj[0, :2], centers[0], atol=1e-4)
    np.testing.assert_allclose(traj[-1, :2], centers[-1], atol=1e-4)
    # time monotone in [0, 1]
    assert traj[0, 2] == pytest.approx(0, abs=1e-6)
    assert traj[-1, 2] == pytest.approx(1, abs=1e-6)
    assert np.all(np.diff(traj[:, 2]) >= -1e-7)
    # arc-length uniform spatial sampling
    seg = np.linalg.norm(np.diff(traj[:, :2], axis=0), axis=1)
    assert seg.std() < 0.05 * seg.mean()
    # velocity profile: slower (bigger dt) near the ends than mid-trace
    dt = np.diff(traj[:, 2])
    assert dt[0] > np.median(dt)


def test_min_jerk_noise_reproducible(kb):
    centers = kb.get_key_centers_for_word("world")
    r1 = generate_minimum_jerk_trajectory(centers, 64, offset_std=0.02,
                                          rng=np.random.default_rng(7))
    r2 = generate_minimum_jerk_trajectory(centers, 64, offset_std=0.02,
                                          rng=np.random.default_rng(7))
    r3 = generate_minimum_jerk_trajectory(centers, 64, offset_std=0.02,
                                          rng=np.random.default_rng(8))
    np.testing.assert_array_equal(r1, r2)
    assert not np.allclose(r1, r3)


def test_min_jerk_model_fit_and_generate(kb):
    rng = np.random.default_rng(0)
    words = ["hello", "world", "thing", "sound"]
    gestures_by_word = {}
    for w in words:
        base = kb.get_minimum_jerk_trajectory(w, 128, offset_std=0.0)
        gs = []
        for _ in range(3):
            g = base.copy()
            g[:, :2] += rng.normal(0, 0.01, (128, 2)).astype(np.float32)
            gs.append(g)
        gestures_by_word[w] = gs

    model = MinimumJerkModel(kb).fit(gestures_by_word, verbose=False)
    d = model.distributions
    assert d.is_fitted()
    assert d.n_key_offset_samples > 0 and d.n_midpoint_samples > 0
    # offsets should be small since gestures hug the ideal path
    assert abs(d.key_offset_mean_x) < 0.05
    assert d.key_offset_std_x < 0.1

    traj = model.generate_trajectory("hello", 128, rng=np.random.default_rng(1))
    assert traj.shape == (128, 3)
    assert np.isfinite(traj).all()


def test_fitted_trajectory_zero_noise_matches_plain(kb):
    centers = kb.get_key_centers_for_word("water")
    fitted = generate_minimum_jerk_trajectory_fitted(
        centers, 64, key_offset_std=(0.0, 0.0), key_offset_mean=(0.0, 0.0),
        midpoint_angle_mean=0.0, midpoint_angle_std=0.0,
    )
    plain = generate_minimum_jerk_trajectory(centers, 64, offset_std=0.0)
    np.testing.assert_allclose(fitted, plain, atol=1e-6)

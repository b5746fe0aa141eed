"""Properties of the synthetic swipelog generator that keep evaluation
honest: traces must NOT be the min-jerk process the eval suite uses as its
baseline, users must have persistent distinct styles, and malformed rows
must exist and be survivable."""

import numpy as np
import pytest

from wordgesture_gan_tpu.data.parse import parse_log_file
from wordgesture_gan_tpu.data.synthetic import (
    _render_word_trace,
    generate_log_content,
    load_word_list,
    sample_user_style,
)
from wordgesture_gan_tpu.keyboard import QWERTYKeyboard, generate_minimum_jerk_trajectory


@pytest.fixture(scope="module")
def kb():
    return QWERTYKeyboard()


def test_user_styles_are_distinct():
    rng = np.random.default_rng(0)
    a, b = sample_user_style(rng), sample_user_style(rng)
    assert a != b
    assert a.speed != b.speed and a.sloppiness != b.sloppiness


def test_trace_deviates_from_min_jerk(kb):
    """Rendered traces carry correlated tremor + perturbed waypoints; their
    high-frequency path energy must exceed a pure min-jerk trajectory's."""
    rng = np.random.default_rng(1)

    def roughness(xy):
        dd = np.diff(xy, n=2, axis=0)
        return float(np.abs(dd).mean())

    word = "gesture"
    n = 64
    # Pure min-jerk, no noise, through exact key centers.
    centers = kb.get_key_centers_for_word(word)
    pure = generate_minimum_jerk_trajectory(centers, num_points=n,
                                            include_midpoints=True,
                                            offset_std=0.0, rng=rng)
    rough_pure = roughness(np.asarray(pure)[:, :2])

    rough_rendered = []
    for seed in range(8):
        style_rng = np.random.default_rng(100 + seed)
        trace = _render_word_trace(kb, word, style_rng, 1080.0, 360.0,
                                   sample_user_style(style_rng))
        xy = trace[:, :2] / np.array([1080.0, 360.0]) * 2.0 - 1.0  # back to canonical
        rough_rendered.append(roughness(xy))

    assert np.mean(rough_rendered) > 1.5 * rough_pure


def test_tempo_not_min_jerk_s_curve(kb):
    """The time channel must not be the min-jerk s(tau) profile: across
    rendered traces the normalized time-grid deviates from the pure profile's."""
    rng = np.random.default_rng(2)
    centers = kb.get_key_centers_for_word("water")
    pure = np.asarray(generate_minimum_jerk_trajectory(
        centers, num_points=48, include_midpoints=True, offset_std=0.0, rng=rng))

    devs = []
    for seed in range(8):
        srng = np.random.default_rng(200 + seed)
        trace = _render_word_trace(kb, "water", srng, 1080.0, 360.0,
                                   sample_user_style(srng))
        t = trace[:, 2]
        t_norm = t / max(t[-1], 1e-9)
        # resample both time profiles onto a common grid and compare
        grid = np.linspace(0, 1, 32)
        ours = np.interp(grid, np.linspace(0, 1, len(t_norm)), t_norm)
        ref = np.interp(grid, np.linspace(0, 1, len(pure)), pure[:, 2])
        devs.append(np.abs(ours - ref).max())
    assert np.mean(devs) > 0.01


class TestRealBands:
    """The synthetic corpus must land inside the REAL corpus's published
    per-sentence bands (dataset/stats-sentences.tsv — the aggregates survive
    even though the raw logs are a stripped blob). This is the quantitative
    synthetic-vs-real validation: unit-exact statistics must have their
    synthetic median inside the real [p10, p90]; the event-rate-renormalized
    DTW statistic gets a loose factor band (see data/realism.py docstring
    for why it cannot be exact)."""

    @pytest.fixture(scope="class")
    def comparison(self, tmp_path_factory):
        from wordgesture_gan_tpu.data.realism import (
            compare_to_real, synthetic_sentence_stats)
        from wordgesture_gan_tpu.data.synthetic import write_synthetic_swipelogs_zip

        zp = str(tmp_path_factory.mktemp("realism") / "syn.zip")
        write_synthetic_swipelogs_zip(
            zp, n_users=40, seed=7,
            wordfreq_path="dataset/wordfreq.txt",
            n_sentences=10, words_per_sentence=6)
        syn = synthetic_sentence_stats(zp)
        return {r.stat: r for r in compare_to_real(syn)}

    def test_all_stats_computed(self, comparison):
        assert set(comparison) == {"time_ms", "length_w", "interval_ms",
                                   "wpm_swipe", "dtw_w"}

    @pytest.mark.parametrize("stat", ["time_ms", "length_w", "interval_ms",
                                      "wpm_swipe"])
    def test_exact_stat_inside_real_band(self, comparison, stat):
        r = comparison[stat]
        assert r.real_p10 <= r.syn_median <= r.real_p90, (
            f"{stat}: synthetic median {r.syn_median:.3f} outside real "
            f"[{r.real_p10:.3f}, {r.real_p90:.3f}]")

    def test_dtw_within_loose_factor_of_real(self, comparison):
        """Approximate metric (event-rate renormalization is only good to
        ~2x): require the synthetic per-step DTW-to-prototype within 10x of
        the real median. Current measured gap: synthetic swipers are ~5x
        MORE accurate than real ones (0.015 vs 0.077 widths/step) — a known,
        documented direction for future corpus tuning, not a regression."""
        r = comparison["dtw_w"]
        assert r.real_median / 10.0 <= r.syn_median <= r.real_median * 10.0


def test_sloppiness_scale_default_is_byte_identical(kb):
    """sloppiness_scale=1.0 must not perturb the RNG stream or the output."""
    words = load_word_list(None)[:20]
    a = generate_log_content(kb, words, np.random.default_rng(5), n_sentences=4)
    b = generate_log_content(kb, words, np.random.default_rng(5), n_sentences=4,
                             sloppiness_scale=1.0)
    assert a == b
    c = generate_log_content(kb, words, np.random.default_rng(5), n_sentences=4,
                             sloppiness_scale=3.0)
    assert c != a


def test_malformed_rows_exist_and_parser_survives(kb):
    words = load_word_list(None)[:30]
    rng = np.random.default_rng(3)
    content = generate_log_content(kb, words, rng, n_sentences=10,
                                   words_per_sentence=5, malformed_rate=0.05)
    lines = content.splitlines()
    bad = [l for l in lines[1:] if len(l.split()) != 12 or l.split()[2] == "0"]
    assert bad, "expected some malformed rows at malformed_rate=0.05"

    gestures = parse_log_file(content)
    total = sum(len(v) for v in gestures.values())
    assert total > 20, "parser must still recover the well-formed gestures"
    for traces in gestures.values():
        for g in traces:
            assert np.isfinite(np.asarray(g.points, dtype=np.float64)).all()

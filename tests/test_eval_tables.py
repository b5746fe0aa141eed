"""Eval driver table printing + profiling utils smoke tests."""

import numpy as np

from wordgesture_gan_tpu.eval.gan_eval import (
    PAPER_GAN,
    PAPER_MINJERK,
    print_comparison_table,
    print_results_table,
)
from wordgesture_gan_tpu.utils.profiling import StepTimer, Throughput


def _fake_results(dtw=1.5):
    return {
        "l2_wasserstein": 2.8, "dtw_wasserstein": dtw,
        "jerk_fake": 0.005, "jerk_real": 0.006,
        "velocity_corr": 0.2, "acceleration_corr": 0.05,
        "speed_profile_corr": 0.1, "time_delta_corr": 0.2,
        "ae_reconstruction_loss": 0.04, "ae_test_loss": 0.05,
        "fid": 0.03, "precision": 0.9, "recall": 0.5,
    }


def test_results_table_prints(capsys):
    print_results_table(_fake_results(), "GAN", PAPER_GAN)
    out = capsys.readouterr().out
    assert "GAN Results" in out
    assert "4.409" in out          # paper constant present
    assert "2.800" in out          # our value formatted


def test_results_table_skipped_dtw(capsys):
    print_results_table(_fake_results(dtw=-1.0), "Minimum Jerk", PAPER_MINJERK)
    assert "SKIPPED" in capsys.readouterr().out


def test_comparison_table_prints(capsys):
    print_comparison_table(_fake_results(), _fake_results(dtw=1.3))
    out = capsys.readouterr().out
    assert "Side-by-Side" in out
    assert "Min Jerk" in out


def test_throughput_counters():
    t = Throughput(n_chips=4)
    t.update(1000, 2.0)
    t.update(1000, 2.0)
    assert t.per_sec == 500.0
    assert t.per_sec_per_chip == 125.0
    assert t.summary()["n_chips"] == 4


def test_step_timer_context():
    with StepTimer() as timer:
        pass
    assert timer.last >= 0
    assert np.isfinite(timer.mean)

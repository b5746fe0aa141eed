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


def test_attach_eval_to_wandb_logs_scalars_and_figures():
    """Eval-time W&B parity (reference eval_gan.py:160-184): GAN scalars
    under eval/, min-jerk under eval_minjerk/, and the two figures — driven
    through a stub wandb module."""
    import numpy as np

    from wordgesture_gan_tpu.eval.gan_eval import attach_eval_to_wandb

    class StubWandb:
        def __init__(self):
            self.summary = {}
            self.logged = {}

        def log(self, d):
            self.logged.update(d)

        @staticmethod
        def Image(fig):
            return ("image", type(fig).__name__)

    wb = StubWandb()
    rng = np.random.default_rng(0)
    real = rng.uniform(-1, 1, (8, 32, 3)).astype(np.float32)
    fake = rng.uniform(-1, 1, (8, 32, 3)).astype(np.float32)
    gan_results = {"l2_wasserstein": 1.5, "fid": 0.2, "_cached_real": object()}
    mj_results = {"l2_wasserstein": 2.5, "jerk_fake": 0.003}

    attach_eval_to_wandb(wb, gan_results, mj_results, real_g=real,
                         gan_fake=fake, words=["alpha", "beta"])

    assert wb.summary["eval/l2_wasserstein"] == 1.5
    assert wb.summary["eval/fid"] == 0.2
    assert "eval/_cached_real" not in wb.summary
    assert wb.summary["eval_minjerk/l2_wasserstein"] == 2.5
    assert wb.summary["eval_minjerk/jerk_fake"] == 0.003
    assert "gestures/comparison" in wb.logged
    assert "gestures/overlay" in wb.logged

"""Visualization smoke tests (figure semantics, host-side)."""

import numpy as np

from wordgesture_gan_tpu.viz import (
    create_comparison_figure,
    create_overlay_figure,
    plot_gestures_on_keyboard,
)


def _gestures(n=6):
    rng = np.random.default_rng(0)
    g = rng.uniform(-1, 1, (n, 128, 3)).astype(np.float32)
    g[:, :, 2] = np.sort(rng.uniform(0, 1, (n, 128)), axis=1)
    return g


def test_figures_build_and_close():
    import matplotlib.pyplot as plt

    real, fake = _gestures(), _gestures()
    words = [f"w{i}" for i in range(6)]
    for fig in (
        plot_gestures_on_keyboard(real[:3], title="t"),
        create_comparison_figure(real, fake, words),
        create_overlay_figure(real, fake, "hello"),
    ):
        assert fig.get_axes()
        plt.close(fig)

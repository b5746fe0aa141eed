"""Shared plumbing for the cross-implementation parity harness
(tests/test_cross_impl_eval.py, tests/test_cross_impl_train.py).

Provides: reference-package import, deterministic gesture-array synthesis,
and a torch RNG patcher that feeds the reference trainer a pre-drawn noise
queue so both stacks consume identical randomness (the jax side takes the
same arrays through ``gan_train_step(..., noise=...)``).
"""

from __future__ import annotations

import sys
from contextlib import contextmanager
from pathlib import Path

import numpy as np

REF = Path("/root/reference")


def add_reference_to_path():
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))


def make_gesture_arrays(n: int, L: int, seed: int = 0, noise: float = 0.08):
    """(real, fake, train) float32 arrays shaped (n, L, 3) in tanh range:
    smooth random 2-D traces + a monotone time channel. ``fake`` is a
    perturbed copy of an independent draw — distributionally close to real
    but not identical, so every metric sees non-degenerate input."""
    rng = np.random.default_rng(seed)

    def draw(m, jitter):
        steps = rng.normal(0, 1.0, (m, L + 8, 2))
        # Moving-average smoothing → gesture-like curvature.
        kernel = np.ones(9) / 9.0
        smooth = np.stack(
            [np.convolve(steps[i, :, c], kernel, mode="valid")
             for i in range(m) for c in range(2)]
        ).reshape(m, 2, L).transpose(0, 2, 1)
        xy = np.cumsum(smooth, axis=1)
        xy -= xy.mean(axis=1, keepdims=True)
        scale = np.abs(xy).max(axis=(1, 2), keepdims=True) + 1e-6
        xy = 0.85 * xy / scale + jitter * rng.normal(0, 1, (m, L, 2)) * 0.1
        dt = rng.uniform(0.3, 1.0, (m, L - 1))
        t = np.concatenate([np.zeros((m, 1)), np.cumsum(dt, axis=1)], axis=1)
        t = 2.0 * t / t[:, -1:] - 1.0
        return np.clip(np.concatenate([xy, t[:, :, None]], axis=2), -1, 1).astype(np.float32)

    real = draw(n, jitter=0.0)
    fake = draw(n, jitter=1.0)
    train = draw(2 * n, jitter=0.0)
    return real, fake, train


@contextmanager
def torch_noise_queue(arrays):
    """Patch ``torch.randn`` / ``torch.randn_like`` to pop pre-drawn numpy
    arrays (in order) instead of sampling, for the duration of the block."""
    import torch

    queue = [np.asarray(a, np.float32) for a in arrays]
    orig_randn, orig_randn_like = torch.randn, torch.randn_like

    def fake_randn(*size, **kwargs):
        a = queue.pop(0)
        assert tuple(a.shape) == tuple(size), (a.shape, size)
        return torch.from_numpy(a.copy())

    def fake_randn_like(t, **kwargs):
        a = queue.pop(0)
        assert tuple(a.shape) == tuple(t.shape), (a.shape, t.shape)
        return torch.from_numpy(a.copy())

    torch.randn, torch.randn_like = fake_randn, fake_randn_like
    try:
        yield queue
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_randn_like


def torch_state_dict_numpy(module):
    """Snapshot a state_dict as numpy COPIES — torch mutates weights and
    spectral-norm u buffers in place, and jax's CPU backend can zero-copy
    alias numpy arrays, so views would silently track the mutations."""
    return {k: v.detach().cpu().numpy().copy() for k, v in module.state_dict().items()}


class SequentialParallel:
    """Drop-in for ``joblib.Parallel`` that evaluates the delayed calls in
    the current process — the reference's DTW fan-out
    (evaluation.py:356) otherwise spawns workers that cannot import the
    in-process fastdtw shim."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, iterable):
        return [fn(*args, **kwargs) for fn, args, kwargs in iterable]

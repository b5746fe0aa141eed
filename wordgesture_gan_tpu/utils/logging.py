"""Logging + seeding utilities (reference src/shared/utils.py:12-25)."""

from __future__ import annotations

import random

import numpy as np


def log(msg: str) -> None:
    """Flush-print (the reference streams stdout through a sandbox; here it
    just keeps interleaving with XLA logs sane)."""
    print(msg, flush=True)


def seed_everything(seed: int) -> None:
    """Seed the host RNGs (stdlib + numpy). Device randomness is explicit
    jax.random key threading — no global device RNG exists to seed."""
    random.seed(seed)
    np.random.seed(seed)

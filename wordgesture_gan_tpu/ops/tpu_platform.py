"""One predicate for "can Pallas kernels run here", with per-kernel
kill-switch env vars.

Every Pallas kernel family used to carry its own copy of the
platform-in-("tpu","axon") try/except, and only the LSTM variant had a
disable flag — so a kernel that miscompiled on a new TPU generation could
not be turned off from the CLIs. Centralized: one check, one env-var naming
scheme (WGG_DISABLE_PALLAS_<KERNEL>)."""

from __future__ import annotations

import os
from typing import Optional

import jax


def tpu_backend() -> bool:
    """A TPU-ish backend is the default jax platform."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover - no backend at all
        return False


def pallas_enabled(disable_env: Optional[str] = None) -> bool:
    """TPU backend present and the kernel's kill switch not set."""
    if disable_env and os.environ.get(disable_env):
        return False
    return tpu_backend()

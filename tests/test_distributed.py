"""Multi-host gating logic (parallel/distributed.py). Actual pod
initialization needs a coordinator and N processes; what CI can pin down is
the environment gate and the single-process contracts every CLI relies on."""

import os

import pytest

from wordgesture_gan_tpu.parallel import (
    distributed_env_requested,
    maybe_init_distributed,
    process_local_batch_slice,
)


@pytest.fixture
def clean_env(monkeypatch):
    for var in ("WGG_DISTRIBUTED", "JAX_NUM_PROCESSES",
                "JAX_COORDINATOR_ADDRESS", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    return monkeypatch


def test_not_requested_by_default(clean_env):
    assert not distributed_env_requested()
    assert maybe_init_distributed(verbose=False) is False


def test_requested_via_explicit_vars(clean_env):
    clean_env.setenv("JAX_NUM_PROCESSES", "4")
    assert distributed_env_requested()


def test_single_process_not_requested(clean_env):
    clean_env.setenv("JAX_NUM_PROCESSES", "1")
    assert not distributed_env_requested()


def test_requested_via_opt_in(clean_env):
    clean_env.setenv("WGG_DISTRIBUTED", "1")
    assert distributed_env_requested()


def test_single_process_batch_slice(clean_env):
    assert process_local_batch_slice(512) == slice(0, 512)

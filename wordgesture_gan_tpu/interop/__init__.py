"""Interoperability with the reference torch implementation: weight-format
converters for migrating reference checkpoints into this framework (and the
cross-implementation parity harness, tests/test_cross_impl_*.py)."""

from .torch_weights import (  # noqa: F401
    autoencoder_from_torch,
    contrastive_encoder_from_torch,
    encoder_from_torch,
    generator_from_torch,
    mlp_disc_from_torch,
    temporal_disc_from_torch,
    trainer_state_from_torch,
)

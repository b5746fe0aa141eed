"""Contrastive gesture encoder: strided Conv1D stack + projection head.

Functional re-design of the reference encoder
(/root/reference/src/contrastive/model.py:48-121): three stride-2 conv
blocks (BatchNorm + ReLU), global average pooling over the time axis, a
2-layer projection MLP, and L2 normalization onto the unit sphere.
BatchNorm running statistics are an explicit state pytree.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import DEFAULT_CONTRASTIVE_CONFIG, ContrastiveConfig
from .layers import batchnorm, batchnorm_init, conv1d, conv1d_init, dense, dense_init

# (in_ch, out_ch, kernel, stride, padding) — reference model.py:72-87
_CONV_SPEC = ((3, 32, 7, 2, 3), (32, 64, 5, 2, 2), (64, 128, 3, 2, 1))


def contrastive_encoder_init(
    key, config: ContrastiveConfig = DEFAULT_CONTRASTIVE_CONFIG
) -> Tuple[Dict, Dict]:
    """Returns (params, batchnorm_state)."""
    keys = jax.random.split(key, len(_CONV_SPEC) + 2)
    convs, bns, bn_states = [], [], []
    for i, (cin, cout, k, _s, _p) in enumerate(_CONV_SPEC):
        convs.append(conv1d_init(keys[i], cin, cout, k))
        bn_p, bn_s = batchnorm_init(cout)
        bns.append(bn_p)
        bn_states.append(bn_s)
    proj1 = dense_init(keys[-2], _CONV_SPEC[-1][1], config.embedding_dim)
    proj2 = dense_init(keys[-1], config.embedding_dim, config.embedding_dim)
    return {"convs": convs, "bns": bns, "proj": [proj1, proj2]}, {"bns": bn_states}


def contrastive_encoder_apply(
    params,
    state,
    x: jnp.ndarray,
    train: bool,
    normalize: bool = True,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, Dict]:
    """(B, L, 3) → ((B, embedding_dim), new_bn_state).

    NWC layout throughout (the reference transposes for torch Conv1d). When
    ``axis_name`` is given, BatchNorm uses cross-device batch statistics."""
    h = x
    new_bn_states = []
    for conv_p, bn_p, bn_s, (_ci, _co, _k, stride, pad) in zip(
        params["convs"], params["bns"], state["bns"], _CONV_SPEC
    ):
        h = conv1d(conv_p, h, stride=stride, padding=pad)
        h, bn_s_new = batchnorm(bn_p, bn_s, h, train=train, axis_name=axis_name)
        h = jax.nn.relu(h)
        new_bn_states.append(bn_s_new)

    h = h.mean(axis=1)                       # global average pool over time
    h = jax.nn.relu(dense(params["proj"][0], h))
    h = dense(params["proj"][1], h)
    if normalize:
        h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-12)
    return h, {"bns": new_bn_states}

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Shared training-loop plumbing: observation/reward transforms, optimizers.

Defaults mirror the reference where it has an opinion (RMSProp lr 1e-3,
``/root/reference/algorithm/a3c/a3c.py:22-23,264-265``; Adam for the
critic, ``critic.py:34``) and make the TPU-sane choice where it does not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from rein48_tpu.models import obs as obs_lib

OBS_ENCODERS = {
    "onehot": obs_lib.encode_onehot,
    "raw": obs_lib.encode_raw,
    "log2": obs_lib.encode_log2_scalar,
}


def encode_obs(boards: jax.Array, encoding: str) -> jax.Array:
    """Encode exponent boards for the model; see ``models/obs.py``.

    ``raw`` reproduces the reference's input (``a3c.py:139``,
    ``actor.py:57``); ``onehot`` is the TPU-native default. Conv models
    need a channel axis, so non-onehot encodings get one appended.
    """
    enc = OBS_ENCODERS[encoding]
    x = enc(boards)
    if encoding != "onehot":
        x = x[..., None]
    return x


def transform_reward(reward: jax.Array, transform: str) -> jax.Array:
    """Reward shaping for learning stability.

    Merge scores span [4, 10^5]; feeding them straight into TD targets
    explodes value magnitudes. ``log2`` compresses to ~[2, 17] while
    keeping monotonicity; ``identity`` is reference-faithful.
    """
    if transform == "identity":
        return reward
    if transform == "log2":
        return jnp.log2(1.0 + reward)
    if transform == "scaled":
        return reward / 256.0
    raise ValueError(f"unknown reward transform '{transform}'")


def make_optimizer(
    name: str,
    learning_rate: float | optax.Schedule,
    *,
    max_grad_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    """Optimizer factory.

    ``rmsprop`` matches the reference A3C's ``tf.train.RMSPropOptimizer``
    defaults (decay 0.9, eps 1e-10; ``a3c.py:264-265``); ``adam`` matches
    the reference critic (``critic.py:34``). Gradient clipping is a TPU-era
    addition (the reference has none and its runs are tiny).
    """
    if name == "rmsprop":
        tx = optax.rmsprop(learning_rate, decay=0.9, eps=1e-10)
    elif name == "adam":
        tx = optax.adam(learning_rate)
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=1e-4)
    elif name == "sgd":
        tx = optax.sgd(learning_rate)
    else:
        raise ValueError(f"unknown optimizer '{name}'")
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def tree_norm(tree) -> jax.Array:
    return optax.global_norm(tree)

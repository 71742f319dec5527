# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Observation encodings for the log2 board.

The reference feeds RAW tile values straight into its nets — the flattened
``state_matrix`` for the A3C MLP (``/root/reference/algorithm/a3c/a3c.py:139``)
and a ``[B,4,4,1]`` reshape for the DDPG CNN
(``/root/reference/algorithm/ddpg/actor.py:57``). Raw values span 5 orders
of magnitude, which is terrible conditioning; the TPU-native default is
one-hot exponent planes ``[B,4,4,16]`` (a comparison against an iota — free
on the VPU), with the raw encoding kept for reference parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_PLANES = 16  # exponents 0..15; plane 0 = empty cell


def encode_onehot(boards: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """``uint8[..., 4, 4]`` exponents -> one-hot ``[..., 4, 4, 16]`` planes."""
    planes = boards[..., None] == jnp.arange(NUM_PLANES, dtype=boards.dtype)
    return planes.astype(dtype)


def encode_raw(boards: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Exponents -> raw tile values ``[..., 4, 4]`` (reference encoding).

    Matches what the reference nets consume: 0 for empty, ``2**k`` for
    tiles (``a3c.py:139``, ``actor.py:57``).
    """
    vals = jnp.where(
        boards > 0, jnp.exp2(boards.astype(jnp.float32)), 0.0
    )
    return vals.astype(dtype)


def encode_log2_scalar(boards: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Exponents scaled to [0, 1] as a single plane — cheap MLP encoding."""
    return (boards.astype(jnp.float32) / float(NUM_PLANES - 1)).astype(dtype)

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Non-learned control policies (reference ``control/`` layer).

* :func:`random_policy` — batched uniform-random actions on device
  (``/root/reference/control/rand.py:9-11`` reimagined as a shaped draw).
* :func:`hand_control` — stdin-driven human play with the reference's
  re-prompt loop (``/root/reference/control/hand.py:7-21``).
* :class:`Rand` / :class:`Hand` — reference-API shims.
"""

from __future__ import annotations

import random as _pyrandom

import jax
import jax.numpy as jnp

from rein48_tpu.engine import core

_VALID_INPUTS = set(core.ACTION_ALIASES.keys())


def random_policy(key: jax.Array, batch_shape=()) -> jax.Array:
    """Uniform-random actions, ``int32[batch_shape]`` in [0, 4)."""
    return jax.random.randint(key, batch_shape, 0, core.NUM_ACTIONS)


def random_legal_policy(key: jax.Array, boards: jax.Array) -> jax.Array:
    """Uniform-random over *legal* actions (addition over reference).

    Falls back to uniform over all 4 when nothing is legal (terminal board).
    """
    mask = core.legal_action_mask(boards)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    all_illegal = ~jnp.any(mask, axis=-1, keepdims=True)
    logits = jnp.where(all_illegal, 0.0, logits)
    return jax.random.categorical(key, logits)


def hand_control(*_args) -> str:
    """Blocking stdin action prompt (``control/hand.py:7-21``)."""
    print("Input action direction, then press ENTER button: ", end="")
    action = input()
    while action not in _VALID_INPUTS:
        print(
            "\n##########[Error]########## \n"
            "Input action signal is invalid, you must input valid value...\n"
            "########################### \n"
        )
        action = input()
    return action


class Rand:
    """Reference-API shim (``control/rand.py``): host RNG, string actions."""

    @staticmethod
    def random_action(*_args) -> str:
        return core.ACTION_NAMES[_pyrandom.randint(0, 3)]


class Hand:
    """Reference-API shim (``control/hand.py``)."""

    hand_control = staticmethod(hand_control)

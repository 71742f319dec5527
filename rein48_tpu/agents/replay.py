# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""On-device circular replay buffer.

TPU-native replacement for the reference's list-backed buffer
(``/root/reference/algorithm/ddpg/replay.py``): that one holds 100 Python
dicts, samples 10 with ``random.sample``, then THROWS AWAY the whole buffer
after every sample (``replay.py:26,45-47``). Here the buffer is a
preallocated pytree of device arrays ``[capacity, ...]`` with a write
cursor; adds are vectorized slot writes, sampling is a shaped
``jax.random.randint`` gather, and nothing ever leaves the device. The
whole thing jits and shards (give the capacity axis to the data-parallel
mesh axis for a per-device buffer).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    """Replay buffer state.

    Attributes:
        data: pytree of ``[capacity, ...]`` arrays (transition fields).
        cursor: next write slot (wraps mod capacity).
        size: number of valid slots (saturates at capacity).
    """

    data: Any
    cursor: jax.Array
    size: jax.Array

    @property
    def capacity(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[0]


def replay_init(example: Any, capacity: int) -> ReplayState:
    """Allocate a buffer shaped like ``example`` (one unbatched transition)."""
    data = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        example,
    )
    return ReplayState(
        data=data,
        cursor=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32),
    )


def replay_add(state: ReplayState, batch: Any) -> ReplayState:
    """Append a batch of transitions (leading axis N), wrapping at capacity.

    N is a static shape; the write is a scatter at ``(cursor + arange(N)) %
    capacity`` — no host sync, no reallocation, unlike the reference's
    ``store``/clear cycle (``replay.py:18-21,45-47``).
    """
    n = jax.tree.leaves(batch)[0].shape[0]
    cap = state.capacity
    idx = (state.cursor + jnp.arange(n, dtype=jnp.int32)) % cap
    data = jax.tree.map(lambda buf, x: buf.at[idx].set(x), state.data, batch)
    return ReplayState(
        data=data,
        cursor=(state.cursor + n) % cap,
        size=jnp.minimum(state.size + n, cap),
    )


def replay_sample(state: ReplayState, key: jax.Array, batch_size: int) -> Any:
    """Uniform sample WITH replacement over the valid prefix.

    The reference samples without replacement then destroys the buffer
    (``replay.py:23-47``); with-replacement sampling from a persistent
    buffer is the standard DQN regime and keeps the op a single gather.
    """
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
    return jax.tree.map(lambda buf: buf[idx], state.data)


def replay_filled(state: ReplayState) -> jax.Array:
    """True once the buffer has wrapped (reference ``filled()``,
    ``replay.py:15-16`` — its train-trigger condition)."""
    return state.size >= state.capacity

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


def replay_sample_nstep(
    state: ReplayState,
    key: jax.Array,
    batch_size: int,
    *,
    n_step: int,
    stride: int,
    gamma: float,
) -> Any:
    """Uniform n-step transition sample (VERDICT r4 item 6).

    The buffer is written in batches of ``stride`` lockstep envs
    (``train/dqn.py``), so the transition FOLLOWING slot ``i`` for the
    same env sits at ``i + stride`` (mod capacity) — the circular layout
    makes the n-chain a strided gather, no extra storage at write time.

    Expects the DQN field contract: ``reward``/``done`` scalars and a
    ``next_board`` per slot; every other field is taken from the chain's
    first transition. Returns a 1-step-shaped batch with

    * ``reward`` = sum_{k<n} gamma^k r_k, products of (1-done) cutting
      the sum at the first episode end (post-reset rewards of the NEXT
      episode never leak in);
    * ``done``  = whether any of the n steps ended the episode;
    * ``next_board`` = the chain-end bootstrap state s_{t+n} (garbage
      when ``done`` — its bootstrap coefficient is 0).

    Feed the result to ``dqn_loss`` with ``gamma**n_step`` as the
    effective discount: target = R^(n) + gamma^n (1-done) max Q(s_{t+n}).

    Sampling is restricted to slots whose whole chain is in the valid
    window (neither beyond the newest write nor overwritten), uniform
    over write age.
    """
    if n_step < 1:
        raise ValueError(f"n_step must be >= 1, got {n_step}")
    cap = state.capacity
    if n_step * stride > cap:
        raise ValueError(
            f"n_step*stride={n_step * stride} exceeds capacity {cap}"
        )
    # Age-ordered index j in [0, size): slot (cursor - size + j) mod cap.
    # A chain starting at j uses j, j+stride, ..., j+(n-1)*stride, all of
    # which must stay < size.
    n_valid = jnp.maximum(state.size - (n_step - 1) * stride, 1)
    j = jax.random.randint(key, (batch_size,), 0, n_valid)
    base = (state.cursor - state.size + j) % cap  # [B]
    offs = jnp.arange(n_step, dtype=jnp.int32) * stride  # [n]
    slots = (base[:, None] + offs[None, :]) % cap  # [B, n]

    rewards = state.data["reward"][slots]  # [B, n]
    dones = state.data["done"][slots].astype(rewards.dtype)  # [B, n]
    # cont[k] = prod_{l<k} (1-done_l): 1, (1-d0), (1-d0)(1-d1), ...
    cont = jnp.cumprod(1.0 - dones, axis=1)
    cont_before = jnp.concatenate(
        [jnp.ones_like(cont[:, :1]), cont[:, :-1]], axis=1
    )
    discounts = gamma ** jnp.arange(n_step, dtype=rewards.dtype)
    reward_n = jnp.sum(rewards * cont_before * discounts, axis=1)
    done_any = cont[:, -1] < 0.5

    first = jax.tree.map(lambda buf: buf[slots[:, 0]], state.data)
    return {
        **first,
        "reward": reward_n,
        "done": done_any,
        "next_board": state.data["next_board"][slots[:, -1]],
    }


def replay_filled(state: ReplayState) -> jax.Array:
    """True once the buffer has wrapped (reference ``filled()``,
    ``replay.py:15-16`` — its train-trigger condition)."""
    return state.size >= state.capacity

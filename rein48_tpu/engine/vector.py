# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Lockstep vectorized 2048 engine with auto-reset.

This is the workhorse the reference never had: where the reference steps
one Python ``Game`` per A3C worker thread (``a3c.py:182,204``), this engine
steps B boards per device in one fused XLA program and keeps stepping them
forever — boards that finish an episode are reset in-place (one fresh
random tile, matching ``Game.reset``'s single spawn, ``GameClient.py:33-38``)
so the batch never degenerates.

Design invariant: every environment owns its PRNG key (``core.EnvState``),
so a board's trajectory is a pure function of (initial key, action
sequence). Consequences:

* **B-invariance** — env ``i`` of a 16k batch steps bit-identically to the
  same env run solo (tested in ``tests/test_vector.py``).
* **Sharding-invariance** — sharding the batch axis over a
  ``jax.sharding.Mesh`` cannot change results, because no randomness is
  shaped over the batch; collective-free stepping.

The step also returns per-board episode metrics sampled at the reset
boundary (final tile-sum score, episode length, max tile) so training loops
can log learning curves without host round-trips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rein48_tpu.engine import core
from rein48_tpu.engine.core import EnvState, RewardMode


@struct.dataclass
class StepOutput:
    """Per-step transition record emitted by :func:`step_autoreset`.

    Attributes:
        reward: ``float32[B]`` reward paid this step (mode-dependent).
        done: ``bool[B]`` True where an episode ended this step (the state
            returned alongside has already been reset at those slots).
        changed: ``bool[B]`` whether the move changed the board (illegal
            moves are no-ops, matching ``GameClient.py:48-49``).
        episode_score: ``float32[B]`` cumulative merge score of the episode
            that just ended (valid where ``done``).
        episode_tile_sum: ``float32[B]`` reference-style score
            (``np.sum(state_matrix)``, ``main.py:48``) of the ended episode.
        episode_length: ``int32[B]`` length of the ended episode.
        max_tile: ``float32[B]`` largest tile value of the ended episode.
    """

    reward: jax.Array
    done: jax.Array
    changed: jax.Array
    episode_score: jax.Array
    episode_tile_sum: jax.Array
    episode_length: jax.Array
    max_tile: jax.Array


@functools.partial(jax.jit, static_argnums=(1,))
def reset_batch(key: jax.Array, batch_size: int) -> EnvState:
    """Fresh batch of B independent boards, each with its own key.

    Jitted: the eager vmap dispatches thousands of tiny ops, which is
    catastrophic over this environment's TPU tunnel (~10 min at B=64k vs
    seconds jitted).
    """
    keys = jax.random.split(key, batch_size)
    return jax.vmap(core.reset)(keys)


def _step_autoreset_single(
    state: EnvState, action: jax.Array, reward_mode: RewardMode
) -> Tuple[EnvState, StepOutput]:
    """Unbatched autoreset step; :func:`step_autoreset` vmaps this.

    RNG economy: the step's four random decisions (spawn cell, spawn
    value, reset cell, reset value) are all derived from ONE 4-word
    ``jax.random.bits`` draw instead of per-decision key splits + uniforms
    — threefry passes dominate the step cost on TPU (measured ~2.4x
    engine throughput from this alone), and a single per-step draw keeps
    the per-env stream property (trajectory = f(initial key, actions))
    that B-invariance and sharding-invariance rest on.
    """
    key, sub = jax.random.split(state.key)
    bits = jax.random.bits(sub, (4,), dtype=jnp.uint32)
    return _step_autoreset_from_bits(state, key, action, bits, reward_mode)


def _step_autoreset_from_bits(
    state: EnvState,
    new_key: jax.Array,
    action: jax.Array,
    bits: jax.Array,
    reward_mode: RewardMode,
) -> Tuple[EnvState, StepOutput]:
    """Autoreset step body with randomness supplied as 4 uint32 words."""
    key = new_key
    moved, merge_score, changed = core.move_boards(state.boards, action)
    n_blanks = jnp.sum(moved == 0).astype(jnp.int32)
    moved = core.place_tile(
        moved,
        core.spawn_rank_from_bits(bits[0], n_blanks),
        core.spawn_exp_from_bits(bits[1]),
        changed,
    )
    done = core.is_game_over(moved)

    episode_score = state.score + merge_score
    episode_tile_sum = core.board_tile_sum(moved)
    episode_length = state.steps + 1
    max_tile = jnp.exp2(jnp.max(moved).astype(jnp.float32))

    # In-place reset of a finished board: zero board + one random tile.
    fresh = core.place_tile(
        jnp.zeros_like(moved),
        core.spawn_rank_from_bits(bits[2], jnp.asarray(core.NUM_CELLS)),
        core.spawn_exp_from_bits(bits[3]),
        done,
    )
    board = jnp.where(done, fresh, moved)

    new_state = EnvState(
        boards=board,
        key=key,
        done=jnp.zeros_like(done),
        score=jnp.where(done, 0.0, episode_score),
        steps=jnp.where(done, 0, episode_length),
    )
    if reward_mode == RewardMode.PARITY_ZERO:
        reward = jnp.zeros_like(merge_score)
    else:
        reward = merge_score
    out = StepOutput(
        reward=reward,
        done=done,
        changed=changed,
        episode_score=jnp.where(done, episode_score, 0.0),
        episode_tile_sum=jnp.where(done, episode_tile_sum, 0.0),
        episode_length=jnp.where(done, episode_length, 0),
        max_tile=jnp.where(done, max_tile, 0.0),
    )
    return new_state, out


def step_autoreset(
    state: EnvState,
    actions: jax.Array,
    reward_mode: RewardMode = RewardMode.MERGE_SCORE,
) -> Tuple[EnvState, StepOutput]:
    """Step every board; reset finished boards in-place.

    Args:
        state: batched :class:`EnvState` (leading axis B).
        actions: ``int32[B]``.
        reward_mode: static reward channel selection.

    Returns:
        ``(new_state, StepOutput)``. ``new_state.boards`` at done slots hold
        the *next* episode's opening board; the episode's terminal metrics
        are in the :class:`StepOutput`.
    """
    return jax.vmap(lambda s, a: _step_autoreset_single(s, a, reward_mode))(
        state, actions
    )


def step_batch(
    state: EnvState,
    actions: jax.Array,
    reward_mode: RewardMode = RewardMode.MERGE_SCORE,
):
    """Batched plain step (no auto-reset): vmap of ``core.step``."""
    return jax.vmap(lambda s, a: core.step(s, a, reward_mode))(state, actions)


def _random_action_step(state: EnvState, reward_mode: RewardMode):
    """Uniform-random action and env step from ONE 5-word bits draw."""
    key, sub = jax.random.split(state.key)
    bits = jax.random.bits(sub, (5,), dtype=jnp.uint32)
    action = (bits[4] & 3).astype(jnp.int32)
    return _step_autoreset_from_bits(state, key, action, bits[:4], reward_mode)


@functools.partial(jax.jit, static_argnums=(1, 2))
def rollout_random(
    state: EnvState,
    num_steps: int,
    reward_mode: RewardMode = RewardMode.MERGE_SCORE,
):
    """Scan ``num_steps`` of uniform-random actions over the whole batch.

    The batched analogue of the reference's rand-control play loop
    (``main.py:36-42`` with ``control/rand.py``), used by the benchmark and
    the vmap-consistency tests. Entirely on device: one ``lax.scan`` whose
    carry is the env state; actions come from each env's own key stream, so
    the rollout is bit-identical at any batch size.

    Returns:
        ``(final_state, outputs)`` with outputs stacked along a leading time
        axis (``StepOutput`` of shape ``[T, B]``).
    """

    def body(st, _):
        return jax.vmap(lambda s: _random_action_step(s, reward_mode))(st)

    return jax.lax.scan(body, state, None, length=num_steps)

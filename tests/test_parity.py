# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Fixed-seed trajectory parity: JAX engine == oracle == actual reference.

Three layers of parity (BASELINE.md graded config #1):

1. ``OracleGame`` (our clean-room reference-semantics Python) vs the ACTUAL
   reference code imported from ``/root/reference`` — same seed, same
   global-RNG call order, bit-identical boards every step.
2. The JAX LUT engine, driven with the oracle's captured spawn decisions
   (``place_tile``), vs the oracle — bit-identical boards every step.
3. Therefore JAX engine == reference, transitively, for entire random-policy
   games.
"""

import random
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from rein48_tpu.engine import core, oracle

REFERENCE_PATH = "/root/reference"


def _load_reference_game():
    """Import the reference Game class, if the reference tree is mounted."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        from game.GameClient import Game  # noqa: PLC0415

        return Game
    except Exception:  # pragma: no cover - reference absent in some envs
        return None


def _play_reference(seed: int, max_steps: int):
    """Seed the global RNG and play the reference with its own Rand policy.

    Reproduces ``main.py:36-42`` + ``control/rand.py``: per step one
    ``randint(0,3)`` for the action, then ``Game.step``.
    """
    Game = _load_reference_game()
    if Game is None:
        pytest.skip("reference tree not available")
    random.seed(seed)
    game = Game()
    boards = [[row[:] for row in game.state_matrix]]
    names = ("UP", "DOWN", "LEFT", "RIGHT")
    done = False
    steps = 0
    while not done and steps < max_steps:
        action = names[random.randint(0, 3)]
        state, _, done = game.step(action)
        boards.append([row[:] for row in state])
        steps += 1
    return boards, done


def _play_oracle(seed: int, max_steps: int):
    rng = random.Random(seed)
    game = oracle.OracleGame(rng=rng)
    boards = [[row[:] for row in game.state_matrix]]
    done = False
    steps = 0
    while not done and steps < max_steps:
        action = oracle.random_action(rng)
        state, _, done = game.step(action)
        boards.append([row[:] for row in state])
        steps += 1
    return boards, done, game.spawn_log


@pytest.mark.parametrize("seed", [0, 1, 7, 12345])
def test_oracle_matches_actual_reference(seed):
    """Layer 1: oracle == the real /root/reference code, whole games."""
    ref_boards, ref_done = _play_reference(seed, max_steps=3000)
    ora_boards, ora_done, _ = _play_oracle(seed, max_steps=3000)
    assert len(ref_boards) == len(ora_boards)
    assert ref_done == ora_done
    for t, (rb, ob) in enumerate(zip(ref_boards, ora_boards)):
        assert rb == ob, f"divergence at step {t}"


@pytest.mark.parametrize("seed", [0, 3, 99])
def test_engine_matches_oracle_with_replayed_spawns(seed):
    """Layer 2: LUT engine driven by captured spawn decisions == oracle."""
    rng = random.Random(seed)
    game = oracle.OracleGame(rng=rng)
    spawn_iter = iter(game.spawn_log)

    # Rebuild the opening board by replaying the reset spawn into JAX.
    board = jnp.zeros((4, 4), dtype=jnp.uint8)
    d = next(spawn_iter)
    board = core.place_tile(
        board, jnp.asarray(d.rank), jnp.asarray(d.value_exp), jnp.asarray(True)
    )
    np.testing.assert_array_equal(
        np.asarray(core.boards_to_values(board)), np.asarray(game.state_matrix)
    )

    done = False
    steps = 0
    while not done and steps < 2000:
        action = oracle.random_action(rng)
        act_idx = core.ACTION_ALIASES[action]
        prev_spawns = len(game.spawn_log)
        state, _, done = game.step(action)

        new_board, _, changed = core.move_boards(board, jnp.asarray(act_idx))
        if len(game.spawn_log) > prev_spawns:
            assert bool(changed), "oracle spawned but engine saw no change"
            d = game.spawn_log[-1]
            new_board = core.place_tile(
                new_board,
                jnp.asarray(d.rank),
                jnp.asarray(d.value_exp),
                jnp.asarray(True),
            )
        else:
            assert not bool(changed) or oracle.has_table_filled(state)
        board = new_board
        np.testing.assert_array_equal(
            np.asarray(core.boards_to_values(board)),
            np.asarray(state),
            err_msg=f"divergence at step {steps}",
        )
        assert bool(core.is_game_over(board)) == done
        steps += 1
    assert done, "game should terminate within 2000 random steps"

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Expectimax planner tests (control/search.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rein48_tpu.control import search
from rein48_tpu.engine import core, vector
from rein48_tpu.train.evaluate import evaluate_search


def _random_boards(key, n):
    """Plausible mid-game boards: exponents 0..10, ~half empty."""
    k1, k2 = jax.random.split(key)
    exps = jax.random.randint(k1, (n, 4, 4), 1, 11).astype(jnp.uint8)
    keep = jax.random.bernoulli(k2, 0.5, (n, 4, 4))
    return jnp.where(keep, exps, 0).astype(jnp.uint8)


class TestChanceChildren:
    def test_probs_sum_to_one_with_blanks(self):
        boards = _random_boards(jax.random.key(0), 64)
        has_blank = jnp.any(boards.reshape(64, 16) == 0, axis=-1)
        _, probs = search._chance_children(boards)
        sums = jnp.sum(probs, axis=-1)
        np.testing.assert_allclose(
            np.asarray(sums)[np.asarray(has_blank)], 1.0, rtol=1e-6
        )

    def test_children_match_place_tile_semantics(self):
        board = jnp.asarray(
            [[1, 0, 2, 0], [0, 3, 0, 0], [0, 0, 0, 0], [4, 0, 0, 5]],
            jnp.uint8,
        )[None]
        children, probs = search._chance_children(board)
        blanks = np.asarray(board[0].reshape(16) == 0)
        n = blanks.sum()
        for c in range(16):
            p2 = float(probs[0, c])
            p4 = float(probs[0, 16 + c])
            if blanks[c]:
                assert p2 == pytest.approx(0.9 / n)
                assert p4 == pytest.approx(0.1 / n)
                # child places exponent 1 (tile 2) / 2 (tile 4) at cell c
                assert int(children[0, c].reshape(16)[c]) == 1
                assert int(children[0, 16 + c].reshape(16)[c]) == 2
            else:
                assert p2 == 0.0 and p4 == 0.0


class TestHeuristic:
    def test_symmetry_invariant(self):
        boards = _random_boards(jax.random.key(1), 32)
        h = search.heuristic(boards)
        for sym in (
            lambda b: jnp.flip(b, -1),
            lambda b: jnp.flip(b, -2),
            lambda b: jnp.swapaxes(b, -1, -2),
            lambda b: jnp.flip(jnp.flip(b, -1), -2),
        ):
            np.testing.assert_allclose(
                np.asarray(search.heuristic(sym(boards))), np.asarray(h), rtol=1e-6
            )

    def test_prefers_merged_corner_stack(self):
        snake = jnp.asarray(
            [[10, 9, 8, 7], [3, 4, 5, 6], [2, 1, 0, 0], [0, 0, 0, 0]],
            jnp.uint8,
        )[None]
        scattered = jnp.asarray(
            [[0, 9, 0, 7], [3, 0, 10, 6], [2, 1, 0, 4], [8, 0, 5, 0]],
            jnp.uint8,
        )[None]
        assert float(search.heuristic(snake)[0]) > float(
            search.heuristic(scattered)[0]
        )


class TestPolicy:
    def test_actions_always_legal_when_possible(self):
        boards = _random_boards(jax.random.key(2), 128)
        actions = search.expectimax_policy(boards, depth=1)
        legal = core.legal_action_mask(boards)
        has_legal = np.asarray(jnp.any(legal, axis=-1))
        chosen = np.asarray(
            jnp.take_along_axis(legal, actions[:, None], axis=-1)[:, 0]
        )
        assert chosen[has_legal].all()

    def test_takes_winning_merge_over_junk_move(self):
        # Two 1024 tiles side by side: LEFT/RIGHT merges to 2048; the
        # heuristic and reward must make the planner take a merge move.
        board = jnp.asarray(
            [[11, 11, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
            jnp.uint8,
        )[None]
        action = int(search.expectimax_policy(board, depth=1)[0])
        after, reward, _ = core.move_boards(
            board, jnp.asarray([action], jnp.int32)
        )
        assert int(jnp.max(after)) == 12  # made the 2048 tile
        assert float(reward[0]) == 4096.0

    def test_beats_random_play(self):
        # Same budget of lockstep steps; compare board progress (max tile
        # exponent reached on each board).
        n, steps = 24, 256
        st0 = vector.reset_batch(jax.random.key(3), n)

        def roll_search(st):
            def body(s, _):
                a = search.expectimax_policy(s.boards, 1)
                s, out = vector.step_autoreset(s, a)
                return s, out.max_tile

            return jax.lax.scan(body, st, None, length=steps)

        final_s, tiles_s = jax.jit(roll_search)(st0)
        final_r, outs = vector.rollout_random(st0, steps)
        # Expectimax envs should still be mid-episode (few deaths) with
        # much higher scores than random play.
        assert float(jnp.mean(final_s.score)) > 2.0 * float(
            jnp.mean(final_r.score)
        )

    def test_eval_search_runs_and_reports(self):
        stats = evaluate_search(depth=1, num_envs=8, num_steps=64, seed=0)
        assert set(stats) >= {"episodes", "best_tile", "frac_2048"}
        assert np.isfinite(list(stats.values())).all()

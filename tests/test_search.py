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


class TestValueGuidedSearch:
    """make_expectimax_policy with a learned critic leaf (the planner's
    AlphaZero-style mode; the reference has no planner at all)."""

    def test_constant_leaf_reduces_to_greedy_reward(self):
        """With a constant leaf and gamma=1, the depth-1 planner picks
        the action with the largest immediate (transformed) reward."""
        boards = _random_boards(jax.random.key(5), 32)
        policy = search.make_expectimax_policy(
            1, leaf_value=lambda b: jnp.zeros(b.shape[:-2]), gamma=0.0
        )
        actions = jax.jit(policy)(boards)
        _, rewards, legal = search._afterstates(boards)
        q = jnp.where(legal, rewards, -jnp.inf)
        q = jnp.where(~jnp.any(legal, -1, keepdims=True), 0.0, q)
        np.testing.assert_array_equal(
            np.asarray(actions), np.asarray(jnp.argmax(q, -1))
        )

    def test_value_leaf_handles_tree_ranks(self):
        """make_value_leaf must accept the search's stacked board ranks."""
        from rein48_tpu.models import nets

        model = nets.make_model("mlp")
        boards = _random_boards(jax.random.key(6), 4)
        from rein48_tpu.train import common

        obs = common.encode_obs(boards, "onehot")
        params = model.init(jax.random.key(0), obs)["params"]
        leaf = search.make_value_leaf(model, params, "onehot")
        v1 = leaf(boards)  # [4]
        v2 = leaf(boards.reshape(2, 2, 4, 4))  # stacked rank
        assert v1.shape == (4,)
        np.testing.assert_allclose(
            np.asarray(v2).reshape(4), np.asarray(v1), rtol=1e-6
        )

    def test_evaluate_search_with_value_leaf(self):
        from rein48_tpu.models import nets
        from rein48_tpu.train import common

        model = nets.make_model("mlp")
        obs = common.encode_obs(jnp.zeros((1, 4, 4), jnp.uint8), "onehot")
        params = model.init(jax.random.key(1), obs)["params"]
        stats = evaluate_search(
            depth=1, num_envs=8, num_steps=64, seed=0,
            model=model, params=params,
        )
        assert stats["episodes"] >= 0
        assert np.isfinite(stats["avg_tile_sum"])


class TestDeathValue:
    def test_dead_node_takes_death_value(self):
        """A board with no legal move is worth exactly death_value."""
        dead = jnp.asarray(
            np.array(
                [[1, 2, 1, 2], [2, 1, 2, 1], [1, 2, 1, 2], [2, 1, 2, 1]],
                np.uint8,
            )
        )
        for dv in (0.0, search.DEATH_VALUE):
            v = search._value_max(
                dead[None], 0, search.heuristic, lambda r: r, 1.0, dv
            )
            assert float(v[0]) == float(np.float32(dv))

    def test_value_guided_evaluate_uses_zero_death(self):
        """evaluate_search's value-guided policy must not mix the huge
        heuristic DEATH_VALUE into critic-unit backups (ADVICE #3): with
        a constant-zero critic every Q is just the (transformed) merge
        reward — finite and small — even when some chance children die."""
        from rein48_tpu.train import evaluate

        boards = jnp.asarray(
            np.array(
                [[[5, 4, 3, 2], [4, 3, 2, 1], [3, 2, 1, 0], [2, 1, 0, 0]]],
                np.uint8,
            )
        )
        zero_leaf = lambda b: jnp.zeros(b.shape[:-2], jnp.float32)
        q, legal = search._action_values(
            boards, 1, zero_leaf, lambda r: jnp.log2(1.0 + r), 0.99,
            death_value=0.0,
        )
        q = np.asarray(jnp.where(legal, q, 0.0))
        assert np.all(np.isfinite(q))
        assert np.all(np.abs(q) < 100.0)


class TestChanceChunking:
    """chance_chunk serializes the chance expansion with identical math
    (the TPU-safe depth-1 shape; see search._value_chance)."""

    @pytest.mark.parametrize("chunk", [4, 8, 16])
    def test_chunked_q_matches_fused(self, chunk):
        boards = _random_boards(jax.random.key(5), 32)
        q_fused, legal_fused = search._action_values(
            boards, 1, search.heuristic, lambda r: r, 1.0
        )
        q_chunk, legal_chunk = search._action_values(
            boards, 1, search.heuristic, lambda r: r, 1.0,
            chance_chunk=chunk,
        )
        np.testing.assert_array_equal(
            np.asarray(legal_fused), np.asarray(legal_chunk)
        )
        np.testing.assert_allclose(
            np.asarray(q_fused), np.asarray(q_chunk), rtol=1e-6, atol=1e-3
        )

    def test_chunked_policy_identical_actions(self):
        boards = _random_boards(jax.random.key(6), 64)
        fused = search.make_expectimax_policy(1)(boards)
        chunked = search.make_expectimax_policy(1, chance_chunk=8)(boards)
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(chunked))

    def test_chunked_ntuple_eval_matches(self):
        """The n-tuple depth-1 eval path gives identical actions chunked."""
        from rein48_tpu.agents import ntuple as ntuple_lib
        from rein48_tpu.train.ntuple import (
            NTupleTrainConfig,
            _get_ntuple_policy,
            init_ntuple,
        )

        cfg = NTupleTrainConfig(tuples=ntuple_lib.TINY_2X3, batch_size=16)
        state, net = init_ntuple(cfg, jax.random.key(0))
        # Non-trivial tables so the argmax is informative.
        params = {
            k: v + jax.random.normal(jax.random.key(i), v.shape)
            for i, (k, v) in enumerate(state.params.items())
        }
        boards = _random_boards(jax.random.key(7), 24)
        p_fused = _get_ntuple_policy(cfg.network_config(), 1)
        p_chunk = _get_ntuple_policy(cfg.network_config(), 1, 8)
        np.testing.assert_array_equal(
            np.asarray(p_fused(params, boards)),
            np.asarray(p_chunk(params, boards)),
        )

    def test_bad_chunk_raises(self):
        boards = _random_boards(jax.random.key(8), 4)
        with pytest.raises(ValueError):
            search._action_values(
                boards, 1, search.heuristic, lambda r: r, 1.0,
                chance_chunk=5,
            )

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Tests for the lockstep vector engine (`rein48_tpu/engine/vector.py`).

Pins the properties that make the batched engine trustworthy at 16k boards
(BASELINE.md graded config #2): auto-reset semantics, episode-metric
emission, and bit-exact batch-size invariance (env i of a big batch ==
the same env stepped alone).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rein48_tpu.engine import core, vector


def _state_slice(state, i):
    """Extract env i of a batched EnvState as an unbatched EnvState."""
    return jax.tree.map(lambda x: x[i], state)


class TestAutoReset:
    def test_reset_batch_shapes(self):
        st = vector.reset_batch(jax.random.key(0), 32)
        assert st.boards.shape == (32, 4, 4)
        assert st.done.shape == (32,)
        counts = (np.asarray(st.boards) != 0).sum(axis=(1, 2))
        np.testing.assert_array_equal(counts, np.ones(32))

    def test_independent_opening_boards(self):
        st = vector.reset_batch(jax.random.key(1), 256)
        flat = (np.asarray(st.boards) != 0).reshape(256, 16)
        positions = flat.argmax(axis=1)
        # 256 envs over 16 cells: every cell should be hit at least once.
        assert len(set(positions.tolist())) == 16

    def test_done_board_is_reset_in_place(self):
        """Step until some episode naturally ends; check the reset slot."""
        B = 64
        st = vector.reset_batch(jax.random.key(2), B)
        step = jax.jit(
            lambda s, k: vector.step_autoreset(
                s, jax.random.randint(k, (B,), 0, core.NUM_ACTIONS)
            )
        )
        key = jax.random.key(100)
        for t in range(1500):
            key, akey = jax.random.split(key)
            prev_steps = np.asarray(st.steps)
            st, out = step(st, akey)
            done = np.asarray(out.done)
            if done.any():
                i = int(np.where(done)[0][0])
                # State slot holds the NEXT episode's opening board.
                vals = np.asarray(core.boards_to_values(st.boards[i]))
                assert (vals != 0).sum() == 1
                assert float(st.score[i]) == 0.0
                assert int(st.steps[i]) == 0
                # Terminal metrics reported.
                assert float(out.episode_score[i]) > 0.0
                assert int(out.episode_length[i]) == prev_steps[i] + 1
                assert float(out.max_tile[i]) >= 8.0
                assert float(out.episode_tile_sum[i]) > 0
                return
        raise AssertionError("no episode ended in 1500 random steps")

    def test_not_done_metrics_are_zero(self):
        st = vector.reset_batch(jax.random.key(3), 8)
        st2, out = vector.step_autoreset(
            st, jnp.zeros((8,), jnp.int32)
        )
        live = ~np.asarray(out.done)
        assert np.all(np.asarray(out.episode_score)[live] == 0.0)
        assert np.all(np.asarray(out.episode_length)[live] == 0)


class TestBatchInvariance:
    def test_env_slice_matches_solo_run(self):
        """Env i of B=64 steps bit-identically to the same env at B=1."""
        B = 64
        T = 40
        st0 = vector.reset_batch(jax.random.key(7), B)
        _, big = vector.rollout_random(st0, T)

        for i in (0, 13, 63):
            solo0 = jax.tree.map(lambda x: x[i : i + 1], st0)
            _, small = vector.rollout_random(solo0, T)
            np.testing.assert_array_equal(
                np.asarray(small.reward[:, 0]), np.asarray(big.reward[:, i])
            )
            np.testing.assert_array_equal(
                np.asarray(small.done[:, 0]), np.asarray(big.done[:, i])
            )
            np.testing.assert_array_equal(
                np.asarray(small.episode_score[:, 0]),
                np.asarray(big.episode_score[:, i]),
            )

    def test_step_autoreset_matches_core_step_when_not_done(self):
        """Until the first done, autoreset == plain move+spawn semantics.

        Pins the key schedule: ONE split advances the env key, and the
        spawn cell/value come from a 4-word ``jax.random.bits`` draw on the
        subkey via the shared fixed-point helpers (the threefry-economical
        schedule; see vector._step_autoreset_single)."""
        st = vector.reset_batch(jax.random.key(11), 4)
        actions = jnp.asarray([0, 1, 2, 3])
        st_auto, out = vector.step_autoreset(st, actions)
        live = ~np.asarray(out.done)
        assert live.any()
        for i in range(4):
            if not live[i]:
                continue
            _, sub = jax.random.split(st.key[i])
            bits = jax.random.bits(sub, (4,), dtype=jnp.uint32)
            moved, _, changed = core.move_boards(st.boards[i], actions[i])
            n_blanks = jnp.sum(moved == 0).astype(jnp.int32)
            moved = core.place_tile(
                moved,
                core.spawn_rank_from_bits(bits[0], n_blanks),
                core.spawn_exp_from_bits(bits[1]),
                changed,
            )
            np.testing.assert_array_equal(
                np.asarray(st_auto.boards[i]), np.asarray(moved)
            )


class TestRollout:
    def test_rollout_shapes_and_progress(self):
        B, T = 128, 100
        st = vector.reset_batch(jax.random.key(0), B)
        final, out = vector.rollout_random(st, T)
        assert out.reward.shape == (T, B)
        assert out.done.shape == (T, B)
        # Random play for 100 steps should change boards and accrue score.
        assert np.asarray(out.changed).mean() > 0.5
        assert float(np.asarray(final.score).mean()) > 0.0

    def test_rollout_jit_cache(self):
        st = vector.reset_batch(jax.random.key(0), 16)
        f1, _ = vector.rollout_random(st, 10)
        f2, _ = vector.rollout_random(st, 10)
        np.testing.assert_array_equal(np.asarray(f1.boards), np.asarray(f2.boards))

    def test_episodes_complete_under_random_play(self):
        """Long random rollouts must terminate episodes and report metrics."""
        B, T = 64, 600
        st = vector.reset_batch(jax.random.key(21), B)
        _, out = vector.rollout_random(st, T)
        dones = np.asarray(out.done)
        assert dones.sum() > 0, "no episode finished in 600 random steps"
        scores = np.asarray(out.episode_tile_sum)[dones]
        assert (scores > 0).all()

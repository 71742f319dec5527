# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Tests for the reference-compatible `Game` wrapper and `EnvSpec`."""

import numpy as np
import pytest

import rein48_tpu
from rein48_tpu import Game
from rein48_tpu.engine import render
from rein48_tpu.spec import DEFAULT_SPEC


class TestGameWrapper:
    def test_reset_returns_board_with_one_tile(self):
        game = Game(seed=0)
        state = game.reset()
        assert state.shape == (4, 4)
        assert (state != 0).sum() == 1

    def test_step_accepts_all_reference_aliases(self):
        for alias in ["UP", "Up", "U", "up", "u", 0, "DOWN", "d", 1, "l", 2, "R", 3]:
            game = Game(seed=1)
            state, reward, done = game.step(alias)
            assert state.shape == (4, 4)
            assert isinstance(reward, float)
            assert isinstance(done, bool)

    def test_step_rejects_garbage(self):
        game = Game(seed=2)
        with pytest.raises(ValueError):
            game.step("sideways")
        with pytest.raises(ValueError):
            game.step(7)

    def test_parity_zero_reward_default(self):
        """Default reward mode replicates GameClient.py:138 (always 0)."""
        game = Game(seed=3)
        for a in ["U", "D", "L", "R"] * 10:
            _, reward, done = game.step(a)
            assert reward == 0.0
            if done:
                break

    def test_merge_score_mode_pays(self):
        from rein48_tpu.engine.core import RewardMode

        game = Game(seed=4, reward_mode=RewardMode.MERGE_SCORE)
        total = 0.0
        for a in ["U", "L", "D", "R"] * 50:
            _, reward, done = game.step(a)
            total += reward
            if done:
                break
        assert total > 0.0

    def test_seeded_games_reproduce(self):
        g1, g2 = Game(seed=42), Game(seed=42)
        for a in ["U", "L", "D", "R"] * 25:
            s1, _, d1 = g1.step(a)
            s2, _, d2 = g2.step(a)
            np.testing.assert_array_equal(s1, s2)
            assert d1 == d2
            if d1:
                break

    def test_spec_attribute_spellings(self):
        """Both reference-style and DDPG-style names work (fixes the
        reference's agent.py:12-14 vs GameClient.py:21-27 mismatch)."""
        game = Game(seed=0)
        assert game.action_space_size == game.action_size == 4
        assert game.state_space_size == game.state_size == 4
        assert game.reward_space_size == game.reward_size == 1
        assert DEFAULT_SPEC.num_cells == 16

    def test_size_clamp_matches_reference(self):
        """Sizes < 4 clamp to 4 (GameClient.py:24-27); > 4 rejected."""
        game = Game(table_matrix_size=2, seed=0)
        assert game.state_matrix.shape == (4, 4)
        with pytest.raises(NotImplementedError):
            Game(table_matrix_size=5)

    def test_legal_actions_mask(self):
        game = Game(seed=6)
        mask = game.legal_actions
        assert mask.shape == (4,)
        assert mask.any()

    def test_version(self):
        assert rein48_tpu.__version__


class TestRender:
    def test_render_layout(self):
        out = render.render_values([[2, 0], [16, 2048]])
        lines = out.split("\n")
        assert lines[0] == "-" * 15
        assert "2" in lines[1] and "|" in lines[1]
        assert "2048" in lines[3]

    def test_game_render(self):
        game = Game(seed=0)
        text = game.render()
        assert text.count("|") > 0
        Game.print_terminal(game.state_matrix)

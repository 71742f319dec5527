# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Native (C) oracle tests: CPython-RNG bit parity and game parity.

The C oracle (``rein48_tpu/native/oracle.c``) must be indistinguishable
from the Python oracle (``engine/oracle.py``) — same MT19937 stream as
``random.Random``, same game semantics, same RNG call order — because
the parity harness treats them interchangeably. All tests skip if no C
compiler is available (graceful-degradation contract).
"""

import random

import pytest

from rein48_tpu import native
from rein48_tpu.engine import oracle as pyo

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler for the native oracle"
)


class TestRngParity:
    @pytest.mark.parametrize("seed", [0, 1, 42, 123456789, 2**40 + 17])
    def test_randint_uniform_random_streams_match_cpython(self, seed):
        py = random.Random(seed)
        c = native.NativeRandom(seed)
        for _ in range(500):
            assert py.randint(0, 15) == c.randint(0, 15)
            assert py.uniform(0.0, 1.0) == c.uniform(0.0, 1.0)
            assert py.random() == c.random()

    def test_getrandbits_matches(self):
        py = random.Random(99)
        c = native.NativeRandom(99)
        for k in (1, 3, 8, 16, 31, 32):
            for _ in range(50):
                assert py.getrandbits(k) == c.getrandbits(k)

    def test_randbelow_rejection_path(self):
        """Non-power-of-two bounds exercise the rejection loop; mixed
        call patterns keep the two streams aligned."""
        py = random.Random(7)
        c = native.NativeRandom(7)
        for n in (3, 5, 6, 7, 9, 100, 1000):
            for _ in range(100):
                assert py.randint(0, n - 1) == c.randint(0, n - 1)


class TestGameParity:
    @pytest.mark.parametrize("seed", range(4))
    def test_whole_game_matches_python_oracle(self, seed):
        rng = random.Random(seed)
        g_py = pyo.OracleGame(rng=rng)
        g_c = native.NativeOracleGame(seed)
        assert g_py.state_matrix == g_c.state_matrix
        done, steps = False, 0
        names = ("UP", "DOWN", "LEFT", "RIGHT")
        while not done and steps < 4000:
            a_py = pyo.random_action(rng)
            a_c = g_c.random_action()
            assert names[a_c] == a_py
            s_py, r_py, d_py = g_py.step(a_py)
            s_c, r_c, d_c = g_c.step(a_c)
            assert s_py == s_c, f"diverged at step {steps}"
            assert (r_py, d_py) == (r_c, d_c)
            done = d_c
            steps += 1
        assert done, "game should finish under random play"

    def test_spawn_capture_matches(self):
        """last_spawn mirrors the Python oracle's SpawnDecision log."""
        seed = 11
        rng = random.Random(seed)
        g_py = pyo.OracleGame(rng=rng)
        g_c = native.NativeOracleGame(seed)
        d = g_py.spawn_log[-1]
        assert g_c.last_spawn == (d.rank, d.value_exp)
        assert g_c.spawn_count == len(g_py.spawn_log)
        for _ in range(50):
            a = pyo.random_action(rng)
            g_c.random_action()
            g_py.step(a)
            g_c.step(a)
            if g_py.spawn_log:
                d = g_py.spawn_log[-1]
                assert g_c.last_spawn == (d.rank, d.value_exp)
            assert g_c.spawn_count == len(g_py.spawn_log)

    def test_play_random_full_game(self):
        g = native.NativeOracleGame(3)
        steps = g.play_random(max_steps=100000)
        assert steps > 20
        board = g.state_matrix
        assert all(v >= 0 for row in board for v in row)
        # Terminal: board full (random play always ends by filling up).
        assert all(v != 0 for row in board for v in row)

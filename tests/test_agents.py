# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Tests for losses, returns, replay, and action selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rein48_tpu.agents import a3c, dqn, replay


class TestNStepReturns:
    def test_matches_reference_backward_pass(self):
        """Against a transliteration of a3c.py:246-256 semantics."""
        rewards = np.asarray([1.0, 2.0, 3.0, 4.0])
        bootstrap = 10.0
        gamma = 0.9

        # Correct recursion.
        want = np.zeros(4)
        acc = bootstrap
        for t in (3, 2, 1, 0):
            acc = rewards[t] + gamma * acc
            want[t] = acc
        got = a3c.n_step_returns(
            jnp.asarray(rewards), jnp.asarray(bootstrap), gamma
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_parity_drops_last_reward(self):
        """Reference quirk: list seeded with bootstrap, last reward unused
        (a3c.py:251): targets[T-1] == bootstrap exactly."""
        rewards = np.asarray([1.0, 2.0, 3.0, 4.0])
        bootstrap = 10.0
        gamma = 0.9
        got = np.asarray(
            a3c.n_step_returns(
                jnp.asarray(rewards),
                jnp.asarray(bootstrap),
                gamma,
                parity_drop_last_reward=True,
            )
        )
        # Reference loop: [10] <- r2+g*10=12 <- r1+g*12=12.8 <- r0+g*12.8
        want = np.zeros(4)
        want[3] = bootstrap
        for t in (2, 1, 0):
            want[t] = rewards[t] + gamma * want[t + 1]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_done_cuts_recursion(self):
        rewards = jnp.asarray([1.0, 1.0, 1.0, 1.0])
        dones = jnp.asarray([False, True, False, False])
        got = np.asarray(
            a3c.n_step_returns(rewards, jnp.asarray(100.0), 0.9, dones=dones)
        )
        # t=3: 1 + .9*100; t=2: 1 + .9*t3; t=1: 1 (cut); t=0: 1 + .9*1.
        assert got[1] == pytest.approx(1.0)
        assert got[0] == pytest.approx(1.9)
        assert got[3] == pytest.approx(91.0)
        assert got[2] == pytest.approx(1 + 0.9 * 91.0)

    def test_batched_shapes(self):
        out = a3c.n_step_returns(
            jnp.ones((5, 7)), jnp.zeros((7,)), 0.9, dones=jnp.zeros((5, 7), bool)
        )
        assert out.shape == (5, 7)


class TestA3CLoss:
    def test_gradient_direction(self):
        """Positive advantage must increase the chosen action's logit."""
        actions = jnp.asarray([0])
        targets = jnp.asarray([1.0])  # value estimate is 0 -> advantage +1

        def loss_of(logits):
            loss, _ = a3c.a3c_loss(
                logits[None], jnp.zeros((1,)), actions, targets,
                a3c.A3CLossConfig(entropy_beta=0.0, value_coef=0.0),
            )
            return loss

        g = jax.grad(loss_of)(jnp.zeros((4,)))
        assert g[0] < 0  # minimizing loss pushes logit 0 up
        assert np.all(np.asarray(g[1:]) > 0)

    def test_critic_loss_is_mse(self):
        logits = jnp.zeros((3, 4))
        values = jnp.asarray([1.0, 2.0, 3.0])
        targets = jnp.asarray([2.0, 2.0, 5.0])
        _, aux = a3c.a3c_loss(
            logits, values, jnp.zeros((3,), jnp.int32), targets,
            a3c.A3CLossConfig(entropy_beta=0.0),
        )
        assert float(aux["critic_loss"]) == pytest.approx((1 + 0 + 4) / 3)

    def test_entropy_max_at_uniform(self):
        _, aux_u = a3c.a3c_loss(
            jnp.zeros((1, 4)), jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,)),
        )
        _, aux_p = a3c.a3c_loss(
            jnp.asarray([[10.0, 0, 0, 0]]), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,)),
        )
        assert float(aux_u["entropy"]) == pytest.approx(np.log(4), rel=1e-4)
        assert float(aux_p["entropy"]) < 0.01

    def test_sample_actions_respects_mask(self):
        key = jax.random.key(0)
        logits = jnp.zeros((64, 4))
        mask = jnp.tile(jnp.asarray([[False, True, False, True]]), (64, 1))
        acts = np.asarray(a3c.sample_actions(key, logits, mask))
        assert set(acts.tolist()) <= {1, 3}

    def test_sample_actions_all_illegal_falls_back(self):
        key = jax.random.key(0)
        logits = jnp.zeros((8, 4))
        mask = jnp.zeros((8, 4), bool)
        acts = np.asarray(a3c.sample_actions(key, logits, mask))
        assert ((acts >= 0) & (acts < 4)).all()


class TestDQN:
    def test_loss_target_math(self):
        q = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
        q_next = jnp.asarray([[0.0, 5.0, 0.0, 0.0]])
        actions = jnp.asarray([3])
        rewards = jnp.asarray([1.0])
        cfg = dqn.DQNLossConfig(gamma=0.5, double_dqn=False, huber_delta=1e9)
        _, aux = dqn.dqn_loss(
            q, q_next, q_next, actions, rewards, jnp.asarray([False]), cfg
        )
        # target = 1 + 0.5*5 = 3.5; q_a = 4 -> td = -0.5 -> huber~0.5*td^2
        assert float(aux["target_mean"]) == pytest.approx(3.5)
        assert float(aux["q_mean"]) == pytest.approx(4.0)

    def test_done_blocks_bootstrap(self):
        q = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
        q_next = jnp.asarray([[9.0, 9.0, 9.0, 9.0]])
        _, aux = dqn.dqn_loss(
            q, q_next, q_next, jnp.asarray([0]), jnp.asarray([2.0]),
            jnp.asarray([True]), dqn.DQNLossConfig(),
        )
        assert float(aux["target_mean"]) == pytest.approx(2.0)

    def test_double_dqn_uses_online_argmax(self):
        q = jnp.zeros((1, 4))
        q_online_next = jnp.asarray([[9.0, 0.0, 0.0, 0.0]])
        q_target_next = jnp.asarray([[1.0, 0.0, 0.0, 100.0]])
        _, aux = dqn.dqn_loss(
            q, q_online_next, q_target_next, jnp.asarray([0]),
            jnp.asarray([0.0]), jnp.asarray([False]),
            dqn.DQNLossConfig(gamma=1.0, double_dqn=True),
        )
        # online argmax = 0 -> target net's Q[0] = 1, NOT 100.
        assert float(aux["target_mean"]) == pytest.approx(1.0)

    def test_epsilon_greedy_extremes(self):
        key = jax.random.key(0)
        q = jnp.tile(jnp.asarray([[0.0, 9.0, 0.0, 0.0]]), (256, 1))
        greedy = np.asarray(dqn.epsilon_greedy(key, q, jnp.asarray(0.0)))
        assert (greedy == 1).all()
        explore = np.asarray(dqn.epsilon_greedy(key, q, jnp.asarray(1.0)))
        assert len(set(explore.tolist())) > 1

    def test_polyak_keep_fraction(self):
        t = {"w": jnp.asarray(1.0)}
        o = {"w": jnp.asarray(0.0)}
        out = dqn.polyak_update(t, o, tau=0.9)
        assert float(out["w"]) == pytest.approx(0.9)


class TestReplay:
    def _example(self):
        return {
            "x": jnp.zeros((4,), jnp.float32),
            "a": jnp.asarray(0, jnp.int32),
        }

    def test_add_and_wrap(self):
        st = replay.replay_init(self._example(), capacity=8)
        batch = {
            "x": jnp.arange(24, dtype=jnp.float32).reshape(6, 4),
            "a": jnp.arange(6, dtype=jnp.int32),
        }
        st = replay.replay_add(st, batch)
        assert int(st.size) == 6 and int(st.cursor) == 6
        st = replay.replay_add(st, batch)  # wraps
        assert int(st.size) == 8 and int(st.cursor) == 4
        # Slots 4..5 hold the oldest surviving entries (a=4,5), slots
        # 6..7 and 0..3 the second batch.
        np.testing.assert_array_equal(
            np.asarray(st.data["a"]), [2, 3, 4, 5, 4, 5, 0, 1]
        )

    def test_sample_only_valid_prefix(self):
        st = replay.replay_init(self._example(), capacity=128)
        batch = {
            "x": jnp.ones((4, 4)), "a": jnp.asarray([7, 7, 7, 7], jnp.int32)
        }
        st = replay.replay_add(st, batch)
        out = replay.replay_sample(st, jax.random.key(0), 64)
        assert (np.asarray(out["a"]) == 7).all()

    def test_nstep_sample_reduction(self):
        """Hand-checked n-step chains over a 2-env strided buffer."""
        example = {
            "board": jnp.asarray(0, jnp.int32),
            "action": jnp.asarray(0, jnp.int32),
            "reward": jnp.asarray(0.0, jnp.float32),
            "next_board": jnp.asarray(0, jnp.int32),
            "done": jnp.asarray(False),
        }
        st = replay.replay_init(example, capacity=64)
        # Acting order: step t writes [env0, env1]. env1 dies at step 1.
        rewards = [(1.0, 10.0), (2.0, 20.0), (4.0, 40.0), (8.0, 80.0)]
        dones = [(False, False), (False, True), (False, False), (False, False)]
        for t, ((r0, r1), (d0, d1)) in enumerate(zip(rewards, dones)):
            st = replay.replay_add(
                st,
                {
                    "board": jnp.asarray([t * 2, t * 2 + 1], jnp.int32),
                    "action": jnp.asarray([t, t], jnp.int32),
                    "reward": jnp.asarray([r0, r1], jnp.float32),
                    "next_board": jnp.asarray(
                        [100 + t * 2, 100 + t * 2 + 1], jnp.int32
                    ),
                    "done": jnp.asarray([d0, d1]),
                },
            )
        out = replay.replay_sample_nstep(
            st, jax.random.key(0), 512, n_step=3, stride=2, gamma=0.5
        )
        # Valid chain starts: (env, t) in {(0,0),(1,0),(0,1),(1,1)}.
        # R(0,0) = 1 + .5*2 + .25*4 = 3         done=F  boot next=104
        # R(1,0) = 10 + .5*20 (cut at done) = 20 done=T
        # R(0,1) = 2 + .5*4 + .25*8 = 6          done=F  boot next=106
        # R(1,1) = 20 (done on its own step)     done=T
        expect = {
            0: (3.0, False, 104),
            1: (20.0, True, 105),
            2: (6.0, False, 106),
            3: (20.0, True, 107),
        }
        boards = np.asarray(out["board"])
        assert set(boards) == set(expect)  # only valid starts sampled
        for b, r, d, nb in zip(
            boards,
            np.asarray(out["reward"]),
            np.asarray(out["done"]),
            np.asarray(out["next_board"]),
        ):
            er, ed, enb = expect[int(b)]
            assert r == pytest.approx(er), (b, r)
            assert bool(d) == ed, (b, d)
            if not ed:  # bootstrap board only meaningful when not done
                assert int(nb) == enb, (b, nb)

    def test_nstep_one_matches_plain_sample_fields(self):
        """n_step=1 must reduce to the 1-step contract exactly."""
        example = {
            "board": jnp.asarray(0, jnp.int32),
            "reward": jnp.asarray(0.0, jnp.float32),
            "next_board": jnp.asarray(0, jnp.int32),
            "done": jnp.asarray(False),
        }
        st = replay.replay_init(example, capacity=16)
        st = replay.replay_add(
            st,
            {
                "board": jnp.arange(8, dtype=jnp.int32),
                "reward": jnp.arange(8, dtype=jnp.float32),
                "next_board": 100 + jnp.arange(8, dtype=jnp.int32),
                "done": jnp.zeros(8, bool),
            },
        )
        out = replay.replay_sample_nstep(
            st, jax.random.key(1), 64, n_step=1, stride=4, gamma=0.9
        )
        np.testing.assert_array_equal(
            np.asarray(out["reward"]), np.asarray(out["board"], np.float32)
        )
        np.testing.assert_array_equal(
            np.asarray(out["next_board"]), np.asarray(out["board"]) + 100
        )

    def test_nstep_wrapped_buffer_stays_in_window(self):
        """After wrap, chains never mix overwritten and fresh slots."""
        example = {
            "board": jnp.asarray(0, jnp.int32),
            "reward": jnp.asarray(0.0, jnp.float32),
            "next_board": jnp.asarray(0, jnp.int32),
            "done": jnp.asarray(False),
        }
        st = replay.replay_init(example, capacity=8)
        # 8 writes of 2 envs = 16 slots through a capacity-8 buffer; the
        # surviving window is writes 4..7 (slots for t=4..7).
        for t in range(8):
            st = replay.replay_add(
                st,
                {
                    "board": jnp.asarray([t, t], jnp.int32),
                    "reward": jnp.asarray([float(t), float(t)], jnp.float32),
                    "next_board": jnp.asarray([t, t], jnp.int32),
                    "done": jnp.zeros(2, bool),
                },
            )
        out = replay.replay_sample_nstep(
            st, jax.random.key(2), 256, n_step=2, stride=2, gamma=1.0
        )
        # Valid starts: t in {4, 5, 6} (t=7 has no successor yet).
        starts = np.asarray(out["board"])
        assert set(starts) <= {4, 5, 6}
        np.testing.assert_allclose(
            np.asarray(out["reward"]), starts * 2.0 + 1.0
        )  # r_t + r_{t+1} = t + (t+1)

    def test_filled_trigger(self):
        st = replay.replay_init(self._example(), capacity=4)
        assert not bool(replay.replay_filled(st))
        st = replay.replay_add(
            st, {"x": jnp.zeros((4, 4)), "a": jnp.zeros((4,), jnp.int32)}
        )
        assert bool(replay.replay_filled(st))

    def test_jit_compatible(self):
        st = replay.replay_init(self._example(), capacity=16)

        @jax.jit
        def add_and_sample(st, key):
            st = replay.replay_add(
                st, {"x": jnp.ones((4, 4)), "a": jnp.ones((4,), jnp.int32)}
            )
            return st, replay.replay_sample(st, key, 8)

        st, out = add_and_sample(st, jax.random.key(0))
        assert out["x"].shape == (8, 4)

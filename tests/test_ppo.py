# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""PPO math pins and trainer integration tests (small shapes, CPU).

The reference has no PPO (its on-policy trainer is async A3C,
``/root/reference/algorithm/a3c/a3c.py``); these tests pin the new math
against hand-computed values and against the A3C return machinery where
the two must coincide (GAE at lambda=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rein48_tpu.agents import a3c as a3c_agent
from rein48_tpu.agents import ppo as ppo_agent
from rein48_tpu.train.ppo import PPOConfig, init_ppo, make_ppo_step, train_ppo

TINY_RESNET = (("channels", 16), ("num_blocks", 1))


def _param_delta(a, b):
    return float(optax.global_norm(jax.tree.map(lambda x, y: x - y, a, b)))


class TestGAE:
    def test_lambda_one_matches_n_step_returns(self):
        """At lam=1, adv + V must equal a3c.n_step_returns exactly."""
        key = jax.random.key(0)
        T, B, gamma = 7, 5, 0.97
        kr, kv, kb, kd = jax.random.split(key, 4)
        rewards = jax.random.uniform(kr, (T, B))
        values = jax.random.normal(kv, (T, B))
        bootstrap = jax.random.normal(kb, (B,))
        dones = jax.random.bernoulli(kd, 0.2, (T, B))
        adv, ret = ppo_agent.gae(
            rewards, values, bootstrap, gamma, 1.0, dones=dones
        )
        targets = a3c_agent.n_step_returns(
            rewards, bootstrap, gamma, dones=dones
        )
        np.testing.assert_allclose(ret, targets, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(adv, targets - values, rtol=1e-5, atol=1e-5)

    def test_lambda_zero_is_one_step_td(self):
        """At lam=0, adv[t] = r[t] + gamma*cont*V[t+1] - V[t] exactly."""
        T, B, gamma = 4, 3, 0.9
        key = jax.random.key(1)
        kr, kv, kb = jax.random.split(key, 3)
        rewards = jax.random.uniform(kr, (T, B))
        values = jax.random.normal(kv, (T, B))
        bootstrap = jax.random.normal(kb, (B,))
        adv, _ = ppo_agent.gae(rewards, values, bootstrap, gamma, 0.0)
        nxt = jnp.concatenate([values[1:], bootstrap[None]], axis=0)
        np.testing.assert_allclose(
            adv, rewards + gamma * nxt - values, rtol=1e-6, atol=1e-6
        )

    def test_done_cuts_recursion(self):
        """A done at t blocks both V[t+1] and adv[t+1] from leaking back."""
        rewards = jnp.array([[1.0], [1.0], [1.0]])
        values = jnp.zeros((3, 1))
        bootstrap = jnp.array([100.0])
        dones = jnp.array([[False], [True], [False]])
        adv, _ = ppo_agent.gae(
            rewards, values, bootstrap, 0.5, 0.8, dones=dones
        )
        # t=2 sees the bootstrap; t=1 is cut dead; t=0 chains onto t=1
        # (deltas reduce to the rewards since all V are zero).
        assert float(adv[2, 0]) == 1.0 + 0.5 * 100.0
        assert float(adv[1, 0]) == 1.0
        np.testing.assert_allclose(
            float(adv[0, 0]), 1.0 + 0.5 * 0.8 * 1.0, rtol=1e-6
        )


class TestPPOLoss:
    def _inputs(self):
        logits = jnp.array([[2.0, 0.0, -1.0, 0.5], [0.1, 0.1, 0.1, 0.1]])
        values = jnp.array([1.0, -0.5])
        actions = jnp.array([0, 2])
        logp = jax.nn.log_softmax(logits)
        behavior_logp = jnp.take_along_axis(
            logp, actions[:, None], axis=-1
        )[:, 0]
        return logits, values, actions, behavior_logp

    def test_ratio_one_reduces_to_vanilla_pg(self):
        """Same params as behavior => ratio=1: actor term = -mean(adv)."""
        logits, values, actions, blogp = self._inputs()
        adv = jnp.array([2.0, -1.0])
        ret = jnp.array([0.0, 0.0])
        cfg = ppo_agent.PPOLossConfig(entropy_beta=0.0, value_coef=0.0)
        loss, aux = ppo_agent.ppo_loss(
            logits, values, actions, blogp, values, adv, ret, cfg
        )
        assert np.isclose(float(aux["actor_loss"]), -float(jnp.mean(adv)))
        assert np.isclose(float(aux["approx_kl"]), 0.0, atol=1e-6)
        assert float(aux["clip_frac"]) == 0.0

    def test_clip_blocks_gradient_beyond_eps(self):
        """With ratio far above 1+eps and adv>0 the actor grad is zero."""
        logits, values, actions, blogp = self._inputs()
        cfg = ppo_agent.PPOLossConfig(
            clip_eps=0.2, entropy_beta=0.0, value_coef=0.0
        )
        adv = jnp.array([1.0, 1.0])
        ret = jnp.zeros(2)

        def actor_only(lg):
            loss, _ = ppo_agent.ppo_loss(
                lg, values, actions, blogp - 5.0, values, adv, ret, cfg
            )
            return loss

        g = jax.grad(actor_only)(logits)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    def test_value_clip_is_pessimistic(self):
        """Clipped value loss >= unclipped value loss, elementwise max."""
        logits, values, actions, blogp = self._inputs()
        adv = jnp.zeros(2)
        ret = jnp.array([10.0, -10.0])
        behavior_values = jnp.zeros(2)
        base = ppo_agent.PPOLossConfig(entropy_beta=0.0, clip_value=False)
        clip = ppo_agent.PPOLossConfig(entropy_beta=0.0, clip_value=True)
        _, a_unc = ppo_agent.ppo_loss(
            logits, values, actions, blogp, behavior_values, adv, ret, base
        )
        _, a_cl = ppo_agent.ppo_loss(
            logits, values, actions, blogp, behavior_values, adv, ret, clip
        )
        assert float(a_cl["critic_loss"]) >= float(a_unc["critic_loss"])


class TestPPOTrainer:
    def test_step_updates_params_and_env(self):
        cfg = PPOConfig(
            batch_size=8,
            unroll_len=4,
            num_epochs=2,
            num_minibatches=2,
            model="resnet",
            model_kwargs=TINY_RESNET,
        )
        state, model, opt = init_ppo(cfg, jax.random.key(0))
        step = jax.jit(make_ppo_step(cfg, model, opt))
        state2, metrics = step(state)
        assert np.isfinite(float(metrics["loss"]))
        assert _param_delta(state.params, state2.params) > 0
        assert int(state2.update_step) == 1
        assert int(np.asarray(state2.env.steps).max()) > 0
        assert float(metrics["env_steps"]) == 8 * 4
        assert 0.0 <= float(metrics["clip_frac"]) <= 1.0

    def test_deterministic_given_seed(self):
        cfg = PPOConfig(
            batch_size=4, unroll_len=4, num_epochs=2, num_minibatches=2,
            model="mlp",
        )
        outs = []
        for _ in range(2):
            state, model, opt = init_ppo(cfg, jax.random.key(42))
            step = jax.jit(make_ppo_step(cfg, model, opt))
            _, m = step(state)
            outs.append(float(m["loss"]))
        assert outs[0] == outs[1]

    def test_flat_perm_variant_runs(self):
        cfg = PPOConfig(
            batch_size=4, unroll_len=6, num_epochs=1, num_minibatches=3,
            model="mlp", shard_friendly_perm=False,
        )
        state, model, opt = init_ppo(cfg, jax.random.key(0))
        _, m = jax.jit(make_ppo_step(cfg, model, opt))(state)
        assert np.isfinite(float(m["loss"]))

    def test_first_epoch_first_minibatch_kl_is_zero_shapewise(self):
        """Sanity: approx_kl stays small on the very first update (the
        policy has not moved far from behavior yet)."""
        cfg = PPOConfig(
            batch_size=8, unroll_len=4, num_epochs=1, num_minibatches=1,
            model="mlp", learning_rate=1e-5,
        )
        state, model, opt = init_ppo(cfg, jax.random.key(3))
        _, m = jax.jit(make_ppo_step(cfg, model, opt))(state)
        assert abs(float(m["approx_kl_last"])) < 1e-2

    def test_train_driver_on_mesh(self):
        """Full driver across an 8-device mesh: shard-friendly minibatch
        permutation must compile and run with the env batch on "dp"."""
        from rein48_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=8, tp=1))
        cfg = PPOConfig(
            batch_size=16, unroll_len=4, num_epochs=2, num_minibatches=2,
            model="mlp",
        )
        state, history = train_ppo(
            cfg, num_updates=2, seed=0, mesh=mesh, log_every=1
        )
        assert len(history) == 2
        assert np.isfinite(history[-1]["loss"])
        assert int(state.update_step) == 2

    @pytest.mark.slow
    def test_learning_curve_regression(self):
        """Fixed-seed check that PPO training IMPROVES play (the same
        regression A3C has in test_train.py)."""
        cfg = PPOConfig(
            batch_size=128,
            unroll_len=16,
            num_epochs=2,
            num_minibatches=2,
            model="cnn",
            learning_rate=1e-3,
            entropy_beta=0.02,
            gamma=0.97,
        )
        _, history = train_ppo(cfg, num_updates=100, seed=0, log_every=20)
        early = np.mean(
            [r["avg_episode_tile_sum"] for r in history[:2] if r["episodes"]]
        )
        late = np.mean(
            [r["avg_episode_tile_sum"] for r in history[-2:] if r["episodes"]]
        )
        assert late > early * 1.2, (early, late)


class TestAfterstateCritic:
    """Afterstate critic co-training (VERDICT r4 item 1)."""

    def test_targets_are_next_returns_cut_at_done(self):
        """target[t] = returns[t+1] (bootstrap at T-1), 0 where done[t]."""
        returns = jnp.array([[1.0], [2.0], [3.0]])
        bootstrap = jnp.array([7.0])
        dones = jnp.array([[False], [True], [False]])
        targ = ppo_agent.afterstate_targets(returns, bootstrap, dones)
        # t=0 continues -> returns[1]; t=1 done -> 0 (no leak from the
        # post-reset episode); t=2 continues -> bootstrap V(s_T).
        np.testing.assert_allclose(
            np.asarray(targ), [[2.0], [0.0], [7.0]]
        )

    def test_targets_shift_matches_bellman(self):
        """Without dones: returns[t] == r[t] + gamma*target[t] at lam=1
        (the planner backup q = r + gamma * V_after is consistent)."""
        T, B, gamma = 6, 3, 0.9
        key = jax.random.key(5)
        kr, kv, kb = jax.random.split(key, 3)
        rewards = jax.random.uniform(kr, (T, B))
        values = jax.random.normal(kv, (T, B))
        bootstrap = jax.random.normal(kb, (B,))
        _, returns = ppo_agent.gae(rewards, values, bootstrap, gamma, 1.0)
        targ = ppo_agent.afterstate_targets(
            returns, bootstrap, jnp.zeros((T, B), bool)
        )
        np.testing.assert_allclose(
            np.asarray(returns), np.asarray(rewards + gamma * targ),
            rtol=1e-5, atol=1e-5,
        )

    def test_joint_step_trains_both_subtrees(self):
        cfg = PPOConfig(
            batch_size=8, unroll_len=4, num_epochs=2, num_minibatches=2,
            model="mlp", afterstate_critic=True, after_model="mlp",
        )
        state, model, opt = init_ppo(cfg, jax.random.key(0))
        assert set(state.params) == {"policy", "after"}
        step = jax.jit(make_ppo_step(cfg, model, opt))
        state2, m = step(state)
        assert np.isfinite(float(m["loss"]))
        assert np.isfinite(float(m["after_loss"]))
        assert _param_delta(state.params["policy"], state2.params["policy"]) > 0
        assert _param_delta(state.params["after"], state2.params["after"]) > 0

    def test_warm_start_policy_is_used(self):
        cfg = PPOConfig(
            batch_size=4, unroll_len=4, num_epochs=1, num_minibatches=1,
            model="mlp", afterstate_critic=True, after_model="mlp",
            learning_rate=0.0,
        )
        donor, _, _ = init_ppo(cfg, jax.random.key(9))
        state, history = train_ppo(
            cfg, num_updates=1, seed=0,
            warm_start_policy=donor.params["policy"],
        )
        # lr=0: params must still equal the warm-start donor afterwards.
        assert _param_delta(state.params["policy"], donor.params["policy"]) == 0
        assert len(history) == 1

    def test_after_leaf_composes_with_search(self):
        """The trained after net drives depth-0/1 planning via
        evaluate_search — the exact composition the flagship driver runs."""
        from rein48_tpu.train.evaluate import evaluate_search

        cfg = PPOConfig(
            batch_size=4, unroll_len=4, num_epochs=1, num_minibatches=1,
            model="mlp", afterstate_critic=True, after_model="mlp",
        )
        state, model, opt = init_ppo(cfg, jax.random.key(1))
        state, _ = jax.jit(make_ppo_step(cfg, model, opt))(state)
        stats = evaluate_search(
            depth=0, num_envs=4, num_steps=32,
            model=cfg.make_after_model(), params=state.params["after"],
            obs_encoding=cfg.obs_encoding, gamma=cfg.gamma,
            reward_transform=cfg.reward_transform, protocol="first",
        )
        assert stats["episodes"] == 4.0
        assert np.isfinite(stats["avg_score"])


class TestValueClipRadius:
    """value_clip_eps is the ABSOLUTE value-clip radius, separate from
    clip_eps (regression for ADVICE.md round-1 #4: reusing the 0.2 ratio
    radius froze the critic once V drifted >0.2 from its rollout value)."""

    def test_wide_radius_never_binds(self):
        values = jnp.array([5.0, -5.0])
        behavior_values = jnp.zeros(2)
        ret = jnp.array([50.0, -50.0])
        logits = jnp.zeros((2, 4))
        actions = jnp.zeros(2, jnp.int32)
        blogp = jax.nn.log_softmax(logits)[:, 0]
        unclipped = ppo_agent.PPOLossConfig(entropy_beta=0.0, clip_value=False)
        wide = ppo_agent.PPOLossConfig(
            entropy_beta=0.0, clip_value=True, value_clip_eps=1e9
        )
        _, a_unc = ppo_agent.ppo_loss(
            logits, values, actions, blogp, behavior_values,
            jnp.zeros(2), ret, unclipped,
        )
        _, a_wide = ppo_agent.ppo_loss(
            logits, values, actions, blogp, behavior_values,
            jnp.zeros(2), ret, wide,
        )
        assert float(a_wide["critic_loss"]) == float(a_unc["critic_loss"])

    def test_tight_radius_freezes_critic_gradient(self):
        """The failure mode the fix guards: radius << |V - behavior V|
        zeroes the critic gradient (pessimistic max picks the clipped,
        constant branch)."""
        behavior_values = jnp.zeros(2)
        ret = jnp.array([100.0, 100.0])
        logits = jnp.zeros((2, 4))
        actions = jnp.zeros(2, jnp.int32)
        blogp = jax.nn.log_softmax(logits)[:, 0]
        tight = ppo_agent.PPOLossConfig(
            entropy_beta=0.0, value_coef=1.0, clip_value=True,
            value_clip_eps=0.2,
        )

        def critic_only(v):
            loss, _ = ppo_agent.ppo_loss(
                logits, v, actions, blogp, behavior_values,
                jnp.zeros(2), ret, tight,
            )
            return loss

        # V moved 5 >> 0.2 from its rollout estimate but still far from
        # the 100 target: clipped error (|0.2-100|) > unclipped (|5-100|),
        # so the max selects the constant clipped branch => zero gradient.
        g = jax.grad(critic_only)(jnp.array([5.0, 5.0]))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

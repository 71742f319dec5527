# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Deep afterstate-TD trainer tests (train/afterstate.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rein48_tpu.train.afterstate import (
    AfterstateTDConfig,
    init_afterstate_td,
    make_act_values,
    make_afterstate_td_step,
    make_value_fn,
    train_afterstate_td,
)


def _param_delta(a, b):
    return float(optax.global_norm(jax.tree.map(lambda x, y: x - y, a, b)))


def _random_boards(key, n):
    return jax.random.randint(key, (n, 4, 4), 0, 8, dtype=jnp.uint8).at[
        :, 0, 0
    ].set(1)


class TestAfterstateTD:
    def _cfg(self, **kw):
        base = dict(
            batch_size=8,
            unroll_len=8,
            model="mlp",
            num_epochs=2,
            num_minibatches=2,
            gamma=0.99,
        )
        base.update(kw)
        return AfterstateTDConfig(**base)

    def test_step_updates_params_and_env(self):
        cfg = self._cfg()
        state, model, opt = init_afterstate_td(cfg, jax.random.key(0))
        step = jax.jit(make_afterstate_td_step(cfg, model, opt))
        state2, m = step(state)
        assert np.isfinite(float(m["loss"]))
        assert _param_delta(state.params, state2.params) > 0
        assert int(state2.update_step) == 1
        assert float(m["env_steps"]) == 8 * 8

    def test_deterministic_given_seed(self):
        cfg = self._cfg()
        outs = []
        for _ in range(2):
            state, model, opt = init_afterstate_td(cfg, jax.random.key(7))
            _, m = jax.jit(make_afterstate_td_step(cfg, model, opt))(state)
            outs.append(float(m["loss"]))
        assert outs[0] == outs[1]

    def test_acting_is_depth0_planner(self):
        """The trainer's greedy action == control/search depth-0 with the
        same value leaf — acting and the eval protocol are ONE policy."""
        from rein48_tpu.control import search
        from rein48_tpu.train import common

        cfg = self._cfg()
        state, model, _ = init_afterstate_td(cfg, jax.random.key(1))
        boards = _random_boards(jax.random.key(2), 32)

        act_values = make_act_values(cfg, model)
        q, _, _, legal = act_values(state.params, boards)
        mq = jnp.where(legal, q, -jnp.inf)
        mq = jnp.where(~jnp.any(legal, axis=-1, keepdims=True), 0.0, mq)
        trainer_actions = jnp.argmax(mq, axis=-1)

        value = make_value_fn(cfg, model)
        planner = search.make_expectimax_policy(
            0,
            leaf_value=lambda b: value(state.params, b),
            reward_fn=lambda r: common.transform_reward(
                r.astype(jnp.float32), cfg.reward_transform
            ),
            gamma=cfg.gamma,
            death_value=0.0,
        )
        np.testing.assert_array_equal(
            np.asarray(trainer_actions), np.asarray(planner(boards))
        )

    def test_warm_start_params_used(self):
        cfg = self._cfg(learning_rate=0.0)
        donor, _, _ = init_afterstate_td(cfg, jax.random.key(9))
        state, hist = train_afterstate_td(
            cfg, num_updates=1, seed=0, warm_start_params=donor.params
        )
        assert _param_delta(state.params, donor.params) == 0
        assert len(hist) == 1

    def test_mesh_shards(self):
        from rein48_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=8, tp=1))
        cfg = self._cfg(batch_size=16)
        state, hist = train_afterstate_td(
            cfg, num_updates=2, seed=0, mesh=mesh, log_every=1
        )
        assert len(hist) == 2
        assert np.isfinite(hist[-1]["loss"])

    @pytest.mark.slow
    def test_learning_improves_play_afterstate(self):
        cfg = AfterstateTDConfig(
            batch_size=128,
            unroll_len=16,
            model="cnn",
            learning_rate=1e-3,
            td_lambda=0.7,
            gamma=0.99,
            num_epochs=2,
            num_minibatches=4,
        )
        _, hist = train_afterstate_td(cfg, num_updates=40, seed=0, log_every=10)
        early = hist[0]["avg_episode_tile_sum"]
        late = max(h["avg_episode_tile_sum"] for h in hist[1:])
        assert late > early * 1.2, (early, late)

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""DDPG-style actor-critic with target networks and replay.

The reference ships a DDPG skeleton that never runs: dead-on-arrival env
API mismatch (``/root/reference/algorithm/ddpg/agent.py:12-14``), a target
"network" aliased to the estimate (``actor.py:26``), a constant-1.0
softmax Q output (``critic.py:78-83``), a scalar reward broadcast over the
batch (``ddpg.py:42``), and no caller anywhere. This module is the working
TPU-native realization of what that code gestures at, adapted to the
discrete action space the game actually has:

* actor: softmax policy (the reference actor's CNN + softmax,
  ``actor.py:51-85``) with a REAL separate target copy;
* critic: all-actions Q net with its own target;
* actor update: maximize expected Q under the policy —
  ``loss = -E_s[sum_a pi(a|s) Q(s,a)]`` — the discrete analogue of the
  deterministic policy gradient chain rule the reference builds with two
  ``tf.gradients`` calls (``actor.py:28-36``);
* critic update: per-sample TD targets from the target actor+critic
  (fixing ``ddpg.py:42``); Polyak updates with the reference's tau=0.9
  keep-fraction (``agent.py:9``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rein48_tpu.agents import dqn as dqn_agent
from rein48_tpu.agents import replay as replay_lib
from rein48_tpu.engine import core, vector
from rein48_tpu.engine.core import RewardMode
from rein48_tpu.models import nets
from rein48_tpu.train import common


@dataclasses.dataclass(frozen=True)
class DDPGConfig:
    num_envs: int = 2048
    obs_encoding: str = "onehot"
    reward_mode: RewardMode = RewardMode.MERGE_SCORE
    reward_transform: str = "log2"
    use_legal_mask: bool = True
    replay_capacity: int = 1 << 19
    learn_batch_size: int = 4096
    gamma: float = 0.99  # ddpg.py:9
    tau: float = 0.9  # keep fraction, agent.py:9
    optimizer: str = "adam"  # critic.py:34
    learning_rate: float = 3e-4
    max_grad_norm: float = 1.0
    min_replay_before_learn: int = 20_000

    def make_actor(self):
        return nets.CNNPolicy()

    def make_critic(self):
        return nets.QNetwork(dueling=False)


@struct.dataclass
class DDPGTrainState:
    actor_params: Any
    critic_params: Any
    target_actor_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    env: core.EnvState
    replay: replay_lib.ReplayState
    key: jax.Array
    update_step: jax.Array


def init_ddpg(
    config: DDPGConfig, key: jax.Array
) -> Tuple[DDPGTrainState, Any, Any, optax.GradientTransformation]:
    actor, critic = config.make_actor(), config.make_critic()
    k_a, k_c, k_env, k_state = jax.random.split(key, 4)
    dummy = common.encode_obs(
        jnp.zeros((1, core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
        config.obs_encoding,
    )
    actor_params = actor.init(k_a, dummy)["params"]
    critic_params = critic.init(k_c, dummy)["params"]
    tx = common.make_optimizer(
        config.optimizer, config.learning_rate, max_grad_norm=config.max_grad_norm
    )
    example = {
        "board": jnp.zeros((core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
        "action": jnp.asarray(0, jnp.int32),
        "reward": jnp.asarray(0.0, jnp.float32),
        "next_board": jnp.zeros((core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
        "done": jnp.asarray(False),
    }
    state = DDPGTrainState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_actor_params=jax.tree.map(jnp.copy, actor_params),
        target_critic_params=jax.tree.map(jnp.copy, critic_params),
        actor_opt=tx.init(actor_params),
        critic_opt=tx.init(critic_params),
        env=vector.reset_batch(k_env, config.num_envs),
        replay=replay_lib.replay_init(example, config.replay_capacity),
        key=k_state,
        update_step=jnp.asarray(0, jnp.int32),
    )
    return state, actor, critic, tx


def make_ddpg_step(
    config: DDPGConfig, actor: Any, critic: Any, tx: optax.GradientTransformation
) -> Callable[[DDPGTrainState], Tuple[DDPGTrainState, dict]]:
    def actor_probs(params, boards):
        obs = common.encode_obs(boards, config.obs_encoding)
        logits, _ = actor.apply({"params": params}, obs)
        return logits

    def critic_q(params, boards):
        obs = common.encode_obs(boards, config.obs_encoding)
        return critic.apply({"params": params}, obs)

    def step_fn(state: DDPGTrainState) -> Tuple[DDPGTrainState, dict]:
        key, k_act, k_sample = jax.random.split(state.key, 3)

        # --- act (sampled from the softmax policy, actor.py:95-96) ---
        logits = actor_probs(state.actor_params, state.env.boards)
        if config.use_legal_mask:
            mask = core.legal_action_mask(state.env.boards)
            neg = jnp.asarray(-1e9, logits.dtype)
            any_legal = jnp.any(mask, axis=-1, keepdims=True)
            logits = jnp.where(mask | ~any_legal, logits, neg)
        actions = jax.random.categorical(k_act, logits)
        env2, out = vector.step_autoreset(
            state.env, actions, config.reward_mode
        )
        batch = {
            "board": state.env.boards,
            "action": actions.astype(jnp.int32),
            "reward": common.transform_reward(out.reward, config.reward_transform),
            "next_board": env2.boards,
            "done": out.done,
        }
        replay = replay_lib.replay_add(state.replay, batch)

        sample = replay_lib.replay_sample(replay, k_sample, config.learn_batch_size)

        # --- critic update: per-sample TD targets from target nets ---
        next_logits = actor_probs(state.target_actor_params, sample["next_board"])
        next_probs = jax.nn.softmax(next_logits)
        next_q = critic_q(state.target_critic_params, sample["next_board"])
        target_v = jnp.sum(next_probs * next_q, axis=-1)
        td_target = sample["reward"] + config.gamma * (
            1.0 - sample["done"].astype(jnp.float32)
        ) * target_v

        def critic_loss_fn(params):
            q = critic_q(params, sample["board"])
            q_a = jnp.take_along_axis(q, sample["action"][..., None], axis=-1)[..., 0]
            td = jax.lax.stop_gradient(td_target) - q_a
            return jnp.mean(jnp.square(td)), jnp.mean(jnp.abs(td))

        (critic_loss, td_abs), critic_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(state.critic_params)

        # --- actor update: maximize expected Q under the policy ---
        def actor_loss_fn(params):
            lg = actor_probs(params, sample["board"])
            probs = jax.nn.softmax(lg)
            q = jax.lax.stop_gradient(critic_q(state.critic_params, sample["board"]))
            return -jnp.mean(jnp.sum(probs * q, axis=-1))

        actor_loss, actor_grads = jax.value_and_grad(actor_loss_fn)(
            state.actor_params
        )

        learn = replay.size >= jnp.minimum(
            config.min_replay_before_learn, config.replay_capacity
        )
        zero_if_cold = lambda g: jax.tree.map(  # noqa: E731
            lambda x: jnp.where(learn, x, jnp.zeros_like(x)), g
        )
        critic_grads = zero_if_cold(critic_grads)
        actor_grads = zero_if_cold(actor_grads)

        c_updates, critic_opt = tx.update(
            critic_grads, state.critic_opt, state.critic_params
        )
        critic_params = optax.apply_updates(state.critic_params, c_updates)
        a_updates, actor_opt = tx.update(
            actor_grads, state.actor_opt, state.actor_params
        )
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        metrics = {
            "critic_loss": critic_loss,
            "actor_loss": actor_loss,
            "td_abs": td_abs,
            "replay_size": replay.size.astype(jnp.float32),
            "episodes": jnp.sum(out.done.astype(jnp.float32)),
            "episode_tile_sum_sum": jnp.sum(out.episode_tile_sum),
            "episode_length_sum": jnp.sum(out.episode_length.astype(jnp.float32)),
            "best_tile": jnp.max(out.max_tile),
        }
        new_state = DDPGTrainState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=dqn_agent.polyak_update(
                state.target_actor_params, actor_params, config.tau
            ),
            target_critic_params=dqn_agent.polyak_update(
                state.target_critic_params, critic_params, config.tau
            ),
            actor_opt=actor_opt,
            critic_opt=critic_opt,
            env=env2,
            replay=replay,
            key=key,
            update_step=state.update_step + 1,
        )
        return new_state, metrics

    return step_fn


def train_ddpg(
    config: DDPGConfig,
    num_updates: int,
    seed: int = 0,
    log_every: int = 10,
    logger=None,
    checkpointer=None,
) -> Tuple[DDPGTrainState, list]:
    """Host driver loop (mirrors ``train_a3c``)."""
    state, actor, critic, tx = init_ddpg(config, jax.random.key(seed))
    step = jax.jit(make_ddpg_step(config, actor, critic, tx), donate_argnums=(0,))

    history = []
    base = int(state.update_step)
    t0 = time.perf_counter()
    for i in range(num_updates):
        state, metrics = step(state)
        if (i + 1) % log_every == 0 or i + 1 == num_updates:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            eps = max(m["episodes"], 1.0)
            record = {
                "update": base + i + 1,
                "critic_loss": m["critic_loss"],
                "actor_loss": m["actor_loss"],
                "td_abs": m["td_abs"],
                "replay_size": m["replay_size"],
                "episodes": m["episodes"],
                "avg_episode_tile_sum": m["episode_tile_sum_sum"] / eps,
                "best_tile": m["best_tile"],
                "steps_per_sec": (i + 1)
                * config.num_envs
                / (time.perf_counter() - t0),
            }
            history.append(record)
            if logger is not None:
                logger.write(record)
            if checkpointer is not None:
                checkpointer.maybe_save(base + i + 1, state)
    return state, history

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""DQN with an on-device replay buffer (the north star's "replay variant").

The working realization of the reference's unfinished DDPG/replay stack
(``/root/reference/algorithm/ddpg/``): batched epsilon-greedy acting over
thousands of envs, transitions scattered into a preallocated device-side
circular buffer, sampled minibatch TD updates against a target network.
Everything — acting, storage, sampling, learning, target sync — is one
jitted program per iteration; the reference's per-episode
``SESS.run`` + buffer-clearing cycle (``ddpg.py:33-62``, ``replay.py:45-47``)
has no analogue because nothing leaves the device.
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
class DQNConfig:
    """Hyperparameters.

    Reference-derived values where they exist: ``gamma=0.99``
    (``ddpg.py:9``), ``tau=0.9`` keep-fraction Polyak (``agent.py:9``).
    Buffer/batch are scaled to TPU reality (the reference's cap of 100 with
    batch 10, ``replay.py:5,10``, is below one acting step here).
    """

    num_envs: int = 4096
    model: str = "resnet"
    model_kwargs: Tuple[Tuple[str, Any], ...] = ()
    obs_encoding: str = "onehot"
    reward_mode: RewardMode = RewardMode.MERGE_SCORE
    reward_transform: str = "log2"
    use_legal_mask: bool = True
    replay_capacity: int = 1 << 20
    learn_batch_size: int = 8192
    acting_steps_per_update: int = 1
    gamma: float = 0.99
    double_dqn: bool = True
    huber_delta: float = 1.0
    # n-step TD targets (VERDICT r4 item 6): 2048's credit horizon is
    # ~1000 moves and a 1-step backup propagates value one move per
    # update — the known weak link behind the round-4 frac_2048 0.012.
    # n > 1 samples n-chains from the circular buffer's strided layout
    # (agents/replay.py::replay_sample_nstep); 1 keeps the classic path.
    n_step: int = 1
    optimizer: str = "adam"
    learning_rate: float = 3e-4
    max_grad_norm: float = 1.0
    # Polyak soft sync every update (tau = KEEP fraction, reference
    # convention agent.py:9); set target_sync_period > 1 for hard sync.
    tau: float = 0.995
    target_sync_period: int = 1
    # Linear epsilon anneal, in environment steps.
    epsilon_start: float = 1.0
    epsilon_end: float = 0.05
    epsilon_decay_steps: int = 2_000_000
    min_replay_before_learn: int = 50_000

    def make_model(self) -> Any:
        kwargs = dict(self.model_kwargs)
        if self.model == "qnet":
            return nets.QNetwork(**kwargs)
        return nets.make_model(self.model, **kwargs)


@struct.dataclass
class DQNTrainState:
    params: Any
    target_params: Any
    opt_state: Any
    env: core.EnvState  # [num_envs]
    replay: replay_lib.ReplayState
    key: jax.Array
    update_step: jax.Array
    env_steps: jax.Array


def _q_values(model, params, boards, encoding):
    """Forward that tolerates both QNetwork (q) and policy nets (logits)."""
    obs = common.encode_obs(boards, encoding)
    out = model.apply({"params": params}, obs)
    if isinstance(out, tuple):  # (logits, value) policy nets double as Q
        return out[0]
    return out


def init_dqn(
    config: DQNConfig, key: jax.Array
) -> Tuple[DQNTrainState, Any, optax.GradientTransformation]:
    model = config.make_model()
    k_param, k_env, k_state = jax.random.split(key, 3)
    dummy = common.encode_obs(
        jnp.zeros((1, core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
        config.obs_encoding,
    )
    params = model.init(k_param, dummy)["params"]
    optimizer = common.make_optimizer(
        config.optimizer, config.learning_rate, max_grad_norm=config.max_grad_norm
    )
    example = {
        "board": jnp.zeros((core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
        "action": jnp.asarray(0, jnp.int32),
        "reward": jnp.asarray(0.0, jnp.float32),
        "next_board": jnp.zeros((core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
        "done": jnp.asarray(False),
    }
    state = DQNTrainState(
        params=params,
        target_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
        env=vector.reset_batch(k_env, config.num_envs),
        replay=replay_lib.replay_init(example, config.replay_capacity),
        key=k_state,
        update_step=jnp.asarray(0, jnp.int32),
        env_steps=jnp.asarray(0, jnp.int32),
    )
    return state, model, optimizer


def make_dqn_step(
    config: DQNConfig, model: Any, optimizer: optax.GradientTransformation
) -> Callable[[DQNTrainState], Tuple[DQNTrainState, dict]]:
    """Fused act->store->sample->learn->sync step (pure; caller jits)."""
    # With n-step targets the bootstrap discount is gamma^n:
    # target = R^(n) + gamma^n (1-done) max Q(s_{t+n}); the reward sum
    # and the done-cut come pre-reduced from replay_sample_nstep.
    loss_cfg = dqn_agent.DQNLossConfig(
        gamma=config.gamma**config.n_step,
        double_dqn=config.double_dqn,
        huber_delta=config.huber_delta,
    )

    def epsilon_at(env_steps):
        frac = jnp.clip(
            env_steps.astype(jnp.float32) / config.epsilon_decay_steps, 0.0, 1.0
        )
        return config.epsilon_start + frac * (
            config.epsilon_end - config.epsilon_start
        )

    def step_fn(state: DQNTrainState) -> Tuple[DQNTrainState, dict]:
        key, k_sample = jax.random.split(state.key)

        def act_body(carry, _):
            env, replay, k, env_steps = carry
            k, k_act = jax.random.split(k)
            q = _q_values(model, state.params, env.boards, config.obs_encoding)
            mask = (
                core.legal_action_mask(env.boards)
                if config.use_legal_mask
                else None
            )
            eps = epsilon_at(env_steps)
            actions = dqn_agent.epsilon_greedy(k_act, q, eps, mask)
            env2, out = vector.step_autoreset(env, actions, config.reward_mode)
            batch = {
                "board": env.boards,
                "action": actions,
                "reward": common.transform_reward(
                    out.reward, config.reward_transform
                ),
                # Next observation: post-move board. At episode end the
                # state slot was auto-reset, but `done` cuts the TD
                # recursion so the stored next_board is never used there.
                "next_board": env2.boards,
                "done": out.done,
            }
            replay = replay_lib.replay_add(replay, batch)
            info = {
                "episodes": jnp.sum(out.done.astype(jnp.float32)),
                "episode_tile_sum_sum": jnp.sum(out.episode_tile_sum),
                "episode_length_sum": jnp.sum(
                    out.episode_length.astype(jnp.float32)
                ),
                "best_tile": jnp.max(out.max_tile),
            }
            env_steps = env_steps + config.num_envs
            return (env2, replay, k, env_steps), info

        (env, replay, key, env_steps), infos = jax.lax.scan(
            act_body,
            (state.env, state.replay, key, state.env_steps),
            None,
            length=config.acting_steps_per_update,
        )

        if config.n_step > 1:
            batch = replay_lib.replay_sample_nstep(
                replay,
                k_sample,
                config.learn_batch_size,
                n_step=config.n_step,
                stride=config.num_envs,
                gamma=config.gamma,
            )
        else:
            batch = replay_lib.replay_sample(
                replay, k_sample, config.learn_batch_size
            )

        def loss_fn(params):
            q_online = _q_values(
                model, params, batch["board"], config.obs_encoding
            )
            q_online_next = _q_values(
                model, params, batch["next_board"], config.obs_encoding
            )
            q_target_next = _q_values(
                model, state.target_params, batch["next_board"], config.obs_encoding
            )
            return dqn_agent.dqn_loss(
                q_online,
                jax.lax.stop_gradient(q_online_next),
                q_target_next,
                batch["action"],
                batch["reward"],
                batch["done"],
                loss_cfg,
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # Freeze learning until the buffer has enough data (the analogue of
        # the reference's `filled()` train trigger, replay.py:15-16). The
        # whole optimizer transaction is gated — not just the grads — so
        # Adam's moment/bias-correction counters stay at step 0 through
        # warm-up and the first real update behaves like a first update.
        learn = replay.size >= jnp.minimum(
            config.min_replay_before_learn, config.replay_capacity
        )

        def do_update(operand):
            g, opt_state, params = operand
            updates, new_opt = optimizer.update(g, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        def skip_update(operand):
            _, opt_state, params = operand
            return params, opt_state

        params, opt_state = jax.lax.cond(
            learn, do_update, skip_update, (grads, state.opt_state, state.params)
        )

        update_step = state.update_step + 1
        if config.target_sync_period > 1:
            sync = (update_step % config.target_sync_period) == 0
            target_params = jax.tree.map(
                lambda t, o: jnp.where(sync, o, t), state.target_params, params
            )
        else:
            target_params = dqn_agent.polyak_update(
                state.target_params, params, config.tau
            )

        metrics = {
            **aux,
            "epsilon": epsilon_at(env_steps),
            "replay_size": replay.size.astype(jnp.float32),
            "grad_norm": common.tree_norm(grads),
            "episodes": jnp.sum(infos["episodes"]),
            "episode_tile_sum_sum": jnp.sum(infos["episode_tile_sum_sum"]),
            "episode_length_sum": jnp.sum(infos["episode_length_sum"]),
            "best_tile": jnp.max(infos["best_tile"]),
            "env_steps": env_steps.astype(jnp.float32),
        }
        new_state = DQNTrainState(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            env=env,
            replay=replay,
            key=key,
            update_step=update_step,
            env_steps=env_steps,
        )
        return new_state, metrics

    return step_fn


def train_dqn(
    config: DQNConfig,
    num_updates: int,
    seed: int = 0,
    mesh=None,
    log_every: int = 10,
    logger=None,
    checkpointer=None,
) -> Tuple[DQNTrainState, list]:
    """Host driver loop (mirrors ``train_a3c``)."""
    from rein48_tpu.parallel import mesh as mesh_lib

    state, model, optimizer = init_dqn(config, jax.random.key(seed))
    if checkpointer is not None:
        # Persist the config so eval-time consumers (cli.py eval) can
        # recover gamma/reward_transform/obs_encoding/model instead of
        # silently assuming defaults.
        checkpointer.save_config(config)
    if checkpointer is not None and checkpointer.latest_step() is not None:
        state = checkpointer.restore(state)
        print(
            f"resumed from checkpoint step {int(state.update_step)}",
            flush=True,
        )
    step_fn = make_dqn_step(config, model, optimizer)

    if mesh is not None:
        repl = mesh_lib.replicated_sharding(mesh)
        state = dataclasses.replace(
            state,
            env=mesh_lib.shard_env_state(state.env, mesh),
            replay=jax.tree.map(
                lambda x: jax.device_put(x, mesh_lib.batch_sharding(mesh))
                if x.ndim > 0
                else jax.device_put(x, repl),
                state.replay,
            ),
            # Replicated when tp=1; kernels tp-sharded otherwise (the
            # optimizer moments mirror the param specs). See mesh.py.
            params=mesh_lib.shard_params(state.params, mesh),
            target_params=mesh_lib.shard_params(state.target_params, mesh),
            opt_state=mesh_lib.shard_params(state.opt_state, mesh),
        )
    step = jax.jit(step_fn, donate_argnums=(0,))

    history = []
    base = int(state.update_step)
    t0 = time.perf_counter()
    for i in range(num_updates):
        state, metrics = step(state)
        if (i + 1) % log_every == 0 or i + 1 == num_updates:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            dt = time.perf_counter() - t0
            eps = max(m["episodes"], 1.0)
            record = {
                "update": base + i + 1,
                "loss": m["loss"],
                "td_abs": m["td_abs"],
                "q_mean": m["q_mean"],
                "epsilon": m["epsilon"],
                "replay_size": m["replay_size"],
                "episodes": m["episodes"],
                "avg_episode_tile_sum": m["episode_tile_sum_sum"] / eps,
                "avg_episode_length": m["episode_length_sum"] / eps,
                "best_tile": m["best_tile"],
                "steps_per_sec": m["env_steps"] / dt,
            }
            history.append(record)
            if logger is not None:
                logger.write(record)
            if checkpointer is not None:
                checkpointer.maybe_save(base + i + 1, state)
    return state, history

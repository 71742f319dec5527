# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Deep afterstate-TD trainer — the n-tuple recipe on a dense net.

The capability workhorse of this framework is afterstate TD learning
(``train/ntuple.py``): act greedily on ``q(a) = r(a) + V(afterstate)``,
regress V toward the TD target, and the planner composition is exact by
construction. Round-5 measurements showed WHY the PPO-co-trained
afterstate critic still loses to the policy head under search
(runs/ppo_afterstate_tpu/eval.json: after_greedy 0.293 / depth-1 0.617
vs greedy 0.776): that critic evaluates the PPO policy, not the policy
that the search itself induces — classic off-policy misalignment that
function-approximation error turns into argmax exploitation. The fix is
this trainer: V_after is trained ON-POLICY for its own greedy policy
(approximate policy iteration), exactly how the n-tuple tables and the
modern deep-2048 agents (Matsuzaki-style afterstate networks) train.

One training step is one XLA program: a ``lax.scan`` rollout in which
acting IS the depth-0 planner (4 afterstates per board, one batched
value forward), then TD(lambda) targets via the same
``gae``/``afterstate_targets`` math PPO uses (pinned by tests), then
epochs x minibatches of MSE — the whole loop MXU-dense (the acting
forward is 4x the policy-gradient trainers' per-step batch).

Reference lineage: the reference never trains a value function that
works (its A3C critic regresses zero rewards, ``a3c.py:99-123``); this
trainer is the TPU-native realization of what its README aspires to
(``/root/reference/README.md:3``), built on the engine's afterstate
factorization (``engine/core.py::move_boards``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rein48_tpu.agents import ppo as ppo_agent
from rein48_tpu.engine import core, vector
from rein48_tpu.engine.core import RewardMode
from rein48_tpu.models import nets
from rein48_tpu.train import common


@dataclasses.dataclass(frozen=True)
class AfterstateTDConfig:
    """Hyperparameters (flagship defaults; units match train/ppo.py)."""

    batch_size: int = 8192
    unroll_len: int = 32
    model: str = "resnet"
    model_kwargs: Tuple[Tuple[str, Any], ...] = ()
    obs_encoding: str = "onehot"
    reward_mode: RewardMode = RewardMode.MERGE_SCORE
    reward_transform: str = "log2"
    gamma: float = 0.997
    # TD(lambda) mixing for the afterstate targets: 0 = one-step TD (the
    # n-tuple trainer's regime), 1 = Monte-Carlo returns.
    td_lambda: float = 0.7
    # Greedy acting is the n-tuple precedent (spawn randomness explores);
    # epsilon adds uniform-legal exploration if a run needs it.
    epsilon: float = 0.0
    num_epochs: int = 2
    num_minibatches: int = 4
    optimizer: str = "adam"
    learning_rate: float = 1e-4
    lr_decay_updates: int = 0
    lr_final_frac: float = 0.1
    max_grad_norm: float = 0.5
    # True => per-epoch shuffles permute the time axis per-env only (the
    # mesh-safe scheme, same as PPOConfig.shard_friendly_perm).
    shard_friendly_perm: bool = True

    def make_model(self) -> Any:
        return nets.make_model(self.model, **dict(self.model_kwargs))

    def make_learning_rate(self):
        if self.lr_decay_updates > 0:
            steps = self.lr_decay_updates * self.num_epochs * self.num_minibatches
            return optax.cosine_decay_schedule(
                self.learning_rate, steps, alpha=self.lr_final_frac
            )
        return self.learning_rate


@struct.dataclass
class AfterstateTDState:
    params: Any
    opt_state: Any
    env: core.EnvState  # [B]
    key: jax.Array
    update_step: jax.Array


def init_afterstate_td(
    config: AfterstateTDConfig, key: jax.Array
) -> Tuple[AfterstateTDState, Any, optax.GradientTransformation]:
    model = config.make_model()
    k_param, k_env, k_state = jax.random.split(key, 3)
    obs = common.encode_obs(
        jnp.zeros((1, core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
        config.obs_encoding,
    )
    params = model.init(k_param, obs)["params"]
    optimizer = common.make_optimizer(
        config.optimizer,
        config.make_learning_rate(),
        max_grad_norm=config.max_grad_norm,
    )
    state = AfterstateTDState(
        params=params,
        opt_state=optimizer.init(params),
        env=vector.reset_batch(k_env, config.batch_size),
        key=k_state,
        update_step=jnp.asarray(0, jnp.int32),
    )
    return state, model, optimizer


def make_value_fn(config: AfterstateTDConfig, model: Any):
    """V_after(boards) through the model's value head."""

    def value(params, boards):
        obs = common.encode_obs(boards, config.obs_encoding)
        out = model.apply({"params": params}, obs, train=False)
        return out[1] if isinstance(out, tuple) else out

    return value


def make_act_values(config: AfterstateTDConfig, model: Any):
    """``q(a) = r(a) + gamma * V(after(s, a))`` over all 4 actions.

    Returns a function ``(params, boards[B,4,4]) -> (q[B,4],
    after[B,4,4,4], reward_tr[B,4], legal[B,4])``. Greedy argmax over
    the legal entries of ``q`` is EXACTLY the depth-0 planner of
    ``control/search.py`` with this value as the leaf (pinned by
    ``tests/test_afterstate.py``) — acting and evaluation are the same
    policy by construction, the property the n-tuple family has and the
    PPO-co-trained critic lacked.
    """
    value = make_value_fn(config, model)

    def act_values(params, boards):
        actions = jnp.arange(core.NUM_ACTIONS, dtype=jnp.int32)
        tiled = jnp.broadcast_to(
            boards[:, None], (boards.shape[0], core.NUM_ACTIONS) + boards.shape[1:]
        )
        acts = jnp.broadcast_to(actions, tiled.shape[:2])
        after, reward, legal = core.move_boards(tiled, acts)
        r_tr = common.transform_reward(
            reward.astype(jnp.float32), config.reward_transform
        )
        v = value(params, after.reshape((-1,) + after.shape[-2:])).reshape(
            after.shape[:2]
        )
        return r_tr + config.gamma * v, after, r_tr, legal

    return act_values


def make_afterstate_td_step(
    config: AfterstateTDConfig, model: Any, optimizer: optax.GradientTransformation
) -> Callable[[AfterstateTDState], Tuple[AfterstateTDState, dict]]:
    """Build the fused step: greedy-TD rollout -> targets -> SGD epochs."""
    T, B = config.unroll_len, config.batch_size
    M = config.num_minibatches
    if config.shard_friendly_perm and T % M:
        raise ValueError(
            f"shard_friendly_perm needs unroll_len={T} divisible by "
            f"num_minibatches={M}"
        )

    value = make_value_fn(config, model)
    act_values = make_act_values(config, model)

    def step_fn(state: AfterstateTDState) -> Tuple[AfterstateTDState, dict]:
        key, k_roll, k_learn = jax.random.split(state.key, 3)

        def body(carry, _):
            env, k = carry
            k, k_eps, k_pick = jax.random.split(k, 3)
            q, after, r_tr, legal = act_values(state.params, env.boards)
            masked_q = jnp.where(legal, q, -jnp.inf)
            all_illegal = ~jnp.any(legal, axis=-1, keepdims=True)
            masked_q = jnp.where(all_illegal, 0.0, masked_q)
            greedy = jnp.argmax(masked_q, axis=-1).astype(jnp.int32)
            if config.epsilon > 0.0:
                logits = jnp.where(legal | all_illegal, 0.0, -jnp.inf)
                rand_a = jax.random.categorical(k_pick, logits).astype(jnp.int32)
                explore = (
                    jax.random.uniform(k_eps, greedy.shape) < config.epsilon
                )
                actions = jnp.where(explore, rand_a, greedy)
            else:
                actions = greedy
            take = lambda x: jnp.take_along_axis(
                x, actions.reshape((B,) + (1,) * (x.ndim - 1)), axis=1
            )[:, 0]
            as_t = take(after)  # uint8[B, 4, 4]
            r_t = take(r_tr)  # reward of the chosen move (enters as_t)
            # U_t = q(chosen) = r_t + gamma*V(as_t): the state-value
            # estimate V_hat(s_t) under the greedy policy.
            u_t = take(q)
            env2, out = vector.step_autoreset(env, actions, config.reward_mode)
            trans = {
                "after_boards": as_t,
                "rewards": r_t,
                "dones": out.done,
                "state_value": u_t,
            }
            info = {
                "episodes": out.done.astype(jnp.float32),
                "episode_tile_sum": out.episode_tile_sum,
                "episode_length": out.episode_length.astype(jnp.float32),
                "max_tile": out.max_tile,
            }
            return (env2, k), (trans, info)

        (env, _), (traj, infos) = jax.lax.scan(
            body, (state.env, k_roll), None, length=T
        )

        # Bootstrap state value at s_T under the same greedy policy.
        q_T, _, _, legal_T = act_values(state.params, env.boards)
        dead_T = ~jnp.any(legal_T, axis=-1)
        u_T = jnp.where(
            dead_T, 0.0, jnp.max(jnp.where(legal_T, q_T, -jnp.inf), axis=-1)
        )

        # TD(lambda) state returns, then shift one step onto afterstates:
        # the exact machinery PPO's afterstate critic uses (agents/ppo.py
        # gae + afterstate_targets, both pinned by tests).
        _, returns = ppo_agent.gae(
            traj["rewards"],
            traj["state_value"],
            u_T,
            config.gamma,
            config.td_lambda,
            dones=traj["dones"],
        )
        targets = ppo_agent.afterstate_targets(returns, u_T, traj["dones"])
        data = (traj["after_boards"], targets)

        def minibatch_loss(params, mb):
            boards, targ = mb
            v = value(params, boards)
            loss = jnp.mean(jnp.square(v - jax.lax.stop_gradient(targ)))
            return loss, {
                "loss": loss,
                "v_mean": jnp.mean(v),
                "target_mean": jnp.mean(targ),
            }

        def sgd_step(carry, mb):
            params, opt_state = carry
            (_, aux), grads = jax.value_and_grad(
                minibatch_loss, has_aux=True
            )(params, mb)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux["grad_norm"] = common.tree_norm(grads)
            return (params, opt_state), aux

        if config.shard_friendly_perm:
            def epoch(carry, k_epoch):
                perm = jax.vmap(
                    lambda k: jax.random.permutation(k, T), out_axes=1
                )(jax.random.split(k_epoch, B))
                shuffled = jax.tree.map(
                    lambda x: jnp.take_along_axis(
                        x,
                        perm.reshape((T, B) + (1,) * (x.ndim - 2)),
                        axis=0,
                    ),
                    data,
                )
                mbs = jax.tree.map(
                    lambda x: x.reshape((M, T // M) + x.shape[1:]), shuffled
                )
                return jax.lax.scan(sgd_step, carry, mbs)
        else:
            flat = jax.tree.map(
                lambda x: x.reshape((T * B,) + x.shape[2:]), data
            )

            def epoch(carry, k_epoch):
                perm = jax.random.permutation(k_epoch, T * B)
                mbs = jax.tree.map(
                    lambda x: x[perm].reshape(
                        (M, (T * B) // M) + x.shape[1:]
                    ),
                    flat,
                )
                return jax.lax.scan(sgd_step, carry, mbs)

        (params, opt_state), aux = jax.lax.scan(
            epoch,
            (state.params, state.opt_state),
            jax.random.split(k_learn, config.num_epochs),
        )
        metrics = {k: jnp.mean(v[-1]) for k, v in aux.items()}
        metrics.update(
            episodes=jnp.sum(infos["episodes"]),
            episode_tile_sum_sum=jnp.sum(infos["episode_tile_sum"]),
            episode_length_sum=jnp.sum(infos["episode_length"]),
            best_tile=jnp.max(infos["max_tile"]),
            env_steps=jnp.asarray(T * B, jnp.float32),
        )
        new_state = AfterstateTDState(
            params=params,
            opt_state=opt_state,
            env=env,
            key=key,
            update_step=state.update_step + 1,
        )
        return new_state, metrics

    return step_fn


def train_afterstate_td(
    config: AfterstateTDConfig,
    num_updates: int,
    seed: int = 0,
    mesh=None,
    log_every: int = 10,
    logger=None,
    checkpointer=None,
    warm_start_params=None,
) -> Tuple[AfterstateTDState, list]:
    """Host driver (mirrors ``train_ppo``); ``warm_start_params`` seeds
    the value net (e.g. a PPO run's co-trained afterstate critic)."""
    from rein48_tpu.parallel import mesh as mesh_lib

    state, model, optimizer = init_afterstate_td(config, jax.random.key(seed))
    if checkpointer is not None:
        checkpointer.save_config(config)
    if checkpointer is not None and checkpointer.latest_step() is not None:
        state = checkpointer.restore(state)
        print(
            f"resumed from checkpoint step {int(state.update_step)}",
            flush=True,
        )
    elif warm_start_params is not None:
        state = dataclasses.replace(
            state, params=jax.tree.map(jnp.array, warm_start_params)
        )
        print("warm-started afterstate value params", flush=True)
    step_fn = make_afterstate_td_step(config, model, optimizer)

    if mesh is not None:
        state = dataclasses.replace(
            state,
            env=mesh_lib.shard_env_state(state.env, mesh),
            params=mesh_lib.shard_params(state.params, mesh),
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
            eps = max(m["episodes"], 1.0)
            record = {
                "update": base + i + 1,
                "loss": m["loss"],
                "v_mean": m["v_mean"],
                "target_mean": m["target_mean"],
                "grad_norm": m["grad_norm"],
                "episodes": m["episodes"],
                "avg_episode_tile_sum": m["episode_tile_sum_sum"] / eps,
                "avg_episode_length": m["episode_length_sum"] / eps,
                "best_tile": m["best_tile"],
                "steps_per_sec": (i + 1)
                * config.batch_size
                * config.unroll_len
                / (time.perf_counter() - t0),
            }
            history.append(record)
            if logger is not None:
                logger.write(record)
            if checkpointer is not None:
                checkpointer.maybe_save(base + i + 1, state)
    return state, history

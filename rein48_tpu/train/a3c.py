# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Synchronous batched A3C (A2C) — the TPU-native actor-learner.

Where the reference runs ``cpu_count()`` Python threads, each stepping one
env and racing push/pull updates onto shared TF1 variables
(``/root/reference/algorithm/a3c/a3c.py:180-295``), this trainer steps B
envs in lockstep on device, unrolls T steps with one ``lax.scan``, computes
the exact same advantage-actor-critic math (``a3c.py:99-123,246-256``), and
applies ONE synchronous update. Batch decorrelation over thousands of envs
replaces worker asynchrony; the whole step — rollout, loss, grads, update —
is a single XLA program with zero host round-trips.

Scaling: the env batch shards over the mesh "dp" axis and params stay
replicated; under ``jax.jit`` with those shardings XLA inserts the gradient
all-reduce over ICI (see ``parallel/``). The same step function serves
1 chip, 8 chips, and multi-host meshes unchanged.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rein48_tpu.agents import a3c as a3c_agent
from rein48_tpu.engine import core, vector
from rein48_tpu.engine.core import RewardMode
from rein48_tpu.models import nets
from rein48_tpu.train import common


@dataclasses.dataclass(frozen=True)
class A3CConfig:
    """Trainer hyperparameters.

    Reference-parity values (``a3c.py:14-27``): ``unroll_len=100``
    (MAX_STEP_NUM), ``gamma=0.9``, ``entropy_beta=0.001``, ``lr=1e-3`` with
    ``optimizer="rmsprop"``, ``model="mlp"``, ``obs_encoding="raw"``,
    ``reward_mode=PARITY_ZERO``. Flagship defaults below are the TPU-native
    choices that actually learn (the parity setting cannot: its reward is
    identically zero).
    """

    batch_size: int = 4096
    unroll_len: int = 32
    model: str = "resnet"
    model_kwargs: Tuple[Tuple[str, Any], ...] = ()
    obs_encoding: str = "onehot"
    reward_mode: RewardMode = RewardMode.MERGE_SCORE
    reward_transform: str = "log2"
    use_legal_mask: bool = True
    gamma: float = 0.99
    entropy_beta: float = 0.01
    value_coef: float = 0.5
    normalize_advantage: bool = True
    optimizer: str = "adam"
    learning_rate: float = 3e-4
    max_grad_norm: float = 1.0
    parity_drop_last_reward: bool = False
    # Cosine lr decay over this many updates (0 = constant) and linear
    # entropy anneal — the round-4 PPO recipe (train/ppo.py) backported
    # per VERDICT r4 item 7: constant lr keeps the policy churning at the
    # end of long runs, and early exploration pressure should relax.
    lr_decay_updates: int = 0
    lr_final_frac: float = 0.1
    entropy_beta_final: Optional[float] = None
    entropy_decay_updates: int = 0

    def make_model(self) -> Any:
        return nets.make_model(self.model, **dict(self.model_kwargs))

    def make_learning_rate(self):
        """Scalar lr, or a cosine-decay optax schedule when configured
        (one optimizer step per update)."""
        if self.lr_decay_updates > 0:
            return optax.cosine_decay_schedule(
                self.learning_rate,
                self.lr_decay_updates,
                alpha=self.lr_final_frac,
            )
        return self.learning_rate

    @classmethod
    def reference_parity(cls, **overrides) -> "A3CConfig":
        """The reference's exact training regime (quirks and all)."""
        base = dict(
            batch_size=64,
            unroll_len=100,
            model="mlp",
            obs_encoding="raw",
            reward_mode=RewardMode.PARITY_ZERO,
            reward_transform="identity",
            use_legal_mask=False,
            gamma=0.9,
            entropy_beta=0.001,
            value_coef=1.0,
            optimizer="rmsprop",
            learning_rate=1e-3,
            normalize_advantage=False,
            parity_drop_last_reward=True,
        )
        base.update(overrides)
        return cls(**base)


@struct.dataclass
class Transition:
    """One rollout step, [T, B]-stacked by ``lax.scan``."""

    boards: jax.Array  # uint8[B, 4, 4] — s_t (the fix of a3c.py:203-207)
    actions: jax.Array
    rewards: jax.Array  # transformed
    dones: jax.Array
    # Legal-action mask at s_t. The loss MUST evaluate the same (masked)
    # policy that sampled the actions: computing log-prob/entropy on raw
    # logits while acting masked makes logp_a unbounded and lets the raw
    # head saturate (observed: entropy pinned at 0 within 150 updates).
    legal_mask: jax.Array


@struct.dataclass
class A3CTrainState:
    params: Any
    opt_state: Any
    env: core.EnvState  # [B]
    key: jax.Array
    update_step: jax.Array


def init_a3c(
    config: A3CConfig, key: jax.Array
) -> Tuple[A3CTrainState, Any, optax.GradientTransformation]:
    """Build params, optimizer state, and the initial env batch."""
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
    state = A3CTrainState(
        params=params,
        opt_state=optimizer.init(params),
        env=vector.reset_batch(k_env, config.batch_size),
        key=k_state,
        update_step=jnp.asarray(0, jnp.int32),
    )
    return state, model, optimizer


def make_a3c_step(
    config: A3CConfig, model: Any, optimizer: optax.GradientTransformation
) -> Callable[[A3CTrainState], Tuple[A3CTrainState, dict]]:
    """Build the fused train step: rollout -> returns -> grads -> update.

    Returns an UNJITTED pure function; callers jit it (optionally with mesh
    shardings — see ``train_a3c`` and ``parallel/``).
    """
    loss_cfg = a3c_agent.A3CLossConfig(
        gamma=config.gamma,
        entropy_beta=config.entropy_beta,
        value_coef=config.value_coef,
        normalize_advantage=config.normalize_advantage,
        parity_drop_last_reward=config.parity_drop_last_reward,
    )
    T, B = config.unroll_len, config.batch_size

    def policy(params, boards, *, train, rngs=None):
        obs = common.encode_obs(boards, config.obs_encoding)
        return model.apply({"params": params}, obs, train=train, rngs=rngs)

    def step_fn(state: A3CTrainState) -> Tuple[A3CTrainState, dict]:
        key, k_roll, k_drop = jax.random.split(state.key, 3)

        if config.entropy_beta_final is not None and config.entropy_decay_updates > 0:
            frac = jnp.clip(
                state.update_step.astype(jnp.float32)
                / config.entropy_decay_updates,
                0.0,
                1.0,
            )
            beta = config.entropy_beta + frac * (
                config.entropy_beta_final - config.entropy_beta
            )
            step_loss_cfg = loss_cfg._replace(entropy_beta=beta)
        else:
            step_loss_cfg = loss_cfg

        def body(carry, _):
            env, k = carry
            k, k_act = jax.random.split(k)
            logits, _ = policy(state.params, env.boards, train=False)
            if config.use_legal_mask:
                mask = core.legal_action_mask(env.boards)
            else:
                mask = jnp.ones(logits.shape, dtype=bool)
            actions = a3c_agent.sample_actions(k_act, logits, mask)
            env2, out = vector.step_autoreset(env, actions, config.reward_mode)
            trans = Transition(
                boards=env.boards,
                actions=actions,
                rewards=common.transform_reward(
                    out.reward, config.reward_transform
                ),
                dones=out.done,
                legal_mask=mask,
            )
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

        _, bootstrap = policy(state.params, env.boards, train=False)
        targets = a3c_agent.n_step_returns(
            traj.rewards,
            bootstrap,
            config.gamma,
            dones=traj.dones,
            parity_drop_last_reward=config.parity_drop_last_reward,
        )

        def loss_fn(params):
            flat_boards = traj.boards.reshape((-1,) + traj.boards.shape[2:])
            logits, values = policy(
                params, flat_boards, train=True, rngs={"dropout": k_drop}
            )
            logits = logits.reshape(T, B, nets.NUM_ACTIONS)
            values = values.reshape(T, B)
            # Evaluate the behavior policy: same mask as at sampling time.
            logits = a3c_agent.masked_logits(logits, traj.legal_mask)
            return a3c_agent.a3c_loss(
                logits, values, traj.actions, targets, step_loss_cfg
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        num_eps = jnp.sum(infos["episodes"])
        metrics = {
            **{k: v for k, v in aux.items()},
            "grad_norm": common.tree_norm(grads),
            "episodes": num_eps,
            # Sums, not means: host divides by `episodes` so metrics
            # aggregate exactly across steps/devices.
            "episode_tile_sum_sum": jnp.sum(infos["episode_tile_sum"]),
            "episode_length_sum": jnp.sum(infos["episode_length"]),
            "best_tile": jnp.max(infos["max_tile"]),
            "env_steps": jnp.asarray(T * B, jnp.float32),
        }
        new_state = A3CTrainState(
            params=params,
            opt_state=opt_state,
            env=env,
            key=key,
            update_step=state.update_step + 1,
        )
        return new_state, metrics

    return step_fn


def train_a3c(
    config: A3CConfig,
    num_updates: int,
    seed: int = 0,
    mesh=None,
    log_every: int = 10,
    logger=None,
    checkpointer=None,
) -> Tuple[A3CTrainState, list]:
    """Host driver: jit the step (optionally mesh-sharded) and loop.

    Replaces the reference's ``__main__`` thread fan-out + Coordinator
    (``a3c.py:259-295``). Returns the final state and the metric history.
    """
    from rein48_tpu.parallel import mesh as mesh_lib

    state, model, optimizer = init_a3c(config, jax.random.key(seed))
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
    step_fn = make_a3c_step(config, model, optimizer)

    if mesh is not None:
        state = dataclasses.replace(
            state,
            env=mesh_lib.shard_env_state(state.env, mesh),
            # Replicated when tp=1; kernels tp-sharded otherwise (the
            # optimizer moments mirror the param specs). See mesh.py.
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
            # One batched transfer (device_get) — per-scalar float() costs
            # a tunnel round trip each in this environment.
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            dt = time.perf_counter() - t0
            eps = max(m["episodes"], 1.0)
            record = {
                "update": base + i + 1,
                "loss": m["loss"],
                "actor_loss": m["actor_loss"],
                "critic_loss": m["critic_loss"],
                "entropy": m["entropy"],
                "grad_norm": m["grad_norm"],
                "episodes": m["episodes"],
                "avg_episode_tile_sum": m["episode_tile_sum_sum"] / eps,
                "avg_episode_length": m["episode_length_sum"] / eps,
                "best_tile": m["best_tile"],
                "steps_per_sec": (i + 1)
                * config.batch_size
                * config.unroll_len
                / dt,
            }
            history.append(record)
            if logger is not None:
                logger.write(record)
            if checkpointer is not None:
                checkpointer.maybe_save(base + i + 1, state)
    return state, history

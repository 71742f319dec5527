# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""PPO trainer — multi-epoch clipped-surrogate on the A3C rollout engine.

The reference's only on-policy trainer is asynchronous A3C
(``/root/reference/algorithm/a3c/a3c.py:180-295``); this is the same
actor-critic family with today's loss. One training step is a single XLA
program: ``lax.scan`` rollout over T steps of B lockstep envs (identical
acting path to ``train/a3c.py``), GAE over the trajectory, then
``num_epochs`` x ``num_minibatches`` clipped-surrogate updates via a
nested ``lax.scan`` — fresh minibatch permutation per epoch, zero host
round-trips.

TPU rationale: acting (env stepping + policy forwards) and learning run
in the same program, and PPO's epoch reuse multiplies MXU work per
env-step — the learner minibatches are large dense batches that tile
straight onto the systolic array. The env batch shards over the mesh
"dp" axis exactly as in A3C; params stay replicated and XLA inserts the
gradient all-reduce over ICI (see ``parallel/``). NOTE on sharded
minibatching: the per-epoch permutation is over the FLAT [T*B] batch and
would gather across devices; under a mesh we instead permute within the
time axis only (``shard_friendly_perm=True`` default) so every gather is
device-local.
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
from rein48_tpu.agents import ppo as ppo_agent
from rein48_tpu.engine import core, vector
from rein48_tpu.engine.core import RewardMode
from rein48_tpu.models import nets
from rein48_tpu.train import common


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Trainer hyperparameters (PPO defaults tuned for 2048 scale)."""

    batch_size: int = 4096
    unroll_len: int = 32
    model: str = "resnet"
    model_kwargs: Tuple[Tuple[str, Any], ...] = ()
    obs_encoding: str = "onehot"
    reward_mode: RewardMode = RewardMode.MERGE_SCORE
    reward_transform: str = "log2"
    use_legal_mask: bool = True
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    num_epochs: int = 4
    num_minibatches: int = 4
    entropy_beta: float = 0.01
    value_coef: float = 0.5
    # Value clipping uses its own ABSOLUTE radius (value_clip_eps), not
    # clip_eps: with log2 rewards and gamma=0.99 returns reach ~1e2, so a
    # 0.2 radius would zero the critic gradient once V moves 0.2 from its
    # rollout estimate. Off by default (PPO2 clipping rarely helps).
    clip_value: bool = False
    value_clip_eps: float = 10.0
    normalize_advantage: bool = True  # per-minibatch, PPO convention
    optimizer: str = "adam"
    learning_rate: float = 3e-4
    # Cosine-decay the learning rate over this many UPDATES (0 = constant).
    # Internally scaled by num_epochs*num_minibatches optimizer steps per
    # update; the floor is lr_final_frac * learning_rate. Long-horizon runs
    # want this: constant lr keeps the policy churning at the end.
    lr_decay_updates: int = 0
    lr_final_frac: float = 0.1
    # Linear entropy-bonus anneal over entropy_decay_updates updates, from
    # entropy_beta down to entropy_beta_final (None = constant). Early
    # exploration pressure, late exploitation.
    entropy_beta_final: Optional[float] = None
    entropy_decay_updates: int = 0
    max_grad_norm: float = 0.5
    # True => per-epoch shuffles permute the time axis per-env only, so
    # minibatch gathers never cross the "dp"-sharded env axis (mesh-safe).
    # False => full [T*B] permutation (single-device only; lower variance).
    shard_friendly_perm: bool = True
    # --- Afterstate critic (VERDICT r4 item 1) ---------------------------
    # The planner (control/search.py) backs values up through PRE-spawn
    # afterstates, but the PPO critic is trained on POST-spawn states —
    # the round-4 measurement showed value-guided depth-1 search LOSING to
    # the greedy policy head for exactly this mismatch (BASELINE.md r4).
    # With afterstate_critic=True the trainer co-trains a second,
    # SEPARATE value network V_after on the rollout's afterstates with
    # TD(lambda) targets (the n-tuple recipe, train/ntuple.py:209-251,
    # applied to a dense net): V_after(as_t) regresses onto the GAE
    # return of s_{t+1}, cut at episode bounds, so the planner backup
    # q(a) = r(a) + gamma * V_after(after(s, a)) is Bellman-consistent.
    # Params become {"policy": ..., "after": ...} (one optimizer).
    afterstate_critic: bool = False
    after_model: str = "resnet"
    after_model_kwargs: Tuple[Tuple[str, Any], ...] = ()
    after_coef: float = 0.5

    def make_model(self) -> Any:
        return nets.make_model(self.model, **dict(self.model_kwargs))

    def make_after_model(self) -> Any:
        return nets.make_model(self.after_model, **dict(self.after_model_kwargs))

    def make_learning_rate(self):
        """Scalar lr, or a cosine-decay optax schedule when configured."""
        if self.lr_decay_updates > 0:
            steps = self.lr_decay_updates * self.num_epochs * self.num_minibatches
            return optax.cosine_decay_schedule(
                self.learning_rate, steps, alpha=self.lr_final_frac
            )
        return self.learning_rate


@struct.dataclass
class PPOTransition:
    """One rollout step, [T, B]-stacked by ``lax.scan``."""

    boards: jax.Array  # uint8[B, 4, 4] — s_t
    actions: jax.Array
    rewards: jax.Array  # transformed
    dones: jax.Array
    legal_mask: jax.Array  # mask at s_t; the loss re-masks identically
    behavior_logp: jax.Array  # log pi(a_t | s_t) at sampling time
    behavior_value: jax.Array  # V(s_t) at sampling time
    # uint8[B, 4, 4] pre-spawn afterstate of (s_t, a_t); None unless
    # config.afterstate_critic (None is pytree-transparent in the scan).
    after_boards: Any = None


@struct.dataclass
class PPOTrainState:
    params: Any
    opt_state: Any
    env: core.EnvState  # [B]
    key: jax.Array
    update_step: jax.Array


def init_ppo(
    config: PPOConfig, key: jax.Array
) -> Tuple[PPOTrainState, Any, optax.GradientTransformation]:
    """Build params, optimizer state, and the initial env batch."""
    model = config.make_model()
    k_param, k_env, k_state = jax.random.split(key, 3)
    obs = common.encode_obs(
        jnp.zeros((1, core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
        config.obs_encoding,
    )
    params = model.init(k_param, obs)["params"]
    if config.afterstate_critic:
        k_param, k_after = jax.random.split(k_param)
        after_params = config.make_after_model().init(k_after, obs)["params"]
        params = {"policy": params, "after": after_params}
    optimizer = common.make_optimizer(
        config.optimizer,
        config.make_learning_rate(),
        max_grad_norm=config.max_grad_norm,
    )
    state = PPOTrainState(
        params=params,
        opt_state=optimizer.init(params),
        env=vector.reset_batch(k_env, config.batch_size),
        key=k_state,
        update_step=jnp.asarray(0, jnp.int32),
    )
    return state, model, optimizer


def make_ppo_step(
    config: PPOConfig, model: Any, optimizer: optax.GradientTransformation
) -> Callable[[PPOTrainState], Tuple[PPOTrainState, dict]]:
    """Build the fused step: rollout -> GAE -> epochs x minibatches.

    Returns an UNJITTED pure function; callers jit it (optionally with
    mesh shardings, as in ``train/a3c.py``).
    """
    loss_cfg = ppo_agent.PPOLossConfig(
        clip_eps=config.clip_eps,
        entropy_beta=config.entropy_beta,
        value_coef=config.value_coef,
        clip_value=config.clip_value,
        value_clip_eps=config.value_clip_eps,
    )
    T, B = config.unroll_len, config.batch_size
    M = config.num_minibatches
    if (T * B) % M:
        raise ValueError(f"unroll_len*batch_size={T * B} not divisible by {M}")
    if config.shard_friendly_perm and T % M:
        raise ValueError(
            f"shard_friendly_perm needs unroll_len={T} divisible by "
            f"num_minibatches={M} (minibatches slice the time axis)"
        )

    after_model = config.make_after_model() if config.afterstate_critic else None

    def policy_params(params):
        return params["policy"] if config.afterstate_critic else params

    def policy(params, boards):
        obs = common.encode_obs(boards, config.obs_encoding)
        # train=False throughout: the clipped ratio must compare the SAME
        # deterministic policy across epochs (stochastic dropout would
        # corrupt it). The MLP's dropout is a reference no-op anyway
        # (a3c.py:147,160 — see models/nets.py).
        return model.apply({"params": policy_params(params)}, obs, train=False)

    def after_value(params, boards):
        obs = common.encode_obs(boards, config.obs_encoding)
        out = after_model.apply({"params": params["after"]}, obs, train=False)
        # Policy-net modules return (logits, value); the value head IS the
        # afterstate critic (the logits head is unused, and tiny).
        return out[1] if isinstance(out, tuple) else out

    def step_fn(state: PPOTrainState) -> Tuple[PPOTrainState, dict]:
        key, k_roll, k_learn = jax.random.split(state.key, 3)

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
            logits, value = policy(state.params, env.boards)
            if config.use_legal_mask:
                mask = core.legal_action_mask(env.boards)
            else:
                mask = jnp.ones(logits.shape, dtype=bool)
            mlogits = a3c_agent.masked_logits(logits, mask)
            actions = jax.random.categorical(k_act, mlogits)
            logp = jax.nn.log_softmax(mlogits)
            logp_a = jnp.take_along_axis(
                logp, actions[..., None], axis=-1
            )[..., 0]
            env2, out = vector.step_autoreset(env, actions, config.reward_mode)
            if config.afterstate_critic:
                # Pre-spawn afterstate of (s_t, a_t): recomputing the move
                # is a few VPU ops — far cheaper than threading it out of
                # the fused autoreset step.
                after_boards, _, _ = core.move_boards(env.boards, actions)
            else:
                after_boards = None
            trans = PPOTransition(
                boards=env.boards,
                actions=actions,
                rewards=common.transform_reward(
                    out.reward, config.reward_transform
                ),
                dones=out.done,
                legal_mask=mask,
                behavior_logp=logp_a,
                behavior_value=value,
                after_boards=after_boards,
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

        _, bootstrap = policy(state.params, env.boards)
        advantages, returns = ppo_agent.gae(
            traj.rewards,
            traj.behavior_value,
            bootstrap,
            config.gamma,
            config.gae_lambda,
            dones=traj.dones,
        )
        if config.afterstate_critic:
            # V_after(as_t) ~ E_spawn[V(s_{t+1})]; see
            # agents/ppo.py::afterstate_targets for the derivation.
            after_targets = ppo_agent.afterstate_targets(
                returns, bootstrap, traj.dones
            )
        else:
            after_targets = None
        data = (traj, advantages, returns, after_targets)  # all [T, B, ...]

        def minibatch_loss(params, mb):
            tr, adv, ret, after_targ = mb
            logits, values = policy(params, tr.boards)
            logits = a3c_agent.masked_logits(logits, tr.legal_mask)
            if config.normalize_advantage:
                adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-6)
            loss, aux = ppo_agent.ppo_loss(
                logits,
                values,
                tr.actions,
                tr.behavior_logp,
                tr.behavior_value,
                adv,
                ret,
                step_loss_cfg,
            )
            if config.afterstate_critic:
                v_after = after_value(params, tr.after_boards)
                after_loss = jnp.mean(
                    jnp.square(v_after - jax.lax.stop_gradient(after_targ))
                )
                loss = loss + config.after_coef * after_loss
                aux["after_loss"] = after_loss
                aux["loss"] = loss
            return loss, aux

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
            # Permute the time axis independently per env, then slice it
            # into M minibatches of [T/M, B]: gathers stay within each
            # device's env shard, so this runs unchanged on a "dp" mesh.
            def epoch(carry, k_epoch):
                perm = jax.vmap(
                    lambda k: jax.random.permutation(k, T), out_axes=1
                )(jax.random.split(k_epoch, B))  # int32[T, B]
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
                    lambda x: x[perm].reshape((M, (T * B) // M) + x.shape[1:]),
                    flat,
                )
                return jax.lax.scan(sgd_step, carry, mbs)

        (params, opt_state), aux = jax.lax.scan(
            epoch,
            (state.params, state.opt_state),
            jax.random.split(k_learn, config.num_epochs),
        )
        # aux leaves are [num_epochs, M]; report the final-epoch mean and
        # keep approx_kl's last value (the stop-early diagnostic).
        metrics = {k: jnp.mean(v[-1]) for k, v in aux.items()}
        metrics["approx_kl_last"] = aux["approx_kl"][-1, -1]

        num_eps = jnp.sum(infos["episodes"])
        metrics.update(
            episodes=num_eps,
            episode_tile_sum_sum=jnp.sum(infos["episode_tile_sum"]),
            episode_length_sum=jnp.sum(infos["episode_length"]),
            best_tile=jnp.max(infos["max_tile"]),
            env_steps=jnp.asarray(T * B, jnp.float32),
        )
        new_state = PPOTrainState(
            params=params,
            opt_state=opt_state,
            env=env,
            key=key,
            update_step=state.update_step + 1,
        )
        return new_state, metrics

    return step_fn


def train_ppo(
    config: PPOConfig,
    num_updates: int,
    seed: int = 0,
    mesh=None,
    log_every: int = 10,
    logger=None,
    checkpointer=None,
    warm_start_policy=None,
) -> Tuple[PPOTrainState, list]:
    """Host driver: jit the step (optionally mesh-sharded) and loop.

    ``warm_start_policy``: optional policy-net param tree to start from
    (e.g. a prior flagship checkpoint's params via
    ``Checkpointer.restore_field("params")``) — applied only when there is
    no checkpoint of THIS run to resume; with ``afterstate_critic`` it
    fills the "policy" subtree and the afterstate net starts fresh.
    """
    from rein48_tpu.parallel import mesh as mesh_lib

    state, model, optimizer = init_ppo(config, jax.random.key(seed))
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
    elif warm_start_policy is not None:
        params = (
            {"policy": warm_start_policy, "after": state.params["after"]}
            if config.afterstate_critic
            else warm_start_policy
        )
        # Copy (not alias): the jitted step donates its input state, which
        # would delete the caller's donor arrays in place.
        state = dataclasses.replace(
            state, params=jax.tree.map(jnp.array, params)
        )
        print("warm-started policy params", flush=True)
    step_fn = make_ppo_step(config, model, optimizer)

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
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            eps = max(m["episodes"], 1.0)
            record = {
                "update": base + i + 1,
                "loss": m["loss"],
                "actor_loss": m["actor_loss"],
                "critic_loss": m["critic_loss"],
                "entropy": m["entropy"],
                "approx_kl": m["approx_kl_last"],
                "clip_frac": m["clip_frac"],
                **(
                    {"after_loss": m["after_loss"]}
                    if "after_loss" in m
                    else {}
                ),
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

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""PPO losses and generalized advantage estimation (GAE).

The reference ships only asynchronous A3C
(``/root/reference/algorithm/a3c/a3c.py``); PPO is this framework's
modern on-policy upgrade of that same actor-critic family — the loss the
reference *would* use today. It reuses the A3C rollout machinery
(``train/a3c.py``) and differs only in the math:

* advantages come from GAE(lambda) instead of raw n-step TD — one
  reversed ``lax.scan`` exactly like ``agents/a3c.py::n_step_returns``
  (``a3c.py:246-256``'s backward pass, generalized);
* the policy-gradient term is the clipped importance-ratio surrogate,
  so the SAME rollout batch can be reused for several optimizer epochs
  — on TPU this multiplies MXU work per env-step (the expensive part is
  acting through the env; learning epochs are nearly free compute).

Everything is shape-polymorphic over leading axes ([T, B] or flat [N]).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PPOLossConfig(NamedTuple):
    """Clipped-surrogate hyperparameters (PPO defaults).

    clip_eps: importance-ratio clip radius (relative: ratio in 1 ± eps).
    entropy_beta: entropy bonus weight (same role as ``ENTROPY_BETA``,
        ``a3c.py:21``).
    value_coef: critic loss weight.
    clip_value: if True, also clip the value prediction around its
        rollout-time estimate (PPO2-style) before the squared error.
        Off by default: with log2 rewards and gamma=0.99 returns reach
        ~1e2, so an absolute clip radius throttles critic learning.
    value_clip_eps: ABSOLUTE clip radius on value predictions when
        ``clip_value`` is on. Separate from ``clip_eps`` (which is a
        relative radius on the ratio); scale it to return magnitude.
    """

    clip_eps: float = 0.2
    entropy_beta: float = 0.01
    value_coef: float = 0.5
    clip_value: bool = False
    value_clip_eps: float = 10.0


def gae(
    rewards: jax.Array,
    values: jax.Array,
    bootstrap: jax.Array,
    gamma: float,
    lam: float,
    *,
    dones: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation over the rollout time axis.

    ``delta[t] = r[t] + gamma * cont[t] * V[t+1] - V[t]`` and
    ``adv[t] = delta[t] + gamma * lam * cont[t] * adv[t+1]``, with
    ``V[T] = bootstrap`` and ``cont = 1 - dones`` cutting both recursions
    at auto-reset episode boundaries (same role as the ``dones`` cut in
    ``a3c.n_step_returns``). One reversed ``lax.scan``; fuses into the
    training step.

    At ``lam=1`` the returns ``adv + values`` equal the discounted n-step
    targets of ``a3c.n_step_returns`` exactly (pinned by tests).

    Args:
        rewards: ``float32[T, ...]``.
        values: ``float32[T, ...]`` V(s_t) under the behavior params.
        bootstrap: ``float32[...]`` V(s_T) beyond the horizon (0 if
            terminal — callers zero it via ``dones`` semantics upstream).
        gamma: discount factor.
        lam: GAE lambda in [0, 1].
        dones: optional ``bool[T, ...]`` episode-end flags.

    Returns:
        ``(advantages, returns)`` both ``float32[T, ...]``; ``returns``
        (= advantages + values) are the critic regression targets.
    """
    if dones is None:
        cont = jnp.ones_like(rewards)
    else:
        cont = 1.0 - dones.astype(rewards.dtype)
    next_values = jnp.concatenate([values[1:], bootstrap[None]], axis=0)
    deltas = rewards + gamma * cont * next_values - values

    def body(carry, inp):
        delta, c = inp
        adv = delta + gamma * lam * c * carry
        return adv, adv

    _, advantages = jax.lax.scan(
        body, jnp.zeros_like(bootstrap), (deltas, cont), reverse=True
    )
    return advantages, advantages + values


def afterstate_targets(
    returns: jax.Array, bootstrap: jax.Array, dones: jax.Array
) -> jax.Array:
    """Regression targets for an afterstate critic V_after (VERDICT r4 #1).

    The 2048 transition factors as s_t --move a_t--> afterstate as_t
    (merge reward r_t paid here) --spawn--> s_{t+1}; define
    ``V_after(as_t) = E_spawn[V(s_{t+1})]`` so a planner backup
    ``q(a) = r(a) + gamma * V_after(after(s, a))`` equals Q(s, a)
    (``control/search.py`` with ``reward_fn``/``gamma`` in critic units).
    The sample target is therefore the NEXT step's return — ``returns``
    shifted by one, with ``bootstrap`` = V(s_T) past the horizon — and 0
    where the episode ended at t (a terminal afterstate has no future
    reward, and the post-reset return must not leak across the boundary).
    This is the n-tuple afterstate-TD recipe (``train/ntuple.py:209-251``)
    expressed through GAE returns.

    Args:
        returns: ``float32[T, ...]`` GAE returns (targets for V(s_t)).
        bootstrap: ``float32[...]`` V(s_T).
        dones: ``bool[T, ...]`` episode-end flags.

    Returns:
        ``float32[T, ...]`` targets for V_after(as_t).
    """
    cont = 1.0 - dones.astype(returns.dtype)
    return cont * jnp.concatenate([returns[1:], bootstrap[None]], axis=0)


def ppo_loss(
    logits: jax.Array,
    values: jax.Array,
    actions: jax.Array,
    behavior_logp: jax.Array,
    behavior_values: jax.Array,
    advantages: jax.Array,
    returns: jax.Array,
    config: PPOLossConfig = PPOLossConfig(),
):
    """Clipped-surrogate PPO loss over a (mini)batch.

    ``ratio = exp(log pi_new(a) - log pi_behavior(a))``;
    actor = -mean(min(ratio * A, clip(ratio, 1±eps) * A));
    critic = mean squared error to ``returns``, optionally with the value
    prediction clipped to ``behavior_values ± eps`` (pessimistic max of
    clipped/unclipped errors); entropy bonus as in ``a3c.a3c_loss``.

    ``logits`` must already be masked identically to sampling time
    (``a3c.masked_logits``) — the ratio is only meaningful against the
    behavior policy that actually sampled ``actions``.

    Args:
        logits: ``float32[..., 4]`` current-params (masked) logits.
        values: ``float32[...]`` current-params value predictions.
        actions: ``int32[...]`` sampled actions.
        behavior_logp: ``float32[...]`` log pi(a) at sampling time.
        behavior_values: ``float32[...]`` V(s) at sampling time.
        advantages: ``float32[...]`` GAE advantages (no grad flows in).
        returns: ``float32[...]`` critic targets (no grad flows in).

    Returns:
        ``(loss, aux dict)`` with approx_kl / clip_frac diagnostics.
    """
    advantages = jax.lax.stop_gradient(advantages)
    returns = jax.lax.stop_gradient(returns)

    logp = jax.nn.log_softmax(logits)
    p = jax.nn.softmax(logits)
    logp_a = jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]
    log_ratio = logp_a - behavior_logp
    ratio = jnp.exp(log_ratio)

    unclipped = ratio * advantages
    clipped = (
        jnp.clip(ratio, 1.0 - config.clip_eps, 1.0 + config.clip_eps)
        * advantages
    )
    actor_loss = -jnp.mean(jnp.minimum(unclipped, clipped))

    if config.clip_value:
        v_clip = behavior_values + jnp.clip(
            values - behavior_values,
            -config.value_clip_eps,
            config.value_clip_eps,
        )
        critic_loss = jnp.mean(
            jnp.maximum(
                jnp.square(values - returns), jnp.square(v_clip - returns)
            )
        )
    else:
        critic_loss = jnp.mean(jnp.square(values - returns))

    entropy = -jnp.sum(p * logp, axis=-1)
    loss = (
        actor_loss
        + config.value_coef * critic_loss
        - config.entropy_beta * jnp.mean(entropy)
    )
    aux = {
        "loss": loss,
        "actor_loss": actor_loss,
        "critic_loss": critic_loss,
        "entropy": jnp.mean(entropy),
        # Schulman's low-variance KL estimator E[(r - 1) - log r].
        "approx_kl": jnp.mean((ratio - 1.0) - log_ratio),
        "clip_frac": jnp.mean(
            (jnp.abs(ratio - 1.0) > config.clip_eps).astype(jnp.float32)
        ),
    }
    return loss, aux

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""A3C losses and n-step returns.

TPU-native restatement of the reference's A3C math
(``/root/reference/algorithm/a3c/a3c.py``):

* n-step discounted targets built backward from a bootstrap value
  (``a3c.py:246-256``) — here one reversed ``lax.scan`` over the rollout's
  time axis instead of a Python list loop;
* critic loss = mean(td^2), actor loss = -mean(log pi(a) * td +
  beta * entropy) (``a3c.py:99-123``, ``ENTROPY_BETA`` ``a3c.py:21``).

The reference's asynchronous pull/push parameter server (``a3c.py:69-86``)
does not survive the port — SPMD learners are synchronous; the batch axis
over thousands of envs replaces worker asynchrony as the decorrelator.

Reference quirks, reproducible behind flags (off by default; see
SURVEY.md §7.5 for the bug-parity policy):

* ``parity_drop_last_reward`` — the backward pass seeds with the bootstrap
  and never consumes the final reward (``a3c.py:251``);
* the reference pairs a_t with the POST-action state s_{t+1}
  (``a3c.py:203-207``); rollouts here store s_t (the fix), and the parity
  harness documents the quirk rather than reproducing it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class A3CLossConfig(NamedTuple):
    """Loss hyperparameters (defaults = reference values).

    gamma: discount (``GAMMA = 0.9``, ``a3c.py:22``... reference sets 0.9
        at ``a3c.py:247`` via the backward pass constant).
    entropy_beta: entropy bonus weight (``ENTROPY_BETA = 0.001``,
        ``a3c.py:21``).
    value_coef: critic loss weight (1.0 == reference's separate-optimizer
        setup for disjoint towers; tune below 1 for shared trunks).
    parity_drop_last_reward: reproduce the ``a3c.py:251`` off-by-one.
    """

    gamma: float = 0.9
    entropy_beta: float = 0.001
    value_coef: float = 1.0
    # Normalize advantages to zero-mean/unit-std over the whole rollout
    # batch before the policy-gradient term. Not in the reference (its
    # raw-TD actor term is one reason it can never stabilize); essential
    # at 2048's reward scale. Critic still regresses raw targets.
    normalize_advantage: bool = False
    parity_drop_last_reward: bool = False


def n_step_returns(
    rewards: jax.Array,
    bootstrap: jax.Array,
    gamma: float,
    *,
    dones: jax.Array | None = None,
    parity_drop_last_reward: bool = False,
) -> jax.Array:
    """Discounted n-step targets, computed backward over the time axis.

    ``targets[t] = rewards[t] + gamma * targets[t+1]``, seeded with
    ``targets[T] = bootstrap`` (0 at terminal, V(s_T) otherwise —
    ``a3c.py:218-223``). One ``lax.scan`` with ``reverse=True``; no Python
    loops, so it fuses into the training step.

    The reference rollout stops at episode end so its recursion never
    crosses an episode boundary; the batched auto-reset engine keeps
    stepping, so pass ``dones`` and the recursion is cut at boundaries:
    ``targets[t] = rewards[t] + gamma * (1 - dones[t]) * targets[t+1]``.

    Args:
        rewards: ``float32[T, ...]``.
        bootstrap: ``float32[...]`` value estimate beyond the horizon.
        gamma: discount factor.
        dones: optional ``bool[T, ...]`` episode-end flags per step.
        parity_drop_last_reward: if True, replicate the reference bug where
            the last reward is never consumed (``a3c.py:251``):
            ``targets[T-1] = bootstrap`` exactly (instead of
            ``rewards[T-1] + gamma * bootstrap``), with the recursion
            otherwise unchanged.

    Returns:
        ``float32[T, ...]`` targets.
    """
    if dones is None:
        cont = jnp.ones_like(rewards)
    else:
        cont = 1.0 - dones.astype(rewards.dtype)

    def body(carry, inp):
        r, c = inp
        tgt = r + gamma * c * carry
        return tgt, tgt

    if parity_drop_last_reward:
        _, head = jax.lax.scan(
            body, bootstrap, (rewards[:-1], cont[:-1]), reverse=True
        )
        return jnp.concatenate([head, bootstrap[None]], axis=0)

    _, targets = jax.lax.scan(body, bootstrap, (rewards, cont), reverse=True)
    return targets


def masked_logits(logits: jax.Array, legal_mask: jax.Array) -> jax.Array:
    """Push illegal actions to -inf (guarding the all-illegal terminal)."""
    neg = jnp.asarray(-1e9, logits.dtype)
    out = jnp.where(legal_mask, logits, neg)
    all_illegal = ~jnp.any(legal_mask, axis=-1, keepdims=True)
    return jnp.where(all_illegal, logits, out)


def sample_actions(
    key: jax.Array, logits: jax.Array, legal_mask: jax.Array | None = None
) -> jax.Array:
    """Sample from softmax(logits), optionally masked to legal moves.

    The device-side replacement for the reference's per-step
    ``SESS.run`` + ``np.random.choice`` (``a3c.py:89-93``).
    """
    if legal_mask is not None:
        logits = masked_logits(logits, legal_mask)
    return jax.random.categorical(key, logits)


def a3c_loss(
    logits: jax.Array,
    values: jax.Array,
    actions: jax.Array,
    targets: jax.Array,
    config: A3CLossConfig = A3CLossConfig(),
):
    """Joint actor+critic loss over a rollout batch.

    Semantics of ``NetworkTool.get_loss_value`` (``a3c.py:99-123``):
    ``td = target - V``; critic = mean(td^2); actor =
    -mean(log pi(a) * stop_grad(td) + beta * entropy). The reference keeps
    two optimizers over disjoint towers; with a joint loss and one
    optimizer the gradients are identical for disjoint parameters and
    correctly shared for trunk parameters.

    Args:
        logits: ``float32[..., 4]`` (any leading shape, e.g. [T, B]).
        values: ``float32[...]``.
        actions: ``int32[...]``.
        targets: ``float32[...]`` n-step targets (no gradient flows in).
    Returns:
        ``(loss, aux dict)``.
    """
    targets = jax.lax.stop_gradient(targets)
    td = targets - values
    critic_loss = jnp.mean(jnp.square(td))

    adv = jax.lax.stop_gradient(td)
    if config.normalize_advantage:
        adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-6)

    logp = jax.nn.log_softmax(logits)
    p = jax.nn.softmax(logits)
    logp_a = jnp.take_along_axis(logp, actions[..., None], axis=-1)[..., 0]
    entropy = -jnp.sum(p * logp, axis=-1)
    actor_loss = -jnp.mean(logp_a * adv + config.entropy_beta * entropy)

    loss = actor_loss + config.value_coef * critic_loss
    aux = {
        "loss": loss,
        "actor_loss": actor_loss,
        "critic_loss": critic_loss,
        "entropy": jnp.mean(entropy),
        "td_abs": jnp.mean(jnp.abs(td)),
    }
    return loss, aux

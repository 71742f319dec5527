# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""DQN loss and exploration.

The "DQN replay variant" of the north star: the working realization of what
the reference's unfinished DDPG stack gestures at
(``/root/reference/algorithm/ddpg/``) — replay buffer, target network with
soft (Polyak, tau from ``agent.py:9``) or periodic hard sync, TD targets.
The reference bugs are NOT kept: per-sample rewards instead of the scalar
last-reward-for-the-whole-batch (``ddpg.py:42``), a real separate target
net instead of the aliased one (``actor.py:26``), and no softmax on a
1-unit Q output (``critic.py:78-83``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DQNLossConfig(NamedTuple):
    """DQN hyperparameters (gamma default = reference DDPG's 0.99,
    ``ddpg.py:9``)."""

    gamma: float = 0.99
    double_dqn: bool = True
    huber_delta: float = 1.0


def epsilon_greedy(
    key: jax.Array,
    q_values: jax.Array,
    epsilon: jax.Array,
    legal_mask: jax.Array | None = None,
) -> jax.Array:
    """Batched epsilon-greedy over Q(s, ·), optionally legality-masked.

    Args:
        key: PRNG key.
        q_values: ``float32[..., 4]``.
        epsilon: scalar exploration rate (traced — anneal on device).
        legal_mask: optional ``bool[..., 4]``.

    Returns:
        ``int32[...]`` actions.
    """
    batch_shape = q_values.shape[:-1]
    k_explore, k_rand = jax.random.split(key)
    if legal_mask is not None:
        neg = jnp.asarray(-1e9, q_values.dtype)
        any_legal = jnp.any(legal_mask, axis=-1, keepdims=True)
        masked_q = jnp.where(legal_mask | ~any_legal, q_values, neg)
        greedy = jnp.argmax(masked_q, axis=-1)
        logits = jnp.where(legal_mask | ~any_legal, 0.0, -jnp.inf)
        random_a = jax.random.categorical(k_rand, logits)
    else:
        greedy = jnp.argmax(q_values, axis=-1)
        random_a = jax.random.randint(k_rand, batch_shape, 0, q_values.shape[-1])
    explore = jax.random.uniform(k_explore, batch_shape) < epsilon
    return jnp.where(explore, random_a, greedy).astype(jnp.int32)


def huber(x: jax.Array, delta: float) -> jax.Array:
    absx = jnp.abs(x)
    return jnp.where(
        absx <= delta, 0.5 * jnp.square(x), delta * (absx - 0.5 * delta)
    )


def dqn_loss(
    q_online: jax.Array,
    q_online_next: jax.Array,
    q_target_next: jax.Array,
    actions: jax.Array,
    rewards: jax.Array,
    dones: jax.Array,
    config: DQNLossConfig = DQNLossConfig(),
):
    """TD loss over a sampled batch.

    ``target = r + gamma * (1 - done) * Q_target(s', a*)`` where ``a*`` is
    ``argmax Q_online(s', .)`` under double-DQN (else argmax of the target
    net). Compare the reference's ``ddpg.py:42``, which broadcasts the
    final step's scalar reward over the whole batch.

    Args:
        q_online: ``float32[B, 4]`` online net at s.
        q_online_next: ``float32[B, 4]`` online net at s' (for double-DQN).
        q_target_next: ``float32[B, 4]`` target net at s'.
        actions/rewards/dones: ``[B]`` transition fields.

    Returns:
        ``(loss, aux dict)``.
    """
    q_a = jnp.take_along_axis(q_online, actions[..., None], axis=-1)[..., 0]
    if config.double_dqn:
        next_a = jnp.argmax(q_online_next, axis=-1)
    else:
        next_a = jnp.argmax(q_target_next, axis=-1)
    q_next = jnp.take_along_axis(q_target_next, next_a[..., None], axis=-1)[..., 0]
    target = rewards + config.gamma * (1.0 - dones.astype(jnp.float32)) * q_next
    td = jax.lax.stop_gradient(target) - q_a
    loss = jnp.mean(huber(td, config.huber_delta))
    aux = {
        "loss": loss,
        "td_abs": jnp.mean(jnp.abs(td)),
        "q_mean": jnp.mean(q_a),
        "target_mean": jnp.mean(target),
    }
    return loss, aux


def polyak_update(target_params, online_params, tau: float):
    """Soft target update ``t = tau * t + (1 - tau) * o``.

    Matches the reference's convention where ``tau`` is the KEEP fraction
    (``actor.py:38-40``, ``agent.py:9`` — tau=0.9 keeps 90% of the target),
    as a ``tree_map`` over the param pytrees.
    """
    return jax.tree.map(
        lambda t, o: tau * t + (1.0 - tau) * o, target_params, online_params
    )

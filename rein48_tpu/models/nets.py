# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Policy/value networks.

Flax rebuilds of every net in the reference plus the TPU-first flagship:

* :class:`A3CMLP` — the reference A3C two-tower MLP
  (``/root/reference/algorithm/a3c/a3c.py:136-169``): shared flattened
  input; actor tower dense64/relu6 -> dropout(0.4) -> dense4/relu ->
  softmax; critic tower dense64/relu6 -> dropout -> dense1.
* :class:`CNNPolicy` — the reference DDPG actor CNN
  (``/root/reference/algorithm/ddpg/actor.py:51-85``): conv2x2x32 valid ->
  relu -> conv2x2x64 -> flatten -> dense4 (logits).
* :class:`QNetwork` — Q(s, ·) for all 4 actions in one forward pass (the
  TPU-native replacement for the reference critic's per-action Q(s,a),
  ``critic.py:50-85``, whose softmax-on-1-unit output bug we do not keep);
  optional dueling decomposition.
* :class:`ResNetPolicy` — the flagship policy+value net the reference's
  README promises but never ships (``README.md:20-22``): pre-activation
  residual tower over one-hot planes, joint policy/value heads,
  bfloat16-friendly.

All modules take the one-hot ``[..., 4, 4, 16]`` observation unless noted
and return ``(logits[..., 4], value[...])`` so every training loop shares
one interface. Dropout is interpreted at train time only, like the
reference's ``tf.layers.dropout`` with rate 0.4 (``a3c.py:147,160``).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_ACTIONS = 4


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


class A3CMLP(nn.Module):
    """Reference-parity two-tower MLP (``a3c.py:136-169``).

    Structure (reference semantics, Xavier init ``a3c.py:138``):
    flatten -> [actor] dense64 relu6 -> dropout 0.4 -> dense4 relu ->
    (softmax taken by the loss); [critic] dense64 relu6 -> dropout 0.4 ->
    dense1. The odd relu-before-softmax on the actor head is a reference
    quirk we keep in parity mode; set ``parity_relu_head=False`` for a
    plain linear policy head.
    """

    hidden: int = 64
    # NOTE: the reference passes no `training=` to tf.layers.dropout
    # (a3c.py:147,160), which defaults to False — its dropout is a NO-OP.
    # parity_noop_dropout=True (default) reproduces that regardless of the
    # caller's train flag; set False to make dropout actually work.
    dropout_rate: float = 0.4
    parity_noop_dropout: bool = True
    parity_relu_head: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array, *, train: bool = False):
        x = obs.reshape(obs.shape[: -3] + (-1,)).astype(self.dtype)
        init = nn.initializers.xavier_uniform()
        drop = (not train) or self.parity_noop_dropout

        a = nn.Dense(self.hidden, kernel_init=init, dtype=self.dtype, name="actor_fc")(x)
        a = nn.relu6(a)
        a = nn.Dropout(self.dropout_rate, deterministic=drop)(a)
        logits = nn.Dense(NUM_ACTIONS, kernel_init=init, dtype=self.dtype, name="actor_out")(a)
        if self.parity_relu_head:
            logits = nn.relu(logits)

        c = nn.Dense(self.hidden, kernel_init=init, dtype=self.dtype, name="critic_fc")(x)
        c = nn.relu6(c)
        c = nn.Dropout(self.dropout_rate, deterministic=drop)(c)
        value = nn.Dense(1, kernel_init=init, dtype=self.dtype, name="critic_out")(c)
        return logits.astype(jnp.float32), jnp.squeeze(value, -1).astype(jnp.float32)


class CNNPolicy(nn.Module):
    """Reference DDPG-actor CNN shape (``actor.py:51-85``) + a value head.

    conv 2x2x32 valid relu -> conv 2x2x64 valid relu -> flatten(256) ->
    dense4 logits. The reference has no value head on this net; we add a
    linear one off the shared trunk so the same net serves actor-critic
    training (heads are cheap; a headless parity forward just ignores it).
    """

    channels: Sequence[int] = (32, 64)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jax.Array, *, train: bool = False):
        x = obs.astype(self.dtype)
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (2, 2), padding="VALID", dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[: -3] + (-1,))
        logits = nn.Dense(NUM_ACTIONS, dtype=self.dtype, name="policy")(x)
        value = nn.Dense(1, dtype=self.dtype, name="value")(x)
        return logits.astype(jnp.float32), jnp.squeeze(value, -1).astype(jnp.float32)


class ResBlock(nn.Module):
    """Pre-activation residual block (LayerNorm -> relu -> conv) x2."""

    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return x + h


class ResNetPolicy(nn.Module):
    """Flagship AlphaZero-style residual policy+value tower.

    The README promises "CNN/ResNet feature extraction"
    (``/root/reference/README.md:20-22``) that the reference never
    implements; this is the TPU-native realization. One-hot planes ->
    stem conv -> N pre-activation res blocks -> joint policy (4 logits)
    and value (tanh-free linear) heads. Compute in bfloat16, params and
    head outputs in float32 (MXU-friendly mixed precision).

    On 4x4 boards the conv is tiny; XLA lowers it to MXU matmuls over the
    batch, which is exactly where a 16k-board batch shines.
    """

    channels: int = 64
    num_blocks: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jax.Array, *, train: bool = False):
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name="stem")(
            obs.astype(self.dtype)
        )
        for i in range(self.num_blocks):
            x = ResBlock(self.channels, dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        flat = x.reshape(x.shape[: -3] + (-1,))
        p = nn.Dense(self.channels, dtype=self.dtype, name="policy_fc")(flat)
        p = nn.relu(p)
        logits = nn.Dense(NUM_ACTIONS, dtype=self.dtype, name="policy_out")(p)
        v = nn.Dense(self.channels, dtype=self.dtype, name="value_fc")(flat)
        v = nn.relu(v)
        value = nn.Dense(1, dtype=self.dtype, name="value_out")(v)
        return logits.astype(jnp.float32), jnp.squeeze(value, -1).astype(jnp.float32)


class QNetwork(nn.Module):
    """Q(s, ·) over all actions; optional dueling heads.

    Replaces the reference critic (``critic.py:50-85``) — which evaluates a
    single (s, a) pair per forward and applies a softmax to its 1-unit
    output (a constant-1.0 bug, ``critic.py:78-83``) — with the standard
    all-actions Q head used by DQN-family learners.
    """

    channels: Sequence[int] = (32, 64)
    hidden: int = 128
    dueling: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jax.Array, *, train: bool = False):
        x = obs.astype(self.dtype)
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (2, 2), padding="VALID", dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[: -3] + (-1,))
        x = nn.Dense(self.hidden, dtype=self.dtype, name="trunk")(x)
        x = nn.relu(x)
        if self.dueling:
            adv = nn.Dense(NUM_ACTIONS, dtype=self.dtype, name="advantage")(x)
            val = nn.Dense(1, dtype=self.dtype, name="state_value")(x)
            q = val + adv - jnp.mean(adv, axis=-1, keepdims=True)
        else:
            q = nn.Dense(NUM_ACTIONS, dtype=self.dtype, name="q")(x)
        return q.astype(jnp.float32)


_MODELS = {
    "mlp": A3CMLP,
    "cnn": CNNPolicy,
    "resnet": ResNetPolicy,
}


def make_model(name: str, **kwargs) -> nn.Module:
    """Model registry for configs/CLI (mlp | cnn | resnet)."""
    try:
        return _MODELS[name](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown model '{name}'; choose from {sorted(_MODELS)}"
        ) from None

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Tests for observation encodings and policy/value networks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rein48_tpu.models import nets, obs


class TestObs:
    def test_onehot_planes(self):
        board = jnp.asarray([[1, 0, 0, 0]] * 4, jnp.uint8).reshape(4, 4)
        x = obs.encode_onehot(board, dtype=jnp.float32)
        assert x.shape == (4, 4, 16)
        assert float(x[0, 0, 1]) == 1.0 and float(x[0, 0, 0]) == 0.0
        assert float(x[0, 1, 0]) == 1.0  # empty cell -> plane 0
        np.testing.assert_allclose(np.asarray(x.sum(-1)), np.ones((4, 4)))

    def test_raw_matches_reference_values(self):
        board = jnp.asarray([[0, 1, 5, 11]], jnp.uint8).reshape(1, 4)
        # encode_raw works on [..., 4, 4]; reshape to a 4x4 with padding.
        full = jnp.zeros((4, 4), jnp.uint8).at[0].set(board[0])
        x = obs.encode_raw(full)
        np.testing.assert_array_equal(
            np.asarray(x[0]), [0.0, 2.0, 32.0, 2048.0]
        )


@pytest.mark.parametrize("name", ["mlp", "cnn", "resnet"])
def test_policy_nets_forward(name):
    model = nets.make_model(name)
    boards = jnp.zeros((3, 4, 4), jnp.uint8)
    x = obs.encode_onehot(boards)
    params = model.init(jax.random.key(0), x)["params"]
    logits, value = model.apply({"params": params}, x)
    assert logits.shape == (3, 4)
    assert value.shape == (3,)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_qnetwork_forward():
    model = nets.QNetwork()
    x = obs.encode_onehot(jnp.zeros((5, 4, 4), jnp.uint8))
    params = model.init(jax.random.key(0), x)["params"]
    q = model.apply({"params": params}, x)
    assert q.shape == (5, 4)


def test_mlp_matches_reference_shape():
    """Parity tower sizes: dense64 per tower, 4-way and 1-way heads
    (a3c.py:141-166)."""
    model = nets.A3CMLP()
    x = obs.encode_raw(jnp.zeros((1, 4, 4), jnp.uint8))[..., None]
    params = model.init(jax.random.key(0), x)["params"]
    assert params["actor_fc"]["kernel"].shape == (16, 64)
    assert params["actor_out"]["kernel"].shape == (64, 4)
    assert params["critic_fc"]["kernel"].shape == (16, 64)
    assert params["critic_out"]["kernel"].shape == (64, 1)


def test_cnn_matches_reference_shape():
    """conv2x2x32 -> conv2x2x64 -> flatten 256 (actor.py:57-85)."""
    model = nets.CNNPolicy()
    x = jnp.zeros((1, 4, 4, 1), jnp.float32)
    params = model.init(jax.random.key(0), x)["params"]
    assert params["conv0"]["kernel"].shape == (2, 2, 1, 32)
    assert params["conv1"]["kernel"].shape == (2, 2, 32, 64)
    assert params["policy"]["kernel"].shape == (2 * 2 * 64, 4)


def test_resnet_time_batched_input():
    """Nets accept extra leading dims (rollout [T, B] batches)."""
    model = nets.ResNetPolicy(channels=8, num_blocks=1)
    x = obs.encode_onehot(jnp.zeros((2, 3, 4, 4), jnp.uint8))
    params = model.init(jax.random.key(0), x)["params"]
    logits, value = model.apply({"params": params}, x)
    assert logits.shape == (2, 3, 4)
    assert value.shape == (2, 3)


def test_make_model_rejects_unknown():
    with pytest.raises(ValueError):
        nets.make_model("transformer9000")

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Tests for batched policy evaluation and the workload presets."""

import jax
import numpy as np

from rein48_tpu import configs
from rein48_tpu.models import nets
from rein48_tpu.models.obs import encode_onehot
from rein48_tpu.train.evaluate import evaluate_policy


def test_evaluate_random_init_policy():
    model = nets.ResNetPolicy(channels=8, num_blocks=1)
    params = model.init(
        jax.random.key(0), encode_onehot(np.zeros((1, 4, 4), np.uint8))
    )["params"]
    stats = evaluate_policy(
        params, model, num_envs=32, num_steps=400, seed=0, greedy=False
    )
    assert stats["episodes"] > 0
    assert stats["avg_tile_sum"] > 0
    assert stats["best_tile"] >= 16
    assert 0.0 <= stats["frac_2048"] <= 1.0


def test_greedy_masked_never_stalls():
    """Greedy over legal actions always progresses (no-op moves barred)."""
    model = nets.ResNetPolicy(channels=8, num_blocks=1)
    params = model.init(
        jax.random.key(1), encode_onehot(np.zeros((1, 4, 4), np.uint8))
    )["params"]
    stats = evaluate_policy(
        params, model, num_envs=16, num_steps=600, seed=1, greedy=True
    )
    # A greedy policy restricted to legal moves must finish episodes.
    assert stats["episodes"] > 0


def test_presets_exist_and_build():
    assert set(configs.PRESETS) == {
        "parity-single",
        "vector-16k",
        "dqn-4k",
        "a3c-8chip",
        "multihost",
    }
    dqn = configs.dqn_4k()
    assert dqn.num_envs == 4096
    a3c = configs.a3c_8chip()
    assert a3c.batch_size % 8 == 0
    assert configs.multihost(1024).batch_size == 1024

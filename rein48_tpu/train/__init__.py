# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""On-device training loops (A3C/A2C, DQN, DDPG-style actor-critic)."""

from rein48_tpu.train.a3c import (  # noqa: F401
    A3CConfig,
    A3CTrainState,
    init_a3c,
    make_a3c_step,
    train_a3c,
)
from rein48_tpu.train.ddpg import (  # noqa: F401
    DDPGConfig,
    DDPGTrainState,
    init_ddpg,
    make_ddpg_step,
    train_ddpg,
)
from rein48_tpu.train.dqn import (  # noqa: F401
    DQNConfig,
    DQNTrainState,
    init_dqn,
    make_dqn_step,
    train_dqn,
)

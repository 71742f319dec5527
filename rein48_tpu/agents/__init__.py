# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Learned agents: losses, returns, replay, action selection."""

from rein48_tpu.agents.a3c import (  # noqa: F401
    A3CLossConfig,
    a3c_loss,
    n_step_returns,
    sample_actions,
)
from rein48_tpu.agents.dqn import (  # noqa: F401
    DQNLossConfig,
    dqn_loss,
    epsilon_greedy,
)
from rein48_tpu.agents.replay import (  # noqa: F401
    ReplayState,
    replay_add,
    replay_init,
    replay_sample,
)

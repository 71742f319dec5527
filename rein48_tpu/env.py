# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Stateful Gym-like wrapper over the functional engine.

Drop-in counterpart of the reference's ``Game`` class
(``/root/reference/game/GameClient.py:15-51``) for interactive/CLI use and
for users porting code: same ``reset()/step(action)`` shape, same action
aliases, raw tile values in/out. Internally it is a thin host-side shell
around the jitted functional core — training code should use
``engine.vector`` directly and never this class.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from rein48_tpu import spec as spec_lib
from rein48_tpu.engine import core, render
from rein48_tpu.engine.core import RewardMode


class Game:
    """Single-board 2048 with the reference's public API.

    Differences from the reference, all deliberate:
    * board values returned as a numpy int32 array (the reference returns
      list-of-lists; ``np.asarray`` round-trips either way),
    * ``reward_mode`` selects reference-parity zero reward
      (``GameClient.py:138``) or true merge score,
    * all randomness is keyed (``seed`` argument) instead of the global
      ``random`` module.
    """

    def __init__(
        self,
        table_matrix_size: int = 4,
        seed: Optional[int] = None,
        reward_mode: RewardMode = RewardMode.PARITY_ZERO,
    ):
        # The reference clamps sizes below 4 up to 4 (GameClient.py:24-27);
        # the LUT engine is specialized to 4, so larger sizes are rejected
        # rather than silently mis-handled.
        if table_matrix_size > 4:
            raise NotImplementedError(
                "rein48-tpu's LUT engine is specialized to 4x4 boards "
                f"(got {table_matrix_size})"
            )
        self.spec = spec_lib.DEFAULT_SPEC
        self.reward_space_size = self.spec.reward_space_size
        self.action_space_size = self.spec.action_space_size
        self.state_space_size = self.spec.state_space_size
        # DDPG-style aliases (fixes the reference API mismatch,
        # algorithm/ddpg/agent.py:12-14).
        self.action_size = self.spec.action_size
        self.state_size = self.spec.state_size
        self.reward_size = self.spec.reward_size

        self._reward_mode = reward_mode
        self._key = jax.random.key(seed if seed is not None else 0)
        self._state: Optional[core.EnvState] = None

        self._jit_reset = jax.jit(lambda k: core.reset(k))
        self._jit_step = jax.jit(
            lambda s, a: core.step(s, a, reward_mode), static_argnums=()
        )
        # Host-facing views are jitted too: eager dispatch of the dozen
        # small ops in legal_action_mask/boards_to_values costs ~10-50ms
        # per call, which dominates interactive stepping otherwise.
        self._jit_legal = jax.jit(core.legal_action_mask)
        self._jit_values = jax.jit(core.boards_to_values)
        self.reset()

    @property
    def state_matrix(self) -> np.ndarray:
        """Current board as raw tile values (reference representation)."""
        return np.asarray(self._jit_values(self._state.boards))

    def reset(self, display: bool = False) -> np.ndarray:
        """Zero board + one random tile (``GameClient.py:33-38``)."""
        self._key, sub = jax.random.split(self._key)
        self._state = self._jit_reset(sub)
        if display:
            print(render.render_board(self._state.boards))
        return self.state_matrix

    def step(self, action) -> Tuple[np.ndarray, float, bool]:
        """Move, spawn iff changed, report game-over (``GameClient.py:40-51``).

        Accepts the full reference alias set ("U", "up", 0, ...).
        """
        try:
            act = core.ACTION_ALIASES.get(action)
        except TypeError:
            act = None
        if act is None:
            try:
                act = core.ACTION_ALIASES[int(action)]
            except (KeyError, TypeError, ValueError):
                raise ValueError(
                    "Input action signal is wrong:\n You must input valid "
                    "inputs, such as  [U] [D] [L] [R]... "
                ) from None
        self._state, reward, done = self._jit_step(
            self._state, np.int32(act)
        )
        return self.state_matrix, float(reward), bool(done)

    @property
    def legal_actions(self) -> np.ndarray:
        """bool[4] mask (UP, DOWN, LEFT, RIGHT) — addition over reference."""
        return np.asarray(self._jit_legal(self._state.boards))

    def render(self) -> str:
        return render.render_board(self._state.boards)

    @staticmethod
    def print_terminal(matrix) -> None:
        """Reference-compatible static printer (``GameClient.py:257-269``)."""
        print(render.render_values(matrix))

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Host-side ASCII board rendering (debug/CLI only).

Reproduces the reference's terminal grid layout
(``/root/reference/game/GameClient.py:257-269``): 6-char-wide cells,
``|`` separators, dashed rules, blanks for zeros.
"""

from __future__ import annotations

import numpy as np


def render_values(matrix) -> str:
    """Render a board of raw tile values to the reference's ASCII grid."""
    matrix = np.asarray(matrix)
    height, width = matrix.shape
    rule = "-" * (1 + 7 * width)
    lines = [rule]
    for i in range(height):
        cells = ["|"]
        for j in range(width):
            v = int(matrix[i, j])
            cells.append((str(v).center(6) if v != 0 else " " * 6) + "|")
        lines.append("".join(cells))
        lines.append(rule)
    return "\n".join(lines)


def render_board(board) -> str:
    """Render an exponent-encoded board (uint8[4,4]) as tile values."""
    from rein48_tpu.engine import core

    vals = np.asarray(core.boards_to_values(np.asarray(board)))
    return render_values(vals)


def print_board(board) -> None:
    print(render_board(board))

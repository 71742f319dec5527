# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Pure-functional 2048 environment core (single-board semantics).

This module is the TPU-native re-design of the reference's stateful
``Game`` class (``/root/reference/game/GameClient.py``): every method
becomes a pure function over an immutable :class:`EnvState` pytree so the
whole step can be traced once by XLA, vmapped over tens of thousands of
boards, and sharded over a device mesh. All functions in this module are
shape-polymorphic in the leading batch dimensions: they operate on
``boards`` of shape ``[..., 4, 4]`` and actions of shape ``[...]``, so the
same code serves the single-board CLI and the 16k-board lockstep engine.

Board encoding: ``uint8[..., 4, 4]`` tile *exponents* (0 = empty, ``k`` =
tile ``2**k``), NOT raw tile values like the reference's list-of-lists
(``GameClient.py:17``). The exponent encoding makes the move kernel a
single 16-bit LUT gather per row (see ``lut.py``) and one-hot observation
planes a comparison against an iota.

Semantics parity with the reference:
* ``reset`` spawns ONE tile, not the classic two (``GameClient.py:33-38``).
* ``step`` slides/merges, then spawns only if the move changed the board
  (``GameClient.py:48-49``); illegal moves are silent no-ops.
* New tiles are 2 w.p. 0.9 / 4 w.p. 0.1 over a uniform blank cell
  (``GameClient.py:103-127``).
* Game-over iff the board is full and no 4-neighbour pair is equal
  (``GameClient.py:66-100``).
* The reference pays ``reward = 0`` always (``GameClient.py:138``);
  :data:`RewardMode.PARITY_ZERO` replicates that, while
  :data:`RewardMode.MERGE_SCORE` pays the standard 2048 merge score.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rein48_tpu.engine import lut

# Action encoding matches the reference's integer aliases
# (``GameClient.py:140,182,206,230``).
UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3
NUM_ACTIONS = 4
BOARD_SIZE = lut.BOARD_SIZE
NUM_CELLS = BOARD_SIZE * BOARD_SIZE
MAX_EXPONENT = lut.MAX_EXPONENT

ACTION_NAMES = ("UP", "DOWN", "LEFT", "RIGHT")

# String aliases accepted by the reference (``GameClient.py:140,182,206,230``).
ACTION_ALIASES = {
    **{a: UP for a in ("UP", "Up", "U", "up", "u", 0)},
    **{a: DOWN for a in ("DOWN", "Down", "D", "down", "d", 1)},
    **{a: LEFT for a in ("LEFT", "Left", "L", "left", "l", 2)},
    **{a: RIGHT for a in ("RIGHT", "Right", "R", "right", "r", 3)},
}


class RewardMode(enum.Enum):
    """Reward channel selection.

    PARITY_ZERO replicates the reference bug where merge score is computed
    into a ``reward`` variable that is never updated (``GameClient.py:138``);
    MERGE_SCORE pays the standard 2048 score (sum of values of tiles created
    by merges this step).
    """

    PARITY_ZERO = "parity_zero"
    MERGE_SCORE = "merge_score"


@struct.dataclass
class EnvState:
    """Immutable environment state pytree.

    Replaces the reference's mutable ``Game.state_matrix`` + host RNG with
    an explicit, shardable state. All fields share leading batch dims.

    Each environment carries its OWN PRNG key: a board's trajectory is a
    pure function of its initial key and its action sequence, independent of
    batch size, batch position, or device sharding. This is what makes
    B=1 vs B=16k bit-exactness and multi-host determinism hold by
    construction (the reference instead threads one global ``random`` module
    through every env and worker thread, so its trajectories depend on
    thread interleaving).

    Attributes:
        boards: ``uint8[..., 4, 4]`` tile exponents.
        key: per-env ``jax.random`` key (leading dims = batch dims).
        done: ``bool[...]`` game-over flags.
        score: ``float32[...]`` cumulative merge score this episode.
        steps: ``int32[...]`` steps taken this episode.
    """

    boards: jax.Array
    key: jax.Array
    done: jax.Array
    score: jax.Array
    steps: jax.Array


# The packed LUT as a HOST (numpy) constant. It is deliberately NOT a
# device array: tracing a jit that closes over a device-resident constant
# pays a pathological one-time cost in this environment (~300s measured),
# while a numpy constant embeds as an HLO literal in ~1s and XLA hoists it
# to device memory once per executable.
_ROW_LUT = lut.build_row_lut()
_PACK_WEIGHTS = lut.ROW_PACK_WEIGHTS


def merge_cells_left(c0, c1, c2, c3):
    """Merge one line of 4 cell arrays toward index 0 — pure vector algebra.

    The move kernel, in structure-of-arrays form so both the jnp engine
    (:func:`merge_rows_left`) and the fused Pallas rollout kernel
    (``fused.py``) share one proven implementation. A 3-pass
    compare-exchange network compacts nonzeros left (stable), then three
    mutually-exclusive pair-merge flags with left priority build the
    output — the same algebra ``lut.build_row_lut`` uses, now inline and
    fully elementwise. No gathers, no data-dependent control flow; ~50 int
    ops per line.

    Semantics match the reference two-pointer pass exactly
    (``GameClient.py:140-180``); proven exhaustively against the LUT over
    all 65536 rows in ``tests/test_core.py``.

    Args:
        c0, c1, c2, c3: integer arrays of tile exponents (any shared shape
            and integer dtype), cell 0 being the merge target end.

    Returns:
        ``((o0, o1, o2, o3), score)``: merged cells (input dtype) and int32
        merge score per line.
    """
    dtype = c0.dtype
    # Stable left-compaction: push zeros right with the triangle bubble
    # schedule (3+2+1 compare-exchanges — after pass k the rightmost k
    # slots are final, so later passes shrink; 6 CEs, minimal for n=4).
    # Each CE only moves a nonzero left past a zero, so the relative
    # order of nonzero tiles (the reference's slide order) is preserved.
    for npairs in (3, 2, 1):
        cells = [c0, c1, c2, c3]
        for i in range(npairs):
            a, b = cells[i], cells[i + 1]
            sw = (a == 0) & (b != 0)
            cells[i] = jnp.where(sw, b, a)
            cells[i + 1] = jnp.where(sw, 0, b)
        c0, c1, c2, c3 = cells

    # Pair-merge with left priority; a merged tile cannot merge again.
    m01 = (c0 != 0) & (c0 == c1)
    m12 = (c1 != 0) & (c1 == c2) & ~m01
    m23 = (c2 != 0) & (c2 == c3) & ~m12

    def bump(e):
        return jnp.minimum(e + 1, MAX_EXPONENT).astype(dtype)

    zero = jnp.zeros_like(c0)
    o0 = jnp.where(m01, bump(c0), c0)
    o1 = jnp.where(m01, jnp.where(m23, bump(c2), c2), jnp.where(m12, bump(c1), c1))
    o2 = jnp.where(
        m01,
        jnp.where(m23, zero, c3),
        jnp.where(m12, c3, jnp.where(m23, bump(c2), c2)),
    )
    o3 = jnp.where(m01 | m12 | m23, zero, c3)

    one = jnp.ones_like(c0, dtype=jnp.int32)
    score = (
        jnp.where(m01, one << (c0.astype(jnp.int32) + 1), 0)
        + jnp.where(m12, one << (c1.astype(jnp.int32) + 1), 0)
        + jnp.where(m23, one << (c2.astype(jnp.int32) + 1), 0)
    )
    return (o0, o1, o2, o3), score


def merge_rows_left(rows: jax.Array):
    """Merge rows of exponents toward index 0.

    Array-of-structures wrapper over :func:`merge_cells_left` (see there
    for the algorithm). An earlier design used a 65536-entry row LUT
    (``lut.py``, still the test oracle); on TPU the gather serializes and
    capped the engine at ~10M steps/s, so the kernel is computed directly
    on the VPU instead.

    Args:
        rows: ``uint8[..., 4]`` tile exponents.

    Returns:
        ``(new_rows, row_score, row_changed)``: merged rows, int32 merge
        score per row, bool changed per row.
    """
    cells = tuple(rows[..., i] for i in range(4))
    (o0, o1, o2, o3), score = merge_cells_left(*cells)
    new_rows = jnp.stack([o0, o1, o2, o3], axis=-1)
    changed = jnp.any(new_rows != rows, axis=-1)
    return new_rows, score, changed


def move_boards(boards: jax.Array, actions: jax.Array):
    """Slide + merge ``boards`` in the per-board direction ``actions``.

    TPU-native replacement for the reference's four unrolled two-pointer
    passes (``GameClient.py:130-254``): every direction is reduced to a
    merge-left by transpose/flip (selected per board, so each board in a
    batch can move in its own direction), then :func:`merge_rows_left`
    does the work as pure VPU algebra. No data-dependent control flow, so
    the op vmaps and shards trivially.

    Args:
        boards: ``uint8[..., 4, 4]`` exponents.
        actions: ``int32[...]`` in {0=UP, 1=DOWN, 2=LEFT, 3=RIGHT}.

    Returns:
        ``(new_boards, merge_score, changed)`` with ``merge_score`` float32
        (standard 2048 scoring — callers choose whether to pay it out) and
        ``changed`` bool (exactly the reference's deepcopy-compare
        ``GameClient.py:180``).
    """
    actions = actions.astype(jnp.int32)
    vertical = (actions == UP) | (actions == DOWN)
    mirrored = (actions == RIGHT) | (actions == DOWN)

    b = jnp.where(vertical[..., None, None], jnp.swapaxes(boards, -1, -2), boards)
    b = jnp.where(mirrored[..., None, None], jnp.flip(b, axis=-1), b)

    nb, row_scores, row_changed = merge_rows_left(b)
    merge_score = jnp.sum(row_scores, axis=-1).astype(jnp.float32)
    changed = jnp.any(row_changed, axis=-1)

    nb = jnp.where(mirrored[..., None, None], jnp.flip(nb, axis=-1), nb)
    nb = jnp.where(vertical[..., None, None], jnp.swapaxes(nb, -1, -2), nb)
    return nb, merge_score, changed


def move_boards_lut(boards: jax.Array, actions: jax.Array):
    """LUT-gather variant of :func:`move_boards` (test oracle / CPU path).

    Identical semantics via the packed 65536-entry table; kept for the
    exhaustive kernel-equivalence tests and as a reference point for
    benchmarking gather vs compute on new hardware.
    """
    actions = actions.astype(jnp.int32)
    vertical = (actions == UP) | (actions == DOWN)
    mirrored = (actions == RIGHT) | (actions == DOWN)

    b = jnp.where(vertical[..., None, None], jnp.swapaxes(boards, -1, -2), boards)
    b = jnp.where(mirrored[..., None, None], jnp.flip(b, axis=-1), b)

    codes = jnp.sum(b.astype(jnp.int32) * _PACK_WEIGHTS, axis=-1)  # [..., 4]
    packed = jnp.asarray(_ROW_LUT)[codes]
    new_codes = (packed & 0xFFFF).astype(jnp.int32)
    merge_score = jnp.sum(((packed >> 16) << 2).astype(jnp.float32), axis=-1)
    changed = jnp.any(new_codes != codes, axis=-1)

    shifts = jnp.asarray([0, 4, 8, 12], dtype=jnp.int32)
    nb = ((new_codes[..., None] >> shifts) & 0xF).astype(boards.dtype)

    nb = jnp.where(mirrored[..., None, None], jnp.flip(nb, axis=-1), nb)
    nb = jnp.where(vertical[..., None, None], jnp.swapaxes(nb, -1, -2), nb)
    return nb, merge_score, changed


def place_tile(boards: jax.Array, rank: jax.Array, value_exp: jax.Array, enabled: jax.Array):
    """Place a tile of exponent ``value_exp`` on the ``rank``-th blank cell.

    The deterministic half of the reference's ``random_fill_grid``
    (``GameClient.py:103-127``): given the index of the chosen blank cell in
    row-major blank order and the tile value, fill it. Splitting placement
    from randomness lets the parity harness drive the engine with the exact
    random choices the Python reference makes, while the fast path draws
    them from ``jax.random``.

    Args:
        boards: ``uint8[..., 4, 4]``.
        rank: ``int32[...]`` index into the board's blank cells (row-major).
        value_exp: ``int32[...]`` exponent of the new tile (1 -> 2, 2 -> 4).
        enabled: ``bool[...]`` whether to place at all (no-op when False or
            when the board is full, matching ``GameClient.py:117-118``).

    Returns:
        New boards.
    """
    flat = boards.reshape(boards.shape[:-2] + (NUM_CELLS,))
    blanks = flat == 0
    n_blanks = jnp.sum(blanks, axis=-1)
    # 1-indexed running count of blanks; the target is the cell where the
    # count equals rank+1 and the cell is blank.
    csum = jnp.cumsum(blanks, axis=-1)
    target = blanks & (csum == (rank[..., None] + 1))
    do = (enabled & (n_blanks > 0))[..., None]
    new_flat = jnp.where(
        target & do, value_exp[..., None].astype(boards.dtype), flat
    )
    return new_flat.reshape(boards.shape)


# New tiles are 4 w.p. 0.1, else 2 (``GameClient.py:125``): a 24-bit
# uniform is compared against round(0.1 * 2**24).
SPAWN4_THRESHOLD_24 = 1677722


def spawn_rank_from_bits(bits: jax.Array, n_blanks: jax.Array) -> jax.Array:
    """Uniform blank-cell rank in ``[0, n_blanks)`` from uint32 random bits.

    24-bit fixed-point ``floor(u * n)`` — the cheap-RNG analogue of the
    ``random.randint`` blank pick (``GameClient.py:121``), shared by the
    bits-driven jnp step and the fused Pallas kernel (integer-only, no
    transcendentals; bias is 2^-24).
    """
    return ((bits >> 8).astype(jnp.int32) * n_blanks.astype(jnp.int32)) >> 24


def spawn_exp_from_bits(bits: jax.Array) -> jax.Array:
    """Tile exponent (1 -> 2, 2 -> 4 w.p. 0.1) from uint32 random bits."""
    return jnp.where((bits >> 8).astype(jnp.int32) < SPAWN4_THRESHOLD_24, 2, 1)


def random_spawn(board: jax.Array, key: jax.Array, enabled: jax.Array):
    """Spawn a random tile on ONE board (vmap over a batch).

    Fast-path replacement for ``random_fill_grid`` (``GameClient.py:103-127``):
    uniform over blank cells; value 2 w.p. 0.9 else 4 (the reference draws
    ``random.uniform(0,1) > 0.1`` -> 2, ``GameClient.py:125``).

    Args:
        board: ``uint8[4, 4]``.
        key: this env's PRNG key (scalar key).
        enabled: scalar bool.

    Returns:
        New board.
    """
    k_idx, k_val = jax.random.split(key)
    n_blanks = jnp.sum(board == 0)
    u_idx = jax.random.uniform(k_idx, ())
    rank = jnp.minimum(
        (u_idx * n_blanks.astype(jnp.float32)).astype(jnp.int32),
        jnp.maximum(n_blanks - 1, 0),
    )
    u_val = jax.random.uniform(k_val, ())
    value_exp = jnp.where(u_val > 0.1, 1, 2).astype(jnp.int32)
    return place_tile(board, rank, value_exp, enabled)


def is_game_over(boards: jax.Array) -> jax.Array:
    """Game-over predicate: board full and no equal 4-neighbour pair.

    Vectorized form of the reference's full-board neighbour scan
    (``GameClient.py:66-100``) using shifted comparisons.
    """
    full = jnp.all(boards != 0, axis=(-1, -2))
    h_merge = jnp.any(boards[..., :, :-1] == boards[..., :, 1:], axis=(-1, -2))
    v_merge = jnp.any(boards[..., :-1, :] == boards[..., 1:, :], axis=(-1, -2))
    return full & ~h_merge & ~v_merge


def legal_action_mask(boards: jax.Array) -> jax.Array:
    """Per-direction "does this move change the board" mask.

    The reference has no such concept — illegal moves silently do nothing
    and a learned policy can spin forever (``GameClient.py:48-49``). Batched
    training needs the mask to keep policies off no-op actions. A direction
    is legal iff some line, read in move order, has a nonzero cell preceded
    by a zero (slide) or by an equal cell (merge); computed with shifted
    comparisons, no LUT traffic.

    Returns:
        ``bool[..., 4]`` ordered (UP, DOWN, LEFT, RIGHT).
    """

    def movable(prev, nxt):
        # A line can move toward `prev` iff nxt != 0 and (prev == 0 or ==).
        return (nxt != 0) & ((prev == 0) | (prev == nxt))

    left = jnp.any(movable(boards[..., :, :-1], boards[..., :, 1:]), axis=(-1, -2))
    right = jnp.any(movable(boards[..., :, 1:], boards[..., :, :-1]), axis=(-1, -2))
    up = jnp.any(movable(boards[..., :-1, :], boards[..., 1:, :]), axis=(-1, -2))
    down = jnp.any(movable(boards[..., 1:, :], boards[..., :-1, :]), axis=(-1, -2))
    return jnp.stack([up, down, left, right], axis=-1)


def board_tile_sum(boards: jax.Array) -> jax.Array:
    """Sum of raw tile values — the reference's "score" metric.

    Matches ``np.sum(state_matrix)`` used by the CLI and A3C
    (``/root/reference/main.py:48``, ``a3c.py:214``).
    """
    vals = jnp.where(boards > 0, jnp.exp2(boards.astype(jnp.float32)), 0.0)
    return jnp.sum(vals, axis=(-1, -2))


def boards_to_values(boards: jax.Array) -> jax.Array:
    """Exponent board -> raw tile values (int32), for display/interop."""
    b = boards.astype(jnp.int32)
    return jnp.where(b > 0, jnp.left_shift(jnp.ones_like(b), b), 0)


def values_to_boards(values: np.ndarray) -> np.ndarray:
    """Raw tile values -> exponent board (host-side helper)."""
    values = np.asarray(values)
    out = np.zeros_like(values, dtype=np.uint8)
    nz = values > 0
    out[nz] = np.round(np.log2(values[nz])).astype(np.uint8)
    return out


def reset(key: jax.Array) -> EnvState:
    """Fresh single-env state: zero board + ONE random tile (reference parity).

    Classic 2048 spawns two tiles; the reference spawns one
    (``GameClient.py:33-38``) and we match it. Batch by ``vmap`` over split
    keys (see ``vector.reset_batch``).
    """
    spawn_key, state_key = jax.random.split(key)
    board = jnp.zeros((BOARD_SIZE, BOARD_SIZE), dtype=jnp.uint8)
    board = random_spawn(board, spawn_key, jnp.asarray(True))
    return EnvState(
        boards=board,
        key=state_key,
        done=jnp.asarray(False),
        score=jnp.asarray(0.0, dtype=jnp.float32),
        steps=jnp.asarray(0, dtype=jnp.int32),
    )


def step(state: EnvState, action: jax.Array, reward_mode: RewardMode = RewardMode.MERGE_SCORE):
    """One single-env transition (no auto-reset); ``vmap`` for batches.

    Mirrors ``Game.step`` (``GameClient.py:40-51``): move, spawn iff the move
    changed the board, recompute game-over.

    Args:
        state: current unbatched :class:`EnvState`.
        action: scalar ``int32``.
        reward_mode: see :class:`RewardMode`. Static (python-level) arg.

    Returns:
        ``(new_state, reward, done)``.
    """
    key, spawn_key = jax.random.split(state.key)
    new_board, merge_score, changed = move_boards(state.boards, action)
    new_board = random_spawn(new_board, spawn_key, changed)
    done = is_game_over(new_board)
    if reward_mode == RewardMode.PARITY_ZERO:
        reward = jnp.zeros_like(merge_score)
    else:
        reward = merge_score
    new_state = EnvState(
        boards=new_board,
        key=key,
        done=done,
        score=state.score + merge_score,
        steps=state.steps + 1,
    )
    return new_state, reward, done

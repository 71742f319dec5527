# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Fused Pallas TPU rollout kernel: whole random-policy rollouts in VMEM.

The jnp engine (``vector.py``) already runs the reference's entire play
loop (``/root/reference/main.py:36-42`` + ``GameClient.py:40-51``) as one
XLA program, but its per-step cost is dominated by counter-based threefry
PRNG: every env-step pays ~5 ``jax.random`` invocations (action draw, key
splits, spawn index/value, reset spawn), each a multi-round hash. This
module removes that ceiling with a single Pallas kernel that:

* keeps a block of boards resident in **VMEM** for the entire rollout —
  HBM is touched once at entry and once at exit, not per step;
* draws randomness from the TPU core's **hardware PRNG**
  (``pltpu.prng_random_bits``): one 160-bit draw per env-step replaces
  ~5 threefry hashes;
* computes the move with the same cell-wise VPU algebra as the jnp engine
  (:func:`rein48_tpu.engine.core.merge_cells_left` — shared code, proven
  exhaustively against the 65536-row LUT), in structure-of-arrays layout
  ``[16 cells, sublanes, 128 lanes]`` so every op is a fully-packed
  (8, 128) vreg op.

Semantics are identical to ``vector.step_autoreset`` with a uniform-random
policy (same move/spawn/done/auto-reset rules, per-step equivalence proven
in ``tests/test_fused.py``); only the *source* of random bits differs, so
trajectories are deterministic per ``(seed, block layout)`` but not
bit-identical to the threefry path. Use this kernel for throughput work
(benchmarks, eval sweeps, data generation); use ``vector.rollout_random``
when B-invariant threefry streams matter (parity tests).

Layout: boards are stored cell-major, ``int32[16, B/128, 128]`` — cell
``c`` of env ``(s, l)`` lives at ``[c, s, l]``. Each grid program owns
``block_envs`` environments (``block_envs/128`` sublanes of every cell
plane) and loops ``num_steps`` times over them with ``fori_loop``.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rein48_tpu.engine import core
from rein48_tpu.engine.core import EnvState

LANES = 128
NUM_CELLS = 16
NUM_RAND_PLANES = 5  # action, spawn rank, spawn value, reset rank, reset value

# Spawn-decision fixed-point math shared with the jnp engine:
# core.spawn_rank_from_bits / core.spawn_exp_from_bits.


def boards_to_soa(boards: jax.Array) -> jax.Array:
    """``uint8[B, 4, 4]`` boards -> cell-major ``int32[16, B/128, 128]``."""
    n = boards.shape[0]
    if n % LANES != 0:
        raise ValueError(f"batch size {n} must be a multiple of {LANES}")
    return boards.reshape(n, NUM_CELLS).T.reshape(NUM_CELLS, n // LANES, LANES).astype(jnp.int32)


def soa_to_boards(soa: jax.Array) -> jax.Array:
    """Inverse of :func:`boards_to_soa`."""
    n = soa.shape[1] * LANES
    return soa.reshape(NUM_CELLS, n).T.reshape(n, 4, 4).astype(jnp.uint8)


def fused_step_soa(
    cells: Sequence[jax.Array],
    score: jax.Array,
    steps: jax.Array,
    bits: Sequence[jax.Array],
):
    """One autoreset env step on structure-of-arrays cell planes.

    Pure jnp, shape-agnostic: runs identically inside the Pallas kernel
    (on ``[sublanes, 128]`` planes) and under plain jit in the equivalence
    tests. Implements exactly ``vector._step_autoreset_single`` with the
    action drawn uniformly from ``bits[0]`` — move (``GameClient.py:130-254``
    semantics via :func:`core.merge_cells_left`), spawn iff the move changed
    the board (``GameClient.py:48-49``), game-over check
    (``GameClient.py:66-100``), in-place reset with one fresh tile
    (``GameClient.py:33-38``).

    Args:
        cells: 16 int32 arrays (cell-major board planes, row-major cell
            order: cell ``4*r + c`` holds board position ``(r, c)``).
        score: int32 cumulative merge score per env.
        steps: int32 episode step count per env.
        bits: 5 uint32 random planes — action, spawn rank, spawn value,
            reset rank, reset value.

    Returns:
        ``(new_cells, new_score, new_steps, aux)`` where ``aux`` carries
        ``done``, ``changed``, ``reward`` (merge score), ``episode_score``,
        ``episode_length`` and ``board_max_exp`` (all pre-reset values,
        valid where ``done`` for the episode metrics).
    """
    c = list(cells)
    b_act, b_rank, b_val, b_rrank, b_rval = bits
    action = (b_act & 3).astype(jnp.int32)
    # Orientation toward merge-left factors into transpose (UP/DOWN) then
    # in-line reverse (DOWN/RIGHT) — two single-select stages (2 selects
    # per cell each way) instead of a 3-deep select over all 4 directions.
    # Same transpose/flip algebra as core.move_boards.
    is_vert = action <= core.DOWN  # UP=0, DOWN=1 (core.py action codes)
    is_rev = (action & 1) == 1  # DOWN=1, RIGHT=3

    # Stage 1 (transpose select): line l, position p of the working grid.
    t = [[jnp.where(is_vert, c[4 * p + l], c[4 * l + p]) for p in range(4)] for l in range(4)]
    # Stage 2 (reverse select): flip each line for DOWN/RIGHT.
    merged = []
    merge_score = jnp.zeros_like(score)
    for l in range(4):
        line = [jnp.where(is_rev, t[l][3 - p], t[l][p]) for p in range(4)]
        line, line_score = core.merge_cells_left(*line)
        merged.append(line)
        merge_score = merge_score + line_score

    # Un-orient: un-reverse each line, then un-transpose.
    u = [[jnp.where(is_rev, merged[l][3 - p], merged[l][p]) for p in range(4)] for l in range(4)]
    moved = [
        jnp.where(is_vert, u[i % 4][i // 4], u[i // 4][i % 4]) for i in range(NUM_CELLS)
    ]

    changed = moved[0] != c[0]
    for i in range(1, NUM_CELLS):
        changed = changed | (moved[i] != c[i])

    # Spawn a tile on a uniform blank cell iff the move changed the board.
    blanks = [m == 0 for m in moved]
    n_blanks = blanks[0].astype(jnp.int32)
    for i in range(1, NUM_CELLS):
        n_blanks = n_blanks + blanks[i].astype(jnp.int32)
    rank = core.spawn_rank_from_bits(b_rank, n_blanks)
    value_exp = core.spawn_exp_from_bits(b_val)
    enabled = changed & (n_blanks > 0)
    # Fold `enabled` into the rank: a disabled spawn targets rank -1, which
    # no csum value can hit (csum >= 1 at every blank cell), so the
    # per-cell `& enabled` disappears from the 16-iteration scan.
    rank1 = jnp.where(enabled, rank + 1, 0)
    spawned = []
    csum = jnp.zeros_like(rank)
    for i in range(NUM_CELLS):
        csum = csum + blanks[i].astype(jnp.int32)
        hit = blanks[i] & (csum == rank1)
        spawned.append(jnp.where(hit, value_exp, moved[i]))

    # Game over: full board with no equal 4-neighbour pair. Fullness falls
    # out of the blank count: the spawn filled exactly one blank iff it was
    # enabled, so post-spawn blanks == n_blanks - enabled.
    full = n_blanks == enabled.astype(jnp.int32)
    neigh = jnp.zeros_like(full)
    for r in range(4):
        for cc in range(3):
            neigh = neigh | (spawned[4 * r + cc] == spawned[4 * r + cc + 1])
    for r in range(3):
        for cc in range(4):
            neigh = neigh | (spawned[4 * r + cc] == spawned[4 * (r + 1) + cc])
    done = full & ~neigh

    episode_score = score + merge_score
    episode_length = steps + 1
    board_max_exp = spawned[0]
    for i in range(1, NUM_CELLS):
        board_max_exp = jnp.maximum(board_max_exp, spawned[i])

    # In-place reset of finished boards: zero board + one uniform tile.
    r_rank = core.spawn_rank_from_bits(b_rrank, jnp.asarray(NUM_CELLS))
    r_val = core.spawn_exp_from_bits(b_rval)
    new_cells = [
        jnp.where(done, jnp.where(r_rank == i, r_val, 0), spawned[i])
        for i in range(NUM_CELLS)
    ]
    new_score = jnp.where(done, 0, episode_score)
    new_steps = jnp.where(done, 0, episode_length)

    aux = dict(
        done=done,
        changed=changed,
        reward=merge_score,
        episode_score=episode_score,
        episode_length=episode_length,
        board_max_exp=board_max_exp,
    )
    return new_cells, new_score, new_steps, aux


@struct.dataclass
class FusedRolloutStats:
    """Per-env episode statistics accumulated inside the kernel.

    Attributes:
        episodes: ``int32[B]`` episodes finished during the rollout.
        episode_length_sum: ``int32[B]`` total length of finished episodes.
        episode_score_sum: ``int32[B]`` total merge score of finished episodes.
        max_exponent: ``int32[B]`` largest tile exponent seen on the board.
    """

    episodes: jax.Array
    episode_length_sum: jax.Array
    episode_score_sum: jax.Array
    max_exponent: jax.Array


@jax.jit
def rollout_bits_reference(
    state: EnvState, bits: jax.Array
) -> Tuple[EnvState, FusedRolloutStats]:
    """Pure-jnp scan with the exact semantics of the Pallas rollout kernel.

    Consumes the same injected randomness (``uint32[T, 5, B]``) as
    ``rollout_random_fused(..., bits=...)``; used to prove the kernel's
    block plumbing, loop and stat accumulation bit-for-bit, and as a
    portable fallback on non-TPU backends.
    """
    n = state.boards.shape[0]
    cells0 = tuple(
        state.boards.reshape(n, NUM_CELLS)[:, i].astype(jnp.int32) for i in range(NUM_CELLS)
    )
    zeros = jnp.zeros((n,), dtype=jnp.int32)

    def body(carry, bits_t):
        cells, score, steps, epc, elen, escore, mxe = carry
        planes = tuple(bits_t[i] for i in range(NUM_RAND_PLANES))
        new_cells, new_score, new_steps, aux = fused_step_soa(cells, score, steps, planes)
        done = aux["done"]
        carry = (
            tuple(new_cells),
            new_score,
            new_steps,
            epc + done.astype(jnp.int32),
            elen + jnp.where(done, aux["episode_length"], 0),
            escore + jnp.where(done, aux["episode_score"], 0),
            jnp.maximum(mxe, aux["board_max_exp"]),
        )
        return carry, None

    init = (
        cells0,
        state.score.astype(jnp.int32),
        state.steps.astype(jnp.int32),
        zeros,
        zeros,
        zeros,
        zeros,
    )
    (cells, score, steps, epc, elen, escore, mxe), _ = jax.lax.scan(
        body, init, bits.astype(jnp.uint32)
    )
    new_state = EnvState(
        boards=jnp.stack(cells, axis=-1).reshape(n, 4, 4).astype(jnp.uint8),
        key=state.key,
        done=jnp.zeros((n,), dtype=bool),
        score=score.astype(jnp.float32),
        steps=steps,
    )
    stats = FusedRolloutStats(
        episodes=epc, episode_length_sum=elen, episode_score_sum=escore, max_exponent=mxe
    )
    return new_state, stats


def _rollout_kernel(num_steps: int, sub: int, with_bits: bool):
    """Build the kernel body for ``num_steps`` steps over ``sub`` sublanes.

    ``with_bits=False`` (production): randomness comes from the TPU core's
    hardware PRNG, seeded per grid program. ``with_bits=True`` (testing):
    randomness is read from an injected ``[1, T, 5*sub, 128]`` input so the
    whole kernel can be compared bit-for-bit against a jnp scan — the
    Mosaic interpreter stubs ``prng_random_bits`` to zeros, so the hardware
    path is untestable off-TPU.
    """

    def kernel(seed_ref, *refs):
        if with_bits:
            board_ref, score_ref, steps_ref, bits_ref = refs[:4]
            out_refs = refs[4:]
        else:
            board_ref, score_ref, steps_ref = refs[:3]
            out_refs = refs[3:]
            # Distinct, reproducible stream per grid program.
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        board_out, score_out, steps_out, epc_out, elen_out, escore_out, mxe_out = out_refs

        zeros = jnp.zeros((sub, LANES), dtype=jnp.int32)

        def body(t, carry):
            cells, score, steps, epc, elen, escore, mxe = carry
            if with_bits:
                bits = bits_ref[0, t].astype(jnp.uint32)
            else:
                bits = pltpu.bitcast(
                    pltpu.prng_random_bits((NUM_RAND_PLANES * sub, LANES)), jnp.uint32
                )
            planes = tuple(bits[i * sub : (i + 1) * sub] for i in range(NUM_RAND_PLANES))
            new_cells, new_score, new_steps, aux = fused_step_soa(cells, score, steps, planes)
            done = aux["done"]
            return (
                tuple(new_cells),
                new_score,
                new_steps,
                epc + done.astype(jnp.int32),
                elen + jnp.where(done, aux["episode_length"], 0),
                escore + jnp.where(done, aux["episode_score"], 0),
                jnp.maximum(mxe, aux["board_max_exp"]),
            )

        init = (
            tuple(board_ref[i] for i in range(NUM_CELLS)),
            score_ref[:],
            steps_ref[:],
            zeros,
            zeros,
            zeros,
            zeros,
        )
        cells, score, steps, epc, elen, escore, mxe = jax.lax.fori_loop(
            0, num_steps, body, init
        )
        for i in range(NUM_CELLS):
            board_out[i] = cells[i]
        score_out[:] = score
        steps_out[:] = steps
        epc_out[:] = epc
        elen_out[:] = elen
        escore_out[:] = escore
        mxe_out[:] = mxe

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def rollout_random_fused(
    state: EnvState,
    seed: int | jax.Array,
    num_steps: int,
    block_envs: int = 8192,
    interpret: bool = False,
    bits: jax.Array | None = None,
) -> Tuple[EnvState, FusedRolloutStats]:
    """Run ``num_steps`` of uniform-random play fused in one Pallas kernel.

    Drop-in throughput path for ``vector.rollout_random`` (same autoreset
    semantics, hardware-PRNG randomness, per-step outputs reduced to
    :class:`FusedRolloutStats` instead of materialising ``[T, B]`` traces).

    Args:
        state: batched :class:`EnvState` (leading axis B, a multiple of
            ``block_envs``).
        seed: int32 seed for the kernel's hardware PRNG stream. The
            ``state.key`` threefry stream is left untouched.
        num_steps: rollout length T (static).
        block_envs: envs per grid program (static; multiple of 128; the
            VMEM working set is ~``block_envs * 100`` bytes).
        interpret: run the kernel in interpreter mode (CPU testing).
        bits: optional injected randomness ``uint32[T, 5, B]`` (testing
            only — replaces the hardware PRNG so the kernel can be compared
            bit-for-bit against a jnp reference; see ``tests/test_fused.py``).

    Returns:
        ``(final_state, stats)``.
    """
    boards = state.boards
    n = boards.shape[0]
    if n % block_envs != 0:
        raise ValueError(f"batch {n} not a multiple of block_envs {block_envs}")
    sub = block_envs // LANES
    nsub = n // LANES
    grid = nsub // sub

    soa = boards_to_soa(boards)
    score = state.score.astype(jnp.int32).reshape(nsub, LANES)
    steps = state.steps.astype(jnp.int32).reshape(nsub, LANES)
    seed_arr = jnp.asarray(seed, dtype=jnp.int32).reshape(1)

    plane = jax.ShapeDtypeStruct((nsub, LANES), jnp.int32)
    # Index maps receive the scalar-prefetch ref as a trailing argument.
    board_spec = pl.BlockSpec(
        (NUM_CELLS, sub, LANES), lambda i, _: (0, i, 0), memory_space=pltpu.VMEM
    )
    plane_spec = pl.BlockSpec((sub, LANES), lambda i, _: (i, 0), memory_space=pltpu.VMEM)

    in_specs = [board_spec, plane_spec, plane_spec]
    inputs = [soa, score, steps]
    if bits is not None:
        # [T, 5, B] -> per-program [grid, T, 5*sub, 128] matching the
        # kernel's plane slicing.
        bits_kernel = (
            bits.astype(jnp.uint32)
            .reshape(num_steps, NUM_RAND_PLANES, grid, sub, LANES)
            .transpose(2, 0, 1, 3, 4)
            .reshape(grid, num_steps, NUM_RAND_PLANES * sub, LANES)
        )
        in_specs.append(
            pl.BlockSpec(
                (1, num_steps, NUM_RAND_PLANES * sub, LANES),
                lambda i, _: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(bits_kernel)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[board_spec] + [plane_spec] * 6,
    )
    outs = pl.pallas_call(
        _rollout_kernel(num_steps, sub, with_bits=bits is not None),
        out_shape=[jax.ShapeDtypeStruct(soa.shape, jnp.int32)] + [plane] * 6,
        grid_spec=grid_spec,
        # The Mosaic TPU interpreter (not the generic HLO one) is required
        # for pltpu.prng_* on CPU.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, *inputs)
    new_soa, new_score, new_steps, epc, elen, escore, mxe = outs

    new_state = EnvState(
        boards=soa_to_boards(new_soa),
        key=state.key,
        done=jnp.zeros((n,), dtype=bool),
        score=new_score.reshape(n).astype(jnp.float32),
        steps=new_steps.reshape(n),
    )
    stats = FusedRolloutStats(
        episodes=epc.reshape(n),
        episode_length_sum=elen.reshape(n),
        episode_score_sum=escore.reshape(n),
        max_exponent=mxe.reshape(n),
    )
    return new_state, stats

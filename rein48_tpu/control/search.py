# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Batched expectimax search — a planning policy the reference never had.

The reference's only non-learned controls are uniform-random and stdin
(``/root/reference/control/rand.py``, ``control/hand.py``). This module
adds the classic 2048 planning baseline: depth-limited expectimax over
the exact game tree — max over legal moves, expectation over the spawn
distribution (uniform blank cell; tile 2 w.p. 0.9 / 4 w.p. 0.1, the
``GameClient.py:103-127`` rule) — with a snake-gradient heuristic at the
leaves.

TPU-native shape: the tree is never walked node-by-node. Each depth level
is one tensor expansion — ``[N]`` boards become ``[N, 4]`` afterstates
(one ``core.move_boards`` call) and then ``[N, 4, 32]`` chance children
(16 cells x 2 tile values, probability-masked) — so the whole search over
a batch of envs is a few fused VPU ops on a ``[B * 128^depth]`` board
tensor: no recursion, no branching, fully jit/vmap/shard-compatible.
Depth 1 evaluates 128 leaves per board, depth 2 evaluates 16384; at 2048's
branching that is exact expectimax, not a sampled approximation.

Two leaf evaluators: the snake heuristic (classic baseline,
:func:`expectimax_policy`) or a trained critic's value head
(:func:`make_expectimax_policy` + :func:`make_value_leaf`) — the latter
backs the learned value function up through the exact depth-d game tree
(see that function's docstring for the two approximations involved), and
the leaf batch is one big dense forward that tiles straight onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rein48_tpu.engine import core

NUM_ACTIONS = core.NUM_ACTIONS
NUM_CELLS = core.NUM_CELLS
# 16 spawn cells x 2 tile values per chance node.
CHANCE_BRANCH = 2 * NUM_CELLS
SPAWN_P4 = 0.1
# Value assigned to a dead (no legal move) max node. Must dominate any
# reachable heuristic value (max ~2^16 * 4^15 ~ 7e13).
DEATH_VALUE = -1e15

# Snake-gradient heuristic weights: tile values weighted by 4^rank along a
# boustrophedon path, rewarding a monotone chain anchored in a corner —
# the standard hand-crafted 2048 evaluation. Host-side numpy constant so
# jit embeds it as a literal (see core._ROW_LUT note).
_SNAKE_RANK = np.array(
    [
        [15, 14, 13, 12],
        [8, 9, 10, 11],
        [7, 6, 5, 4],
        [0, 1, 2, 3],
    ],
    dtype=np.float32,
)
_SNAKE_WEIGHTS = (4.0**_SNAKE_RANK).astype(np.float32)


def heuristic(boards: jax.Array) -> jax.Array:
    """Leaf evaluation: snake-weighted tile sum, ``float32[...]``.

    The best fixed corner/orientation is taken per board (max over the 8
    symmetries of the snake), so the heuristic does not prefer an
    arbitrary corner.
    """
    vals = jnp.where(boards > 0, jnp.exp2(boards.astype(jnp.float32)), 0.0)
    w = jnp.asarray(_SNAKE_WEIGHTS)
    best = None
    for flip_h in (False, True):
        for flip_v in (False, True):
            for transpose in (False, True):
                ww = w
                if transpose:
                    ww = ww.T
                if flip_h:
                    ww = ww[:, ::-1]
                if flip_v:
                    ww = ww[::-1, :]
                s = jnp.sum(vals * ww, axis=(-2, -1))
                best = s if best is None else jnp.maximum(best, s)
    return best


def _chance_children(after: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """All spawn outcomes of afterstates ``[..., 4, 4]``.

    Returns:
        ``(children[..., 32, 4, 4], probs[..., 32])`` — children ordered
        (cell 0 tile 2, ..., cell 15 tile 2, cell 0 tile 4, ...); the
        probability of a non-blank cell's child is 0 (its board is
        garbage and is masked out of the expectation).
    """
    blanks = (after == 0).reshape(after.shape[:-2] + (NUM_CELLS,))
    n_blanks = jnp.sum(blanks, axis=-1, keepdims=True).astype(jnp.float32)
    p_cell = blanks.astype(jnp.float32) / jnp.maximum(n_blanks, 1.0)
    probs = jnp.concatenate(
        [p_cell * (1.0 - SPAWN_P4), p_cell * SPAWN_P4], axis=-1
    )

    eye = jnp.eye(NUM_CELLS, dtype=after.dtype).reshape(
        NUM_CELLS, core.BOARD_SIZE, core.BOARD_SIZE
    )
    base = after[..., None, :, :]
    children = jnp.concatenate([base + eye, base + 2 * eye], axis=-3)
    return children, probs


def _afterstates(boards: jax.Array):
    """Afterstates of every action: ``[..., 4, 4, 4]`` + reward + legal."""
    actions = jnp.arange(NUM_ACTIONS, dtype=jnp.int32)
    actions = jnp.broadcast_to(actions, boards.shape[:-2] + (NUM_ACTIONS,))
    tiled = jnp.broadcast_to(
        boards[..., None, :, :],
        boards.shape[:-2] + (NUM_ACTIONS,) + boards.shape[-2:],
    )
    after, reward, changed = core.move_boards(tiled, actions)
    return after, reward, changed


def _value_max(
    boards, depth, leaf_value, reward_fn, gamma, death_value, chance_chunk=None
) -> jax.Array:
    """Expectimax value of max nodes ``[...]`` at the given search depth."""
    q, legal = _action_values(
        boards, depth, leaf_value, reward_fn, gamma, death_value, chance_chunk
    )
    dead = ~jnp.any(legal, axis=-1)
    best = jnp.max(jnp.where(legal, q, -jnp.inf), axis=-1)
    return jnp.where(dead, death_value, best)


def _value_chance(
    after, depth, leaf_value, reward_fn, gamma, death_value, chance_chunk=None
) -> jax.Array:
    """Expected value of chance nodes (afterstates) ``[...]``.

    ``chance_chunk`` (must divide 32) serializes the 32-way chance
    expansion through ``lax.map`` in groups of that many children, so
    the subtree intermediates (children boards, their afterstates, the
    leaf lookup streams) materialize at 32/chance_chunk of the fused
    size. The math is identical — the expectation is a sum either way.
    This exists because the fully-fused depth-1 program reproducibly
    faulted this environment's TPU worker at eval scale (round 3); the
    chunked program keeps every intermediate inside the envelope the
    trainer exercises continuously.
    """
    if depth <= 0:
        return leaf_value(after)
    children, probs = _chance_children(after)
    if chance_chunk is None or chance_chunk >= CHANCE_BRANCH:
        child_values = _value_max(
            children, depth - 1, leaf_value, reward_fn, gamma, death_value,
            chance_chunk,
        )
        # Invalid children carry p=0; their (garbage, possibly DEATH)
        # values must not produce 0 * -inf — values are finite by
        # construction.
        return jnp.sum(probs * child_values, axis=-1)
    if CHANCE_BRANCH % chance_chunk:
        raise ValueError(
            f"chance_chunk {chance_chunk} must divide {CHANCE_BRANCH}"
        )
    # [..., 32, 4, 4] -> [n_chunks, ..., chunk, 4, 4]: lax.map carries
    # one chunk's subtree at a time.
    n_chunks = CHANCE_BRANCH // chance_chunk
    ch = jnp.moveaxis(
        children.reshape(
            children.shape[:-3] + (n_chunks, chance_chunk) + children.shape[-2:]
        ),
        -4,
        0,
    )
    pr = jnp.moveaxis(
        probs.reshape(probs.shape[:-1] + (n_chunks, chance_chunk)), -2, 0
    )

    def chunk_expectation(args):
        boards, p = args
        v = _value_max(
            boards, depth - 1, leaf_value, reward_fn, gamma, death_value,
            chance_chunk,
        )
        return jnp.sum(p * v, axis=-1)

    partials = jax.lax.map(chunk_expectation, (ch, pr))  # [n_chunks, ...]
    return jnp.sum(partials, axis=0)


def _action_values(
    boards,
    depth,
    leaf_value,
    reward_fn,
    gamma,
    death_value=DEATH_VALUE,
    chance_chunk=None,
):
    """Q(board, a) = merge reward + gamma * E[value of afterstate]."""
    after, reward, legal = _afterstates(boards)
    q = reward_fn(reward) + gamma * _value_chance(
        after, depth, leaf_value, reward_fn, gamma, death_value, chance_chunk
    )
    return q, legal


def _argmax_legal(q: jax.Array, legal: jax.Array) -> jax.Array:
    q = jnp.where(legal, q, -jnp.inf)
    all_illegal = ~jnp.any(legal, axis=-1, keepdims=True)
    q = jnp.where(all_illegal, 0.0, q)
    return jnp.argmax(q, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def expectimax_policy(boards: jax.Array, depth: int = 1) -> jax.Array:
    """Best action per board by depth-``depth`` expectimax, ``int32[...]``.

    ``depth`` counts chance->max plies below the root's own chance layer:
    depth 1 looks one spawn + one move ahead (128 leaves/board), depth 2
    two (16k leaves/board). Illegal actions are never selected unless the
    board is terminal (then action 0 — the caller's auto-reset takes over,
    matching the engine's no-op-move semantics, ``GameClient.py:48-49``).
    """
    q, legal = _action_values(
        boards, depth, heuristic, lambda r: r, 1.0
    )
    return _argmax_legal(q, legal)


def make_expectimax_policy(
    depth: int,
    *,
    leaf_value=heuristic,
    reward_fn=lambda r: r,
    gamma: float = 1.0,
    death_value: float = DEATH_VALUE,
    chance_chunk: int | None = None,
):
    """Build ``policy(boards) -> int32 actions`` with a custom leaf.

    Generalizes :func:`expectimax_policy` into a value-guided planner:
    pass a trained critic as ``leaf_value`` (see
    :func:`make_value_leaf`) and the tree search propagates the critic's
    values through exact max/expectation backups — AlphaZero-style
    planning-with-a-learned-evaluator, where the tree replaces the policy
    head and the critic replaces the hand-crafted snake heuristic. For a
    critic trained on transformed rewards (``train/common.py``), pass the
    matching ``reward_fn`` and ``gamma`` so interior merge rewards are in
    the critic's own units.

    Leaf-semantics notes for value-guided mode (the tree itself is
    exact): (a) leaves are PRE-spawn afterstates, so the leaf should be
    an AFTERSTATE value function — the n-tuple tables
    (``agents/ntuple.py``), a PPO run's co-trained afterstate critic
    (``train/ppo.py afterstate_critic``), or the deep afterstate-TD net
    (``train/afterstate.py``) make the backup Bellman-consistent and
    measurably WIN over greedy play (BASELINE.md rounds 3-5: +50% score
    for tables, +107% for the deep net). A POST-spawn state critic (a
    plain A3C/PPO value head) absorbs one expectation layer into the
    approximator and measurably LOSES to its own policy head
    (runs/ppo_flagship_tpu/eval_depth1.json — round 4's lesson).
    (b) ``death_value`` should match the critic's terminal convention —
    trainers bootstrap V=0 at done, so pass ``death_value=0.0`` with a
    trained critic; the huge ``DEATH_VALUE`` default is only consistent
    with the unbounded snake heuristic, where it buys explicit death
    avoidance.

    Returns an UNJITTED pure function; callers jit it (it is also safe
    inside ``lax.scan`` bodies, e.g. ``train/evaluate.py``).
    """

    def policy(boards: jax.Array) -> jax.Array:
        q, legal = _action_values(
            boards, depth, leaf_value, reward_fn, gamma, death_value,
            chance_chunk,
        )
        return _argmax_legal(q, legal)

    return policy


def make_value_leaf(model, params, obs_encoding: str = "onehot"):
    """Leaf evaluator from a trained actor-critic's value head.

    Wraps ``model.apply`` so it accepts the search's ``[..., 4, 4]``
    board tensors of any leading rank (the tree expansion stacks extra
    axes): boards are flattened to one batch axis for the network and the
    values reshaped back.
    """
    from rein48_tpu.train import common

    def leaf_value(boards: jax.Array) -> jax.Array:
        lead = boards.shape[:-2]
        flat = boards.reshape((-1,) + boards.shape[-2:])
        obs = common.encode_obs(flat, obs_encoding)
        _, value = model.apply({"params": params}, obs)
        return value.reshape(lead)

    return leaf_value

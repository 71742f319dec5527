# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Batched on-device policy evaluation.

The reference's only evaluation is the per-episode ``np.sum(state)``
printed by workers (``/root/reference/algorithm/a3c/a3c.py:214,243``).
Here evaluation is a first-class jitted sweep: N envs play greedily (or
stochastically) to completion, and the episode statistics — score, length,
max-tile distribution, fraction of episodes reaching 2048 — come back as
a dict of scalars. Used by the CLI ``eval`` subcommand and the capability
regression test.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from rein48_tpu.agents import a3c as a3c_agent
from rein48_tpu.engine import core, vector
from rein48_tpu.train import common


# Max-tile attainment tiers reported by every evaluation sweep. 512-2048
# bracket the actor-critic families; 4096+ exist for the n-tuple/search
# policies that play far past the reference's goal tile.
_TILE_TIERS = (512, 1024, 2048, 4096, 8192, 16384)


def _episode_stats(outs) -> Dict[str, jax.Array]:
    """Aggregate a ``StepOutput[T, B]`` trace into completed-episode stats."""
    dones = outs.done.astype(jnp.float32)
    n_eps = jnp.sum(dones)
    safe = jnp.maximum(n_eps, 1.0)
    max_tile = outs.max_tile
    stats = {
        "episodes": n_eps,
        "avg_tile_sum": jnp.sum(outs.episode_tile_sum) / safe,
        "avg_length": jnp.sum(outs.episode_length.astype(jnp.float32)) / safe,
        "avg_score": jnp.sum(outs.episode_score) / safe,
        "best_tile": jnp.max(max_tile),
    }
    for tier in _TILE_TIERS:
        stats[f"frac_{tier}"] = jnp.sum(dones * (max_tile >= tier)) / safe
    return stats


@functools.partial(jax.jit, static_argnames=("apply_fn", "obs_encoding", "num_steps", "greedy"))
def _eval_rollout(params, start_state, key, *, apply_fn, obs_encoding, num_steps, greedy):
    def body(carry, _):
        st, k = carry
        k, k_act = jax.random.split(k)
        obs = common.encode_obs(st.boards, obs_encoding)
        logits, _ = apply_fn(params, obs)
        mask = core.legal_action_mask(st.boards)
        masked = a3c_agent.masked_logits(logits, mask)
        if greedy:
            actions = jnp.argmax(masked, axis=-1)
        else:
            actions = jax.random.categorical(k_act, masked)
        st, out = vector.step_autoreset(st, actions)
        return (st, k), out

    (final, _), outs = jax.lax.scan(
        body, (start_state, key), None, length=num_steps
    )
    return final, _episode_stats(outs)


@functools.lru_cache(maxsize=32)
def _greedy_policy_fn(model, obs_encoding):
    """Cached greedy masked policy for the first-episode protocol (the
    cache keeps ``policy_fn`` identical across calls, so the jitted
    rollout is compiled once per (model, encoding) — TPU compiles here
    take minutes)."""

    def policy_fn(params, boards):
        obs = common.encode_obs(boards, obs_encoding)
        out = model.apply({"params": params}, obs)
        logits = out[0] if isinstance(out, tuple) else out
        masked = a3c_agent.masked_logits(
            logits, core.legal_action_mask(boards)
        )
        return jnp.argmax(masked, axis=-1)

    return policy_fn


def evaluate_policy(
    params: Any,
    model: Any,
    *,
    obs_encoding: str = "onehot",
    num_envs: int = 512,
    num_steps: int = 4096,
    seed: int = 0,
    greedy: bool = True,
    protocol: str = "window",
) -> Dict[str, float]:
    """Play ``num_envs`` games for ``num_steps`` lockstep steps; aggregate
    completed-episode statistics. Greedy = argmax over legal actions.

    protocol="first" scores exactly ``num_envs`` first episodes with no
    completion-length bias (see :func:`_first_episode_rollout`); greedy
    only. "window" (default) keeps the completed-episode sweep.
    """
    key = jax.random.key(seed)
    k_env, k_roll = jax.random.split(key)
    state = vector.reset_batch(k_env, num_envs)

    if protocol == "first":
        if not greedy:
            raise ValueError("protocol='first' supports greedy eval only")
        _, stats = _first_episode_rollout(
            params,
            state,
            policy_fn=_greedy_policy_fn(model, obs_encoding),
            num_steps=num_steps,
        )
        return {k: float(v) for k, v in stats.items()}

    def apply_fn(p, obs):
        out = model.apply({"params": p}, obs)
        if isinstance(out, tuple):  # policy nets: (logits, value)
            return out
        # Q-networks return q[..., 4]: greedy/categorical over (masked)
        # q-values; the value channel is unused by the rollout.
        return out, jnp.zeros(out.shape[:-1], out.dtype)

    _, stats = _eval_rollout(
        params,
        state,
        k_roll,
        apply_fn=apply_fn,
        obs_encoding=obs_encoding,
        num_steps=num_steps,
        greedy=greedy,
    )
    return {k: float(v) for k, v in stats.items()}


def _build_search_policy(
    depth, model, obs_encoding, gamma, reward_transform, chance_chunk=None
):
    """``policy_fn(params, boards) -> actions`` for :func:`evaluate_search`.

    Built once per distinct config and memoized (``_get_search_policy``):
    ``policy_fn`` is a STATIC jit argument of ``_search_rollout``, so a
    fresh closure per call would miss the jit cache and recompile the
    rollout every time — TPU compiles here take minutes.
    """
    from rein48_tpu.control import search

    if model is None:
        def policy_fn(p, boards):
            q, legal = search._action_values(
                boards, depth, search.heuristic, lambda r: r, 1.0,
                chance_chunk=chance_chunk,
            )
            return search._argmax_legal(q, legal)

        return policy_fn

    def policy_fn(p, boards):
        leaf = search.make_value_leaf(model, p, obs_encoding)
        return search.make_expectimax_policy(
            depth,
            leaf_value=leaf,
            reward_fn=lambda r: common.transform_reward(r, reward_transform),
            gamma=gamma,
            # Match the critic's terminal convention: trainers bootstrap
            # V=0 at done, so a dead node is worth 0 in critic units.
            death_value=0.0,
            chance_chunk=chance_chunk,
        )(boards)

    return policy_fn


_cached_search_policy = functools.lru_cache(maxsize=32)(_build_search_policy)


def _get_search_policy(
    depth, model, obs_encoding, gamma, reward_transform, chance_chunk=None
):
    try:
        # Flax linen modules are frozen dataclasses — hashable, and equal
        # configs compare equal, so identical (depth, model, encoding,
        # gamma, transform) tuples reuse one policy object and therefore
        # one compiled executable.
        return _cached_search_policy(
            depth, model, obs_encoding, gamma, reward_transform, chance_chunk
        )
    except TypeError:  # unhashable custom model: no caching, still works
        return _build_search_policy(
            depth, model, obs_encoding, gamma, reward_transform, chance_chunk
        )


# ``params`` is a traced argument (None for the heuristic planner) so a
# trained critic's weights are NOT baked into the executable as device
# constants (see .claude/skills/verify/SKILL.md on tunnel transfers).
@functools.partial(jax.jit, static_argnames=("policy_fn", "num_steps"))
def _search_rollout(params, start_state, *, policy_fn, num_steps):
    def body(st, _):
        actions = policy_fn(params, st.boards)
        return vector.step_autoreset(st, actions)

    final, outs = jax.lax.scan(body, start_state, None, length=num_steps)
    return final, _episode_stats(outs)


@functools.partial(jax.jit, static_argnames=("policy_fn", "num_steps"))
def _first_episode_segment(params, carry, *, policy_fn, num_steps):
    """``num_steps`` scanned steps of the first-episode sweep (one launch)."""

    def body(carry, _):
        st, acc = carry
        actions = policy_fn(params, st.boards)
        st2, out = vector.step_autoreset(st, actions)
        first = out.done & ~acc["finished"]
        acc = {
            "finished": acc["finished"] | out.done,
            "score": jnp.where(first, out.episode_score, acc["score"]),
            "tile_sum": jnp.where(first, out.episode_tile_sum, acc["tile_sum"]),
            "length": jnp.where(first, out.episode_length, acc["length"]),
            "max_tile": jnp.where(first, out.max_tile, acc["max_tile"]),
        }
        return (st2, acc), None

    carry, _ = jax.lax.scan(body, carry, None, length=num_steps)
    return carry


def _first_episode_stats(final, acc):
    """Finalize first-episode stats from a sweep carry.

    Envs still inside their first episode are credited with the live
    episode as a lower bound (max tile never decreases; score only
    grows); ``unfinished`` reports how many were truncated.
    """
    B = acc["finished"].shape[0]
    fin = acc["finished"]
    boards_f = final.boards.astype(jnp.float32)
    live_max = jnp.exp2(jnp.max(boards_f, axis=(-2, -1)))
    live_tile_sum = jnp.sum(
        jnp.where(final.boards > 0, jnp.exp2(boards_f), 0.0), axis=(-2, -1)
    )
    score = jnp.where(fin, acc["score"], final.score)
    tile_sum = jnp.where(fin, acc["tile_sum"], live_tile_sum)
    length = jnp.where(fin, acc["length"], final.steps)
    max_tile = jnp.where(fin, acc["max_tile"], live_max)

    stats = {
        "episodes": jnp.asarray(B, jnp.float32),
        "unfinished": jnp.sum(~fin).astype(jnp.float32),
        "avg_score": jnp.mean(score),
        "avg_tile_sum": jnp.mean(tile_sum),
        "avg_length": jnp.mean(length.astype(jnp.float32)),
        "best_tile": jnp.max(max_tile),
    }
    for tier in _TILE_TIERS:
        stats[f"frac_{tier}"] = jnp.mean((max_tile >= tier).astype(jnp.float32))
    return stats


def _first_episode_rollout(
    params, start_state, *, policy_fn, num_steps, launch_chunk=None, on_chunk=None
):
    """First-episode capability sweep: exactly B episodes, no length bias.

    The windowed protocol (:func:`_search_rollout` + ``_episode_stats``)
    counts episodes that COMPLETE within the sweep — which systematically
    drops the longest (= strongest: in 2048, reaching a higher tile takes
    proportionally more moves) episodes still running at the end, biasing
    attainment fractions DOWN for strong agents. Here each env contributes
    its first episode and nothing else; envs whose first episode outlives
    the sweep are credited with their live score/max-tile, which only
    under-counts (a lower bound — the episode would have finished at least
    this high). ``unfinished`` in the stats says how much truncation
    happened; size ``num_steps`` so it is ~0.

    ``launch_chunk`` splits the sweep into multiple jit launches of that
    many steps with the carry threaded on-device between them. The math
    is identical (a scan of scans); it exists because this environment's
    TPU worker reproducibly dies under single launches that run for many
    minutes (both the depth-1 planner and a ResNet-leaf tree at full
    eval scale crashed ~6-8 min into their one launch, while the same
    programs at probe scale run clean — see BASELINE.md round 4).

    ``on_chunk(steps_done, stats)`` (optional) is called after every
    launch with the lower-bound stats so far (Python floats) — long
    on-chip sweeps can persist partial rows that survive a worker crash.
    A truthy return stops the sweep early (e.g. once ``unfinished`` hits
    0 the remaining launches cannot change the stats).
    """
    B = start_state.score.shape[0]
    init = {
        "finished": jnp.zeros((B,), bool),
        "score": jnp.zeros((B,), jnp.float32),
        "tile_sum": jnp.zeros((B,), jnp.float32),
        "length": jnp.zeros((B,), jnp.int32),
        "max_tile": jnp.zeros((B,), jnp.float32),
    }
    carry = (start_state, init)
    if launch_chunk is None or launch_chunk >= num_steps:
        carry = _first_episode_segment(
            params, carry, policy_fn=policy_fn, num_steps=num_steps
        )
    else:
        whole, rem = divmod(num_steps, launch_chunk)
        done, stopped = 0, False
        for _ in range(whole):
            carry = _first_episode_segment(
                params, carry, policy_fn=policy_fn, num_steps=launch_chunk
            )
            done += launch_chunk
            if on_chunk is not None:
                partial = {
                    k: float(v) for k, v in _first_episode_stats(*carry).items()
                }
                if on_chunk(done, partial):
                    stopped = True
                    break
        if rem and not stopped:
            carry = _first_episode_segment(
                params, carry, policy_fn=policy_fn, num_steps=rem
            )
    final, acc = carry
    return final, _first_episode_stats(final, acc)


def evaluate_search(
    *,
    depth: int = 1,
    num_envs: int = 256,
    num_steps: int = 4096,
    seed: int = 0,
    model: Any = None,
    params: Any = None,
    obs_encoding: str = "onehot",
    gamma: float = 0.99,
    reward_transform: str = "log2",
    chance_chunk: int | None = None,
    protocol: str = "window",
    launch_chunk: int | None = None,
    on_chunk: Any = None,
) -> Dict[str, float]:
    """Play the expectimax planner (``control/search.py``) in lockstep.

    Same statistics as :func:`evaluate_policy`. With ``model``/``params``
    the leaves are evaluated by the trained critic's value head instead
    of the snake heuristic (value-guided planning); ``gamma`` and
    ``reward_transform`` must match the critic's training config so
    interior merge rewards are in the critic's units. ``chance_chunk``
    serializes the spawn expansion (identical math — the TPU-safe shape
    for depth >= 1, see ``search._value_chance``); ``protocol`` chooses
    completed-episode ("window") or unbiased first-episode stats.
    ``on_chunk`` (first-protocol only) receives ``(steps_done, stats)``
    after every launch chunk — see :func:`_first_episode_rollout`.
    """
    policy_fn = _get_search_policy(
        depth, model, obs_encoding, gamma, reward_transform, chance_chunk
    )
    state = vector.reset_batch(jax.random.key(seed), num_envs)
    if protocol == "first":
        _, stats = _first_episode_rollout(
            params,
            state,
            policy_fn=policy_fn,
            num_steps=num_steps,
            launch_chunk=launch_chunk,
            on_chunk=on_chunk,
        )
    else:
        _, stats = _search_rollout(
            params, state, policy_fn=policy_fn, num_steps=num_steps
        )
    return {k: float(v) for k, v in stats.items()}

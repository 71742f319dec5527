# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Afterstate TD(0) learning for n-tuple networks — the 2048 master.

The algorithm (Szubert & Jaskowski, CIG 2014): act greedily on
``Q(s, a) = r(a) + V(afterstate(s, a))`` and regress each afterstate's
value toward the NEXT step's ``r + V(afterstate')`` — temporal-difference
learning on the deterministic half of the transition, with the spawn
stochasticity marginalized by experience. No policy network, no
optimizer, no gradients: learning is a scatter-add.

TPU-native shape: where the classic implementations step one game in C++
and update tables serially, here B games run in lockstep and every step
does ONE batched table gather (for all 4 afterstates of all B boards)
and ONE batched scatter-add (the TD updates of 2B afterstates — each
step carries the regular backup for the previous afterstate and the
terminal backup for boards whose spawn just killed them). A whole
``steps_per_update`` segment runs as one ``lax.scan`` — tables are the
scan carry and XLA updates them in place.

This trainer exists because the north star demands a policy that reaches
the 2048 tile; the actor-critic families (``train/a3c.py``,
``train/ppo.py``) get there occasionally, the n-tuple learner reliably
(and with a shallow expectimax on top — ``evaluate_ntuple(depth>=1)`` —
far beyond).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rein48_tpu.agents import ntuple as ntuple_lib
from rein48_tpu.engine import core, vector


@dataclasses.dataclass(frozen=True)
class NTupleTrainConfig:
    """Trainer hyperparameters.

    alpha is the TOTAL learning rate per TD backup, split evenly over the
    network's lookups (``agents/ntuple.py td_apply``); 0.1 over 32
    lookups reproduces the classic per-weight 0.0025-0.003 range. With
    ``update_mode="delayed"`` the effective per-window step saturates at
    alpha*beta = 1 (``td_apply_delayed``); alpha > 1 therefore requires
    ``tc=True`` (where beta = |E|/A <= 1 modulates it) and is rejected
    for tc=False rather than silently clamped.
    """

    # Measured optimum of the equal-chip-seconds frontier over B
    # (benchmarks/frontier_r5.json, delayed/4, 420s legs): B=1024 and
    # 4096 tie on capability (frac_2048 0.949 / 0.945) with 4096 only
    # +20% steps/s; B=16384 trades capability away (0.918). The default
    # stays at the small-B end of the tie — sample efficiency wins when
    # throughput can't buy it back.
    batch_size: int = 1024
    steps_per_update: int = 64
    tuples: Tuple[Tuple[int, ...], ...] = ntuple_lib.YEH_4X6
    symmetric: bool = True
    alpha: float = 1.0
    optimistic_init: float = 0.0
    # Collision handling for parallel TD writes — "mean" keeps the
    # per-entry step bounded at any batch size (see agents/ntuple.py
    # td_apply); "sum" is exact small-batch tabular TD.
    collision: str = "mean"
    # Temporal coherence (Jaskowski, TCIAIG 2017): per-entry adaptive
    # learning rates |E|/A, self-damping as an entry's errors start to
    # oscillate — hence the large default alpha. Default ON: measured
    # 7443 vs 4728 avg score (25% vs 2% of episodes reaching 1024) over
    # the plain rule's best alpha at equal step budget (2M steps, SJ_2X4,
    # CPU). tc=False uses the plain constant-alpha rule (then set alpha
    # around 0.1-0.25).
    tc: bool = True
    # "step": classic TD — tables move after every env step (argsort +
    # segment-mean scatter per step; the sort bounds TPU throughput).
    # "delayed": Jaskowski's delayed/windowed TD — tables are FROZEN for
    # a delay_window of steps, every backup of the window is
    # accumulated, and each touched entry moves by the sequential-
    # equivalent saturating step (agents/ntuple.py td_apply_delayed).
    # Much faster on TPU (no sorts, scatter-adds + one dense table pass
    # per window) and the published recipe trains fine with large
    # windows.
    update_mode: str = "step"
    # Window length (in env steps) for update_mode="delayed": tables
    # refresh every delay_window steps, so value information still
    # propagates backward through the bootstrap every window rather
    # than once per update. Must divide steps_per_update. None freezes
    # tables for the whole update (the round-1 behavior; measured ~4x
    # less sample-efficient at steps_per_update=128 than per-step TD).
    # Default 4: the equal-wall-clock frontier on a v5e chip
    # (benchmarks/frontier_r3.json — 7 min/leg, 4x6 network, B=1024,
    # first-episode eval) measured avg_score 61.4k/75.2k/69.5k/32.9k and
    # frac_2048 0.887/0.947/0.934/0.773 for step/delayed-4/16/64 —
    # window 4 beats BOTH classic per-step TD (2x throughput more than
    # pays for the windowing) and longer windows (whose extra throughput
    # does not cover their sample-efficiency loss).
    delay_window: int | None = 4
    # Table gather/scatter lowering: "xla" (any size), "mxu" (one-hot
    # matmul kernels, tables <= 65536 entries — see ops/tables.py), or
    # "auto", or "cached" (hot-prefix permuted tables via the Pallas
    # membership kernels, ops/hbm_tables.py — an opt-in for HBM-sized
    # tables; see its docstring for the measured verdict). Auto picks
    # "mxu" whenever every table qualifies (<= 65536 entries) and the
    # backend is a real TPU: measured end-to-end on a v5e chip
    # (benchmarks/mxu_trainer_r4.json, SJ_2X4, B=1024): step mode
    # 1765k vs 307k steps/s (5.7x), delayed 1754k vs 743k (2.4x).
    # Big-table networks (the 4x6 flagship) resolve to "xla" — the
    # measured in-program XLA rates (1.75ns/elem gather, 10.7ns/elem
    # scatter; benchmarks/bench_tables.py round-4 correction) leave no
    # profitable kernel at VMEM-feasible prefix sizes.
    table_backend: str = "auto"
    # backend="cached" knobs: hot-prefix rows per table and how often
    # (in updates) the permutation is re-derived from the TC heat.
    # 2048 rows keeps all four tables' kernel working sets (the [K,896]
    # scatter accumulator dominates) inside the chip's 128MB VMEM; 8192
    # compiles per-table but OOMs VMEM with four tables fused into one
    # update program.
    cache_prefix_rows: int = 2048
    cache_refresh_every: int = 50

    def network_config(self) -> ntuple_lib.NTupleConfig:
        backend = self.table_backend
        if backend == "auto":
            from rein48_tpu.ops import tables as table_ops

            small = all(
                table_ops.supports_mxu(ntuple_lib.BASE ** len(t))
                for t in self.tuples
            )
            backend = (
                "mxu" if small and jax.default_backend() != "cpu" else "xla"
            )
        return ntuple_lib.NTupleConfig(
            tuples=tuple(tuple(int(c) for c in t) for t in self.tuples),
            symmetric=self.symmetric,
            optimistic_init=self.optimistic_init,
            backend=backend,
            prefix_rows=self.cache_prefix_rows,
        )


@functools.lru_cache(maxsize=8)
def get_network(config: ntuple_lib.NTupleConfig) -> ntuple_lib.NTupleNetwork:
    """One network instance per config, so jit caches keyed on it hit."""
    return ntuple_lib.NTupleNetwork(config)


@struct.dataclass
class NTupleTrainState:
    params: Dict[str, jax.Array]
    env: core.EnvState  # [B]
    prev_after: jax.Array  # uint8[B, 4, 4] — afterstate awaiting its backup
    prev_valid: jax.Array  # float32[B] — 0 right after an episode start
    update_step: jax.Array


def _all_afterstates(boards: jax.Array):
    """Afterstates/rewards/legal of all 4 actions: ``[B, 4, ...]``."""
    actions = jnp.broadcast_to(
        jnp.arange(core.NUM_ACTIONS, dtype=jnp.int32),
        boards.shape[:-2] + (core.NUM_ACTIONS,),
    )
    tiled = jnp.broadcast_to(
        boards[..., None, :, :],
        boards.shape[:-2] + (core.NUM_ACTIONS,) + boards.shape[-2:],
    )
    return core.move_boards(tiled, actions)


def init_ntuple(
    config: NTupleTrainConfig, key: jax.Array
) -> Tuple[NTupleTrainState, ntuple_lib.NTupleNetwork]:
    net = get_network(config.network_config())
    B = config.batch_size
    env = vector.reset_batch(key, B)
    return (
        NTupleTrainState(
            params=net.init_tc() if config.tc else net.init(),
            env=env,
            prev_after=jnp.zeros((B, core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
            prev_valid=jnp.zeros((B,), jnp.float32),
            update_step=jnp.asarray(0, jnp.int32),
        ),
        net,
    )


def make_ntuple_step(config: NTupleTrainConfig):
    """Build the fused update: ``steps_per_update`` TD steps in one scan.

    Returns an UNJITTED pure function ``state -> (state, metrics)``.
    """
    net = get_network(config.network_config())
    alpha = config.alpha
    if config.update_mode not in ("step", "delayed"):
        raise ValueError(f"unknown update_mode '{config.update_mode}'")
    if config.update_mode == "delayed" and not config.tc and config.alpha > 1.0:
        # td_apply_delayed's sequential-equivalent gain clamps the
        # per-step fraction alpha*beta to [0, 1]; with tc=False (beta=1)
        # an alpha above 1 would silently train at alpha=1 while "step"
        # mode applies it unclipped — error instead of quietly diverging
        # from the mode the user asked to compare against.
        raise ValueError(
            f"alpha={config.alpha} > 1 with update_mode='delayed', tc=False: "
            "the windowed update saturates at alpha=1; use alpha <= 1 "
            "(or tc=True, where large alpha is modulated per-entry)."
        )

    def _policy_and_backups(params, env, prev_after, prev_valid):
        """Greedy afterstate step + the window's two TD backups.

        Shared by both update modes; ``params`` is the value table the
        policy acts with (the freshly-updated table in "step" mode, the
        window-frozen table in "delayed" mode).
        """
        after, reward, legal = _all_afterstates(env.boards)
        v_after = net.value(params, after)  # [B, 4]
        q = jnp.where(legal, reward + v_after, -jnp.inf)
        # Autoreset guarantees live states, so some action is legal.
        action = jnp.argmax(q, axis=-1).astype(jnp.int32)
        take = lambda x: jnp.take_along_axis(x, action[:, None], axis=1)[:, 0]
        r_chosen = take(reward)
        v_chosen = take(v_after)
        chosen_after = jnp.take_along_axis(
            after, action[:, None, None, None], axis=1
        )[:, 0]

        # Backup 1: V(prev_after) <- r_t + V(after_t), with the values
        # read BEFORE this step's writes (classic TD uses old estimates).
        target = r_chosen + v_chosen
        err_prev = (target - net.value(params, prev_after)) * prev_valid

        env2, out = vector.step_autoreset(env, action)

        # Backup 2: spawn killed the board => V(after_t) <- 0 now (there
        # is no next step for this episode to deliver the backup).
        done = out.done.astype(jnp.float32)
        err_term = (0.0 - v_chosen) * done

        upd_boards = jnp.concatenate([prev_after, chosen_after], axis=0)
        upd_errs = jnp.concatenate([err_prev, err_term], axis=0)
        metrics = {
            "episodes": jnp.sum(done),
            "episode_score_sum": jnp.sum(out.episode_score),
            "episode_tile_sum_sum": jnp.sum(out.episode_tile_sum),
            "episode_length_sum": jnp.sum(out.episode_length.astype(jnp.float32)),
            "best_tile": jnp.max(out.max_tile),
            "td_abs_err": jnp.sum(jnp.abs(err_prev)),
            "td_updates": jnp.sum(prev_valid),
        }
        return env2, chosen_after, done, upd_boards, upd_errs, metrics

    def body(carry, _):
        params, env, prev_after, prev_valid = carry
        env2, chosen_after, done, upd_boards, upd_errs, metrics = (
            _policy_and_backups(params, env, prev_after, prev_valid)
        )
        if config.tc:
            params = net.td_apply_tc(params, upd_boards, upd_errs, alpha)
        else:
            params = net.td_apply(
                params, upd_boards, upd_errs, alpha, collision=config.collision
            )
        return (params, env2, chosen_after, 1.0 - done), metrics

    def _scan_step(state: NTupleTrainState):
        """"step" mode: tables ride the scan carry, updated every step."""
        (params, env, prev_after, prev_valid), ms = jax.lax.scan(
            body,
            (state.params, state.env, state.prev_after, state.prev_valid),
            None,
            length=config.steps_per_update,
        )
        return params, env, prev_after, prev_valid, ms

    window = config.delay_window or config.steps_per_update
    if config.update_mode == "delayed" and config.steps_per_update % window:
        raise ValueError(
            f"delay_window {window} must divide "
            f"steps_per_update {config.steps_per_update}"
        )

    def _scan_delayed(state: NTupleTrainState):
        """"delayed" mode: an outer scan over windows; within each
        window the tables are frozen, the inner scan emits every backup,
        and one windowed apply lands them all."""

        def window_body(carry, _):
            params, env, prev_after, prev_valid = carry

            def body_frozen(inner, _):
                env, prev_after, prev_valid = inner
                env2, chosen_after, done, upd_boards, upd_errs, metrics = (
                    _policy_and_backups(params, env, prev_after, prev_valid)
                )
                return (env2, chosen_after, 1.0 - done), (
                    upd_boards,
                    upd_errs,
                    metrics,
                )

            (env, prev_after, prev_valid), (boards, errs, ms) = jax.lax.scan(
                body_frozen,
                (env, prev_after, prev_valid),
                None,
                length=window,
            )
            params = net.td_apply_delayed(
                params,
                boards.reshape((-1,) + boards.shape[2:]),
                errs.reshape(-1),
                alpha,
                tc=config.tc,
            )
            return (params, env, prev_after, prev_valid), ms

        (params, env, prev_after, prev_valid), ms = jax.lax.scan(
            window_body,
            (state.params, state.env, state.prev_after, state.prev_valid),
            None,
            length=config.steps_per_update // window,
        )
        # Metrics arrive [num_windows, window, ...]; the caller reduces
        # over all leading axes, so flatten them together.
        ms = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), ms)
        return params, env, prev_after, prev_valid, ms

    def step_fn(state: NTupleTrainState):
        scan = _scan_step if config.update_mode == "step" else _scan_delayed
        params, env, prev_after, prev_valid, ms = scan(state)
        metrics = {
            "episodes": jnp.sum(ms["episodes"]),
            "episode_score_sum": jnp.sum(ms["episode_score_sum"]),
            "episode_tile_sum_sum": jnp.sum(ms["episode_tile_sum_sum"]),
            "episode_length_sum": jnp.sum(ms["episode_length_sum"]),
            "best_tile": jnp.max(ms["best_tile"]),
            "td_abs_err": jnp.sum(ms["td_abs_err"])
            / jnp.maximum(jnp.sum(ms["td_updates"]), 1.0),
            "env_steps": jnp.asarray(
                config.steps_per_update * config.batch_size, jnp.float32
            ),
        }
        return (
            NTupleTrainState(
                params=params,
                env=env,
                prev_after=prev_after,
                prev_valid=prev_valid,
                update_step=state.update_step + 1,
            ),
            metrics,
        )

    return step_fn


def train_ntuple(
    config: NTupleTrainConfig,
    num_updates: int,
    seed: int = 0,
    mesh=None,
    log_every: int = 10,
    logger=None,
    checkpointer=None,
) -> Tuple[NTupleTrainState, list]:
    """Host driver; same contract as ``train_a3c``.

    Under a mesh the env batch shards over "dp" and the tables stay
    replicated; XLA then reduces the per-device scatter deltas each step.
    That per-step collective makes mesh training bandwidth-heavy — it is
    supported (and tested on the CPU mesh) but a single chip already
    trains this network fast.
    """
    from rein48_tpu.parallel import mesh as mesh_lib

    state, _ = init_ntuple(config, jax.random.key(seed))
    if checkpointer is not None:
        checkpointer.save_config(config)
    if checkpointer is not None and checkpointer.latest_step() is not None:
        state = checkpointer.restore(state)
        print(
            f"resumed from checkpoint step {int(state.update_step)}",
            flush=True,
        )
    step_fn = make_ntuple_step(config)

    net_cfg = config.network_config()
    refresh = None
    if net_cfg.backend == "cached":
        net = get_network(net_cfg)

        def _refresh(st):
            return dataclasses.replace(
                st, params=net.refresh_cache(st.params)
            )

        refresh = jax.jit(_refresh, donate_argnums=(0,))
        # Warm the permutation immediately: after a resume the heat is
        # real; on a fresh init it fronts the low rows, and the kernel's
        # overflow fallback keeps correctness until the first refresh.
        state = refresh(state)

    if mesh is not None:
        state = dataclasses.replace(
            state,
            env=mesh_lib.shard_env_state(state.env, mesh),
            prev_after=jax.device_put(
                state.prev_after, mesh_lib.batch_sharding(mesh)
            ),
            prev_valid=jax.device_put(
                state.prev_valid, mesh_lib.batch_sharding(mesh)
            ),
            # Tables carry no "kernel" leaves, so shard_params keeps
            # them replicated on any mesh shape (see mesh.py).
            params=mesh_lib.shard_params(state.params, mesh),
        )
    step = jax.jit(step_fn, donate_argnums=(0,))

    history = []
    base = int(state.update_step)
    t0 = time.perf_counter()
    for i in range(num_updates):
        state, metrics = step(state)
        if refresh is not None and (i + 1) % config.cache_refresh_every == 0:
            state = refresh(state)
        if (i + 1) % log_every == 0 or i + 1 == num_updates:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            dt = time.perf_counter() - t0
            eps = max(m["episodes"], 1.0)
            record = {
                "update": base + i + 1,
                "episodes": m["episodes"],
                "avg_episode_score": m["episode_score_sum"] / eps,
                "avg_episode_tile_sum": m["episode_tile_sum_sum"] / eps,
                "avg_episode_length": m["episode_length_sum"] / eps,
                "best_tile": m["best_tile"],
                "td_abs_err": m["td_abs_err"],
                "steps_per_sec": (i + 1)
                * config.batch_size
                * config.steps_per_update
                / dt,
            }
            history.append(record)
            if logger is not None:
                logger.write(record)
            if checkpointer is not None:
                checkpointer.maybe_save(base + i + 1, state)
    return state, history


@functools.lru_cache(maxsize=16)
def _get_ntuple_policy(
    net_config: ntuple_lib.NTupleConfig,
    depth: int,
    chance_chunk: int | None = None,
):
    """Cached ``policy_fn(params, boards)`` for the eval rollout.

    depth=0 is the training policy itself (greedy ``r + V(afterstate)``);
    depth>=1 wraps the same value function in the exact expectimax tree
    of ``control/search.py``. N-tuple leaves ARE afterstate values, so
    the planner composition is unit-exact (no pre/post-spawn mismatch).
    ``chance_chunk`` serializes the chance expansion (identical math;
    see ``search._value_chance``) — the TPU-safe shape for depth >= 1.
    """
    from rein48_tpu.control import search

    net = get_network(net_config)

    def policy_fn(params, boards):
        return search.make_expectimax_policy(
            depth,
            leaf_value=net.make_leaf(params),
            reward_fn=lambda r: r,
            gamma=1.0,
            death_value=0.0,
            chance_chunk=chance_chunk,
        )(boards)

    return policy_fn


def evaluate_ntuple(
    params: Dict[str, jax.Array],
    config: NTupleTrainConfig | ntuple_lib.NTupleConfig,
    *,
    depth: int = 0,
    num_envs: int = 512,
    num_steps: int | None = None,
    seed: int = 0,
    protocol: str = "window",
    chance_chunk: int | None = None,
    launch_chunk: int | None = None,
) -> Dict[str, float]:
    """Greedy (or expectimax-boosted) evaluation sweep.

    protocol="window" reports completed-episode statistics within the
    sweep (same as ``train.evaluate.evaluate_policy``); "first" scores
    exactly ``num_envs`` first episodes with no completion-length bias
    (``evaluate._first_episode_rollout``) — use it for headline
    capability numbers, with ``num_steps`` >= the longest plausible
    episode. ``num_steps=None`` (default) sizes the sweep by protocol:
    16384 for "first" — a 16384-tile game runs ~17k moves, so a short
    default would silently truncate exactly the strongest agents into
    ``unfinished`` rows (VERDICT r4 weak item 5) — and 4096 for
    "window".
    """
    from rein48_tpu.train import evaluate

    if num_steps is None:
        num_steps = 16384 if protocol == "first" else 4096
    if isinstance(config, NTupleTrainConfig):
        config = config.network_config()
    policy_fn = _get_ntuple_policy(config, depth, chance_chunk)
    state = vector.reset_batch(jax.random.key(seed), num_envs)
    if protocol == "first":
        _, stats = evaluate._first_episode_rollout(
            params,
            state,
            policy_fn=policy_fn,
            num_steps=num_steps,
            launch_chunk=launch_chunk,
        )
    else:
        _, stats = evaluate._search_rollout(
            params, state, policy_fn=policy_fn, num_steps=num_steps
        )
    return {k: float(v) for k, v in stats.items()}

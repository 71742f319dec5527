# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Command-line driver: play / train / bench.

Supersedes the reference's two entry points — ``main.py`` (hand/rand play,
``/root/reference/main.py:51-75``) and the ``a3c.py`` ``__main__`` training
script (``a3c.py:259-308``) — with one CLI:

    python -m rein48_tpu play  --control rand --visual
    python -m rein48_tpu play  --control hand
    python -m rein48_tpu train --algo a3c --updates 500 --batch-size 4096
    python -m rein48_tpu train --algo dqn --updates 500
    python -m rein48_tpu bench --batch 16384

The reference's ``-c/--control`` aliases (r/rand/random, h/hand/human,
``main.py:64-69``) are honored.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional, Sequence


def _cmd_play(args: argparse.Namespace) -> int:
    import numpy as np

    from rein48_tpu import control
    from rein48_tpu.env import Game
    from rein48_tpu.engine.core import RewardMode

    game = Game(
        seed=args.seed,
        reward_mode=RewardMode.MERGE_SCORE if args.score else RewardMode.PARITY_ZERO,
    )
    is_hand = args.control == "hand"
    if is_hand:
        # Reference banner (main.py:20-33).
        print("=" * 40)
        print("Welcome to 2048 (rein48-tpu edition)")
        print("Actions: U/D/L/R (or up/down/left/right); Ctrl-C quits.")
        print("=" * 40)
    steps, done = 0, False
    rng = np.random.default_rng(args.seed)
    total_reward = 0.0
    while not done and steps < args.max_steps:
        if is_hand or args.visual:
            print(game.render())
        if is_hand:
            action = control.hand_control()
        else:
            legal = game.legal_actions
            if args.legal_only and legal.any():
                action = int(rng.choice(np.flatnonzero(legal)))
            else:
                action = int(rng.integers(0, 4))
        _, reward, done = game.step(action)
        total_reward += reward
        steps += 1
    print(game.render())
    # Reference scoring: sum of tiles (main.py:48).
    print(
        f"game_over={done} steps={steps} "
        f"tile_sum={int(game.state_matrix.sum())} merge_score={total_reward:.0f}"
    )
    return 0


def _cmd_train(args: argparse.Namespace) -> int:
    from rein48_tpu.utils.metrics import MetricLogger
    from rein48_tpu.utils.checkpoint import Checkpointer

    logger = MetricLogger(log_dir=args.log_dir)
    ckpt = (
        Checkpointer(args.checkpoint_dir, save_every=args.checkpoint_every)
        if args.checkpoint_dir
        else None
    )
    mesh = None
    if args.mesh:
        from rein48_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh()
        print(f"mesh: {mesh}", file=sys.stderr)

    if args.algo == "a3c":
        from rein48_tpu.train.a3c import A3CConfig, train_a3c

        if args.parity:
            config = A3CConfig.reference_parity(batch_size=args.batch_size)
        else:
            config = A3CConfig(
                batch_size=args.batch_size,
                unroll_len=args.unroll,
                model=args.model,
                learning_rate=args.lr,
            )
        _, history = train_a3c(
            config,
            num_updates=args.updates,
            seed=args.seed,
            mesh=mesh,
            log_every=args.log_every,
            logger=logger,
            checkpointer=ckpt,
        )
    elif args.algo == "ppo":
        from rein48_tpu.train.ppo import PPOConfig, train_ppo

        config = PPOConfig(
            batch_size=args.batch_size,
            unroll_len=args.unroll,
            model=args.model,
            learning_rate=args.lr,
            afterstate_critic=args.afterstate,
            after_model=args.model,
        )
        _, history = train_ppo(
            config,
            num_updates=args.updates,
            seed=args.seed,
            mesh=mesh,
            log_every=args.log_every,
            logger=logger,
            checkpointer=ckpt,
        )
    elif args.algo == "dqn":
        from rein48_tpu.train.dqn import DQNConfig, train_dqn

        config = DQNConfig(
            num_envs=args.batch_size,
            model=args.model if args.model != "mlp" else "qnet",
            learning_rate=args.lr,
        )
        _, history = train_dqn(
            config,
            num_updates=args.updates,
            seed=args.seed,
            mesh=mesh,
            log_every=args.log_every,
            logger=logger,
            checkpointer=ckpt,
        )
    elif args.algo == "afterstate":
        from rein48_tpu.train.afterstate import (
            AfterstateTDConfig,
            train_afterstate_td,
        )

        config = AfterstateTDConfig(
            batch_size=args.batch_size,
            unroll_len=args.unroll,
            model=args.model,
            learning_rate=args.lr,
        )
        _, history = train_afterstate_td(
            config,
            num_updates=args.updates,
            seed=args.seed,
            mesh=mesh,
            log_every=args.log_every,
            logger=logger,
            checkpointer=ckpt,
        )
    elif args.algo == "ntuple":
        from rein48_tpu.train.ntuple import NTupleTrainConfig, train_ntuple

        kwargs = {} if args.alpha is None else {"alpha": args.alpha}
        if args.delay_window is not None:
            # 0 = whole-update window (None); unset falls through to the
            # NTupleTrainConfig default so the CLI and library can't
            # diverge (the default is the measured frontier optimum).
            kwargs["delay_window"] = args.delay_window or None
        config = NTupleTrainConfig(
            batch_size=args.batch_size,
            steps_per_update=args.unroll,
            update_mode=args.update_mode,
            table_backend=args.table_backend,
            **kwargs,
        )
        _, history = train_ntuple(
            config,
            num_updates=args.updates,
            seed=args.seed,
            mesh=mesh,
            log_every=args.log_every,
            logger=logger,
            checkpointer=ckpt,
        )
    elif args.algo == "ddpg":
        from rein48_tpu.train.ddpg import DDPGConfig, train_ddpg

        config = DDPGConfig(num_envs=args.batch_size, learning_rate=args.lr)
        _, history = train_ddpg(
            config,
            num_updates=args.updates,
            seed=args.seed,
            log_every=args.log_every,
            logger=logger,
            checkpointer=ckpt,
        )
    else:  # pragma: no cover
        raise SystemExit(f"unknown algo {args.algo}")
    if history:
        last = history[-1]
        print(f"final: {last}", file=sys.stderr)
    logger.close()
    return 0


def _cmd_parity(args: argparse.Namespace) -> int:
    """Fixed-seed trajectory parity check (BASELINE config #1).

    Plays whole games up to four ways — the ACTUAL reference code (if
    mounted), the clean-room Python oracle, the native C oracle (if a
    compiler is available), and the JAX engine replaying the oracle's
    spawn decisions — and asserts bit-identical boards at every step.
    """
    import json
    import random as pyrandom

    import jax.numpy as jnp
    import numpy as np

    from rein48_tpu import native
    from rein48_tpu.engine import core, oracle

    use_native = native.available()
    results = []
    for seed in range(args.seeds):
        rng = pyrandom.Random(seed)
        game = oracle.OracleGame(rng=rng)
        native_game = native.NativeOracleGame(seed) if use_native else None
        spawn_iter = iter(game.spawn_log)
        board = jnp.zeros((4, 4), dtype=jnp.uint8)
        d = next(spawn_iter)
        board = core.place_tile(
            board, jnp.asarray(d.rank), jnp.asarray(d.value_exp), jnp.asarray(True)
        )
        if native_game is not None and native_game.state_matrix != game.state_matrix:
            raise SystemExit(f"native oracle reset diverged (seed {seed})")
        steps, done, diverged = 0, False, False
        while not done and steps < args.max_steps:
            action = oracle.random_action(rng)
            prev_spawns = len(game.spawn_log)
            state, _, done = game.step(action)
            if native_game is not None:
                # Consume the action draw on the native stream too, then
                # step; the native board must match the Python oracle's.
                native_game.random_action()
                n_state, _, n_done = native_game.step(action)
                if n_state != state or n_done != done:
                    diverged = True
                    break
            nb, _, changed = core.move_boards(
                board, jnp.asarray(core.ACTION_ALIASES[action])
            )
            if len(game.spawn_log) > prev_spawns:
                dd = game.spawn_log[-1]
                nb = core.place_tile(
                    nb, jnp.asarray(dd.rank), jnp.asarray(dd.value_exp),
                    jnp.asarray(True),
                )
            board = nb
            if not np.array_equal(
                np.asarray(core.boards_to_values(board)), np.asarray(state)
            ):
                diverged = True
                break
            steps += 1
        results.append(
            {"seed": seed, "steps": steps, "done": done, "parity": not diverged}
        )
        status = "OK " if not diverged else "FAIL"
        print(f"seed {seed}: {status} {steps} steps", file=sys.stderr)
    ok = all(r["parity"] for r in results)
    print(json.dumps({"parity": ok, "native_oracle": use_native, "games": results}))
    return 0 if ok else 1


def _cmd_eval(args: argparse.Namespace) -> int:
    import json

    import jax

    from rein48_tpu.train.evaluate import evaluate_policy, evaluate_search

    # Settings resolution: explicit flag > config persisted next to the
    # checkpoint (utils/checkpoint.py save_config) > trainer default. A
    # checkpoint trained with non-default gamma/reward-transform/encoding
    # must be evaluated in those same units — especially the value-guided
    # planner, where a mismatch silently degrades the search.
    saved = {}
    ckpt = None
    if args.checkpoint_dir:
        from rein48_tpu.utils.checkpoint import Checkpointer

        ckpt = Checkpointer(args.checkpoint_dir)
        saved = ckpt.load_config() or {}

    def setting(flag_value, key, default):
        if flag_value is not None:
            return flag_value
        return saved.get(key, default)

    model_name = setting(args.model, "model", "resnet")
    obs_encoding = setting(args.obs_encoding, "obs_encoding", "onehot")

    def split_afterstate(params):
        """Afterstate-critic checkpoints store {"policy", "after"}
        (train/ppo.py afterstate_critic); split so policy eval gets the
        policy net and value-guided search gets the afterstate critic."""
        if isinstance(params, dict) and set(params) == {"policy", "after"}:
            return params["policy"], params["after"]
        return params, None

    if args.algo == "search":
        kwargs = {}
        if ckpt is not None:
            # Value-guided planning: the trained critic evaluates leaves.
            from rein48_tpu.models import nets

            params, after = split_afterstate(ckpt.restore_field("params"))
            if after is not None:
                # The co-trained afterstate critic IS the planner leaf
                # the tree is Bellman-consistent with; prefer it.
                params = after
                leaf_model = setting(None, "after_model", model_name)
                print("using afterstate-critic leaf", file=sys.stderr)
            else:
                leaf_model = model_name
            kwargs = {
                "model": nets.make_model(leaf_model),
                "params": params,
                "obs_encoding": obs_encoding,
                "gamma": setting(args.gamma, "gamma", 0.99),
                "reward_transform": setting(
                    args.reward_transform, "reward_transform", "log2"
                ),
            }
            print(f"restored step {ckpt.latest_step()}", file=sys.stderr)
        stats = evaluate_search(
            depth=args.depth,
            num_envs=args.num_envs,
            num_steps=args.max_steps,
            seed=args.seed,
            **kwargs,
        )
        print(json.dumps(stats))
        return 0
    if args.algo == "ntuple":
        from rein48_tpu.agents.ntuple import NTupleConfig, YEH_4X6
        from rein48_tpu.train.ntuple import evaluate_ntuple

        if ckpt is None:
            raise SystemExit("eval --algo ntuple needs --checkpoint-dir")
        tuples = tuple(
            tuple(int(c) for c in t) for t in saved.get("tuples", YEH_4X6)
        )
        net_config = NTupleConfig(
            tuples=tuples, symmetric=saved.get("symmetric", True)
        )
        params = ckpt.restore_field("params")
        print(f"restored step {ckpt.latest_step()}", file=sys.stderr)
        stats = evaluate_ntuple(
            params,
            net_config,
            depth=args.depth,
            num_envs=args.num_envs,
            num_steps=args.max_steps,
            seed=args.seed,
        )
        print(json.dumps(stats))
        return 0
    if args.algo == "a3c":
        from rein48_tpu.train.a3c import A3CConfig

        model = A3CConfig(model=model_name).make_model()
    elif args.algo == "ppo":
        from rein48_tpu.train.ppo import PPOConfig

        model = PPOConfig(model=model_name).make_model()
    elif args.algo == "dqn":
        from rein48_tpu.train.dqn import DQNConfig

        model = DQNConfig(model=model_name).make_model()
    else:
        raise SystemExit("eval supports --algo a3c, ppo, or dqn checkpoints")

    if ckpt is not None:
        # Params-only restore: eval needs no env batch / replay shapes.
        params, _ = split_afterstate(ckpt.restore_field("params"))
        print(f"restored step {ckpt.latest_step()}", file=sys.stderr)
    else:
        import jax.numpy as jnp

        from rein48_tpu.engine import core
        from rein48_tpu.train import common

        dummy = common.encode_obs(
            jnp.zeros((1, core.BOARD_SIZE, core.BOARD_SIZE), jnp.uint8),
            obs_encoding,
        )
        params = model.init(jax.random.key(0), dummy)["params"]
    stats = evaluate_policy(
        params,
        model,
        obs_encoding=obs_encoding,
        num_envs=args.num_envs,
        num_steps=args.max_steps,
        seed=args.seed,
        greedy=not args.sample,
    )
    print(json.dumps(stats))
    return 0


def _cmd_bench(args: argparse.Namespace) -> int:
    import json
    import time

    import jax

    from rein48_tpu.engine import vector
    from rein48_tpu.utils.profiling import force

    def run_jnp(st, _rnd):
        st, _ = vector.rollout_random(st, args.unroll)
        return st

    def run_fused(st, rnd):
        from rein48_tpu.engine import fused

        st, _ = fused.rollout_random_fused(st, args.seed * 1000 + rnd, args.unroll)
        return st

    engine = args.engine
    rollout = run_fused if engine == "fused" else run_jnp
    state = vector.reset_batch(jax.random.key(args.seed), args.batch)
    if engine == "auto":
        # Prefer the fused Pallas kernel; fall back to the portable jnp
        # engine on backends without Mosaic support.
        try:
            state = run_fused(state, -1)
            force(state.score)
            engine, rollout = "fused", run_fused
        except Exception as exc:
            print(f"fused engine unavailable ({type(exc).__name__}); "
                  "using jnp engine", file=sys.stderr)
            engine, rollout = "jnp", run_jnp
    state = rollout(state, 0)  # compile + warm up
    force(state.score)
    t0 = time.perf_counter()
    for i in range(args.rounds):
        state = rollout(state, i + 1)
    force(state.score)
    dt = time.perf_counter() - t0
    sps = args.batch * args.unroll * args.rounds / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(sps, 1),
                "unit": "steps/s",
                "engine": engine,
                "batch": args.batch,
                "unroll": args.unroll,
                "device": str(jax.devices()[0]),
            }
        )
    )
    return 0


def _normalize_control(value: str) -> str:
    # Reference alias sets (main.py:64-69).
    if value in ("r", "rand", "random", "Random"):
        return "rand"
    if value in ("h", "hand", "human", "Hand"):
        return "hand"
    raise argparse.ArgumentTypeError(
        f"unknown control '{value}' (choose rand/hand)"
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rein48", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("play", help="play one game (rand or hand control)")
    pp.add_argument("-c", "--control", type=_normalize_control, default="rand")
    pp.add_argument("-v", "--visual", action="store_true")
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--max-steps", type=int, default=10000)
    pp.add_argument("--legal-only", action="store_true", default=True)
    pp.add_argument("--score", action="store_true", help="pay merge score")
    pp.set_defaults(fn=_cmd_play)

    pt = sub.add_parser("train", help="train an agent")
    pt.add_argument(
        "--algo",
        choices=("a3c", "ppo", "dqn", "ddpg", "ntuple", "afterstate"),
        default="a3c",
    )
    pt.add_argument("--model", default="resnet")
    pt.add_argument("--updates", type=int, default=200)
    pt.add_argument("--batch-size", type=int, default=4096)
    pt.add_argument("--unroll", type=int, default=32)
    pt.add_argument("--lr", type=float, default=3e-4)
    pt.add_argument(
        "--alpha", type=float, default=None,
        help="TD learning rate (--algo ntuple; default: trainer default)",
    )
    pt.add_argument(
        "--update-mode", choices=("step", "delayed"), default="step",
        help="--algo ntuple: classic per-step TD or windowed delayed TD "
        "(much faster on TPU)",
    )
    pt.add_argument(
        "--delay-window", type=int, default=None,
        help="--update-mode delayed: env steps per frozen-table window "
        "(must divide --unroll; 0 = whole update; default: trainer "
        "default, the measured frontier optimum)",
    )
    pt.add_argument(
        "--table-backend", choices=("auto", "xla", "mxu"), default="auto",
        help="--algo ntuple: table op lowering; mxu = one-hot matmul "
        "kernels (ops/tables.py), tables <= 65536 entries only",
    )
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument(
        "--afterstate",
        action="store_true",
        help="ppo only: co-train an afterstate value net (planner leaf)",
    )
    pt.add_argument("--mesh", action="store_true", help="shard over all devices")
    pt.add_argument("--parity", action="store_true", help="reference-parity regime")
    pt.add_argument("--log-dir", default=None)
    pt.add_argument("--log-every", type=int, default=10)
    pt.add_argument("--checkpoint-dir", default=None)
    pt.add_argument("--checkpoint-every", type=int, default=100)
    pt.set_defaults(fn=_cmd_train)

    pr = sub.add_parser("parity", help="fixed-seed parity check vs reference")
    pr.add_argument("--seeds", type=int, default=5)
    pr.add_argument("--max-steps", type=int, default=3000)
    pr.set_defaults(fn=_cmd_parity)

    pe = sub.add_parser("eval", help="evaluate a trained policy or the planner")
    pe.add_argument(
        "--algo",
        choices=("a3c", "ppo", "dqn", "search", "ntuple"),
        default="a3c",
    )
    # None defaults: fall back to the config persisted with the
    # checkpoint, then to the trainer default (see _cmd_eval).
    pe.add_argument("--model", default=None)
    pe.add_argument(
        "--obs-encoding", default=None, choices=("onehot", "raw", "log2")
    )
    pe.add_argument("--gamma", type=float, default=None)
    pe.add_argument("--reward-transform", default=None)
    pe.add_argument(
        "--depth", type=int, default=1,
        help="expectimax depth (--algo search/ntuple; ntuple depth 0 = "
        "greedy afterstate policy)",
    )
    pe.add_argument("--checkpoint-dir", default=None)
    pe.add_argument("--num-envs", type=int, default=512)
    pe.add_argument("--max-steps", type=int, default=4096)
    pe.add_argument("--seed", type=int, default=0)
    pe.add_argument("--sample", action="store_true", help="sample instead of greedy")
    pe.set_defaults(fn=_cmd_eval)

    pb = sub.add_parser("bench", help="env throughput benchmark")
    pb.add_argument("--batch", type=int, default=16384)
    pb.add_argument("--unroll", type=int, default=1024)
    pb.add_argument("--rounds", type=int, default=4)
    pb.add_argument("--seed", type=int, default=0)
    pb.add_argument(
        "--engine",
        choices=("auto", "fused", "jnp"),
        default="auto",
        help="fused Pallas kernel (TPU) or portable jnp scan",
    )
    pb.set_defaults(fn=_cmd_bench)
    return p


def main(argv: Optional[Sequence[str]] = None) -> int:
    # The environment's sitecustomize force-selects the TPU backend and
    # ignores JAX_PLATFORMS (see .claude/skills/verify/SKILL.md); honor an
    # explicit CPU request via config, which does win.
    if os.environ.get("REIN48_FORCE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

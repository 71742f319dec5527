# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Capability-per-wall-clock frontier: per-step TD vs delayed windows.

VERDICT r2 item 3: the trainer default (update_mode/delay_window) was
chosen by throughput intuition, not evidence. This script gives every
contender the SAME wall-clock budget on the same chip — per-step TD and
delayed TD at several window lengths — then scores each policy with the
unbiased first-episode protocol. Capability-per-wall-hour is the number
that picks the default.

Each leg trains the flagship 4x6 network (B=1024, steps_per_update=128)
from scratch for BUDGET_SEC of pure stepping (compile excluded — one
warmup update runs before the clock starts), then plays 512 greedy
first-episodes.

Usage: python examples/ntuple_frontier_tpu.py [budget_sec] [out_json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.enable()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from rein48_tpu.train.ntuple import (
    NTupleTrainConfig,
    evaluate_ntuple,
    init_ntuple,
    make_ntuple_step,
)
from rein48_tpu.utils.profiling import force

BUDGET_SEC = float(sys.argv[1]) if len(sys.argv) > 1 else 420.0
OUT = sys.argv[2] if len(sys.argv) > 2 else "benchmarks/frontier_r3.json"
# Optional: table backend and an explicit leg list ("mode:window" with
# window "none" for whole-update), e.g.
#   python examples/ntuple_frontier_tpu.py 420 out.json cached delayed:4
BACKEND = sys.argv[3] if len(sys.argv) > 3 else "xla"

if len(sys.argv) > 4:
    LEGS = tuple(
        (m, None if w.lower() == "none" else int(w))
        for m, w in (leg.split(":") for leg in sys.argv[4:])
    )
else:
    LEGS = (
        ("step", None),
        ("delayed", 4),
        ("delayed", 16),
        ("delayed", 64),
    )

results = []
for mode, window in LEGS:
    config = NTupleTrainConfig(
        batch_size=1024,
        steps_per_update=128,
        update_mode=mode,
        delay_window=window,
        table_backend=BACKEND,
    )
    state, net = init_ntuple(config, jax.random.key(0))
    step = jax.jit(make_ntuple_step(config), donate_argnums=(0,))
    refresh = None
    if config.network_config().backend == "cached":
        refresh = jax.jit(net.refresh_cache, donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = step(state)  # compile + warmup (excluded from budget)
    force(metrics["td_abs_err"])
    if refresh is not None:
        # Compile the refresh too, then reset to a fresh state so every
        # leg trains from scratch.
        import dataclasses

        state = dataclasses.replace(state, params=refresh(state.params))
        force(state.params["t0_rm"])
    compile_sec = time.perf_counter() - t0

    updates = 0
    t0 = time.perf_counter()
    # Check the clock every 20 updates (~1-30s depending on mode) so the
    # fence overhead stays negligible. The cache refresh (every 40
    # updates) runs INSIDE the budget — it is part of training cost.
    while time.perf_counter() - t0 < BUDGET_SEC:
        for _ in range(20):
            state, metrics = step(state)
        force(metrics["td_abs_err"])
        updates += 20
        if refresh is not None and updates % 40 == 0:
            import dataclasses

            state = dataclasses.replace(state, params=refresh(state.params))
    train_sec = time.perf_counter() - t0
    env_steps = updates * config.batch_size * config.steps_per_update

    t0 = time.perf_counter()
    stats = evaluate_ntuple(
        state.params,
        config,
        depth=0,
        num_envs=512,
        num_steps=16384,
        seed=321,
        protocol="first",
    )
    eval_sec = time.perf_counter() - t0

    leg = {
        "mode": mode,
        "delay_window": window,
        "backend": BACKEND,
        "compile_sec": round(compile_sec, 1),
        "train_sec": round(train_sec, 1),
        "updates": updates,
        "env_steps": env_steps,
        "steps_per_sec": round(env_steps / train_sec, 1),
        "eval_sec": round(eval_sec, 1),
        "eval": stats,
    }
    results.append(leg)
    print(
        f"LEG {mode}/{window}: {env_steps / 1e6:.1f}M steps in {train_sec:.0f}s "
        f"({env_steps / train_sec / 1e3:.0f}k/s) -> avg_score "
        f"{stats['avg_score']:.0f}, frac_1024 {stats['frac_1024']:.3f}, "
        f"frac_2048 {stats['frac_2048']:.3f}",
        flush=True,
    )
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"budget_sec": BUDGET_SEC, "legs": results}, f, indent=2)

print(f"wrote {OUT}", flush=True)

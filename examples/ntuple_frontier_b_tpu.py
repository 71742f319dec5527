# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Capability-per-wall-clock frontier over BATCH SIZE (VERDICT r4 item 4).

Round 3's frontier (benchmarks/frontier_r3.json) compared update modes at
fixed B=1024 and picked delayed/4; no leg ever varied B. The flagship
trains at ~205k env-steps/s (B=1024) on an engine that steps 2.8B/s — if
capability per chip-second holds at bigger B, the 62-minute flagship run
compresses several-fold. This sweep gives delayed/4 the SAME wall-clock
budget at B in {1024, 4096, 16384} (steps_per_update fixed at 128), then
scores 512 greedy first-episodes each. Whatever wins becomes the
flagship default (NTupleTrainConfig.batch_size).

Usage: python examples/ntuple_frontier_b_tpu.py [budget_sec] [out_json]
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
OUT = sys.argv[2] if len(sys.argv) > 2 else "benchmarks/frontier_r5.json"
BATCHES = (
    tuple(int(b) for b in sys.argv[3:]) if len(sys.argv) > 3 else (1024, 4096, 16384)
)

results = []
for batch in BATCHES:
    config = NTupleTrainConfig(
        batch_size=batch,
        steps_per_update=128,
        update_mode="delayed",
        delay_window=4,
    )
    state, net = init_ntuple(config, jax.random.key(0))
    step = jax.jit(make_ntuple_step(config), donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = step(state)  # compile + warmup (excluded from budget)
    force(metrics["td_abs_err"])
    compile_sec = time.perf_counter() - t0

    updates = 0
    t0 = time.perf_counter()
    # Check the clock every few updates; a scalar force per check keeps
    # fence overhead negligible while bounding budget overshoot.
    check_every = max(1, 20480 // batch)
    while time.perf_counter() - t0 < BUDGET_SEC:
        for _ in range(check_every):
            state, metrics = step(state)
        force(metrics["td_abs_err"])
        updates += check_every
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
        "batch_size": batch,
        "mode": "delayed",
        "delay_window": 4,
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
        f"LEG B={batch}: {env_steps / 1e6:.1f}M steps in {train_sec:.0f}s "
        f"({env_steps / train_sec / 1e3:.0f}k/s) -> avg_score "
        f"{stats['avg_score']:.0f}, frac_1024 {stats['frac_1024']:.3f}, "
        f"frac_2048 {stats['frac_2048']:.3f}",
        flush=True,
    )
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({"budget_sec": BUDGET_SEC, "legs": results}, f, indent=2)

print(f"wrote {OUT}", flush=True)

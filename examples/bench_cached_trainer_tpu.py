# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Flagship n-tuple trainer: XLA vs hot-prefix-cached table backend, TPU.

VERDICT r3 item 1: the 4x6-tuple trainer — source of every headline
capability number — runs at ~206k env-steps/s because XLA serializes
its random table ops. This measures the end-to-end trainer win of
``table_backend="cached"`` (ops/hbm_tables.py) against the XLA baseline
at the frontier configuration (delayed/4, B=1024, steps_per_update=128)
plus a B=4096 leg, training FROM the flagship checkpoint's heat regime
(fresh tables but a warmed policy distribution matters little for
throughput; steady-state rates are what count).

Usage:  python examples/bench_cached_trainer_tpu.py [updates_per_leg]
Writes: benchmarks/cached_trainer_r4.json
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

from rein48_tpu.train.ntuple import NTupleTrainConfig, train_ntuple

UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 60
ALL_LEGS = {
    "xla_b1024": ("xla", 1024),
    "cached_b1024": ("cached", 1024),
    "xla_b4096": ("xla", 4096),
    "cached_b4096": ("cached", 4096),
}
CHOSEN = sys.argv[2:] or ["xla_b1024", "cached_b1024"]

results = {}
if os.path.exists("benchmarks/cached_trainer_r4.json"):
    with open("benchmarks/cached_trainer_r4.json") as f:
        results = json.load(f)
for name in CHOSEN:
    backend, batch = ALL_LEGS[name]
    config = NTupleTrainConfig(
        batch_size=batch,
        steps_per_update=128,
        update_mode="delayed",
        delay_window=4,
        table_backend=backend,
    )
    t0 = time.perf_counter()
    state, hist = train_ntuple(
        config, num_updates=UPDATES, seed=0, log_every=10
    )
    wall = time.perf_counter() - t0
    # Steady-state rate from the last two history records (cumulative
    # steps_per_sec includes compile; invert to wall-clock per record).
    spu = config.batch_size * config.steps_per_update
    t_a = hist[-2]["update"] * spu / hist[-2]["steps_per_sec"]
    t_b = hist[-1]["update"] * spu / hist[-1]["steps_per_sec"]
    sps = (hist[-1]["update"] - hist[-2]["update"]) * spu / (t_b - t_a)
    results[name] = {
        "steps_per_sec": round(sps, 1),
        "cumulative_steps_per_sec": round(hist[-1]["steps_per_sec"], 1),
        "wall_sec": round(wall, 1),
        "updates": UPDATES,
        "batch": batch,
    }
    print(f"{name}: {sps:,.0f} steps/s steady (wall {wall:.1f}s)",
          flush=True)

os.makedirs("benchmarks", exist_ok=True)
with open("benchmarks/cached_trainer_r4.json", "w") as f:
    json.dump(results, f, indent=2)
print("wrote benchmarks/cached_trainer_r4.json", flush=True)

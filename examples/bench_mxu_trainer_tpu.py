# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""End-to-end n-tuple trainer throughput: XLA vs MXU table backend.

VERDICT r2 item 4 asks for two measurements on the real chip: the raw
table-op speedup of the one-hot matmul kernels (``ops/tables.py``,
measured by ``benchmarks/bench_tables.py``) and proof that a trainer
mode uses them END-TO-END. This script times the full training step
(env rollout + TD learning, ``train/ntuple.py make_ntuple_step``) for
the SJ_2X4 network — whose 65536-entry tables qualify for the MXU
path — under both backends and both update modes, on one chip.

Usage:  python examples/bench_mxu_trainer_tpu.py [rounds] [updates_per_round]
Writes: benchmarks/mxu_trainer_r4.json
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

from rein48_tpu.agents import ntuple as ntuple_lib
from rein48_tpu.train.ntuple import (
    NTupleTrainConfig,
    init_ntuple,
    make_ntuple_step,
)
from rein48_tpu.utils.profiling import force

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
UPDATES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

LEGS = (
    ("step", "xla"),
    ("step", "mxu"),
    ("delayed", "xla"),
    ("delayed", "mxu"),
)

print("devices:", jax.devices(), flush=True)
results = []
for mode, backend in LEGS:
    config = NTupleTrainConfig(
        batch_size=1024,
        steps_per_update=128,
        update_mode=mode,
        tuples=ntuple_lib.SJ_2X4,
        table_backend=backend,
    )
    state, _ = init_ntuple(config, jax.random.key(0))
    step = jax.jit(make_ntuple_step(config), donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = step(state)
    force(metrics["td_abs_err"])
    compile_sec = time.perf_counter() - t0

    best = 0.0
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(UPDATES):
            state, metrics = step(state)
        force(metrics["td_abs_err"])
        dt = time.perf_counter() - t0
        best = max(best, UPDATES * config.batch_size
                   * config.steps_per_update / dt)
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    leg = {
        "mode": mode,
        "backend": backend,
        "compile_sec": round(compile_sec, 1),
        "steps_per_sec": round(best, 1),
        "td_abs_err": round(m["td_abs_err"], 4),
        "best_tile": m["best_tile"],
    }
    results.append(leg)
    print(f"LEG {mode}/{backend}: {best / 1e3:.0f}k env-steps/s "
          f"(compile {compile_sec:.0f}s)", flush=True)
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/mxu_trainer_r4.json", "w") as f:
        json.dump({"network": "SJ_2X4", "batch": 1024,
                   "steps_per_update": 128, "legs": results}, f, indent=2)

print("wrote benchmarks/mxu_trainer_r4.json", flush=True)

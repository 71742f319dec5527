# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Throughput smoke for the n-tuple TD trainer on the real TPU chip.

Usage: python examples/smoke_ntuple_tpu.py [updates] [batch] [steps_per_update] [mode]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.enable()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from rein48_tpu.train.ntuple import NTupleTrainConfig, init_ntuple, make_ntuple_step

UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
SPU = int(sys.argv[3]) if len(sys.argv) > 3 else 128
MODE = sys.argv[4] if len(sys.argv) > 4 else "step"

print("devices:", jax.devices(), flush=True)
config = NTupleTrainConfig(
    batch_size=BATCH, steps_per_update=SPU, update_mode=MODE
)
state, _ = init_ntuple(config, jax.random.key(0))
step = jax.jit(make_ntuple_step(config), donate_argnums=(0,))

t0 = time.perf_counter()
state, metrics = step(state)
# Scalar fetch fences the first (compiling) step.
print(f"compile+first step: {float(metrics['episodes']):.0f} eps, "
      f"{time.perf_counter()-t0:.1f}s", flush=True)

for r in range(3):
    t0 = time.perf_counter()
    for _ in range(UPDATES):
        state, metrics = step(state)
    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    dt = time.perf_counter() - t0
    sps = UPDATES * BATCH * SPU / dt
    print(f"round {r}: {dt:.2f}s -> {sps/1e6:.1f}M steps/s | "
          f"best_tile={m['best_tile']:.0f} td_err={m['td_abs_err']:.2f}",
          flush=True)

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""PPO throughput/MFU vs batch size — the measured optimization attempt
VERDICT r4 item 5 asks for if PPO MFU lands under ~25% (it did: 17.2%,
benchmarks/mfu_r5.json).

Hypothesis: at B=8192 the per-step launch overhead + rollout env math
leave MXU headroom; doubling the env batch amortizes both and raises
MFU. This probe runs a short steady-state window at each B and records
frames/s + computed MFU. No training value is at stake — fresh params,
~40 updates per leg.

Usage: python examples/bench_ppo_batch_tpu.py [updates_per_leg] [B ...]
Writes: benchmarks/ppo_batch_mfu_r5.json
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

from rein48_tpu.models import nets
from rein48_tpu.train.ppo import PPOConfig, init_ppo, make_ppo_step
from rein48_tpu.utils import flops as F
from rein48_tpu.utils.profiling import force

UPDATES = int(sys.argv[1]) if len(sys.argv) > 1 else 40
BATCHES = tuple(int(b) for b in sys.argv[2:]) if len(sys.argv) > 2 else (8192, 16384)

fwd = F.model_forward_flops(nets.make_model("resnet"))
legs = []
for batch in BATCHES:
    config = PPOConfig(batch_size=batch, unroll_len=32, model="resnet", gamma=0.997)
    state, model, optimizer = init_ppo(config, jax.random.key(0))
    step = jax.jit(make_ppo_step(config, model, optimizer), donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = step(state)
    force(metrics["loss"])
    compile_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(UPDATES):
        state, metrics = step(state)
    force(metrics["loss"])
    dt = time.perf_counter() - t0
    fps = UPDATES * batch * config.unroll_len / dt
    flops_per_frame = F.train_flops_per_frame(fwd, reuse_passes=config.num_epochs)
    leg = {
        "batch_size": batch,
        "updates": UPDATES,
        "compile_sec": round(compile_sec, 1),
        "window_sec": round(dt, 2),
        "frames_per_sec": round(fps),
        "achieved_tflops": round(fps * flops_per_frame / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(F.mfu(fps, flops_per_frame), 4),
    }
    legs.append(leg)
    print("LEG", leg, flush=True)
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/ppo_batch_mfu_r5.json", "w") as f:
        json.dump({"resnet_fwd_flops": fwd, "legs": legs}, f, indent=2)

print("wrote benchmarks/ppo_batch_mfu_r5.json", flush=True)

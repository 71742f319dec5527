# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Headline benchmark: batched 2048 env throughput on the local device.

Prints ONE JSON line to stdout:
    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N}

``vs_baseline`` is value / 10M — the north-star target of >=10M
env-steps/s per v5e host (``BASELINE.json``; the reference publishes no
numbers of its own, see BASELINE.md). Progress goes to stderr; stdout
stays machine-readable.

Measurement protocol (tunnel-aware, see .claude/skills/verify/SKILL.md):
everything stays on device and timing rounds are fenced by fetching ONE
scalar — ``block_until_ready`` alone does not reliably fence execution
through this environment's TPU tunnel and yields absurd rates. Rollouts
are uniform-random-policy ``lax.scan``s — the same acting path training
uses.
"""

from __future__ import annotations

import json
import sys
import time

import jax

BATCH = 65536
UNROLL = 2048
ROUNDS = 3
TARGET = 10_000_000.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from rein48_tpu.engine import vector
    from rein48_tpu.utils.profiling import force

    log(f"devices: {jax.devices()}")
    key = jax.random.key(0)

    t0 = time.perf_counter()
    state = vector.reset_batch(key, BATCH)
    force(state.score)
    log(f"reset_batch({BATCH}): {time.perf_counter() - t0:.1f}s")

    # Compile + warm up.
    t0 = time.perf_counter()
    state, _ = vector.rollout_random(state, UNROLL)
    force(state.score)
    log(f"first rollout (compile): {time.perf_counter() - t0:.1f}s")

    best = 0.0
    for i in range(ROUNDS):
        t0 = time.perf_counter()
        state, _ = vector.rollout_random(state, UNROLL)
        force(state.score)  # fences the whole round
        dt = time.perf_counter() - t0
        sps = BATCH * UNROLL / dt
        best = max(best, sps)
        log(f"round {i}: {dt * 1e3:.1f}ms -> {sps / 1e6:.1f}M steps/s")

    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec",
                "value": round(best, 1),
                "unit": "steps/s",
                "vs_baseline": round(best / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

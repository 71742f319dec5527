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

Two engines are measured and the best wins the headline:
* the fused Pallas rollout kernel (``engine/fused.py``): whole rollout in
  VMEM, hardware PRNG — ~2.8G steps/s on one v5e chip;
* the jnp ``lax.scan`` engine (``engine/vector.py``): threefry streams,
  B-invariant — ~300M steps/s; also the fallback if Pallas is unavailable
  on the backend.

Measurement protocol (tunnel-aware, see .claude/skills/verify/SKILL.md):
everything stays on device and timing rounds are fenced by fetching ONE
scalar — ``block_until_ready`` alone does not reliably fence execution
through this environment's TPU tunnel and yields absurd rates. Rollouts
are uniform-random-policy loops — the same acting path training uses.
"""

from __future__ import annotations

import json
import sys
import time

import jax

# Persistent compile cache: reset_batch/rollout executables are identical
# across bench runs, and the remote TPU compile tunnel is slow and
# variable (40-300s observed for the same program).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 65536
UNROLL = 2048
ROUNDS = 3
TARGET = 10_000_000.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _bench_engine(name, state, rollout, force):
    """Time ROUNDS rollouts of an engine; returns (best steps/s, state)."""
    t0 = time.perf_counter()
    state = rollout(state, 0)
    force(state.score)
    log(f"{name}: first rollout (compile): {time.perf_counter() - t0:.1f}s")

    best = 0.0
    for i in range(ROUNDS):
        t0 = time.perf_counter()
        state = rollout(state, i + 1)
        force(state.score)  # fences the whole round
        dt = time.perf_counter() - t0
        sps = BATCH * UNROLL / dt
        best = max(best, sps)
        log(f"{name}: round {i}: {dt * 1e3:.1f}ms -> {sps / 1e6:.1f}M steps/s")
    return best, state


def main() -> None:
    from rein48_tpu.engine import fused, vector
    from rein48_tpu.utils.profiling import force

    log(f"devices: {jax.devices()}")
    key = jax.random.key(0)

    t0 = time.perf_counter()
    state = vector.reset_batch(key, BATCH)
    force(state.score)
    log(f"reset_batch({BATCH}): {time.perf_counter() - t0:.1f}s")

    def run_jnp(st, _round):
        st, _ = vector.rollout_random(st, UNROLL)
        return st

    def run_fused(st, rnd):
        st, _ = fused.rollout_random_fused(st, 7_000_001 + rnd, UNROLL)
        return st

    best_jnp, state = _bench_engine("jnp-scan", state, run_jnp, force)

    try:
        best_fused, state = _bench_engine("pallas-fused", state, run_fused, force)
    except Exception as exc:  # Pallas unavailable on this backend
        log(f"pallas-fused engine unavailable: {type(exc).__name__}: {exc}")
        best_fused = 0.0

    best = max(best_jnp, best_fused)
    log(f"headline: {'pallas-fused' if best_fused >= best_jnp else 'jnp-scan'}")
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

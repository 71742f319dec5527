# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Measure the n-tuple trainer's REAL table-index distribution (CPU).

The XLA ceiling on random table ops (~47M elem/s, benchmarks/
bench_tables.py) is distribution-independent, but any Pallas escape
hatch is not: a VMEM-resident "hot head" only pays off if the trainer's
actual lookups concentrate there. This script replays the flagship
policy's own lookup stream (greedy afterstate policy from the trained
checkpoint, the same `_all_afterstates` indices the trainer gathers
every step) and reports, per table:

* CDF of index values under the checkpoint's digit order (head-residency
  of a static table prefix);
* the same CDF under the best "zeros-first" digit reordering (cells most
  likely to hold an empty/small exponent moved to the HIGH-significance
  digits, compacting real boards toward index 0);
* top-K hot-row coverage (dynamic-cache upper bound);
* per-step unique-row counts (dedup/DMA-coalescing potential).

Output: benchmarks/index_distribution.json + stdout table.

Usage: PALLAS_AXON_POOL_IPS= python benchmarks/measure_index_distribution.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rein48_tpu.agents import ntuple as ntuple_lib
from rein48_tpu.engine import vector
from rein48_tpu.train.ntuple import (
    NTupleTrainConfig,
    _all_afterstates,
    get_network,
    init_ntuple,
)
from rein48_tpu.utils.checkpoint import Checkpointer

B = 256
HORIZON = 8192
SAMPLE_EVERY = 64

ckpt = Checkpointer("ckpt/ntuple_tpu")
saved = ckpt.load_config() or {}
kwargs = {}
if "tuples" in saved:
    kwargs["tuples"] = tuple(tuple(int(c) for c in t) for t in saved["tuples"])
config = NTupleTrainConfig(**kwargs)
net = get_network(config.network_config())

template, _ = init_ntuple(config, jax.random.key(0))
state = ckpt.restore(template)
params = state.params
print(f"checkpoint step {ckpt.latest_step()} restored", flush=True)


@jax.jit
def greedy_step(env, params):
    after, reward, legal = _all_afterstates(env.boards)
    v = net.value(params, after)
    q = jnp.where(legal, reward + v, -jnp.inf)
    action = jnp.argmax(q, axis=-1).astype(jnp.int32)
    env2, _ = vector.step_autoreset(env, action)
    return env2


env = vector.reset_batch(jax.random.key(42), B)
boards_samples = []
for t in range(HORIZON):
    env = greedy_step(env, params)
    if (t + 1) % SAMPLE_EVERY == 0:
        boards_samples.append(np.asarray(env.boards))
        if len(boards_samples) % 32 == 0:
            print(f"  step {t + 1}/{HORIZON}", flush=True)

boards = np.concatenate(boards_samples)  # [S*B, 4, 4]
print(f"collected {boards.shape[0]} boards", flush=True)

# The trainer's gather stream: indices of all 4 afterstates per board.
after, _, _ = _all_afterstates(jnp.asarray(boards))
after = np.asarray(after).reshape(-1, 4, 4)  # [N*4, 4, 4]

flat = after.reshape(after.shape[0], 16).astype(np.int64)

report = {"boards": int(boards.shape[0]), "tables": []}
for i, cells in enumerate(config.tuples):
    k = len(cells)
    size = 16**k
    digits = flat[:, list(cells)]  # [N, k] exponents, canonical cell order
    # Symmetry images: the trainer gathers all 8; replicate that.
    syms = ntuple_lib._symmetry_maps()
    digs = np.concatenate(
        [flat[:, syms[s][list(cells)]] for s in range(8)], axis=0
    )  # [8N, k]

    def cdf_for(order):
        w = 16 ** np.arange(k)[np.argsort(order)]  # significance per col
        # order[j] = significance rank of digit j (0 = least significant)
        weights = np.zeros(k, dtype=np.int64)
        for col, rank in enumerate(order):
            weights[col] = 16**rank
        idx = (digs * weights).sum(axis=1)
        out = {}
        for head_bits in (13, 14, 16, 17, 18, 20):
            out[f"frac_lt_2^{head_bits}"] = float(
                np.mean(idx < (1 << head_bits))
            )
        return idx, out

    # Canonical order: cell j has significance j (weights 16^j).
    idx_can, cdf_can = cdf_for(list(range(k)))

    # Zeros-first order: give the HIGHEST significance to the cell most
    # likely to be empty, so real boards compact toward low indices.
    p_zero = (digs == 0).mean(axis=0)
    order = np.empty(k, dtype=int)
    # ranks: least-significant (0) -> least-likely-zero cell.
    for rank, col in enumerate(np.argsort(p_zero)):
        order[col] = rank
    idx_opt, cdf_opt = cdf_for(order.tolist())

    # Hot-row coverage (128-wide rows) under the optimized order.
    rows = idx_opt >> 7
    uniq, counts = np.unique(rows, return_counts=True)
    top = np.sort(counts)[::-1]
    coverage = {}
    for K in (512, 2048, 8192, 32768):
        coverage[f"top_{K}_rows"] = float(top[:K].sum() / len(rows))

    # Dedup potential within one trainer step-batch (B=1024's stream is
    # 1024 boards x 4 afterstates x 8 syms = 32768 lookups per table).
    step_rows = rows[: 32768] if len(rows) >= 32768 else rows
    uniq_step = len(np.unique(step_rows))

    table_report = {
        "table": i,
        "cells": list(cells),
        "size": size,
        "p_zero_per_cell": [round(float(p), 4) for p in p_zero],
        "order_opt": order.tolist(),
        "cdf_canonical": cdf_can,
        "cdf_zeros_first": cdf_opt,
        "hot_row_coverage_opt": coverage,
        "unique_rows_in_32k_lookups": int(uniq_step),
    }
    report["tables"].append(table_report)
    print(f"\ntable {i} cells={cells} size={size}")
    print(f"  p_zero/cell: {[round(float(p), 3) for p in p_zero]}")
    print(f"  canonical CDF: {cdf_can}")
    print(f"  zeros-first CDF: {cdf_opt}")
    print(f"  hot-row coverage: {coverage}")
    print(f"  unique rows in 32k lookups: {uniq_step}")

with open("benchmarks/index_distribution.json", "w") as f:
    json.dump(report, f, indent=2)
print("\nwrote benchmarks/index_distribution.json", flush=True)

# Dump a realistic per-table index-stream sample (the trainer's actual
# canonical-order lookup indices) so table-op benchmarks can measure the
# TRUE workload, not uniform random — the XLA serial loop is
# distribution-independent but Pallas cache designs are not.
streams = {}
idx_streams = net.indices(jnp.asarray(after))
for i, idx in enumerate(idx_streams):
    flat_idx = np.asarray(idx).reshape(-1).astype(np.int32)
    streams[f"t{i}"] = flat_idx[:262144]
np.savez_compressed("benchmarks/realistic_idx.npz", **streams)
print("wrote benchmarks/realistic_idx.npz", flush=True)

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Microbenchmark: random gathers/scatters into n-tuple value tables.

ROUND-4 CORRECTION (measure-first lesson): every number in the original
table below was dominated by PER-LAUNCH overhead, not op cost. This
environment dispatches each jitted call through a remote TPU tunnel
with ~3ms round-trip, and the original protocol timed one op per call:
the "flat ~47M elem/s serial loop" at 160k elements was ~3ms of launch
+ ~0.3ms of gather. Measured with IN-PROGRAM repetition (a fori_loop
around the op inside one jit, which is how ops actually run inside the
trainer's update step), on the same chip:

    in-program elem gather   160k            1.75 ns/elem   572 M elem/s
    in-program elem scatter+ 160k            10.7 ns/elem    94 M elem/s
    in-program row gather    8192x128 rows     31 ns/row    4.1 G elem/s
    in-program row scatter   2048x128 rows    164 ns/row    781 M elem/s
    P4 single-launch gather  1k..160k        2.9-3.9 ms (launch-bound)

Consequences:
* The trainer (one launch per UPDATE) always ran at the in-program
  rates; gathers were never its bottleneck. The measured update
  ablation (B=1024, delayed/4, 21.6ms/window): acting+values 10.5ms,
  window apply (3 stats scatters + dense pass per table) 11.1ms.
* Scatter-add at 10.7 ns/elem IS the slowest primitive; a Pallas
  membership/MXU scatter kernel (ops/hbm_tables.py) was built and is
  exact, but Mosaic's constraints (no sort/scatter, sublane
  dynamic_gather limited to one vreg, and [K, 896] f32 accumulators
  paying full VMEM read+write per touch: measured 14us per RMW, 6.5M
  elem/s end-to-end) leave it ~unprofitable vs XLA's in-program rates
  at any prefix size with acceptable coverage. It ships as a tested
  opt-in (table_backend="cached"), default off.
* Two "obvious" XLA-level fixes measured SLOWER end-to-end and were
  reverted: a [size, 3] fused stats scatter (minor-dim 3 pads to 128
  lanes: 97k steps/s, a 2x regression) and a constant-matmul index
  computation (193k vs 203k; XLA already lowers the constant-index
  digit gather well).

The original (launch-bound) numbers and conclusions are kept below for
the record; treat any cross-launch comparison as a tunnel measurement,
not an op measurement.


Measures every strategy considered for the n-tuple trainer's hot ops
(``agents/ntuple.py``): the value lookup (a 160k-element random gather
into 16^6-entry tables per env step at B=1024) and the TD collision-mean
apply. Run it alone — it owns the TPU tunnel.

Measured on TPU v5e (one chip, 2026-08-20, fenced with scalar fetches —
over the axon tunnel ``block_until_ready`` returns at enqueue, which
inflates rates ~100x; see utils/profiling.py):

    g0 flat fancy-index                3.49 ms        46.9 M elem/s
    g1 row16 + take_along              6.33 ms        25.9 M elem/s
    g1b row16 + onehot-sum             4.71 ms        34.8 M elem/s
    g3 sorted gather                   4.87 ms        33.6 M elem/s
    g4 value-like gather+reduce        3.45 ms        47.4 M elem/s
    s0 scatter-add flat                3.82 ms        42.9 M elem/s
    s2 scatter-add sorted              6.17 ms        26.6 M elem/s
    sort only (argsort 160k)           2.92 ms        56.2 M elem/s
    mean via argsort+segments          9.05 ms        18.1 M elem/s
    mean via scratch+gatherback        7.70 ms        21.3 M elem/s

Conclusions baked into the framework design:

* XLA lowers big-table gathers/scatters on TPU to a serial loop at a
  flat ~47M elements/s — independent of layout (flat vs 16/128-wide
  rows), sortedness, or batching. The plain 1D fancy-index is already
  optimal; every "clever" layout is slower because it moves MORE
  elements through the same loop.
* The n-tuple trainer does 160 lookups per env step (4 afterstates + 1
  previous afterstate, 32 symmetry images each), so ~300k env-steps/s
  is the hard XLA ceiling for ANY update mode at any batch size; the
  per-step collision-mean apply puts step mode at ~100k. This is why
  ``update_mode="delayed"`` exists. The equal-wall-clock frontier on
  the real chip (benchmarks/frontier_r3.json, round 3) showed
  delayed/window-4 beats per-step TD on BOTH throughput (206k vs 102k
  steps/s) and capability (frac_2048 0.947 vs 0.887 at 420s) — the
  earlier note here that per-step TD wins per wall-clock was a
  CPU-regime extrapolation and is refuted on TPU.
* Beating the wall needs a Mosaic/Pallas kernel doing scalar-core VMEM
  gathers, which requires tables small enough to stay VMEM-resident
  (e.g. 5-cell tuples at 4MB/table), or SparseCore hardware (not on
  v5e). The 4x6 network's 4x67MB tables rule that out on this chip.

Small-table (65536-entry) regime, measured round 3 on the same chip
with the FIRST-CUT MXU kernels (f32 one-hot matmuls, 1024-index grid
steps):

    small g0 fancy-index               3.59 ms        45.6 M elem/s
    small s0 scatter-add               3.49 ms        46.9 M elem/s
    small mean argsort+segments        9.11 ms        18.0 M elem/s
    small MXU gather                   3.09 ms        52.9 M elem/s
    small MXU scatter-sum              3.78 ms        43.4 M elem/s
    small MXU scatter-stats(3x)        2.91 ms        56.2 M elem/s

i.e. only ~1.2x on the raw gather (per-grid-step pipeline overhead
dominated: 160 tiny steps against a ~0.3ms matmul floor) but already
3.1x on the fused stats pass vs the argsort+segments pipeline step mode
actually uses. ops/tables.py has since been reworked (exact bf16 limb
matmuls at full MXU rate + 64k-index super-chunks swept by an inner
loop — see its docstring); the reworked kernels are CPU-verified
bit-exact, and their TPU timing is the first thing to measure next time
the chip is free (this round's remaining budget was spent re-landing
the flagship capability runs around TPU-worker crashes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N_TABLE = 16**6
N_IDX = 160 * 1024  # lookups per env-step at B=1024 in the trainer


def timeit(name, fn, *args):
    float(fn(*args))  # compile + warm
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(out)  # fence: scalar fetch, not block_until_ready
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt*1e3:8.2f} ms   {N_IDX/dt/1e6:9.1f} M elem/s",
          flush=True)


@jax.jit
def g0_flat(table, idx):
    return jnp.sum(table[idx])


@jax.jit
def g1_row16(table, idx):
    t2 = table.reshape(N_TABLE // 16, 16)
    rows = t2[idx >> 4]  # [N, 16]
    return jnp.sum(jnp.take_along_axis(rows, (idx & 15)[:, None], axis=1))


@jax.jit
def g1b_row16_onehot(table, idx):
    t2 = table.reshape(N_TABLE // 16, 16)
    rows = t2[idx >> 4]
    oh = jax.nn.one_hot(idx & 15, 16, dtype=jnp.float32)
    return jnp.sum(rows * oh)


@jax.jit
def g3_sorted(table, idx):
    order = jnp.argsort(idx)
    return jnp.sum(table[idx[order]])


@jax.jit
def g4_value_like(table, idx):
    # Five board-sets x 32 lookups as in the trainer's hot loop.
    v = table[idx].reshape(5, N_IDX // (5 * 32), 32)
    return jnp.sum(jnp.sum(v, axis=-1))


@jax.jit
def s0_scatter_add(table, idx, vals):
    return jnp.sum(table.at[idx].add(vals)[:8])


@jax.jit
def s2_scatter_sorted(table, idx, vals):
    order = jnp.argsort(idx)
    return jnp.sum(
        table.at[idx[order]].add(vals[order], indices_are_sorted=True)[:8]
    )


@jax.jit
def sort_only(idx):
    return jnp.sum(jnp.argsort(idx))


@jax.jit
def mean_sorted(table, idx, vals):
    # The td_apply collision="mean" path: argsort + segment means.
    order = jnp.argsort(idx)
    s_ids = idx[order]
    s_d = vals[order]
    first = jnp.concatenate([jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    seg = jnp.cumsum(first) - 1
    live = (s_d != 0.0).astype(s_d.dtype)
    counts = jnp.zeros(idx.shape, s_d.dtype).at[seg].add(live)
    d = s_d / jnp.maximum(counts[seg], 1.0)
    return jnp.sum(table.at[s_ids].add(d, mode="drop")[:8])


@jax.jit
def mean_scratch(table, idx, vals):
    # Sort-free collision mean: scatter hit counts into a dense scratch,
    # gather them back per element, scale, scatter-add.
    live = (vals != 0.0).astype(jnp.float32)
    hits = jnp.zeros((N_TABLE,), jnp.float32).at[idx].add(live)
    d = vals / jnp.maximum(hits[idx], 1.0)
    return jnp.sum(table.at[idx].add(d, mode="drop")[:8])


N_SMALL = 16**4  # 4-cell-tuple table: the ops/tables.py MXU regime


@jax.jit
def g0_small(table, idx):
    return jnp.sum(table[idx])


@jax.jit
def s0_small(table, idx, vals):
    return jnp.sum(table.at[idx].add(vals)[:8])


@jax.jit
def mxu_gather_sum(table, idx):
    from rein48_tpu.ops import tables as table_ops

    return jnp.sum(table_ops.mxu_gather(table, idx))


@jax.jit
def mxu_scatter_sum_head(idx, vals):
    from rein48_tpu.ops import tables as table_ops

    return jnp.sum(table_ops.mxu_scatter_sum(N_SMALL, idx, vals)[:8])


@jax.jit
def mxu_stats_head(idx, vals):
    from rein48_tpu.ops import tables as table_ops

    e, a, h = table_ops.mxu_scatter_stats(N_SMALL, idx, vals)
    return jnp.sum(e[:8]) + jnp.sum(a[:8]) + jnp.sum(h[:8])


@jax.jit
def mean_small_sorted(table, idx, vals):
    order = jnp.argsort(idx)
    s_ids = idx[order]
    s_d = vals[order]
    first = jnp.concatenate([jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]])
    seg = jnp.cumsum(first) - 1
    live = (s_d != 0.0).astype(s_d.dtype)
    counts = jnp.zeros(idx.shape, s_d.dtype).at[seg].add(live)
    d = s_d / jnp.maximum(counts[seg], 1.0)
    return jnp.sum(table.at[s_ids].add(d, mode="drop")[:8])


import functools


@functools.partial(jax.jit, static_argnames=("reps",))
def _inprog_gather(table, idx, reps):
    # The gather must DEPEND on the carry or while-loop invariant code
    # motion could hoist it and the timing would cover < reps gathers
    # (ADVICE r4). acc stays ~1e-3, so int32(acc * 1e-30) is 0 at runtime
    # every iteration — but not provably so at compile time (x - x would
    # be algebraically simplified; a float->int cast of a carry isn't).
    def body(i, acc):
        dep = jnp.asarray(acc * 1e-30, jnp.int32)
        return acc + jnp.sum(table[idx + dep]) * 1e-9

    return jax.lax.fori_loop(0, reps, body, 0.0)


@functools.partial(jax.jit, static_argnames=("reps",))
def _inprog_scatter(table, idx, vals, reps):
    def body(i, t):
        return t.at[idx].add(vals + i * 0.0)

    return jax.lax.fori_loop(0, reps, body, table)[:2]


def inprogram_protocol():
    """The CORRECT op-measurement protocol (round 4): repeat the op
    inside one jit so the ~3ms per-launch tunnel round-trip amortizes
    away; the per-rep time is the op as the trainer actually pays it."""
    key = jax.random.key(0)
    table = jnp.zeros((N_TABLE,), jnp.float32) + 1.0
    idx = jax.random.randint(key, (N_IDX,), 0, N_TABLE, dtype=jnp.int32)
    vals = jnp.sin(jnp.arange(N_IDX, dtype=jnp.float32))
    REPS = 20
    for name, fn, args in (
        ("in-program gather 160k", _inprog_gather, (table, idx, REPS)),
        ("in-program scatter-add 160k", _inprog_scatter, (table, idx, vals, REPS)),
    ):
        out = fn(*args)
        float(jnp.sum(out.reshape(-1)[:1]) if hasattr(out, "reshape") else out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.sum(out.reshape(-1)[:1]) if hasattr(out, "reshape") else out)
            best = min(best, (time.perf_counter() - t0) / REPS)
        print(
            f"{name:30s} {best*1e6:8.1f} us/rep   "
            f"{N_IDX/best/1e6:9.1f} M elem/s   {best/N_IDX*1e9:5.2f} ns/elem",
            flush=True,
        )


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    key = jax.random.key(0)
    table = jnp.zeros((N_TABLE,), jnp.float32) + 1.0
    idx = jax.random.randint(key, (N_IDX,), 0, N_TABLE, dtype=jnp.int32)
    vals = jnp.sin(jnp.arange(N_IDX, dtype=jnp.float32))

    print("devices:", jax.devices(), flush=True)
    inprogram_protocol()
    print("--- single-launch (tunnel-bound) protocol below ---", flush=True)
    timeit("g0 flat fancy-index", g0_flat, table, idx)
    timeit("g1 row16 + take_along", g1_row16, table, idx)
    timeit("g1b row16 + onehot-sum", g1b_row16_onehot, table, idx)
    timeit("g3 sorted gather", g3_sorted, table, idx)
    timeit("g4 value-like gather+reduce", g4_value_like, table, idx)
    timeit("s0 scatter-add flat", s0_scatter_add, table, idx, vals)
    timeit("s2 scatter-add sorted", s2_scatter_sorted, table, idx, vals)
    timeit("sort only (argsort 160k)", sort_only, idx)
    timeit("mean via argsort+segments", mean_sorted, table, idx, vals)
    timeit("mean via scratch+gatherback", mean_scratch, table, idx, vals)

    # --- small-table (65536) regime: XLA serial loop vs MXU kernels ---
    table_s = jnp.zeros((N_SMALL,), jnp.float32) + 1.0
    idx_s = jax.random.randint(key, (N_IDX,), 0, N_SMALL, dtype=jnp.int32)
    timeit("small g0 fancy-index", g0_small, table_s, idx_s)
    timeit("small s0 scatter-add", s0_small, table_s, idx_s, vals)
    timeit("small mean argsort+segments", mean_small_sorted, table_s, idx_s, vals)
    timeit("small MXU gather", mxu_gather_sum, table_s, idx_s)
    timeit("small MXU scatter-sum", mxu_scatter_sum_head, idx_s, vals)
    timeit("small MXU scatter-stats(3x)", mxu_stats_head, idx_s, vals)


if __name__ == "__main__":
    main()

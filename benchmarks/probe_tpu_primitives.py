# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Micro-probes for the primitives behind a Pallas HBM-table kernel.

The n-tuple trainer's ceiling is XLA's ~47M elem/s serial loop on random
table gathers/scatters (benchmarks/bench_tables.py). Any Pallas escape
hatch composes from a handful of primitives whose TPU cost is NOT
documented anywhere; this script measures each one in isolation so the
kernel design is built on data:

  P1  Mosaic dynamic gather along sublanes (take_along_axis axis=0,
      same-shape): out[j,l] = tab[idx[j,l], l]. THE enabler for a
      VMEM-resident hot-row cache — is it a hardware gather or a
      legalization loop?
  P2  Lane shuffle (take_along_axis axis=1, same-shape).
  P3  In-kernel stream compaction (prefix-sum by matmul with a
      triangular matrix + outer-product placement) — the exact cold-path
      splitter.
  P4  XLA gather cost vs N (fixed overhead vs per-element cost).
  P5  Per-row DMA issue rate (HBM->VMEM ring of single 128-float rows).
  P6  Fused compare+select "MXU membership gather" at K in {1k, 4k}.

Every probe validates on the CPU interpreter first (--cpu), then times
on the chip (best-of-8, scalar-fetch fenced per the tunnel protocol).

Usage:
  PALLAS_AXON_POOL_IPS= python benchmarks/probe_tpu_primitives.py --cpu
  python benchmarks/probe_tpu_primitives.py          # on the TPU
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CPU = "--cpu" in sys.argv
if CPU:
    jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

INTERP = pltpu.InterpretParams() if CPU else False
RESULTS = {}


def fence(x):
    return float(jnp.sum(x.reshape(-1)[:1]))


def timeit(name, fn, *args, reps=20, elems=None):
    out = fn(*args)
    fence(out if not isinstance(out, tuple) else out[0])  # compile
    best = float("inf")
    for _ in range(3 if CPU else 8):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        fence(out if not isinstance(out, tuple) else out[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    rate = f"   {elems / best / 1e6:9.1f} M elem/s" if elems else ""
    print(f"{name:42s} {best * 1e6:9.1f} us{rate}", flush=True)
    RESULTS[name] = {"us": best * 1e6, "m_elem_s": (elems / best / 1e6) if elems else None}
    return best


# ---------------------------------------------------------------- P1
def _p1_kernel(idx_ref, tab_ref, out_ref, *, reps):
    def body(i, acc):
        g = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
        return acc + g

    out_ref[:] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros_like(out_ref), unroll=False
    )


@functools.partial(jax.jit, static_argnames=("reps",))
def p1_gather_axis0(idx, tab, reps):
    return pl.pallas_call(
        functools.partial(_p1_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct(tab.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(idx, tab)


def probe_p1():
    for K in (1024, 8192):
        key = jax.random.key(0)
        tab = jax.random.normal(key, (K, 128), jnp.float32)
        idx = jax.random.randint(jax.random.key(1), (K, 128), 0, K, jnp.int32)
        # correctness
        got = np.asarray(p1_gather_axis0(idx, tab, 1))
        want = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        inner = 1 if CPU else 16
        timeit(
            f"P1 axis0 dyn-gather [{K},128] x{inner}",
            p1_gather_axis0, idx, tab, inner,
            elems=K * 128 * inner,
        )


# ---------------------------------------------------------------- P2
def _p2_kernel(idx_ref, x_ref, out_ref, *, reps):
    def body(i, acc):
        return acc + jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    out_ref[:] = jax.lax.fori_loop(
        0, reps, body, jnp.zeros_like(out_ref), unroll=False
    )


@functools.partial(jax.jit, static_argnames=("reps",))
def p2_shuffle(idx, x, reps):
    return pl.pallas_call(
        functools.partial(_p2_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(idx, x)


def probe_p2():
    N = 8192
    x = jax.random.normal(jax.random.key(0), (N, 128), jnp.float32)
    idx = jax.random.randint(jax.random.key(1), (N, 128), 0, 128, jnp.int32)
    got = np.asarray(p2_shuffle(idx, x, 1))
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    inner = 1 if CPU else 16
    timeit(
        f"P2 lane shuffle [{N},128] x{inner}",
        p2_shuffle, idx, x, inner, elems=N * 128 * inner,
    )


# ---------------------------------------------------------------- P3
# Compaction: given mask[Nr,128] and payload[Nr,128], write the masked
# payload elements densely (row-major order) into out[Cr,128]; count in
# a scalar. Prefix sums via triangular matmuls; placement via per-group
# outer products (positions are unique, so adds never collide).
def _p3_kernel(mask_ref, pay_ref, out_ref, cnt_ref, *, Nr, Cr, reps):
    tri_l = (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(jnp.float32)  # strictly-lower -> exclusive scan
    tri_r = (
        jax.lax.broadcasted_iota(jnp.int32, (Nr, Nr), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (Nr, Nr), 1)
    ).astype(jnp.float32)

    def body(_, carry):
        m = mask_ref[:].astype(jnp.float32)
        within = jnp.dot(m, tri_l, preferred_element_type=jnp.float32)
        rowsum = jnp.sum(m, axis=1, keepdims=True)  # [Nr,1]
        rowoff = jnp.dot(tri_r, rowsum, preferred_element_type=jnp.float32)
        pos = (within + rowoff).astype(jnp.int32)  # exclusive global rank
        total = rowoff[Nr - 1, 0] + rowsum[Nr - 1, 0]

        pr = pos // 128
        pl_ = pos % 128
        dst_rows = jax.lax.broadcasted_iota(jnp.int32, (Cr, 1), 0)

        acc = jnp.zeros((Cr, 128), jnp.float32)

        def group(g, acc):
            mrow = mask_ref[g, :].astype(jnp.float32)
            a = (dst_rows == pr[g, :][None, :]).astype(jnp.float32) * mrow[
                None, :
            ]  # [Cr, 128e]
            b = (
                jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
                == pl_[g, :][:, None]
            ).astype(jnp.float32) * pay_ref[g, :][:, None]  # [128e, 128]
            return acc + jnp.dot(a, b, preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(0, Nr, group, acc, unroll=False)
        return (acc, total)

    acc, total = jax.lax.fori_loop(
        0, reps, body, (jnp.zeros((Cr, 128), jnp.float32), 0.0), unroll=False
    )
    out_ref[:] = acc
    cnt_ref[0] = total


@functools.partial(jax.jit, static_argnames=("Cr", "reps"))
def p3_compact(mask, payload, Cr, reps):
    Nr = mask.shape[0]
    return pl.pallas_call(
        functools.partial(_p3_kernel, Nr=Nr, Cr=Cr, reps=reps),
        out_shape=(
            jax.ShapeDtypeStruct((Cr, 128), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=INTERP,
    )(mask, payload)


def probe_p3():
    Nr, Cr = 128, 32  # 16384 elements, up to 4096 compacted
    key = jax.random.key(0)
    mask = jax.random.uniform(key, (Nr, 128)) < 0.1
    payload = jax.random.normal(jax.random.key(1), (Nr, 128), jnp.float32)
    out, cnt = p3_compact(mask, payload, Cr, 1)
    want = np.asarray(payload)[np.asarray(mask)]
    got = np.asarray(out).reshape(-1)[: len(want)]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert int(cnt[0]) == len(want)
    inner = 1 if CPU else 8
    timeit(
        f"P3 compact 16384 elems (10% cold) x{inner}",
        p3_compact, mask, payload, Cr, inner, elems=Nr * 128 * inner,
    )


# ---------------------------------------------------------------- P4
def probe_p4():
    tab = jnp.ones((16**6,), jnp.float32)

    @jax.jit
    def g(idx):
        return jnp.sum(tab[idx])

    for N in (1024, 8192, 65536, 163840):
        idx = jax.random.randint(jax.random.key(2), (N,), 0, 16**6, jnp.int32)
        timeit(f"P4 XLA gather N={N}", g, idx, reps=10, elems=N)

    @jax.jit
    def s(idx, vals):
        return jnp.sum(tab.at[idx].add(vals)[:8])

    for N in (8192, 65536):
        idx = jax.random.randint(jax.random.key(2), (N,), 0, 16**6, jnp.int32)
        vals = jnp.ones((N,), jnp.float32)
        timeit(f"P4 XLA scatter-add N={N}", s, idx, vals, reps=10, elems=N)


# ---------------------------------------------------------------- P5
def _p5_kernel(idx_ref, tab_hbm, out_ref, buf, sems, *, n, slots):
    def issue(i, _):
        row = idx_ref[i]
        slot = jax.lax.rem(i, slots)

        @pl.when(i >= slots)
        def _():
            pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[i - slots], 1), :],
                buf.at[pl.ds(slot, 1), :],
                sems.at[slot],
            ).wait()

        pltpu.make_async_copy(
            tab_hbm.at[pl.ds(row, 1), :],
            buf.at[pl.ds(slot, 1), :],
            sems.at[slot],
        ).start()
        return 0

    jax.lax.fori_loop(0, n, issue, 0, unroll=False)

    def drain(i, _):
        slot = jax.lax.rem(n - 1 - i, slots)
        pltpu.make_async_copy(
            tab_hbm.at[pl.ds(idx_ref[n - 1 - i], 1), :],
            buf.at[pl.ds(slot, 1), :],
            sems.at[slot],
        ).wait()
        return 0

    jax.lax.fori_loop(0, min(slots, n), drain, 0, unroll=False)
    out_ref[:] = buf[:]


@functools.partial(jax.jit, static_argnames=("n",))
def p5_dma_rows(idx, tab, n):
    slots = 16
    return pl.pallas_call(
        functools.partial(_p5_kernel, n=n, slots=slots),
        out_shape=jax.ShapeDtypeStruct((slots, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((slots, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERP,
    )(idx, tab)


def probe_p5():
    R = 131072
    tab = jnp.ones((R, 128), jnp.float32)
    for n in (2048, 16384):
        idx = jax.random.randint(jax.random.key(3), (n,), 0, R, jnp.int32)
        got = p5_dma_rows(idx, tab, n)
        fence(got)
        timeit(f"P5 row-DMA loop n={n}", p5_dma_rows, idx, tab, n,
               reps=5, elems=n)


# ---------------------------------------------------------------- P6
def _p6_kernel(hi_ref, rows_ref, cache_ref, out_ref, *, K, SUB, reps):
    n_sub = hi_ref.shape[0] // SUB

    def body(r, _):
        def sub(s, _):
            h = hi_ref[pl.ds(s * SUB, SUB), :]  # [SUB, 1] int32
            mask = h == rows_ref[0:1, :]  # broadcast -> [SUB, K]
            m = mask.astype(jnp.bfloat16)
            vals = jnp.dot(
                m,
                cache_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # [SUB, 128]
            out_ref[pl.ds(s * SUB, SUB), :] = vals
            return 0

        return jax.lax.fori_loop(0, n_sub, sub, 0, unroll=False)

    jax.lax.fori_loop(0, reps, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("K", "reps"))
def p6_membership(hi, rows, cache, K, reps):
    N = hi.shape[0]
    SUB = 256
    return pl.pallas_call(
        functools.partial(_p6_kernel, K=K, SUB=SUB, reps=reps),
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERP,
    )(hi, rows, cache)


def probe_p6():
    for K in (1024, 4096):
        N = 2048
        rows = jnp.arange(K, dtype=jnp.int32).reshape(1, K) * 7
        cache = jax.random.normal(jax.random.key(0), (K, 128), jnp.float32)
        hi = (
            jax.random.randint(jax.random.key(1), (N, 1), 0, K, jnp.int32) * 7
        )
        got = np.asarray(p6_membership(hi, rows, cache, K, 1))
        want = np.asarray(cache)[np.asarray(hi[:, 0]) // 7]
        # Timing probe casts cache to bf16 (the real kernel limb-splits
        # for exactness); tolerance is bf16 rounding.
        np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)
        inner = 1 if CPU else 8
        timeit(
            f"P6 membership-select K={K} N={N} x{inner}",
            p6_membership, hi, rows, cache, K, inner, elems=N * inner,
        )


def main():
    print("devices:", jax.devices(), flush=True)
    names = ["probe_p2", "probe_p3", "probe_p6", "probe_p4", "probe_p7",
             "probe_p1"]
    if not CPU:
        names.append("probe_p5")  # DMA loop: real hardware only
    probes = [globals()[n] for n in names]
    for p in probes:
        try:
            p()
        except Exception as e:  # keep measuring; record the failure
            msg = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
            print(f"{p.__name__} FAILED: {msg}", flush=True)
            RESULTS[p.__name__] = {"error": msg}
    with open(
        "benchmarks/probe_primitives_%s.json" % ("cpu" if CPU else "tpu"), "w"
    ) as f:
        json.dump(RESULTS, f, indent=2)
    print("done", flush=True)




# ---------------------------------------------------------------- P7
# The assembled hot-prefix gather kernel (ops/hbm_tables.py) on the
# trainer's REAL index stream (benchmarks/realistic_idx.npz) and on
# uniform random — end-to-end, including the XLA cold residue.
def probe_p7():
    import os

    import numpy as np

    from rein48_tpu.ops import hbm_tables as ht

    SIZE = 16**6
    rng = np.random.default_rng(0)
    streams = {"uniform": rng.integers(0, SIZE, 163840).astype(np.int32)}
    npz = os.path.join(os.path.dirname(__file__), "realistic_idx.npz")
    if os.path.exists(npz):
        data = np.load(npz)
        streams["realistic_t0"] = data["t0"][:163840]
    table_logical = jnp.arange(SIZE, dtype=jnp.float32) * 0.001
    rm = ht.identity_rowmap(SIZE)
    K = 2048

    for name, np_idx in streams.items():
        idx = jnp.asarray(np_idx)
        # Build the hot permutation from the stream's own row histogram
        # (stand-in for the TC heat signal).
        rows = np_idx >> 7
        heat_rows = np.bincount(rows, minlength=SIZE // ht.ROW).astype(
            np.float32
        )
        heat = np.repeat(heat_rows, ht.ROW)
        perm, rm2, hot = ht.hot_permutation(jnp.asarray(heat), rm, K)
        phys_idx = ht.physical_index(rm2, idx)
        table = (
            jnp.zeros((SIZE,), jnp.float32)
            .at[phys_idx]
            .set(table_logical[idx])
        )

        @jax.jit
        def kernel_gather(table, rm_flat, hot, idx):
            return jnp.sum(
                ht.cached_gather(
                    table,
                    rm_flat,
                    hot,
                    idx,
                    prefix_rows=K,
                    cold_capacity_rows=32,
                )
            )

        @jax.jit
        def xla_gather(table, rm_flat, idx):
            return jnp.sum(table[ht.physical_index(rm_flat, idx)])

        got = float(kernel_gather(table, rm2, hot, idx))
        want = float(xla_gather(table, rm2, idx))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        timeit(
            f"P7 kernel gather 160k ({name})",
            kernel_gather, table, rm2, hot, idx,
            reps=10, elems=163840,
        )
        timeit(
            f"P7 XLA gather 160k ({name})",
            xla_gather, table, rm2, idx,
            reps=10, elems=163840,
        )


if __name__ == "__main__":
    main()

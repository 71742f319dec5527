# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Hot-prefix permuted tables: fast table ops for HBM-sized value tables.

The flagship 4x6-tuple network's tables (4 x 16.7M entries, 67MB each)
are far beyond VMEM, and XLA lowers every random gather/scatter into
them to a serial ~47M elem/s loop (``benchmarks/bench_tables.py``) that
caps the n-tuple trainer — the framework's strongest agent — at ~0.007%
of engine throughput. The escape uses a measured property of the REAL
workload (``benchmarks/index_distribution.json``): lookups concentrate
massively — the hottest ~2048 of each table's 131072 128-wide rows
receive ~80-85% of all lookups across a whole greedy-policy horizon
(8192 rows: 94.6-97.4%).

Design — keep each table PHYSICALLY PERMUTED so its hottest rows form
the contiguous prefix ``table[:K*128]``:

* The prefix IS the cache: no second copy exists, so XLA-side updates
  of the (permuted) table are automatically coherent with kernel-side
  reads of the prefix slice.
* Membership and slot resolution are ONE fused question — "which hot
  slot, if any, holds my logical row?" — answered by brute-force
  compare against the K-entry hot-row list on the VPU and turned into
  values by an MXU matmul: the 0/1 match mask (exact in bf16) times
  the prefix's exact 3-limb bf16 decomposition reconstructs f32 values
  bit-exactly (the ``ops/tables.py`` limb trick), and the transposed
  mask times lane-one-hot channel payloads accumulates scatter
  statistics densely into ``[K, channels]`` — the scatter side runs at
  MXU rate with NO serial loop at all.
* Cold elements (rows outside the prefix) are compacted in-kernel
  (prefix-sums via triangular matmuls + one-hot placement) and
  finished by XLA's serial path, which now only ever sees the tail;
  overflow (early training, distribution shift) falls back to the
  full serial path — slower, never wrong.
* Every ``refresh_every`` updates the permutation is re-derived from
  the temporal-coherence ``|err|`` accumulator (the per-entry heat
  signal training already maintains); rows are physically reordered by
  one XLA row-gather per array, and the logical ids of the prefix rows
  become the new hot list.

Mosaic constraints that shaped this (probed in
``benchmarks/probe_tpu_primitives.py``): no sort, no scatter, and
``tpu.dynamic_gather`` along sublanes is limited to one source vreg
(8 rows), so table-sized positional gathers are impossible in-kernel —
brute-force membership at modest K plus a compacted serial tail is the
remaining profitable shape. The lane-dimension ``take_along_axis``
(which IS supported) does the final per-element lane select.

The reference has no analogue of any of this (its value functions are
tiny TF1 dense nets, ``/root/reference/algorithm/a3c/a3c.py:136-169``);
this is TPU-era performance engineering for the framework's added
n-tuple family (``agents/ntuple.py``).

MEASURED VERDICT (round 4, v5e chip; benchmarks/cached_trainer_r4.json):
the flagship delayed/4 trainer runs at 86.8k env-steps/s with this
backend vs 204.7k with plain XLA — the membership compare/accumulate
work (O(K) per element on VPU/MXU, plus ~14us of VMEM read+write per
[K, 7*ROW] accumulator touch) loses to XLA's in-program serial ops
(1.75 ns/elem gather, 10.7 ns/elem scatter; see
benchmarks/bench_tables.py round-4 correction — the "47M elem/s
ceiling" that motivated this design was a per-launch tunnel artifact).
The backend stays a correct, tested, Mosaic-compilable opt-in
(``table_backend="cached"``) and a record of what this hardware
generation's kernel toolbox can and cannot do; the flagship default is
``xla``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW = 128  # table row width == lane count
G_BLK = 128  # element rows per grid step (16384 elements)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _iota2(n, m, d):
    return jax.lax.broadcasted_iota(jnp.int32, (n, m), d)


def physical_index(rowmap_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """Logical flat index -> physical flat index (XLA-side translate)."""
    return rowmap_flat[idx >> 7] * ROW + (idx & (ROW - 1))


# ------------------------------------------------------------------
# Permutation management (plain JAX; refresh-time, O(table) amortized)
# ------------------------------------------------------------------


def identity_rowmap(size: int) -> jax.Array:
    """Identity logical->physical row map (flat ``int32[rows]``)."""
    return jnp.arange(size // ROW, dtype=jnp.int32)


def hot_permutation(a_acc_physical: jax.Array, rowmap_flat: jax.Array, k: int):
    """New permutation putting the k hottest physical rows first.

    Returns ``(perm, new_rowmap_flat, hot_logical)``: ``perm[new_phys] =
    old_phys`` (row-gather order), the updated logical->physical map,
    and the LOGICAL row ids now occupying physical slots ``0..k-1`` (the
    kernel's hot list).
    """
    heat = jnp.sum(a_acc_physical.reshape(-1, ROW), axis=1)
    rows = heat.shape[0]
    _, top = jax.lax.top_k(heat, k)
    in_top = jnp.zeros((rows,), bool).at[top].set(True)
    rest = jnp.where(~in_top, size=rows - k)[0].astype(jnp.int32)
    perm = jnp.concatenate([top.astype(jnp.int32), rest])
    newpos = jnp.zeros((rows,), jnp.int32).at[perm].set(
        jnp.arange(rows, dtype=jnp.int32)
    )
    new_rowmap = newpos[rowmap_flat]
    # hot_logical[s] = logical row in new physical slot s: invert the
    # map on its prefix.
    logical_of_oldphys = jnp.zeros((rows,), jnp.int32).at[rowmap_flat].set(
        jnp.arange(rows, dtype=jnp.int32)
    )
    hot_logical = logical_of_oldphys[perm[:k]]
    return perm, new_rowmap, hot_logical


def apply_row_permutation(arr: jax.Array, perm: jax.Array) -> jax.Array:
    """Physically reorder a flat table by rows: ``out[r] = rows[perm[r]]``."""
    return arr.reshape(-1, ROW)[perm].reshape(arr.shape)


# ------------------------------------------------------------------
# In-kernel helpers
# ------------------------------------------------------------------


def _split3(v):
    """Exact 3-limb bf16 decomposition (ops/tables.py invariant)."""
    l1 = v.astype(jnp.bfloat16)
    r1 = v - l1.astype(jnp.float32)
    l2 = r1.astype(jnp.bfloat16)
    l3 = (r1 - l2.astype(jnp.float32)).astype(jnp.bfloat16)
    return l1, l2, l3


def _compact(mask, pay1, pay2, Cr, G, dump, scratch):
    """Compact masked (pay1, pay2) f32 pairs into ``[Cr, ROW]`` buffers.

    Positions are exact ranks (prefix sums via triangular matmuls), so
    placement one-hots never collide. Unused slots hold (0, dump).
    ``scratch`` is a ``f32[5, G, ROW]`` VMEM ref staging the per-element
    fields so the placement loop can be a fori_loop with ref slicing
    (value dynamic_slice doesn't lower, and a python-unrolled loop blows
    the 16MB scoped-VMEM stack). Returns ``(buf1, buf2, count)``.
    """
    m = mask.astype(jnp.float32)
    tri_l = (_iota2(ROW, ROW, 0) < _iota2(ROW, ROW, 1)).astype(jnp.float32)
    tri_g = (_iota2(G, G, 0) > _iota2(G, G, 1)).astype(jnp.float32)
    within = jnp.dot(m, tri_l, preferred_element_type=jnp.float32)
    rowsum = jnp.sum(m, axis=1, keepdims=True)
    rowoff = jnp.dot(tri_g, rowsum, preferred_element_type=jnp.float32)
    pos = (within + rowoff).astype(jnp.int32)
    count = jnp.sum(m)

    capacity = Cr * ROW
    ok = mask & (pos < capacity)
    pr = pos >> 7
    plane = pos & (ROW - 1)

    scratch[0, :, :] = ok.astype(jnp.float32)
    scratch[1, :, :] = pr.astype(jnp.float32)
    scratch[2, :, :] = plane.astype(jnp.float32)
    scratch[3, :, :] = pay1
    scratch[4, :, :] = pay2

    def row_body(g, bufs):
        buf1, buf2 = bufs
        okr = scratch[0, pl.ds(g, 1), :]  # [1, 128]
        prr = scratch[1, pl.ds(g, 1), :]
        plc = jnp.transpose(scratch[2, pl.ds(g, 1), :]).astype(jnp.int32)
        p1c = jnp.transpose(scratch[3, pl.ds(g, 1), :])
        p2c = jnp.transpose(scratch[4, pl.ds(g, 1), :])
        a = (
            _iota2(Cr, ROW, 0).astype(jnp.float32) == prr
        ).astype(jnp.float32) * okr  # [Cr, 128e] (int iota: f32 iota
        # doesn't lower in Mosaic; row ranks are f32-exact small ints)
        lane_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1) == plc
        ).astype(jnp.float32)  # [128e, 128l]
        buf1 = buf1 + jnp.dot(
            a, lane_oh * p1c, preferred_element_type=jnp.float32
        )
        buf2 = buf2 + jnp.dot(
            a, lane_oh * p2c, preferred_element_type=jnp.float32
        )
        return buf1, buf2

    buf1, buf2 = jax.lax.fori_loop(
        0,
        G,
        row_body,
        (jnp.zeros((Cr, ROW), jnp.float32), jnp.zeros((Cr, ROW), jnp.float32)),
        unroll=False,
    )
    filled = (
        jax.lax.broadcasted_iota(jnp.int32, (Cr, ROW), 0) * ROW
        + jax.lax.broadcasted_iota(jnp.int32, (Cr, ROW), 1)
    ) < count.astype(jnp.int32)
    buf2 = jnp.where(filled, buf2, jnp.float32(dump))
    return buf1, buf2, count


# ------------------------------------------------------------------
# Gather kernel
# ------------------------------------------------------------------


def _gather_kernel(
    idx_ref,
    hot_ref,
    prefix_ref,
    vals_ref,
    hit_ref,
    cold_idx_ref,
    cold_pos_ref,
    cnt_ref,
    compact_scratch,
    *,
    G,
    Cr,
    K,
):
    # Limb-split the prefix once per grid step: [K, 3*ROW] bf16.
    limbs = jnp.concatenate(_split3(prefix_ref[:]), axis=1)
    hot_row = hot_ref[:]  # f32 [1, K]

    # Batch BATCH grid rows per matmul: per row, the 128 elements move to
    # the sublane axis by 2D transpose (Mosaic lowers transposes but not
    # cross-dimension reshapes), membership masks concatenate along
    # sublanes, and one [BATCH*128, K] x [K, 3*ROW] matmul serves all.
    # The batch loop is a fori_loop, NOT a python loop: Mosaic allocates
    # every unrolled iteration's temporaries on one scoped-VMEM stack
    # (16MB limit), so static unrolling OOMs the kernel at compile time.
    BATCH = 8

    def batch_body(b, _):
        base = b * BATCH
        masks, planes = [], []
        for j in range(BATCH):
            idx = idx_ref[pl.ds(base + j, 1), :]  # [1, 128]
            lrow_c = jnp.transpose((idx >> 7).astype(jnp.float32))
            planes.append(jnp.transpose(idx & (ROW - 1)))  # [128, 1]
            masks.append((lrow_c == hot_row).astype(jnp.bfloat16))
        mask = jnp.concatenate(masks, axis=0)  # [BATCH*128, K]
        v3 = jnp.dot(mask, limbs, preferred_element_type=jnp.float32)
        vrow = (
            v3[:, :ROW] + v3[:, ROW : 2 * ROW] + v3[:, 2 * ROW :]
        )  # [BATCH*128, ROW]: element's full hot row (or zeros)
        hit = jnp.sum(mask.astype(jnp.float32), axis=1, keepdims=True)
        for j in range(BATCH):
            vr = vrow[j * ROW : (j + 1) * ROW, :]  # [128e, 128l]
            sel = jnp.take_along_axis(
                vr,
                jnp.broadcast_to(planes[j], (ROW, ROW)),
                axis=1,
            )[:, :1]  # [128e, 1]
            vals_ref[pl.ds(base + j, 1), :] = jnp.transpose(sel)
            hit_ref[pl.ds(base + j, 1), :] = jnp.transpose(
                hit[j * ROW : (j + 1) * ROW, :]
            )
        return 0

    jax.lax.fori_loop(0, G // BATCH, batch_body, 0, unroll=False)

    idx = idx_ref[:]
    hot = hit_ref[:] > 0.0
    base = pl.program_id(0) * G * ROW
    posg = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (G, ROW), 0) * ROW
        + jax.lax.broadcasted_iota(jnp.int32, (G, ROW), 1)
    ).astype(jnp.float32)
    b_idx, b_pos, count = _compact(
        ~hot,
        idx.astype(jnp.float32),
        posg,
        Cr,
        G,
        dump=G * ROW * pl.num_programs(0),
        scratch=compact_scratch,
    )
    cold_idx_ref[:] = b_idx.astype(jnp.int32)
    cold_pos_ref[:] = b_pos.astype(jnp.int32)
    cnt_ref[:, :] = jnp.full((8, ROW), count, jnp.float32)


@functools.partial(jax.jit, static_argnames=("K", "Cr", "interpret"))
def _gather_call(idx2, hot2, prefix, K, Cr, interpret):
    G = idx2.shape[0]
    n_blocks = G // G_BLK
    return pl.pallas_call(
        functools.partial(_gather_kernel, G=G_BLK, Cr=Cr, K=K),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((G, ROW), jnp.float32),
            jax.ShapeDtypeStruct((G, ROW), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * Cr, ROW), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * Cr, ROW), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * 8, ROW), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(
                (G_BLK, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, K), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (K, ROW), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (G_BLK, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G_BLK, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Cr, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Cr, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            # Count "scalar" broadcast over one (8, 128) tile per block
            # (Pallas TPU block sublane granularity).
            pl.BlockSpec(
                (8, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[pltpu.VMEM((5, G_BLK, ROW), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(idx2, hot2, prefix)


def cached_gather(
    table: jax.Array,
    rowmap_flat: jax.Array,
    hot_rows: jax.Array,
    idx: jax.Array,
    *,
    prefix_rows: int,
    cold_capacity_rows: int = 16,
) -> jax.Array:
    """Exact ``table_logical[idx]`` for a hot-prefix permuted table.

    ``table`` is PHYSICAL storage; ``hot_rows`` the ``int32[K]`` logical
    rows of the prefix; ``idx`` LOGICAL flat indices of any shape. Hot
    elements resolve in the Pallas kernel; cold elements return through
    a compacted XLA residue; a cold-count overflow falls back to the
    full serial path (exact, slower, rare after the first refresh).
    """
    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    pad = -n % (G_BLK * ROW)
    # Pad with a guaranteed-HOT index so padding can never consume cold
    # capacity (padded values are dropped by the final slice anyway).
    flat_p = jnp.concatenate(
        [flat, jnp.full((pad,), 1, jnp.int32) * hot_rows[0] * ROW]
    )
    idx2 = flat_p.reshape(-1, ROW)
    # Cold-element positions travel as f32 through _compact (posg
    # payload / rank matmuls), exact only while every position fits a
    # f32 mantissa. Fail loudly rather than silently corrupt placement
    # (ADVICE r4); chunk bigger calls upstream.
    if idx2.size >= 2**24:
        raise ValueError(
            f"cached_gather call of {idx2.size} padded elements exceeds "
            f"the f32-exact position bound 2^24; chunk the call"
        )
    G = idx2.shape[0]
    Cr = cold_capacity_rows
    K = prefix_rows

    hot2 = hot_rows.astype(jnp.float32).reshape(1, K)
    prefix = table[: K * ROW].reshape(K, ROW)
    vals2, hit2, cold_idx, cold_pos, cnt = _gather_call(
        idx2, hot2, prefix, K, Cr, _use_interpret()
    )

    total = G * ROW
    vals = vals2.reshape(-1)
    hot = hit2.reshape(-1) > 0.0
    flat_tab = table.reshape(-1)

    def residue(_):
        ci = cold_idx.reshape(-1)
        cp = cold_pos.reshape(-1)
        cv = flat_tab[physical_index(rowmap_flat, ci)]
        return jnp.zeros((total + 1,), jnp.float32).at[cp].set(cv)[:total]

    def fallback(_):
        return flat_tab[physical_index(rowmap_flat, flat_p)]

    overflow = jnp.max(cnt) > Cr * ROW
    cold_vals = jax.lax.cond(overflow, fallback, residue, None)
    out = jnp.where(hot, vals, cold_vals)
    return out[:n].reshape(shape)


# ------------------------------------------------------------------
# Scatter-stats kernel
# ------------------------------------------------------------------


def _scatter_kernel(
    idx_ref,
    err_ref,
    hot_ref,
    stats_ref,
    cold_idx_ref,
    cold_err_ref,
    cnt_ref,
    hit_scratch,
    compact_scratch,
    *,
    G,
    Cr,
    K,
):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    hot_col = jnp.transpose(hot_ref[:])  # f32 [K, 1]

    # Batch BATCH grid rows per stats accumulation: the [K, 7*ROW] f32
    # accumulator pays a full VMEM read+write per touch (measured ~14us
    # at K=2048), so contributions concatenate across rows first. A
    # fori_loop (see the gather kernel note on scoped-VMEM stacks);
    # per-element hit counts land in a scratch ref.
    BATCH = 8

    def batch_body(b, _):
        base = b * BATCH
        maskTs = []
        rhss = []
        for j in range(BATCH):
            idx = idx_ref[pl.ds(base + j, 1), :]  # [1, 128]
            err = err_ref[pl.ds(base + j, 1), :]
            lrow_r = (idx >> 7).astype(jnp.float32)  # [1, 128]
            plane_c = jnp.transpose(idx & (ROW - 1))  # [128, 1]
            maskTs.append((hot_col == lrow_r).astype(jnp.bfloat16))
            ec = jnp.transpose(err)[:, 0]  # [128] f32
            lane_oh = (
                _iota2(ROW, ROW, 1) == plane_c
            ).astype(jnp.bfloat16)
            chans = _split3(ec) + _split3(jnp.abs(ec)) + (
                (ec != 0.0).astype(jnp.bfloat16),
            )
            rhss.append(
                jnp.concatenate(
                    [c[:, None] * lane_oh for c in chans], axis=1
                )
            )  # [128e, 7*ROW] bf16 (limb * 1.0 exact)
        maskT = jnp.concatenate(maskTs, axis=1)  # [K, BATCH*128]
        rhs = jnp.concatenate(rhss, axis=0)  # [BATCH*128, 7*ROW]
        stats_ref[:] += jnp.dot(
            maskT, rhs, preferred_element_type=jnp.float32
        )
        hits = jnp.sum(
            maskT.astype(jnp.float32), axis=0, keepdims=True
        )  # [1, BATCH*128]
        for j in range(BATCH):
            hit_scratch[pl.ds(base + j, 1), :] = hits[
                :, j * ROW : (j + 1) * ROW
            ]
        return 0

    jax.lax.fori_loop(0, G // BATCH, batch_body, 0, unroll=False)
    hit_acc = hit_scratch[:]

    idx = idx_ref[:]
    hot = hit_acc > 0.0
    b_idx, b_err, count = _compact(
        ~hot,
        idx.astype(jnp.float32),
        err_ref[:],
        Cr,
        G,
        dump=0.0,
        scratch=compact_scratch,
    )
    cold_idx_ref[:] = b_idx.astype(jnp.int32)
    cold_err_ref[:] = b_err
    cnt_ref[:, :] = jnp.full((8, ROW), count, jnp.float32)


@functools.partial(jax.jit, static_argnames=("K", "Cr", "interpret"))
def _scatter_call(idx2, err2, hot2, K, Cr, interpret):
    G = idx2.shape[0]
    n_blocks = G // G_BLK
    return pl.pallas_call(
        functools.partial(_scatter_kernel, G=G_BLK, Cr=Cr, K=K),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((K, 7 * ROW), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * Cr, ROW), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * Cr, ROW), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 8, ROW), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(
                (G_BLK, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G_BLK, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, K), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            # Same block every step: stays VMEM-resident, accumulates
            # across the sequential grid (ops/tables.py pattern).
            pl.BlockSpec(
                (K, 7 * ROW), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Cr, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Cr, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            # Count "scalar" broadcast over one (8, 128) tile per block
            # (Pallas TPU block sublane granularity).
            pl.BlockSpec(
                (8, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((G_BLK, ROW), jnp.float32),
            pltpu.VMEM((5, G_BLK, ROW), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(idx2, err2, hot2)


def cached_scatter_stats(
    hot_rows: jax.Array,
    idx: jax.Array,
    err: jax.Array,
    *,
    prefix_rows: int,
    # Default matches cached_gather and NTupleConfig.cold_capacity_rows
    # so the gather/scatter paths see the same capacity behavior when
    # called bare (ADVICE r4).
    cold_capacity_rows: int = 16,
):
    """Windowed TD statistics, split hot/cold for a hot-prefix table.

    Returns ``(err_sum, abs_sum, hits)`` each ``f32[K, 128]`` over the
    PREFIX (physical slot space), plus compacted cold residue
    ``(cold_idx int32[M], cold_err f32[M], overflow bool)`` in LOGICAL
    index space. Exactness: per-contribution values are exact (bf16
    limbs); collision sums are reassociated relative to an XLA
    scatter-add (parity up to f32 rounding, as in ``ops/tables.py``);
    ``hits`` counts ``err != 0`` exactly. Zero-padding contributes
    nothing (zero limbs, live=0).
    """
    flat = idx.reshape(-1).astype(jnp.int32)
    errf = err.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    pad = -n % (G_BLK * ROW)
    # Hot padding (zero error: contributes zero limbs and live=0).
    idx2 = jnp.concatenate(
        [flat, jnp.full((pad,), 1, jnp.int32) * hot_rows[0] * ROW]
    ).reshape(-1, ROW)
    # Same f32-exact position bound as cached_gather (ADVICE r4).
    if idx2.size >= 2**24:
        raise ValueError(
            f"cached_scatter_stats call of {idx2.size} padded elements "
            f"exceeds the f32-exact position bound 2^24; chunk the call"
        )
    err2 = jnp.pad(errf, (0, pad)).reshape(-1, ROW)
    K = prefix_rows
    hot2 = hot_rows.astype(jnp.float32).reshape(1, K)
    stats, cold_idx, cold_err, cnt = _scatter_call(
        idx2, err2, hot2, K, cold_capacity_rows, _use_interpret()
    )
    err_sum = stats[:, :ROW] + stats[:, ROW : 2 * ROW] + stats[:, 2 * ROW : 3 * ROW]
    abs_sum = (
        stats[:, 3 * ROW : 4 * ROW]
        + stats[:, 4 * ROW : 5 * ROW]
        + stats[:, 5 * ROW : 6 * ROW]
    )
    hits = stats[:, 6 * ROW :]
    overflow = jnp.max(cnt) > cold_capacity_rows * ROW
    return (
        err_sum,
        abs_sum,
        hits,
        cold_idx.reshape(-1),
        cold_err.reshape(-1),
        overflow,
    )

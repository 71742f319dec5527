# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Hot-prefix permuted tables: fast gathers into HBM-sized value tables.

The flagship 4x6-tuple network's tables (4 x 16.7M entries, 67MB each)
are far beyond VMEM, and XLA lowers every random gather/scatter into
them to a serial ~47M elem/s loop (``benchmarks/bench_tables.py``) that
caps the n-tuple trainer — the framework's strongest agent — at ~0.007%
of engine throughput. The escape uses a measured property of the REAL
workload (``benchmarks/index_distribution.json``): lookups concentrate
massively — the hottest 8192 of each table's 131072 128-wide rows
receive 94.6-97.4% of all lookups across a whole greedy-policy horizon.

Design — keep each table PHYSICALLY PERMUTED so its hottest rows form
the contiguous prefix:

* ``rowmap`` (``int32[rows/128, 128]``) maps logical row -> physical
  row. An index is "hot" iff its physical row < K. The prefix slice
  ``table[:K*128]`` IS the cache — no second copy exists, so the XLA
  scatter + dense window-apply path keeps updating the (permuted)
  table directly and cache coherence is free by construction.
* The Pallas kernel resolves ``rowmap`` then the prefix read with the
  one sub-linear indexed-read primitive Mosaic offers (probed in
  ``benchmarks/probe_tpu_primitives.py``): the same-shape sublane
  dynamic gather ``out[j, l] = T[idx[j, l], l]``. Arbitrary
  (row, lane) access is composed by ROLL-PLACED REQUEST ROUNDS:

  - each element's request (its target row, +1) is rotated to its
    target lane by one of 128 static lane-rolls, requests accumulating
    by addition;
  - one sublane gather serves every lane's request;
  - an element accepts the result iff the request slot holds exactly
    its row+1 — lane collisions corrupt the slot into a sum that
    matches nobody (and if it happens to match a third element's row,
    that element is served correctly by construction), so collided
    elements simply retry in the next round;
  - elements unresolved after ``MAX_ROUNDS``, and rows outside the
    prefix, are compacted in-kernel (prefix-sum via triangular
    matmuls + one-hot placement) and finished by XLA's serial gather,
    which now only ever sees the few-% cold tail.

  Physical lanes are XOR-hashed per logical row (``plane = (idx &
  127) ^ h(logical_row)``) so same-lane collisions between different
  rows are ~uniform instead of tracking the skewed low-digit
  distribution of board exponents. The hash is part of the permanent
  physical layout (a per-row lane bijection), shared exactly by
  ``translate`` for the XLA scatter path and by the refresh
  row-gathers (row moves never re-shuffle lanes).
* Every ``refresh_every`` updates the permutation is re-derived from
  the temporal-coherence ``|err|`` accumulator (the per-entry heat
  signal training already maintains) and rows are physically reordered
  by one XLA row-gather per array.

The reference has no analogue of any of this (its value functions are
tiny TF1 dense nets, ``/root/reference/algorithm/a3c/a3c.py:136-169``);
this is TPU-era performance engineering for the framework's added
n-tuple family (``agents/ntuple.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW = 128  # table row width == lane count
MAX_ROUNDS = 4  # request rounds before an element falls to the cold path
G_BLK = 128  # element rows per grid step (16384 elements)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _iota2(n, m, d):
    return jax.lax.broadcasted_iota(jnp.int32, (n, m), d)


def _lane_hash(row: jax.Array) -> jax.Array:
    """Per-logical-row 7-bit lane offset (rows < 2^17; no i32 overflow)."""
    return ((row * 389) >> 5) & (ROW - 1)


def _map_hash(mrow: jax.Array) -> jax.Array:
    """Per-rowmap-row lane offset for the rowmap's own storage layout."""
    return ((mrow * 181) >> 2) & (ROW - 1)


def physical_index(rowmap_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """Logical flat index -> physical flat index (pure arithmetic + map).

    ``rowmap_flat`` is the UN-hashed logical-row-order map ``int32[rows]``
    (see :func:`build_rowmap`); callers on the XLA side use this for the
    scatter/dense paths. The physical lane applies the permanent XOR
    lane hash of the LOGICAL row, so refresh row-moves never reshuffle
    within-row layout.
    """
    lrow = idx >> 7
    plane = (idx & (ROW - 1)) ^ _lane_hash(lrow)
    return rowmap_flat[lrow] * ROW + plane


# ------------------------------------------------------------------
# Permutation management (plain JAX; refresh-time, O(table) amortized)
# ------------------------------------------------------------------


def identity_rowmap(size: int) -> jax.Array:
    """Identity logical->physical row map (flat ``int32[rows]``)."""
    return jnp.arange(size // ROW, dtype=jnp.int32)


def hashed_rowmap_storage(rowmap_flat: jax.Array) -> jax.Array:
    """Kernel-side rowmap storage: ``int32[MR, 128]``, lane-hashed.

    Entry for logical row r lives at ``[r >> 7, (r & 127) ^ h2(r >> 7)]``.
    """
    rows = rowmap_flat.shape[0]
    mr = max(rows // ROW, 1)
    a = jnp.arange(rows, dtype=jnp.int32) >> 7
    b = (jnp.arange(rows, dtype=jnp.int32) & (ROW - 1)) ^ _map_hash(a)
    out = jnp.zeros((mr, ROW), jnp.int32)
    return out.at[a, b].set(rowmap_flat)


def hot_permutation(a_acc_physical: jax.Array, rowmap_flat: jax.Array, k: int):
    """New permutation putting the k hottest physical rows first.

    Returns ``(perm, new_rowmap_flat)`` with ``perm[new_phys] =
    old_phys`` (row-gather order) and the updated logical->physical map.
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
    return perm, newpos[rowmap_flat]


def apply_row_permutation(arr: jax.Array, perm: jax.Array) -> jax.Array:
    """Physically reorder a flat table by rows: ``out[r] = rows[perm[r]]``."""
    return arr.reshape(-1, ROW)[perm].reshape(arr.shape)


# ------------------------------------------------------------------
# Kernel
# ------------------------------------------------------------------


def _stage(tab, rows_t, lanes_t, pend0, G):
    """Roll-placed request rounds: vals[e] = tab[rows_t[e], lanes_t[e]].

    Serves elements with ``pend0`` (others never participate). Returns
    ``(vals f32, resolved bool)``; unresolved elements go cold.
    ``tab`` is f32 ``[H, 128]`` with H >= its largest valid row + 1.
    """
    H = tab.shape[0]
    rowsp1 = (rows_t + 1).astype(jnp.float32)  # request token: row + 1
    # d = how far right each request must rotate to reach its lane.
    pos = _iota2(G, ROW, 1)
    d = (lanes_t - pos) & (ROW - 1)

    def round_body(_, carry):
        vals, pending = carry
        req = jnp.zeros((G, ROW), jnp.float32)
        for shift in range(ROW):
            contrib = jnp.where(
                pending & (d == shift), rowsp1, 0.0
            )
            if shift:
                contrib = pltpu.roll(contrib, shift, 1)
            req = req + contrib
        # Serve check: the slot holds exactly row+1 (collisions sum to a
        # token that matches nobody — or matches a third element whose
        # row IS the sum, which then receives precisely its own row's
        # data from the gather below).
        idx_arr = jnp.clip(req.astype(jnp.int32) - 1, 0, H - 1)
        got = jnp.take_along_axis(tab, idx_arr, axis=0)[:G]
        mine_tok = jnp.take_along_axis(req, lanes_t, axis=1)
        mine_val = jnp.take_along_axis(got, lanes_t, axis=1)
        serve = pending & (mine_tok == rowsp1)
        vals = jnp.where(serve, mine_val, vals)
        return vals, pending & ~serve

    vals, pending = jax.lax.fori_loop(
        0,
        MAX_ROUNDS,
        round_body,
        (jnp.zeros((G, ROW), jnp.float32), pend0),
        unroll=False,
    )
    return vals, pend0 & ~pending


def _compact(mask, pay1, pay2, Cr, G, dump):
    """Compact masked (pay1, pay2) f32 pairs into ``[Cr, ROW]`` buffers.

    Positions are exact ranks (prefix sums via triangular matmuls), so
    placement one-hots never collide. Slots beyond the cold count hold
    (0, dump). Also returns the total masked count.
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

    BLK = 32
    buf1 = jnp.zeros((Cr, ROW), jnp.float32)
    buf2 = jnp.zeros((Cr, ROW), jnp.float32)

    def block(b, bufs):
        buf1, buf2 = bufs
        sl = lambda x: jax.lax.dynamic_slice(x, (b * BLK, 0), (BLK, ROW))
        okb = sl(ok.astype(jnp.float32)).reshape(1, BLK * ROW)
        prb = sl(pr).reshape(BLK * ROW)
        plb = sl(plane).reshape(BLK * ROW)
        p1 = sl(pay1).reshape(BLK * ROW)
        p2 = sl(pay2).reshape(BLK * ROW)
        # a[cr, e] = ok * (pr_e == cr); b_k[e, l] = (plane_e == l) * pay
        a = (
            jax.lax.broadcasted_iota(jnp.int32, (Cr, BLK * ROW), 0)
            == prb[None, :]
        ).astype(jnp.float32) * okb
        lane_oh = (
            jax.lax.broadcasted_iota(jnp.int32, (BLK * ROW, ROW), 1)
            == plb[:, None]
        ).astype(jnp.float32)
        buf1 = buf1 + jnp.dot(
            a, lane_oh * p1[:, None], preferred_element_type=jnp.float32
        )
        buf2 = buf2 + jnp.dot(
            a, lane_oh * p2[:, None], preferred_element_type=jnp.float32
        )
        return buf1, buf2

    buf1, buf2 = jax.lax.fori_loop(
        0, G // BLK, block, (buf1, buf2), unroll=False
    )
    # Unused slots: pay2 (positions) must point at the dump slot.
    filled = (
        jax.lax.broadcasted_iota(jnp.int32, (Cr, ROW), 0) * ROW
        + jax.lax.broadcasted_iota(jnp.int32, (Cr, ROW), 1)
    ) < count.astype(jnp.int32)
    buf2 = jnp.where(filled, buf2, jnp.float32(dump))
    return buf1, buf2, count


def _gather_kernel(
    idx_ref,
    rowmap_ref,
    prefix_ref,
    vals_ref,
    hot_ref,
    cold_idx_ref,
    cold_pos_ref,
    cnt_ref,
    *,
    G,
    Cr,
    K,
):
    idx = idx_ref[:]  # [G, ROW] int32 LOGICAL flat indices
    lrow = idx >> 7
    plane = (idx & (ROW - 1)) ^ _lane_hash(lrow)
    ma = lrow >> 7
    mb = (lrow & (ROW - 1)) ^ _map_hash(ma)

    all_on = jnp.ones((G, ROW), bool)
    phys_f, map_ok = _stage(
        rowmap_ref[:].astype(jnp.float32), ma, mb, all_on, G
    )
    phys_row = phys_f.astype(jnp.int32)
    in_prefix = map_ok & (phys_row < K)

    vals, val_ok = _stage(
        prefix_ref[:], jnp.where(in_prefix, phys_row, 0), plane, in_prefix, G
    )
    hot = in_prefix & val_ok
    vals_ref[:] = jnp.where(hot, vals, 0.0)
    hot_ref[:] = hot.astype(jnp.float32)

    # Cold elements carry their LOGICAL flat index (the residue redoes
    # the translation in XLA) and their GLOBAL element position.
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
    )
    cold_idx_ref[:] = b_idx.astype(jnp.int32)
    cold_pos_ref[:] = b_pos.astype(jnp.int32)
    cnt_ref[0, 0] = count


@functools.partial(jax.jit, static_argnames=("K", "Cr", "interpret"))
def _gather_call(idx2, rowmap_st, prefix, K, Cr, interpret):
    """Grid-blocked kernel launch; ``Cr`` = per-block cold rows."""
    G = idx2.shape[0]
    n_blocks = G // G_BLK
    mh = max(rowmap_st.shape[0], G_BLK)
    ph = max(K, G_BLK)
    rowmap_p = jnp.pad(rowmap_st, ((0, mh - rowmap_st.shape[0]), (0, 0)))
    prefix_p = jnp.pad(prefix, ((0, ph - K), (0, 0)))
    return pl.pallas_call(
        functools.partial(_gather_kernel, G=G_BLK, Cr=Cr, K=K),
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((G, ROW), jnp.float32),
            jax.ShapeDtypeStruct((G, ROW), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * Cr, ROW), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks * Cr, ROW), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(
                (G_BLK, ROW), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (mh, ROW), lambda g: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ph, ROW), lambda g: (0, 0), memory_space=pltpu.VMEM
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
            pl.BlockSpec(
                (1, 1), lambda g: (g, 0), memory_space=pltpu.SMEM
            ),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(idx2, rowmap_p, prefix_p)


def cached_gather(
    table: jax.Array,
    rowmap_flat: jax.Array,
    rowmap_storage: jax.Array,
    idx: jax.Array,
    *,
    prefix_rows: int,
    cold_capacity_rows: int = 8,
) -> jax.Array:
    """Exact ``table_logical[idx]`` for a hot-prefix permuted table.

    ``table`` is PHYSICAL storage; ``idx`` are LOGICAL flat indices of
    any shape. Hot elements resolve inside the Pallas kernel against
    the ``[prefix_rows, 128]`` slice; cold elements return through a
    compacted XLA residue. If any block's cold count overflows the
    compaction capacity (early training before the first refresh, or a
    distribution shift), the whole batch falls back to XLA's serial
    path — slower, never wrong.
    """
    shape = idx.shape
    flat = idx.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    pad = -n % (G_BLK * ROW)
    flat_p = jnp.pad(flat, (0, pad))
    idx2 = flat_p.reshape(-1, ROW)
    G = idx2.shape[0]
    Cr = cold_capacity_rows

    prefix = table[: prefix_rows * ROW].reshape(prefix_rows, ROW)
    vals2, hot2, cold_idx, cold_pos, cnt = _gather_call(
        idx2, rowmap_storage, prefix, prefix_rows, Cr, _use_interpret()
    )

    total = G * ROW
    vals = vals2.reshape(-1)
    hot = hot2.reshape(-1) > 0.0
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

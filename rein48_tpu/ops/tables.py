# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""MXU-reformulated table gather/scatter for small value tables.

Why this exists: XLA lowers big-table random gathers/scatters on TPU to
a serial ~47M elem/s loop (measured across every layout in
``benchmarks/bench_tables.py``), which caps the n-tuple trainer — the
framework's strongest agent — at ~0.003% of engine throughput. The
escape hatch for tables that fit VMEM is to stop asking the hardware to
chase pointers and instead feed its 128x128 systolic array:

factor each index as ``idx = hi * C + lo`` with the table reshaped
``[R, C]``; then

* gather:   ``out[n]   = onehot(hi[n]) @ table  .  onehot(lo[n])``  — one
  ``[N, R] x [R, C]`` matmul selects rows, a VPU masked row-sum selects
  the lane;
* scatter:  ``table   += onehot_hi^T @ (vals * onehot_lo)``            — one
  ``[R, N] x [N, C]`` matmul lands a whole batch of updates as a dense
  ``[R, C]`` delta.

Both are exact (one-hot rows select values; f32 accumulation), and both
run at MXU speed: for a 65536-entry table (4-cell tuples) the matmul
costs ``N * 65536 * 2`` FLOPs — ~0.4ms for N=160k on a v5e vs ~3.5ms for
the serial gather loop, with the one-hots generated on the fly in VMEM
by the Pallas kernels below (never materialized to HBM).

Scaling limit: FLOPs grow linearly with table size, so the win holds for
tables up to 16^4 = 65536 entries (4-cell tuples, 256KB — e.g. the
``SJ_2X4`` network); at 16^5 the matmul already costs as much as the
serial loop and at the flagship 16^6 it is hopeless — those networks
keep the XLA scatter path (see ``agents/ntuple.py`` ``backend`` flag).

The reference has no analogue of any of this — its "tables" are TF1
dense layers (``/root/reference/algorithm/a3c/a3c.py:136-169``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest table the MXU reformulation beats the serial-gather loop for.
MXU_TABLE_MAX = 1 << 16

_CHUNK = 1024  # index elements per grid step (VMEM one-hot: [1024, R] f32)


def supports_mxu(table_size: int) -> bool:
    """True if the MXU path is profitable and implemented for this size."""
    return table_size <= MXU_TABLE_MAX and table_size % 128 == 0


def _factor(size: int) -> Tuple[int, int]:
    """Split a table size into ``R * C`` with C a power-of-two lane count."""
    c = 256 if size >= (1 << 16) else 128
    if size % c:
        raise ValueError(f"table size {size} not divisible by {c}")
    return size // c, c


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _onehot_eq(idx: jax.Array, width: int, axis_len: int) -> jax.Array:
    """``f32[len(idx), width]`` one-hot built by iota-compare (VPU)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (axis_len, width), 1)
    return (cols == idx[:, None]).astype(jnp.float32)


def _gather_kernel(idx_ref, table_ref, out_ref, *, R, C):
    idx = idx_ref[:]
    hi = idx >> jnp.int32(C.bit_length() - 1)
    lo = idx & jnp.int32(C - 1)
    oh_hi = _onehot_eq(hi, R, _CHUNK)
    rows = jnp.dot(oh_hi, table_ref[:], preferred_element_type=jnp.float32)
    sel = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, C), 1) == lo[:, None]
    out_ref[:] = jnp.sum(jnp.where(sel, rows, 0.0), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mxu_gather_flat(table, idx, interpret):
    S = table.shape[0]
    R, C = _factor(S)
    n = idx.shape[0]
    n_pad = -n % _CHUNK
    idx_p = jnp.pad(idx, (0, n_pad))
    grid = (idx_p.shape[0] // _CHUNK,)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, R=R, C=C),
        out_shape=jax.ShapeDtypeStruct((idx_p.shape[0],), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(idx_p, table.reshape(R, C))
    return out[:n]


def mxu_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for f32 ``table[S]`` (S <= 65536), any idx shape."""
    flat = idx.reshape(-1).astype(jnp.int32)
    return _mxu_gather_flat(
        table, flat, interpret=_use_interpret()
    ).reshape(idx.shape)


def _scatter_kernel(idx_ref, val_ref, out_ref, *, R, C, stats):
    @pl.when(pl.program_id(0) == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    idx = idx_ref[:]
    v = val_ref[:]
    hi = idx >> jnp.int32(C.bit_length() - 1)
    lo = idx & jnp.int32(C - 1)
    # Transposed hi one-hot, built directly (no relayout): [R, CHUNK].
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, _CHUNK), 0)
    oh_hi_t = (rows == hi[None, :]).astype(jnp.float32)
    oh_lo = _onehot_eq(lo, C, _CHUNK)
    if stats:
        live = (v != 0.0).astype(jnp.float32)
        rhs = jnp.concatenate(
            [
                v[:, None] * oh_lo,
                jnp.abs(v)[:, None] * oh_lo,
                live[:, None] * oh_lo,
            ],
            axis=1,
        )  # [CHUNK, 3C]
    else:
        rhs = v[:, None] * oh_lo
    out_ref[:] += jnp.dot(oh_hi_t, rhs, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("size", "stats", "interpret"))
def _mxu_scatter_flat(idx, vals, size, stats, interpret):
    R, C = _factor(size)
    n = idx.shape[0]
    n_pad = -n % _CHUNK
    # Padding contributes nothing: vals pad with 0 -> zero delta, zero
    # |delta|, and live=0 excludes them from the hit count.
    idx_p = jnp.pad(idx, (0, n_pad))
    vals_p = jnp.pad(vals, (0, n_pad))
    grid = (idx_p.shape[0] // _CHUNK,)
    width = 3 * C if stats else C
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, R=R, C=C, stats=stats),
        out_shape=jax.ShapeDtypeStruct((R, width), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((_CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        # Same [R, width] block every grid step: it stays VMEM-resident
        # and accumulates across the sequential TPU grid.
        out_specs=pl.BlockSpec(
            (R, width), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(idx_p, vals_p)
    return out


def mxu_scatter_sum(size: int, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """Dense ``f32[size]`` holding ``sum of vals`` scattered at ``idx``."""
    out = _mxu_scatter_flat(
        idx.reshape(-1).astype(jnp.int32),
        vals.reshape(-1).astype(jnp.float32),
        size=size,
        stats=False,
        interpret=_use_interpret(),
    )
    return out.reshape(size)


def mxu_scatter_stats(
    size: int, idx: jax.Array, vals: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fused pass -> ``(err_sum, abs_sum, hits)``, each ``f32[size]``.

    ``hits`` counts elements with ``vals != 0`` (masked backups carry
    exact-0 errors by the trainer's convention and must not count) —
    the three quantities ``agents/ntuple.py`` needs for collision-mean,
    temporal-coherence, and delayed updates.
    """
    R, C = _factor(size)
    out = _mxu_scatter_flat(
        idx.reshape(-1).astype(jnp.int32),
        vals.reshape(-1).astype(jnp.float32),
        size=size,
        stats=True,
        interpret=_use_interpret(),
    )
    return (
        out[:, :C].reshape(size),
        out[:, C : 2 * C].reshape(size),
        out[:, 2 * C :].reshape(size),
    )

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

Two TPU-specific tricks make this fast rather than merely cute:

1. **Exact bf16 limb decomposition.** The MXU runs bf16 matmuls several
   times faster than f32, but value tables need f32. Any f32 ``v``
   splits EXACTLY into three bf16 limbs ``v = l1 + l2 + l3``
   (``l1 = bf16(v)``, ``l2 = bf16(v - l1)``, ``l3 = v - l1 - l2``; each
   subtraction is exact by Sterbenz's lemma and the final residual has
   <= 8 significant bits left, so it IS a bf16). One-hot rows are 0/1 —
   exactly bf16 — so ``onehot @ [l1 | l2 | l3]`` reconstructs the f32
   gather bit-exactly from pure-bf16 matmuls, and the scatter applies
   the same split to the update values. f32 results at bf16 MXU rate.
2. **One grid step, inner loop.** The naive grid (one 1024-index block
   per step) spends more time in per-step pipeline overhead than in the
   MXU — measured 3.1ms where the matmul floor is ~0.3ms. Instead each
   grid step owns a super-chunk and a ``fori_loop`` sweeps it in
   ``_CHUNK``-index tiles, so the fixed cost amortizes over 32x more
   work and the one-hots still never exceed a few MB of VMEM (they are
   built on the fly by iota-compare and never touch HBM).

Scaling limit: FLOPs grow linearly with table size, so the win holds
for tables up to 16^4 = 65536 entries (4-cell tuples, 256KB — e.g. the
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

_CHUNK = 2048  # index elements per inner-loop tile
_MAX_INNER = 32  # inner-loop tiles per grid step (super-chunk = 64k idx)


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


def _split3(v: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact 3-limb bf16 decomposition of f32 ``v`` (l1 + l2 + l3 == v)."""
    l1 = v.astype(jnp.bfloat16)
    r1 = v - l1.astype(jnp.float32)
    l2 = r1.astype(jnp.bfloat16)
    l3 = (r1 - l2.astype(jnp.float32)).astype(jnp.bfloat16)
    return l1, l2, l3


def _tiles(n: int) -> Tuple[int, int, int]:
    """(grid, inner, padded_n) for an index stream of length ``n``."""
    n_tiles = max(1, -(-n // _CHUNK))
    inner = min(_MAX_INNER, n_tiles)
    grid = -(-n_tiles // inner)
    return grid, inner, grid * inner * _CHUNK


def _gather_kernel(idx_ref, table_ref, out_ref, *, R, C, inner):
    shift = jnp.int32(C.bit_length() - 1)
    mask = jnp.int32(C - 1)
    # Limb-split the f32 table once per grid step; [R, 3C] bf16.
    limbs = jnp.concatenate(_split3(table_ref[:]), axis=1)

    def body(i, _):
        idx = idx_ref[i, :]
        hi = idx >> shift
        lo = idx & mask
        cols = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, R), 1)
        oh = (cols == hi[:, None]).astype(jnp.bfloat16)
        rows3 = jnp.dot(oh, limbs, preferred_element_type=jnp.float32)
        rows = rows3[:, :C] + rows3[:, C : 2 * C] + rows3[:, 2 * C :]
        sel = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, C), 1) == lo[:, None]
        out_ref[i, :] = jnp.sum(jnp.where(sel, rows, 0.0), axis=1)
        return 0

    jax.lax.fori_loop(0, inner, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mxu_gather_flat(table, idx, interpret):
    S = table.shape[0]
    R, C = _factor(S)
    n = idx.shape[0]
    grid, inner, n_pad = _tiles(n)
    idx_p = jnp.pad(idx, (0, n_pad - n)).reshape(-1, _CHUNK)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, R=R, C=C, inner=inner),
        out_shape=jax.ShapeDtypeStruct(idx_p.shape, jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (inner, _CHUNK), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((R, C), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (inner, _CHUNK), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(idx_p, table.reshape(R, C))
    return out.reshape(-1)[:n]


def mxu_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for f32 ``table[S]`` (S <= 65536), any idx shape.

    Bit-exact vs the XLA gather: the bf16 limb matmuls reconstruct the
    f32 values with no rounding (one nonzero per one-hot row, f32
    accumulation).
    """
    flat = idx.reshape(-1).astype(jnp.int32)
    return _mxu_gather_flat(
        table, flat, interpret=_use_interpret()
    ).reshape(idx.shape)


def _scatter_kernel(idx_ref, val_ref, out_ref, *, R, C, inner, stats):
    shift = jnp.int32(C.bit_length() - 1)
    mask = jnp.int32(C - 1)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        idx = idx_ref[i, :]
        v = val_ref[i, :]
        hi = idx >> shift
        lo = idx & mask
        rows = jax.lax.broadcasted_iota(jnp.int32, (R, _CHUNK), 0)
        oh_hi_t = (rows == hi[None, :]).astype(jnp.bfloat16)
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, C), 1)
            == lo[:, None]
        ).astype(jnp.bfloat16)
        # Channel values, each limb-split to bf16 so the matmul runs at
        # MXU bf16 rate yet accumulates the exact f32 contributions.
        # Minor-dim insertion ([:, None]) must happen on a 32-bit type
        # (Mosaic: "Insertion of minor dim that is not a no-op only
        # supported for 32-bit types"), so broadcast in f32 and cast the
        # product back — limb * {0,1} stays exactly bf16-representable.
        chans = _split3(v)
        if stats:
            chans = chans + _split3(jnp.abs(v)) + (
                (v != 0.0).astype(jnp.bfloat16),
            )
        oh_lo_f = oh_lo.astype(jnp.float32)
        rhs = jnp.concatenate(
            [
                (c.astype(jnp.float32)[:, None] * oh_lo_f).astype(
                    jnp.bfloat16
                )
                for c in chans
            ],
            axis=1,
        )  # [_CHUNK, len(chans)*C] bf16; limb * 1.0 is exact
        out_ref[:] += jnp.dot(
            oh_hi_t, rhs, preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, inner, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("size", "stats", "interpret"))
def _mxu_scatter_flat(idx, vals, size, stats, interpret):
    R, C = _factor(size)
    n = idx.shape[0]
    grid, inner, n_pad = _tiles(n)
    # Padding contributes nothing: vals pad with 0 -> zero limbs, zero
    # |v| limbs, and live=0 excludes them from the hit count.
    idx_p = jnp.pad(idx, (0, n_pad - n)).reshape(-1, _CHUNK)
    vals_p = jnp.pad(vals, (0, n_pad - n)).reshape(-1, _CHUNK)
    n_chan = 7 if stats else 3
    out = pl.pallas_call(
        functools.partial(
            _scatter_kernel, R=R, C=C, inner=inner, stats=stats
        ),
        out_shape=jax.ShapeDtypeStruct((R, n_chan * C), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (inner, _CHUNK), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (inner, _CHUNK), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        # Same [R, n_chan*C] block every grid step: it stays VMEM-resident
        # and accumulates across the sequential TPU grid.
        out_specs=pl.BlockSpec(
            (R, n_chan * C), lambda g: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(idx_p, vals_p)
    return out


def mxu_scatter_sum(size: int, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """Dense ``f32[size]`` holding ``sum of vals`` scattered at ``idx``.

    Exactness: each individual contribution is exact (bf16 limb split),
    but under index collisions the three per-limb partial sums are folded
    AFTER accumulation, which reassociates the f32 additions relative to
    an XLA scatter-add — colliding sums can differ from the XLA path in
    the last ulp. Parity is up-to-rounding (tests use rtol=1e-5), unlike
    ``mxu_gather`` which is genuinely bit-exact.
    """
    _, C = _factor(size)
    out = _mxu_scatter_flat(
        idx.reshape(-1).astype(jnp.int32),
        vals.reshape(-1).astype(jnp.float32),
        size=size,
        stats=False,
        interpret=_use_interpret(),
    )
    # Fold the three value limbs back into the f32 sum.
    return (
        out[:, :C] + out[:, C : 2 * C] + out[:, 2 * C :]
    ).reshape(size)


def mxu_scatter_stats(
    size: int, idx: jax.Array, vals: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fused pass -> ``(err_sum, abs_sum, hits)``, each ``f32[size]``.

    ``hits`` counts elements with ``vals != 0`` (masked backups carry
    exact-0 errors by the trainer's convention and must not count) —
    the three quantities ``agents/ntuple.py`` needs for collision-mean,
    temporal-coherence, and delayed updates.

    Exactness: as in ``mxu_scatter_sum``, per-contribution values are
    exact but collision sums are reassociated across the limb fold, so
    err_sum/abs_sum match the XLA scatter-add up to f32 rounding (not
    bit-exactly); ``hits`` is exact (0/1 contributions).
    """
    _, C = _factor(size)
    out = _mxu_scatter_flat(
        idx.reshape(-1).astype(jnp.int32),
        vals.reshape(-1).astype(jnp.float32),
        size=size,
        stats=True,
        interpret=_use_interpret(),
    )
    groups = [
        out[:, k * C : (k + 1) * C].reshape(size) for k in range(7)
    ]
    return (
        groups[0] + groups[1] + groups[2],
        groups[3] + groups[4] + groups[5],
        groups[6],
    )

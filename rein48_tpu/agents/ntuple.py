# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""N-tuple network value function — the classic 2048 function approximator.

The reference's learned evaluators are a tiny MLP and CNN
(``/root/reference/algorithm/a3c/a3c.py:136-169``,
``ddpg/actor.py:51-85``); neither family masters the game. This module
adds the approximator that actually does: the n-tuple network of
Szubert & Jaskowski ("Temporal difference learning of N-tuple networks
for the game 2048", CIG 2014), later pushed past the 32768 tile by
Jaskowski ("Mastering 2048 with delayed temporal coherence learning",
TCIAIG 2017). A board position's value is the sum of a handful of table
lookups, one per (tuple, board-symmetry) pair, where each tuple reads a
few cells and indexes a table by their exponents.

TPU-native shape: the whole network is ONE fancy-gather per batch — cell
selection is a host-side numpy constant ``[num_lookups, tuple_len]``, the
per-lookup index is an integer dot with base-16 digit weights, and the
value is a segment-sum of table gathers. Learning is a scatter-add into
the same tables. No MXU at all: this agent is a pure HBM-bandwidth
workload (random gathers into ~64M-entry tables), the exact opposite of
the dense policies in ``models/nets.py`` — between them the framework
exercises both ends of the hardware.

Tables live in a plain params dict (``{"t0": f32[16^k], ...}``), so
orbax checkpointing, optax-free TD updates, and mesh sharding all treat
them like any other pytree.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rein48_tpu.engine import core

BASE = core.MAX_EXPONENT + 1  # exponents 0..15 -> base-16 digits

# Yeh's classic 4x6-tuple shapes (flat row-major cell indices): two
# horizontal 2x3 "snakes" and two 2x3 boxes. With the 8 board symmetries
# below this covers every cell many times over; it is the standard
# "4x6-tuple" network that reaches 2048 in >95% of games with plain
# TD(0) afterstate learning.
YEH_4X6 = (
    (0, 1, 2, 3, 4, 5),
    (4, 5, 6, 7, 8, 9),
    (0, 1, 2, 4, 5, 6),
    (4, 5, 6, 8, 9, 10),
)

# Szubert & Jaskowski's CIG-2014 network, compressed by symmetry: one
# row 4-tuple (its 8 symmetry images are all rows and columns) and one
# 2x2 square (images: the four corner squares, twice). 2 tables of 65536
# — small enough for CPU training, strong enough to reach 1024/2048.
SJ_2X4 = (
    (0, 1, 2, 3),
    (0, 1, 4, 5),
)

# Small shapes for CPU tests: 2 straight 3-tuples (tables of 4096).
TINY_2X3 = (
    (0, 1, 2),
    (0, 4, 8),
)


def _symmetry_maps() -> np.ndarray:
    """The dihedral group of the board as flat cell permutations.

    Returns ``int32[8, 16]``: ``maps[s, i]`` is the original flat cell
    that position ``i`` reads under symmetry ``s``.
    """
    grid = np.arange(core.NUM_CELLS).reshape(core.BOARD_SIZE, core.BOARD_SIZE)
    out = []
    for flip in (False, True):
        g = np.fliplr(grid) if flip else grid
        for k in range(4):
            out.append(np.rot90(g, k).reshape(-1))
    return np.stack(out).astype(np.int32)


@dataclasses.dataclass(frozen=True)
class NTupleConfig:
    """Network shape.

    Attributes:
        tuples: cell-index tuples (flat row-major). All tuples share one
            length class per entry; lengths may differ between tuples.
        symmetric: expand each tuple over the 8 board symmetries with
            SHARED weights (the standard trick: one table serves 8
            lookups, giving rotation/reflection invariance for free).
        optimistic_init: initial table value. Positive values make the
            greedy policy explore (every untried configuration looks
            good); 0 is the classic default.
        backend: table gather/scatter implementation. "xla" = plain
            fancy-index/scatter (works at any size; serial ~47M elem/s
            on TPU). "mxu" = the one-hot matmul reformulation of
            ``ops/tables.py`` — MXU-speed for tables up to 65536
            entries (<= 4-cell tuples); identical math, different
            lowering. "cached" = hot-prefix permuted tables
            (``ops/hbm_tables.py``): value gathers run through the
            Pallas prefix-cache kernel and every scatter/dense op works
            on the physically permuted layout — built for the
            HBM-sized flagship tables the serial loop throttles.
        prefix_rows: "cached" only — hot-prefix size in 128-entry rows
            per table (8192 rows = 4MB of VMEM-resident values, the
            measured 94.6-97.4%-coverage point for the flagship).
        cold_capacity_rows: "cached" only — per-16384-element-block
            compaction capacity for cold lookups, in 128-slot rows
            (16 rows = 12.5% headroom; overflow falls back to the
            exact serial path).
    """

    tuples: Tuple[Tuple[int, ...], ...] = YEH_4X6
    symmetric: bool = True
    optimistic_init: float = 0.0
    backend: str = "xla"
    prefix_rows: int = 8192
    cold_capacity_rows: int = 16

    @property
    def num_lookups(self) -> int:
        return len(self.tuples) * (8 if self.symmetric else 1)


class NTupleNetwork:
    """Stateless apply/update functions for one :class:`NTupleConfig`.

    The constructor precomputes the numpy lookup constants (cell
    selections and digit weights); they embed as HLO literals (see the
    ``core._ROW_LUT`` note on why constants must stay host-side numpy).
    """

    def __init__(self, config: NTupleConfig = NTupleConfig()):
        self.config = config
        syms = _symmetry_maps() if config.symmetric else _symmetry_maps()[:1]
        cells, weights, table_of = [], [], []
        for t_id, cell_idx in enumerate(config.tuples):
            k = len(cell_idx)
            w = (BASE ** np.arange(k)).astype(np.int32)
            for s in syms:
                cells.append(s[np.asarray(cell_idx, np.int32)])
                weights.append(w)
                table_of.append(t_id)
        # Lookups are grouped per table: lookup l reads cells[l] and
        # indexes table table_of[l].
        self._cells = [np.stack([c for c, t in zip(cells, table_of) if t == i])
                       for i in range(len(config.tuples))]
        self._weights = [
            np.stack([w for w, t in zip(weights, table_of) if t == i])
            for i in range(len(config.tuples))
        ]
        self.table_sizes = tuple(
            int(BASE ** len(t)) for t in config.tuples
        )
        self.num_lookups = config.num_lookups
        if config.backend not in ("xla", "mxu", "cached"):
            raise ValueError(f"unknown table backend '{config.backend}'")
        if config.backend == "cached":
            bad = [n for n in self.table_sizes if n % (128 * 128)]
            if bad:
                raise ValueError(
                    "backend='cached' needs table sizes divisible by "
                    f"16384; got {bad} (use 'xla' for small tuples)"
                )
            # Kernel block shapes need whole 128-row groups; clamp to
            # [128, table_rows] and round down to a multiple of 128.
            self.prefix_rows = tuple(
                max(128, min(config.prefix_rows, n // 128) // 128 * 128)
                for n in self.table_sizes
            )
        if config.backend == "mxu":
            from rein48_tpu.ops import tables as table_ops

            bad = [s for s in self.table_sizes if not table_ops.supports_mxu(s)]
            if bad:
                raise ValueError(
                    f"backend='mxu' supports tables <= {table_ops.MXU_TABLE_MAX} "
                    f"entries; got {bad} (use backend='xla' for big tuples)"
                )
        self._mxu = config.backend == "mxu"
        self._cached = config.backend == "cached"

    def init(self) -> Dict[str, jax.Array]:
        """Zero (or optimistic) tables: ``{"t0": f32[16^k0], ...}``.

        backend="cached" adds per-table permutation state: ``t{i}_rm``
        (flat logical-row -> physical-row map) and ``t{i}_hot`` (the
        logical rows resident in the hot prefix, identity at init).
        Constant-initialized tables are layout-invariant, so the
        identity permutation is exact.
        """
        params = {
            f"t{i}": jnp.full((n,), self.config.optimistic_init, jnp.float32)
            for i, n in enumerate(self.table_sizes)
        }
        if self._cached:
            from rein48_tpu.ops import hbm_tables

            for i, n in enumerate(self.table_sizes):
                params[f"t{i}_rm"] = hbm_tables.identity_rowmap(n)
                # Identity permutation: the prefix holds rows 0..K-1.
                params[f"t{i}_hot"] = jnp.arange(
                    self.prefix_rows[i], dtype=jnp.int32
                )
        return params

    def indices(self, boards: jax.Array) -> Tuple[jax.Array, ...]:
        """Per-table lookup indices for ``uint8[..., 4, 4]`` boards.

        Returns one ``int32[..., L_i]`` array per table, where ``L_i`` is
        the number of symmetry images of tuple ``i``.
        """
        flat = boards.reshape(boards.shape[:-2] + (core.NUM_CELLS,)).astype(
            jnp.int32
        )
        out = []
        for cells, weights in zip(self._cells, self._weights):
            # [..., L, K] gather of the tuple's cells, then base-16 dot.
            # (A constant [16, L] index matmul was tried and measured
            # 5% SLOWER end-to-end on v5e — XLA already lowers this
            # constant-index gather well; see benchmarks/bench_tables.py
            # round-4 correction.)
            digits = flat[..., jnp.asarray(cells)]
            out.append(jnp.sum(digits * jnp.asarray(weights), axis=-1))
        return tuple(out)

    def _gather(self, params, i: int, idx: jax.Array) -> jax.Array:
        table = params[f"t{i}"]
        if self._mxu:
            from rein48_tpu.ops import tables as table_ops

            return table_ops.mxu_gather(table, idx)
        if self._cached:
            from rein48_tpu.ops import hbm_tables

            return hbm_tables.cached_gather(
                table,
                params[f"t{i}_rm"],
                params[f"t{i}_hot"],
                idx,
                prefix_rows=self.prefix_rows[i],
                cold_capacity_rows=self.config.cold_capacity_rows,
            )
        return table[idx]

    def _translate(self, params, i: int, ids: jax.Array) -> jax.Array:
        """Logical -> physical ids for the scatter/accumulator paths.

        backend="cached" stores tables physically permuted; every
        non-kernel table op (scatter-adds, sorted-segment updates, TC
        accumulator reads) just runs on translated indices — identical
        per-entry math on a relabeled domain.
        """
        if not self._cached:
            return ids
        from rein48_tpu.ops import hbm_tables

        return hbm_tables.physical_index(params[f"t{i}_rm"], ids)

    def _stats(self, size: int, ids: jax.Array, d: jax.Array):
        """Dense ``(err_sum, abs_sum, hits)`` over one table.

        hits counts nonzero deltas only (masked backups arrive as exact
        zeros and must not dilute means or move TC accumulators).
        """
        if self._mxu:
            from rein48_tpu.ops import tables as table_ops

            return table_ops.mxu_scatter_stats(size, ids, d)
        live = (d != 0.0).astype(jnp.float32)
        # Three separate 1D scatters. A fused [size, 3] scatter looks
        # cheaper (one pass over the indices) but measured 2x SLOWER end
        # to end on v5e: the minor-dim-3 stats array tiles to (8, 128)
        # vregs, so XLA pads 3 -> 128 lanes and the zero-init/apply
        # traffic balloons ~43x. Flat 1D stats keep layout dense.
        err_sum = jnp.zeros((size,), jnp.float32).at[ids].add(d)
        abs_sum = jnp.zeros((size,), jnp.float32).at[ids].add(jnp.abs(d))
        hits = jnp.zeros((size,), jnp.float32).at[ids].add(live)
        return err_sum, abs_sum, hits

    def value(self, params: Dict[str, jax.Array], boards: jax.Array) -> jax.Array:
        """V(board) = sum of all table lookups, ``float32[...]``."""
        total = None
        for i, idx in enumerate(self.indices(boards)):
            v = jnp.sum(self._gather(params, i, idx), axis=-1)
            total = v if total is None else total + v
        return total

    def td_apply(
        self,
        params: Dict[str, jax.Array],
        boards: jax.Array,
        err: jax.Array,
        alpha: float,
        collision: str = "mean",
    ) -> Dict[str, jax.Array]:
        """One TD scatter step: every lookup of ``boards`` moves by
        ``alpha * err / num_lookups``.

        ``err`` is the (already masked) TD error per board, shape =
        ``boards`` leading dims.

        collision — what a table entry hit by SEVERAL boards of the batch
        receives:

        * ``"mean"`` (default): the mean of their deltas, so the
          per-entry step is bounded by ``alpha/num_lookups`` no matter
          how correlated the batch is. This is what makes large-batch
          lockstep TD stable: thousands of parallel early-game boards
          share the same sparse patterns (measured: B=4096 with the
          classic summing update diverges to NaN within 30 updates on
          TPU, while B=128 is fine — the collision count multiplies the
          effective learning rate). Implemented with a sort + segment
          trick, all static shapes.
        * ``"sum"``: plain scatter-add — exact sequential-equivalent
          tabular TD on the minibatch; correct for small batches and for
          the unit tests that pin tabular semantics.
        """
        delta = (alpha / self.num_lookups) * err
        new = dict(params)
        for i, idx in enumerate(self.indices(boards)):
            ids = self._translate(params, i, idx.reshape(-1))
            d = jnp.broadcast_to(delta[..., None], idx.shape).reshape(-1)
            if self._mxu:
                # Dense MXU path: identical math, no sort/scatter loop.
                size = params[f"t{i}"].shape[0]
                if collision == "mean":
                    err_sum, _, hits = self._stats(size, ids, d)
                    new[f"t{i}"] = params[f"t{i}"] + err_sum / jnp.maximum(
                        hits, 1.0
                    )
                elif collision == "sum":
                    from rein48_tpu.ops import tables as table_ops

                    new[f"t{i}"] = params[f"t{i}"] + table_ops.mxu_scatter_sum(
                        size, ids, d
                    )
                else:  # pragma: no cover
                    raise ValueError(f"unknown collision mode '{collision}'")
                continue
            if collision == "mean":
                # Sort by entry; divide each element's delta by the size
                # of its run of equal indices, so the scatter-add below
                # lands the MEAN delta on every entry.
                order = jnp.argsort(ids)
                s_ids = ids[order]
                s_d = d[order]
                first = jnp.concatenate(
                    [jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]]
                )
                seg = jnp.cumsum(first) - 1
                # Masked-out backups arrive as exact 0 deltas (see the
                # trainer's err masking); they carry no information and
                # must not dilute the mean.
                live = (s_d != 0.0).astype(s_d.dtype)
                counts = jnp.zeros(ids.shape, s_d.dtype).at[seg].add(live)
                ids, d = s_ids, s_d / jnp.maximum(counts[seg], 1.0)
            elif collision != "sum":  # pragma: no cover
                raise ValueError(f"unknown collision mode '{collision}'")
            new[f"t{i}"] = new[f"t{i}"].at[ids].add(d, mode="drop")
        return new

    def init_tc(self) -> Dict[str, jax.Array]:
        """Tables plus temporal-coherence accumulators.

        For each weight table ``t{i}`` adds ``t{i}_E`` (signed TD-error
        sum) and ``t{i}_A`` (absolute TD-error sum); the per-entry
        learning-rate modulation is ``|E|/A`` (1 while untouched) — the
        TC rule of Beal & Smith, applied to 2048 n-tuple learning by
        Jaskowski (TCIAIG 2017): entries whose errors keep one sign keep
        the full rate, entries whose errors oscillate (already converged
        / inherently noisy) are damped toward 0.
        """
        params = self.init()
        for i in range(len(self.table_sizes)):
            # Distinct buffers: sharing one zeros array between E and A
            # breaks donation (same buffer donated twice) in jitted steps.
            params[f"t{i}_E"] = jnp.zeros_like(params[f"t{i}"])
            params[f"t{i}_A"] = jnp.zeros_like(params[f"t{i}"])
        return params

    def td_apply_tc(
        self,
        params: Dict[str, jax.Array],
        boards: jax.Array,
        err: jax.Array,
        alpha: float,
    ) -> Dict[str, jax.Array]:
        """Temporal-coherence TD step (collision-mean semantics).

        Per touched entry ``e`` with batch-mean error ``d_e``:
        ``w_e += alpha/L * (|E_e|/A_e) * d_e`` then ``E_e += d_e``,
        ``A_e += |d_e|`` (modulation 1 while ``A_e == 0``). Masked
        backups (exact 0 errors) neither move weights nor touch the
        accumulators.
        """
        new = dict(params)
        scale = alpha / self.num_lookups
        for i, idx in enumerate(self.indices(boards)):
            ids = self._translate(params, i, idx.reshape(-1))
            d = jnp.broadcast_to(err[..., None], idx.shape).reshape(-1)
            if self._mxu:
                # Dense MXU path: per-entry mean error + TC modulation as
                # elementwise table passes; same math as the sorted path.
                size = params[f"t{i}"].shape[0]
                err_sum, _, hits = self._stats(size, ids, d)
                mean_d = err_sum / jnp.maximum(hits, 1.0)
                e_acc = params[f"t{i}_E"]
                a_acc = params[f"t{i}_A"]
                beta = jnp.where(
                    a_acc > 0.0,
                    jnp.abs(e_acc) / jnp.maximum(a_acc, 1e-30),
                    1.0,
                )
                new[f"t{i}"] = params[f"t{i}"] + scale * beta * mean_d
                new[f"t{i}_E"] = e_acc + mean_d
                new[f"t{i}_A"] = a_acc + jnp.abs(mean_d)
                continue
            order = jnp.argsort(ids)
            s_ids = ids[order]
            s_d = d[order]
            first = jnp.concatenate(
                [jnp.ones((1,), bool), s_ids[1:] != s_ids[:-1]]
            )
            seg = jnp.cumsum(first) - 1
            live = (s_d != 0.0).astype(s_d.dtype)
            counts = jnp.zeros(ids.shape, s_d.dtype).at[seg].add(live)
            seg_sum = jnp.zeros(ids.shape, s_d.dtype).at[seg].add(s_d)
            # Per-run mean error, landed once per run (first occurrence).
            mean_d = (seg_sum / jnp.maximum(counts, 1.0))[seg] * first
            e_acc = params[f"t{i}_E"][s_ids]
            a_acc = params[f"t{i}_A"][s_ids]
            beta = jnp.where(
                a_acc > 0.0, jnp.abs(e_acc) / jnp.maximum(a_acc, 1e-30), 1.0
            )
            new[f"t{i}"] = new[f"t{i}"].at[s_ids].add(
                scale * beta * mean_d, mode="drop"
            )
            new[f"t{i}_E"] = new[f"t{i}_E"].at[s_ids].add(mean_d, mode="drop")
            new[f"t{i}_A"] = new[f"t{i}_A"].at[s_ids].add(
                jnp.abs(mean_d), mode="drop"
            )
        return new

    def td_apply_delayed(
        self,
        params: Dict[str, jax.Array],
        boards: jax.Array,
        err: jax.Array,
        alpha: float,
        tc: bool = True,
    ) -> Dict[str, jax.Array]:
        """Windowed ("delayed") TD step — Jaskowski's TCIAIG-2017 recipe.

        Applies a whole window of TD backups at once: ``boards``/``err``
        hold EVERY backup of the window (flattened ``[N, 4, 4]`` /
        ``[N]``, masked backups as exact-0 errors), gathered while the
        tables were frozen. Each touched table entry with ``h`` nonzero
        hits of mean error ``m`` moves by the **sequential-equivalent**
        amount

            ``w += (1 - (1 - alpha*beta)**h) * m / num_lookups``

        — the closed form of ``h`` consecutive per-step TD updates
        against the window's frozen target (each step sees the error
        shrunk by the previous step's movement). At ``h=1`` this is
        exactly one :meth:`td_apply_tc` step; as ``h`` grows it
        saturates at the entry's full share of the mean error, so it is
        unconditionally stable (never overshoots the window-mean target)
        while letting hot entries absorb the whole window's evidence —
        the plain "move once by the mean" variant starves exactly the
        entries the batch visits most. With ``tc`` the accumulators
        receive the full per-hit sums (``E += sum(err)``,
        ``A += sum(|err|)``), matching per-step TC accumulation.

        TPU shape: instead of the per-step argsort + segment trick (the
        sort is what bounds :meth:`td_apply` throughput on TPU), this
        does three scatter-adds per table (error sum, |error| sum, hit
        count) and one dense elementwise pass over the table — O(table)
        HBM traffic paid once per window instead of O(N log N) sort work
        per step.
        """
        new = dict(params)
        for i, idx in enumerate(self.indices(boards)):
            d = jnp.broadcast_to(err[..., None], idx.shape).reshape(-1)
            if self._cached:
                new.update(
                    self._delayed_apply_cached(
                        params, i, idx.reshape(-1), d, alpha, tc
                    )
                )
                continue
            ids = self._translate(params, i, idx.reshape(-1))
            n = params[f"t{i}"].shape[0]
            # Masked backups carry exact-0 errors: they cancel out of the
            # sum and are excluded from the count (_stats).
            err_sum, abs_sum, hits = self._stats(n, ids, d)
            mean_d = err_sum / jnp.maximum(hits, 1.0)
            if tc:
                e_acc = params[f"t{i}_E"]
                a_acc = params[f"t{i}_A"]
                beta = jnp.where(
                    a_acc > 0.0,
                    jnp.abs(e_acc) / jnp.maximum(a_acc, 1e-30),
                    1.0,
                )
            else:
                beta = 1.0
            # (1-s)^h with s in [0,1]: jnp.power handles h=0 (-> 1, so
            # untouched entries move by 0) and s=1 (full step at h>=1).
            s = jnp.clip(alpha * beta, 0.0, 1.0)
            gain = 1.0 - jnp.power(1.0 - s, hits)
            new[f"t{i}"] = params[f"t{i}"] + (gain / self.num_lookups) * mean_d
            if tc:
                new[f"t{i}_E"] = e_acc + err_sum
                new[f"t{i}_A"] = a_acc + abs_sum
        return new

    def _delayed_apply_cached(self, params, i, ids, d, alpha, tc):
        """Windowed apply for backend="cached": kernel stats + sparse apply.

        Hot contributions accumulate into the ``[K, 128]`` prefix stats
        inside the Pallas scatter kernel (MXU rate, no serial loop) and
        the window update applies ELEMENTWISE to the prefix slices; cold
        contributions arrive compacted and update their (few) entries by
        the identical sequential-equivalent formula via sorted segment
        sums — no O(table) dense stats arrays and no dense pass at all.
        Entries neither hot nor touched see hits=0 everywhere, which the
        dense formula maps to a no-op, so this is exactly the dense
        result (up to the documented f32 reassociation of collision
        sums). A cold-capacity overflow (early training, distribution
        shift) falls back to the dense path — slower, never wrong.
        """
        from rein48_tpu.ops import hbm_tables

        K = self.prefix_rows[i]
        keys = [f"t{i}"] + ([f"t{i}_E", f"t{i}_A"] if tc else [])
        rm = params[f"t{i}_rm"]
        n = params[f"t{i}"].shape[0]
        scale = 1.0 / self.num_lookups
        err_sum, abs_sum, hits, cold_i, cold_e, ovf = (
            hbm_tables.cached_scatter_stats(
                params[f"t{i}_hot"],
                ids,
                d,
                prefix_rows=K,
                cold_capacity_rows=self.config.cold_capacity_rows,
            )
        )

        def beta_of(e_acc, a_acc):
            if not tc:
                return 1.0
            return jnp.where(
                a_acc > 0.0, jnp.abs(e_acc) / jnp.maximum(a_acc, 1e-30), 1.0
            )

        def fast(_):
            w = params[f"t{i}"]
            pe = K * 128
            es = err_sum.reshape(-1)
            ab = abs_sum.reshape(-1)
            h = hits.reshape(-1)
            mean_d = es / jnp.maximum(h, 1.0)
            if tc:
                e_acc = params[f"t{i}_E"][:pe]
                a_acc = params[f"t{i}_A"][:pe]
            else:
                e_acc = a_acc = None
            s_step = jnp.clip(alpha * beta_of(e_acc, a_acc), 0.0, 1.0)
            gain = 1.0 - jnp.power(1.0 - s_step, h)
            out = [w.at[:pe].add(gain * scale * mean_d)]
            if tc:
                out.append(params[f"t{i}_E"].at[:pe].add(es))
                out.append(params[f"t{i}_A"].at[:pe].add(ab))

            # Cold residue: sorted segment sums -> the same per-entry
            # update, landed once per unique entry (non-first duplicate
            # positions carry zeroed stats, so their adds are no-ops).
            phys = hbm_tables.physical_index(rm, cold_i)
            order = jnp.argsort(phys)
            sp = phys[order]
            se = cold_e[order]
            m = sp.shape[0]
            firstm = jnp.concatenate(
                [jnp.ones((1,), bool), sp[1:] != sp[:-1]]
            )
            seg = jnp.cumsum(firstm) - 1
            live = (se != 0.0).astype(jnp.float32)
            c_h = jnp.zeros((m,), jnp.float32).at[seg].add(live)[seg]
            c_es = jnp.zeros((m,), jnp.float32).at[seg].add(se)[seg]
            c_ab = jnp.zeros((m,), jnp.float32).at[seg].add(jnp.abs(se))[seg]
            fm = firstm.astype(jnp.float32)
            c_h, c_es, c_ab = c_h * fm, c_es * fm, c_ab * fm
            c_mean = c_es / jnp.maximum(c_h, 1.0)
            if tc:
                ce_acc = out[1][sp]
                ca_acc = out[2][sp]
            else:
                ce_acc = ca_acc = None
            c_s = jnp.clip(alpha * beta_of(ce_acc, ca_acc), 0.0, 1.0)
            c_gain = 1.0 - jnp.power(1.0 - c_s, c_h)
            out[0] = out[0].at[sp].add(c_gain * scale * c_mean)
            if tc:
                out[1] = out[1].at[sp].add(c_es)
                out[2] = out[2].at[sp].add(c_ab)
            return tuple(out)

        def slow(_):
            # Dense fallback: identical math through full-table stats.
            ids_p = hbm_tables.physical_index(rm, ids)
            f_es, f_ab, f_h = self._stats(n, ids_p, d)
            mean_d = f_es / jnp.maximum(f_h, 1.0)
            if tc:
                e_acc = params[f"t{i}_E"]
                a_acc = params[f"t{i}_A"]
            else:
                e_acc = a_acc = None
            s_step = jnp.clip(alpha * beta_of(e_acc, a_acc), 0.0, 1.0)
            gain = 1.0 - jnp.power(1.0 - s_step, f_h)
            out = [params[f"t{i}"] + gain * scale * mean_d]
            if tc:
                out.append(params[f"t{i}_E"] + f_es)
                out.append(params[f"t{i}_A"] + f_ab)
            return tuple(out)

        updated = jax.lax.cond(ovf, slow, fast, None)
        return dict(zip(keys, updated))

    def refresh_cache(self, params: Dict[str, jax.Array]):
        """Re-derive each table's hot-prefix permutation (backend="cached").

        Heat = the TC ``|err|`` accumulator when present (its per-entry
        magnitude is exactly "how much this entry has been learning"),
        else ``|value|``. Rows are physically reordered so the hottest
        ``prefix_rows`` form the kernel's VMEM prefix; all per-entry
        state moves together, so training semantics are untouched (the
        domain is just relabeled). O(table) row-gathers — call every
        ``cache_refresh_every`` updates, not per step.
        """
        if not self._cached:
            return params
        from rein48_tpu.ops import hbm_tables

        new = dict(params)
        for i in range(len(self.table_sizes)):
            heat = params.get(f"t{i}_A")
            if heat is None:
                heat = jnp.abs(params[f"t{i}"])
            perm, rm, hot = hbm_tables.hot_permutation(
                heat, params[f"t{i}_rm"], self.prefix_rows[i]
            )
            for suffix in ("", "_E", "_A"):
                key = f"t{i}{suffix}"
                if key in params:
                    new[key] = hbm_tables.apply_row_permutation(
                        params[key], perm
                    )
            new[f"t{i}_rm"] = rm
            new[f"t{i}_hot"] = hot
        return new

    def make_leaf(self, params, max_batch: int = 4096):
        """Expectimax leaf evaluator (``control/search.py``).

        N-tuple values are trained on PRE-spawn afterstates — exactly the
        planner's leaf domain — so unlike an actor-critic's post-spawn
        value head (see ``make_expectimax_policy``'s approximation notes)
        this composition is unit-exact.

        ``max_batch`` chunks the leaf sweep with ``lax.map``: a depth-1
        tree over B root boards evaluates 128*B leaves in one call
        (B=256 -> 131k boards -> a 4.2M-element table gather), and a
        single gather that size crashed the v5e TPU worker outright
        (round 3; a 524k-element gather ALSO crashed it). The default
        caps each gather at ``32 * max_batch`` = 131k elements — inside
        the regime the trainer exercises continuously (160k) — and
        costs nothing measurable at eval scale.
        """

        def leaf(boards: jax.Array) -> jax.Array:
            lead = boards.shape[:-2]
            flat = boards.reshape((-1,) + boards.shape[-2:])
            n = flat.shape[0]
            if n <= max_batch:
                return self.value(params, flat).reshape(lead)
            pad = -n % max_batch
            flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0)))
            chunks = flat.reshape((-1, max_batch) + flat.shape[1:])
            vals = jax.lax.map(lambda b: self.value(params, b), chunks)
            return vals.reshape(-1)[:n].reshape(lead)

        return leaf

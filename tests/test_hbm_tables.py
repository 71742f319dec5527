# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Hot-prefix permuted table ops (ops/hbm_tables.py), CPU interpreter.

The gather must be EXACT — every element of ``cached_gather`` equals the
plain logical read, for any permutation state, index distribution
(including adversarial duplicate streams), and the overflow fallback.
The scatter-stats kernel must partition contributions exactly between
prefix stats and the compacted cold residue (sums up to the documented
f32 reassociation; hit counts exactly).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rein48_tpu.ops import hbm_tables as ht

SIZE = 16**5  # 1M entries, 8192 rows
ROWS = SIZE // ht.ROW


def make_physical(logical, rowmap_flat):
    idx = jnp.arange(SIZE, dtype=jnp.int32)
    phys = ht.physical_index(rowmap_flat, idx)
    return jnp.zeros((SIZE,), jnp.float32).at[phys].set(logical)


@pytest.fixture(scope="module")
def logical():
    return jax.random.normal(jax.random.key(0), (SIZE,), jnp.float32)


class TestLayout:
    def test_physical_index_is_bijective(self):
        rm = ht.identity_rowmap(SIZE)
        phys = np.asarray(ht.physical_index(rm, jnp.arange(SIZE)))
        assert len(np.unique(phys)) == SIZE

    def test_permutation_preserves_logical_reads(self, logical):
        rm = ht.identity_rowmap(SIZE)
        table = make_physical(logical, rm)
        heat = jax.random.uniform(jax.random.key(2), (SIZE,))
        perm, rm2, hot = ht.hot_permutation(heat, rm, 512)
        table2 = ht.apply_row_permutation(table, perm)
        idx = jax.random.randint(jax.random.key(3), (4096,), 0, SIZE)
        got = np.asarray(table2)[
            np.asarray(ht.physical_index(rm2, idx.astype(jnp.int32)))
        ]
        np.testing.assert_array_equal(
            got, np.asarray(logical)[np.asarray(idx)]
        )

    def test_hot_permutation_fronts_hot_rows(self):
        rm = ht.identity_rowmap(SIZE)
        heat = jnp.zeros((SIZE,))
        hot_rows = jnp.asarray([5, 99, 1000, 8000])
        heat = heat.reshape(-1, ht.ROW).at[hot_rows].set(1.0).reshape(-1)
        perm, rm2, hot = ht.hot_permutation(heat, rm, 4)
        assert set(np.asarray(perm[:4])) == set(np.asarray(hot_rows))
        # Those logical rows now map to physical rows < 4, and the hot
        # list names exactly them (slot order matches the permutation).
        assert set(np.asarray(rm2)[np.asarray(hot_rows)]) == {0, 1, 2, 3}
        assert set(np.asarray(hot)) == set(np.asarray(hot_rows))

    def test_hot_list_survives_second_refresh(self, logical):
        rm = ht.identity_rowmap(SIZE)
        heat1 = jax.random.uniform(jax.random.key(4), (SIZE,))
        perm1, rm1, hot1 = ht.hot_permutation(heat1, rm, 256)
        heat2 = jax.random.uniform(jax.random.key(5), (SIZE,))
        # heat2 is in the NEW physical layout
        perm2, rm2, hot2 = ht.hot_permutation(heat2, rm1, 256)
        # hot2[s] must be the logical row now at physical slot s.
        rm2_np = np.asarray(rm2)
        for s, lrow in enumerate(np.asarray(hot2)[:16]):
            assert rm2_np[lrow] == s


def _gather_case(logical, rowmap_flat, hot, idx, prefix_rows, cold_rows=8):
    table = make_physical(logical, rowmap_flat)
    got = ht.cached_gather(
        table,
        rowmap_flat,
        hot,
        idx,
        prefix_rows=prefix_rows,
        cold_capacity_rows=cold_rows,
    )
    want = np.asarray(logical)[np.asarray(idx)]
    np.testing.assert_array_equal(np.asarray(got), want)


class TestCachedGather:
    def test_identity_map_uniform_indices(self, logical):
        idx = jax.random.randint(
            jax.random.key(4), (5000,), 0, SIZE, jnp.int32
        )
        hot = jnp.arange(4096, dtype=jnp.int32)
        _gather_case(logical, ht.identity_rowmap(SIZE), hot, idx, 4096, 64)

    def test_hot_concentrated_stream(self, logical):
        # ~95% of lookups in 256 hot rows — the real workload shape.
        k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
        rows = jax.random.randint(k1, (16384,), 0, 256, jnp.int32) * 31 % ROWS
        hot_idx = rows * ht.ROW + jax.random.randint(
            k2, (16384,), 0, ht.ROW, jnp.int32
        )
        cold_idx = jax.random.randint(k3, (860,), 0, SIZE, jnp.int32)
        idx = jnp.concatenate([hot_idx, cold_idx])
        rm = ht.identity_rowmap(SIZE)
        heat = (
            jnp.zeros((ROWS,))
            .at[jnp.unique(rows, size=256, fill_value=0)]
            .set(1.0)[:, None]
            * jnp.ones((1, ht.ROW))
        ).reshape(-1)
        perm, rm2, hot = ht.hot_permutation(heat, rm, 256)
        _gather_case(logical, rm2, hot, idx, 256, 16)

    def test_duplicate_heavy_stream(self, logical):
        base = jnp.full((4096,), 12345, jnp.int32)
        same_lane = (
            jax.random.randint(jax.random.key(6), (4096,), 0, 64, jnp.int32)
            * ht.ROW
            + 7
        )
        idx = jnp.concatenate([base, same_lane])
        hot = jnp.arange(4096, dtype=jnp.int32)
        _gather_case(logical, ht.identity_rowmap(SIZE), hot, idx, 4096, 64)

    def test_overflow_falls_back_exact(self, logical):
        idx = jax.random.randint(
            jax.random.key(7), (4096,), 0, SIZE, jnp.int32
        )
        hot = jnp.arange(128, dtype=jnp.int32)
        _gather_case(logical, ht.identity_rowmap(SIZE), hot, idx, 128, 2)

    def test_after_refresh_roundtrip(self, logical):
        rm = ht.identity_rowmap(SIZE)
        heat = jax.random.uniform(jax.random.key(8), (SIZE,))
        perm, rm2, hot = ht.hot_permutation(heat, rm, 1024)
        idx = jax.random.randint(
            jax.random.key(9), (8192,), 0, SIZE, jnp.int32
        )
        _gather_case(logical, rm2, hot, idx, 1024, 48)


class TestScatterStats:
    def test_partition_exact(self, logical):
        rm = ht.identity_rowmap(SIZE)
        heat = jax.random.uniform(jax.random.key(2), (SIZE,))
        perm, rm2, hot = ht.hot_permutation(heat, rm, 256)
        k1, k2, k3, k4 = jax.random.split(jax.random.key(7), 4)
        hi = hot[jax.random.randint(k1, (9000,), 0, 256)] * ht.ROW + (
            jax.random.randint(k2, (9000,), 0, ht.ROW, jnp.int32)
        )
        ci = jax.random.randint(k3, (1500,), 0, SIZE, jnp.int32)
        idx = jnp.concatenate([hi, ci])
        err = jax.random.normal(k4, idx.shape).at[::7].set(0.0)
        es, ab, hits, cold_i, cold_e, ovf = ht.cached_scatter_stats(
            hot, idx, err, prefix_rows=256, cold_capacity_rows=64
        )
        assert not bool(ovf)
        phys = np.asarray(ht.physical_index(rm2, idx))
        e_np = np.asarray(err)
        ref_es = np.zeros(SIZE)
        ref_ab = np.zeros(SIZE)
        ref_h = np.zeros(SIZE)
        np.add.at(ref_es, phys, e_np)
        np.add.at(ref_ab, phys, np.abs(e_np))
        np.add.at(ref_h, phys, (e_np != 0))
        pe = 256 * ht.ROW
        np.testing.assert_allclose(
            np.asarray(es).reshape(-1), ref_es[:pe], rtol=2e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ab).reshape(-1), ref_ab[:pe], rtol=2e-5, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(hits).reshape(-1), ref_h[:pe]
        )
        # The cold residue carries exactly the out-of-prefix contributions.
        res_es = np.zeros(SIZE)
        np.add.at(
            res_es,
            np.asarray(ht.physical_index(rm2, cold_i)),
            np.asarray(cold_e),
        )
        np.testing.assert_allclose(
            res_es[pe:], ref_es[pe:], rtol=2e-5, atol=1e-5
        )
        assert np.allclose(res_es[:pe], 0.0)

    def test_overflow_flag(self, logical):
        hot = jnp.arange(128, dtype=jnp.int32)
        idx = jax.random.randint(
            jax.random.key(1), (16384,), 0, SIZE, jnp.int32
        )
        err = jnp.ones(idx.shape, jnp.float32)
        *_, ovf = ht.cached_scatter_stats(
            hot, idx, err, prefix_rows=128, cold_capacity_rows=2
        )
        assert bool(ovf)

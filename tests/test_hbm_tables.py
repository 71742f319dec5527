# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Hot-prefix permuted table ops (ops/hbm_tables.py), CPU interpreter.

The kernel must be EXACT — every element of ``cached_gather`` equals the
plain logical read, for any permutation state, index distribution
(including adversarial duplicate/collision streams), and the overflow
fallback. Physical layout invariants (lane hash permanence across
refreshes) are pinned separately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rein48_tpu.ops import hbm_tables as ht

SIZE = 16**5  # 1M entries, 8192 rows — big enough to exercise everything
ROWS = SIZE // ht.ROW


def make_physical(logical, rowmap_flat):
    """Scatter a logical table into its physical layout."""
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

    def test_storage_roundtrip(self, logical):
        rm = ht.identity_rowmap(SIZE)
        table = make_physical(logical, rm)
        idx = jax.random.randint(jax.random.key(1), (4096,), 0, SIZE)
        want = np.asarray(logical)[np.asarray(idx)]
        got = np.asarray(table)[
            np.asarray(ht.physical_index(rm, idx.astype(jnp.int32)))
        ]
        np.testing.assert_array_equal(got, want)

    def test_permutation_preserves_logical_reads(self, logical):
        rm = ht.identity_rowmap(SIZE)
        table = make_physical(logical, rm)
        heat = jax.random.uniform(jax.random.key(2), (SIZE,))
        perm, rm2 = ht.hot_permutation(heat, rm, 512)
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
        perm, rm2 = ht.hot_permutation(heat, rm, 4)
        assert set(np.asarray(perm[:4])) == set(np.asarray(hot_rows))
        # Those logical rows now map to physical rows < 4.
        assert set(np.asarray(rm2)[np.asarray(hot_rows)]) == {0, 1, 2, 3}


def _gather_case(logical, rowmap_flat, idx, prefix_rows, cold_rows=8):
    table = make_physical(logical, rowmap_flat)
    storage = ht.hashed_rowmap_storage(rowmap_flat)
    got = ht.cached_gather(
        table,
        rowmap_flat,
        storage,
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
        # Uniform over 8192 rows with a 4096-row prefix: ~50% cold needs
        # generous capacity (16384 padded elements -> use fallback-free
        # capacity of 64 rows = 8192 slots).
        _gather_case(logical, ht.identity_rowmap(SIZE), idx, 4096, 64)

    def test_hot_concentrated_stream(self, logical):
        # 95% of lookups in 256 rows, the rest uniform — the real shape.
        k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
        hot_rows = jax.random.randint(k1, (16384,), 0, 256, jnp.int32)
        hot_idx = hot_rows * ht.ROW + jax.random.randint(
            k2, (16384,), 0, ht.ROW, jnp.int32
        )
        cold_idx = jax.random.randint(k3, (860,), 0, SIZE, jnp.int32)
        idx = jnp.concatenate([hot_idx, cold_idx])
        # Put those 256 logical rows in front via a synthetic heat.
        rm = ht.identity_rowmap(SIZE)
        heat = (
            jnp.zeros((ROWS,))
            .at[jnp.arange(256)]
            .set(1.0)[:, None]
            * jnp.ones((1, ht.ROW))
        ).reshape(-1)
        perm, rm2 = ht.hot_permutation(heat, rm, 256)
        _gather_case(logical, rm2, idx, 256, 16)

    def test_duplicate_heavy_stream(self, logical):
        # Adversarial: one index repeated 4096x plus same-lane clusters.
        base = jnp.full((4096,), 12345, jnp.int32)
        same_lane = (
            jax.random.randint(jax.random.key(6), (4096,), 0, 64, jnp.int32)
            * ht.ROW
            + 7
        )
        idx = jnp.concatenate([base, same_lane])
        _gather_case(logical, ht.identity_rowmap(SIZE), idx, 8192, 64)

    def test_overflow_falls_back_exact(self, logical):
        # Tiny prefix + tiny capacity: everything cold -> fallback path.
        idx = jax.random.randint(
            jax.random.key(7), (4096,), 0, SIZE, jnp.int32
        )
        _gather_case(logical, ht.identity_rowmap(SIZE), idx, 128, 2)

    def test_after_refresh_roundtrip(self, logical):
        # Full lifecycle: permute by fake heat, gather through the new
        # map/table — still exact.
        rm = ht.identity_rowmap(SIZE)
        heat = jax.random.uniform(jax.random.key(8), (SIZE,))
        perm, rm2 = ht.hot_permutation(heat, rm, 1024)
        idx = jax.random.randint(
            jax.random.key(9), (8192,), 0, SIZE, jnp.int32
        )
        _gather_case(logical, rm2, idx, 1024, 48)

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Exhaustive correctness tests for the 65536-entry row-merge LUT.

The LUT builder (`rein48_tpu/engine/lut.py`) is vectorized numpy; these
tests check every one of the 65536 row codes against TWO independent
implementations:

* ``merge_row_left`` — the module's own pure-Python compress-then-pair spec;
* ``_two_pointer_merge`` below — a from-scratch restatement of the
  reference's two-pointer slide/merge semantics
  (``/root/reference/game/GameClient.py:140-180``), written against the
  prose spec, not the LUT code, so the two cannot share a bug.
"""

import numpy as np
import pytest

from rein48_tpu.engine import lut


def _two_pointer_merge(row):
    """Reference-semantics two-pointer merge toward index 0.

    Walks a write pointer ``i``; for each ``i`` scans ``j`` for the next
    nonzero. If cell ``i`` is empty the found tile slides into it (and can
    still merge later); if equal, merge once and advance; else the tile
    moves to ``i+1``. Mirrors ``GameClient.py:140-180`` exactly, including
    single-merge-per-tile.
    """
    r = list(row)
    n = len(r)
    score = 0
    i = 0
    while i < n:
        j = i + 1
        while j < n and r[j] == 0:
            j += 1
        if j >= n:
            break
        if r[i] == 0:
            r[i], r[j] = r[j], 0
            # do not advance i: the slid tile may merge with the next one
        elif r[i] == r[j]:
            merged = min(r[i] + 1, lut.MAX_EXPONENT)
            score += 2 ** (r[i] + 1)
            r[i] = merged
            r[j] = 0
            i += 1
        else:
            val = r[j]
            r[j] = 0
            r[i + 1] = val
            i += 1
    return r, score


@pytest.fixture(scope="module")
def table():
    return lut.build_row_lut()


def test_lut_exhaustive(table):
    """All 65536 entries match BOTH independent implementations."""
    new_codes = lut.lut_new_code(table)
    scores = lut.lut_score(table)
    for code in range(lut.NUM_ROW_CODES):
        row = lut.unpack_row(code)
        got_code = int(new_codes[code])
        got_score = int(scores[code])

        want_row, want_score = lut.merge_row_left(row)
        assert got_code == lut.pack_row(want_row), (
            f"code {code:04x}: row {row} -> {lut.unpack_row(got_code)}, "
            f"want {want_row}"
        )
        assert got_score == min(want_score, (0xFFFF << 2)), (
            f"code {code:04x}: score {got_score} want {want_score}"
        )

        tp_row, tp_score = _two_pointer_merge(row)
        assert tp_row == want_row, f"code {code:04x}: {row}"
        assert tp_score == want_score


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(200):
        row = rng.integers(0, 16, size=4).tolist()
        assert lut.unpack_row(lut.pack_row(row)) == row


def test_merge_examples():
    """Hand-checked semantics pins (exponent encoding)."""
    cases = [
        # (input row, expected row, expected score)
        ([0, 0, 0, 0], [0, 0, 0, 0], 0),
        ([1, 0, 0, 0], [1, 0, 0, 0], 0),
        ([0, 0, 0, 1], [1, 0, 0, 0], 0),
        ([1, 1, 0, 0], [2, 0, 0, 0], 4),
        ([1, 0, 1, 0], [2, 0, 0, 0], 4),
        ([1, 0, 0, 1], [2, 0, 0, 0], 4),
        ([1, 1, 1, 0], [2, 1, 0, 0], 4),      # left pair has priority
        ([1, 1, 1, 1], [2, 2, 0, 0], 8),      # quad merges as two pairs
        ([2, 1, 1, 0], [2, 2, 0, 0], 4),      # no double merge in one move
        ([1, 2, 2, 1], [1, 3, 1, 0], 8),
        ([3, 3, 3, 0], [4, 3, 0, 0], 16),     # [8,8,8,0] -> [16,8,0,0]
        ([1, 2, 1, 2], [1, 2, 1, 2], 0),      # nothing movable
        ([15, 15, 0, 0], [15, 0, 0, 0], 2 ** 16),  # exponent saturates at 15
    ]
    table = lut.build_row_lut()
    for row, want, want_score in cases:
        code = lut.pack_row(row)
        got = lut.unpack_row(int(lut.lut_new_code(table[code : code + 1])[0]))
        got_score = int(lut.lut_score(table[code : code + 1])[0])
        assert got == want, f"{row} -> {got}, want {want}"
        assert got_score == want_score, f"{row}: score {got_score} want {want_score}"


def test_changed_is_code_inequality(table):
    """`changed` == (new_code != code) matches a recomputation from rows."""
    new_codes = lut.lut_new_code(table)
    codes = np.arange(lut.NUM_ROW_CODES, dtype=np.uint32)
    changed = new_codes != codes
    # Spot-check semantics: unchanged iff merge is identity.
    for code in (0x0000, 0x0001, 0x0011, 0x4321, 0x1212):
        row = lut.unpack_row(code)
        want_row, _ = lut.merge_row_left(row)
        assert bool(changed[code]) == (want_row != row)

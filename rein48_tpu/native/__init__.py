# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Native (C) components, built on first use with the system compiler.

The framework's compute path is XLA/Pallas on the TPU; the pieces that
stay on the host are where native code pays. Today that is the
reference-parity oracle (``oracle.c``): a bit-compatible CPython
``random.Random`` (MT19937) plus the reference's exact game semantics
(clean-room, mirroring ``engine/oracle.py``), ~1000x the Python oracle's
step rate, so parity sweeps can cover thousands of seeded games.

Build model: one ``cc -O2 -shared -fPIC`` invocation into
``native/_build/``, cached by source mtime; everything degrades
gracefully — ``load_library()`` returns None if no compiler is
available, and callers (tests, the parity CLI) fall back to the Python
oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "oracle.c")
_BUILD_DIR = os.path.join(_DIR, "_build")
_LIB = os.path.join(_BUILD_DIR, "liboracle.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    for cc in ("cc", "gcc", "clang"):
        try:
            proc = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                capture_output=True,
                text=True,
                timeout=120,
            )
        except (FileNotFoundError, subprocess.TimeoutExpired):
            continue
        if proc.returncode == 0:
            return True
    return False


def load_library() -> Optional[ctypes.CDLL]:
    """The compiled oracle library, building it if needed; None if no
    working compiler is available (callers must fall back to Python)."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    stale = (
        not os.path.exists(_LIB)
        or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    )
    if stale and not _compile():
        _load_failed = True
        return None
    lib = ctypes.CDLL(_LIB)
    lib.oracle_sizeof.restype = ctypes.c_int
    lib.oracle_init.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.oracle_reset.argtypes = [ctypes.c_void_p]
    lib.oracle_step.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)
    ]
    lib.oracle_step.restype = ctypes.c_int
    lib.oracle_random_action.argtypes = [ctypes.c_void_p]
    lib.oracle_random_action.restype = ctypes.c_int
    lib.oracle_play_random.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.oracle_play_random.restype = ctypes.c_int64
    lib.oracle_get_board.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)
    ]
    lib.oracle_last_spawn_rank.argtypes = [ctypes.c_void_p]
    lib.oracle_last_spawn_rank.restype = ctypes.c_int32
    lib.oracle_last_spawn_exp.argtypes = [ctypes.c_void_p]
    lib.oracle_last_spawn_exp.restype = ctypes.c_int32
    lib.oracle_spawn_count.argtypes = [ctypes.c_void_p]
    lib.oracle_spawn_count.restype = ctypes.c_int64
    lib.rng_api_sizeof.restype = ctypes.c_int
    lib.rng_api_seed.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.rng_api_random.argtypes = [ctypes.c_void_p]
    lib.rng_api_random.restype = ctypes.c_double
    lib.rng_api_uniform.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double
    ]
    lib.rng_api_uniform.restype = ctypes.c_double
    lib.rng_api_randint.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32
    ]
    lib.rng_api_randint.restype = ctypes.c_int32
    lib.rng_api_getrandbits.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rng_api_getrandbits.restype = ctypes.c_uint32
    _lib = lib
    return _lib


def available() -> bool:
    return load_library() is not None


class NativeRandom:
    """ctypes wrapper over the C MT19937 — the CPython-parity surface."""

    def __init__(self, seed: int):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native oracle unavailable (no C compiler)")
        self._lib = lib
        self._buf = ctypes.create_string_buffer(lib.rng_api_sizeof())
        lib.rng_api_seed(self._buf, seed)

    def random(self) -> float:
        return self._lib.rng_api_random(self._buf)

    def uniform(self, a: float, b: float) -> float:
        return self._lib.rng_api_uniform(self._buf, a, b)

    def randint(self, a: int, b: int) -> int:
        return self._lib.rng_api_randint(self._buf, a, b)

    def getrandbits(self, k: int) -> int:
        return self._lib.rng_api_getrandbits(self._buf, k)


class NativeOracleGame:
    """C twin of ``engine.oracle.OracleGame`` (same API surface).

    ``state_matrix`` is the raw-value board as a list of rows;
    ``last_spawn`` is ``(blank_rank, value_exp)`` of the latest spawn —
    the decision-capture hook the parity harness feeds to
    ``core.place_tile``.
    """

    def __init__(self, seed: int = 0):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native oracle unavailable (no C compiler)")
        self._lib = lib
        self._buf = ctypes.create_string_buffer(lib.oracle_sizeof())
        lib.oracle_init(self._buf, seed)
        self.reset()

    @property
    def state_matrix(self) -> List[List[int]]:
        out = (ctypes.c_int32 * 16)()
        self._lib.oracle_get_board(self._buf, out)
        return [list(out[r * 4 : r * 4 + 4]) for r in range(4)]

    @property
    def last_spawn(self) -> Tuple[int, int]:
        return (
            int(self._lib.oracle_last_spawn_rank(self._buf)),
            int(self._lib.oracle_last_spawn_exp(self._buf)),
        )

    @property
    def spawn_count(self) -> int:
        return int(self._lib.oracle_spawn_count(self._buf))

    def reset(self) -> List[List[int]]:
        self._lib.oracle_reset(self._buf)
        return self.state_matrix

    def step(self, action) -> Tuple[List[List[int]], int, bool]:
        from rein48_tpu.engine.core import ACTION_ALIASES

        # Accept the reference's full alias set (ints and strings).
        act = ACTION_ALIASES.get(action)
        if act is None:
            act = int(action)
        changed = ctypes.c_int(0)
        done = self._lib.oracle_step(self._buf, act, ctypes.byref(changed))
        return self.state_matrix, 0, bool(done)

    def random_action(self) -> int:
        return self._lib.oracle_random_action(self._buf)

    def play_random(self, max_steps: int = 1 << 30) -> int:
        """Play one whole game (reset + random policy); returns steps."""
        return int(self._lib.oracle_play_random(self._buf, max_steps))

# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Orbax checkpointing of full training state.

The reference has NO checkpointing — no ``tf.train.Saver`` anywhere;
training state dies with the process (SURVEY.md §5). Here the entire
train-state pytree (params, optimizer state, env state including per-env
RNG keys, counters) round-trips through orbax, so a run resumes
bit-exactly: the env keys ARE the stochastic state, there is no hidden
host RNG.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _lookup_path(tree: Any, path) -> Any:
    """Walk a restored nested-dict tree by a jax keypath."""
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            tree = tree[p.name]
        elif isinstance(p, jax.tree_util.DictKey):
            tree = tree[p.key]
        elif isinstance(p, (jax.tree_util.SequenceKey, jax.tree_util.FlattenedIndexKey)):
            tree = tree[p.idx if hasattr(p, "idx") else p.key]
        else:  # pragma: no cover
            raise TypeError(f"unhandled keypath entry {p!r}")
    return tree


class Checkpointer:
    """Thin orbax wrapper with interval-based saving.

    Args:
        directory: checkpoint root (created if missing).
        save_every: save when ``maybe_save(step, ...)`` hits a multiple.
        max_to_keep: retained checkpoints.
    """

    def __init__(
        self, directory: str, save_every: int = 100, max_to_keep: int = 3
    ):
        self.directory = os.path.abspath(directory)
        self.save_every = save_every
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                # A crash mid-save leaves an `N.orbax-checkpoint-tmp` dir;
                # it must never be mistaken for step N on resume, and a
                # fresh manager sweeps it so the garbage cannot accumulate.
                cleanup_tmp_directories=True,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()

    def maybe_save(self, step: int, state: Any) -> bool:
        if step % self.save_every == 0:
            self.save(step, state)
            return True
        return False

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(
        self,
        state_like: Any,
        step: Optional[int] = None,
        via_host: Optional[bool] = None,
    ) -> Any:
        """Restore into the structure/shardings of ``state_like``.

        ``state_like`` is a state built by the trainer's ``init_*`` (same
        pytree structure and shapes; its values are discarded).

        via_host (default: True on non-CPU backends): restore to host
        numpy first and land everything on device with ONE batched
        ``jax.device_put`` honoring ``state_like``'s shardings. Orbax's
        direct-to-device path issues many small placements, which this
        environment's TPU tunnel serializes pathologically (an ~800MB
        n-tuple state took 18+ min; the batched path takes seconds —
        measured in ``examples/eval_ntuple_tpu.py``).
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        if via_host is None:
            via_host = jax.default_backend() != "cpu"
        if not via_host:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
            return self._mngr.restore(
                step, args=ocp.args.StandardRestore(target)
            )

        # Host restore gives the SAVED pytree (nested dicts keyed by field
        # name); rebuild state_like's structure by path so dataclass field
        # order vs dict key order cannot misalign leaves.
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            raw = self._mngr.restore(step)
        flat, treedef = jax.tree_util.tree_flatten_with_path(state_like)
        leaves, shardings = [], []
        for path, like in flat:
            v = _lookup_path(raw, path)
            if jax.dtypes.issubdtype(
                like.dtype, jax.dtypes.prng_key
            ) and not (
                hasattr(v, "dtype")
                and jax.dtypes.issubdtype(v.dtype, jax.dtypes.prng_key)
            ):
                # Typed PRNG keys may come back as raw uint32 key data.
                with jax.default_device(
                    jax.local_devices(backend="cpu")[0]
                ):
                    v = jax.random.wrap_key_data(jax.numpy.asarray(v))
            leaves.append(v)
            shardings.append(
                like.sharding
                if isinstance(like, jax.Array)
                else jax.local_devices()[0]
            )
        host_tree = jax.tree_util.tree_unflatten(treedef, leaves)
        placements = jax.tree_util.tree_unflatten(treedef, shardings)
        return jax.device_put(host_tree, placements)

    def restore_field(self, field: str, step: Optional[int] = None) -> Any:
        """Restore one top-level field (e.g. ``"params"``) of the state.

        Unlike :meth:`restore` this needs no template state, so an
        eval-only process can load params without reconstructing the
        trainer's env batch / replay buffer shapes.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mngr.restore(step)
        return restored[field]

    @property
    def _config_path(self) -> str:
        return os.path.join(self.directory, "train_config.json")

    def save_config(self, config: Any) -> None:
        """Persist the trainer config as JSON next to the checkpoints.

        Evaluation then reads back the settings that actually trained the
        checkpoint (gamma, reward transform, obs encoding, model, ...)
        instead of assuming defaults — a silent-mismatch trap for e.g.
        the value-guided planner (``cli.py eval --algo search``).
        """
        if dataclasses.is_dataclass(config):
            config = dataclasses.asdict(config)

        def jsonable(v):
            if isinstance(v, enum.Enum):
                return v.name
            return str(v)

        with open(self._config_path, "w") as f:
            json.dump(config, f, indent=2, sort_keys=True, default=jsonable)

    def load_config(self) -> Optional[Dict[str, Any]]:
        """The persisted trainer config, or None for older checkpoints."""
        try:
            with open(self._config_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def close(self) -> None:
        self._mngr.close()

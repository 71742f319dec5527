# Copyright 2026 The rein48-tpu Authors.
# SPDX-License-Identifier: Apache-2.0
"""Tests for metrics logging, orbax checkpointing, and the CLI."""

import csv
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from rein48_tpu.utils.checkpoint import Checkpointer
from rein48_tpu.utils.metrics import MetricLogger


class TestMetricLogger:
    def test_csv_roundtrip(self, tmp_path):
        logger = MetricLogger(log_dir=str(tmp_path), stdout=False)
        logger.write({"update": 1, "loss": 0.5})
        logger.write({"update": 2, "loss": 0.25})
        logger.close()
        with open(tmp_path / "metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        assert float(rows[1]["loss"]) == 0.25

    def test_stdout_only(self, capsys):
        logger = MetricLogger(log_dir=None)
        logger.write({"update": 1, "loss": 0.125})
        out = capsys.readouterr().out
        assert "loss=0.125" in out


class TestPlot:
    def test_plot_from_csv(self, tmp_path):
        from rein48_tpu.utils.plot import plot_metrics

        logger = MetricLogger(log_dir=str(tmp_path), stdout=False)
        for i in range(5):
            logger.write(
                {"update": i, "loss": 1.0 / (i + 1), "entropy": 1.0, "best_tile": 2**i}
            )
        logger.close()
        out = plot_metrics(str(tmp_path / "metrics.csv"))
        assert os.path.exists(out)
        assert os.path.getsize(out) > 1000


class TestCheckpointer:
    def test_save_restore_a3c_state(self, tmp_path):
        from rein48_tpu.train.a3c import A3CConfig, init_a3c, make_a3c_step

        cfg = A3CConfig(
            batch_size=4, unroll_len=2, model="mlp", obs_encoding="onehot"
        )
        state, model, opt = init_a3c(cfg, jax.random.key(0))
        step = jax.jit(make_a3c_step(cfg, model, opt))
        state, _ = step(state)

        ckpt = Checkpointer(str(tmp_path / "ckpt"), save_every=1)
        assert ckpt.maybe_save(int(state.update_step), state)
        assert ckpt.latest_step() == 1

        fresh, _, _ = init_a3c(cfg, jax.random.key(99))
        restored = ckpt.restore(fresh)
        for a, b in zip(
            jax.tree.leaves(state), jax.tree.leaves(restored), strict=True
        ):
            np.testing.assert_array_equal(
                np.asarray(jax.random.key_data(a) if jax.dtypes.issubdtype(a.dtype, jax.dtypes.prng_key) else a),
                np.asarray(jax.random.key_data(b) if jax.dtypes.issubdtype(b.dtype, jax.dtypes.prng_key) else b),
            )
        ckpt.close()

    def test_resume_continues_bit_exactly(self, tmp_path):
        """Save at t, restore, and the next update matches the original."""
        from rein48_tpu.train.a3c import A3CConfig, init_a3c, make_a3c_step

        cfg = A3CConfig(
            batch_size=4, unroll_len=2, model="mlp", obs_encoding="onehot"
        )
        state, model, opt = init_a3c(cfg, jax.random.key(0))
        step = jax.jit(make_a3c_step(cfg, model, opt))
        state, _ = step(state)

        ckpt = Checkpointer(str(tmp_path / "ckpt"), save_every=1)
        ckpt.save(1, state)
        cont_direct, m_direct = step(state)

        fresh, _, _ = init_a3c(cfg, jax.random.key(7))
        restored = ckpt.restore(fresh)
        cont_restored, m_restored = step(restored)
        assert float(m_direct["loss"]) == float(m_restored["loss"])
        np.testing.assert_array_equal(
            np.asarray(cont_direct.env.boards),
            np.asarray(cont_restored.env.boards),
        )
        ckpt.close()

    def test_restore_missing_raises(self, tmp_path):
        ckpt = Checkpointer(str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError):
            ckpt.restore({"w": np.zeros(2)})
        ckpt.close()

    def test_config_roundtrip(self, tmp_path):
        """Trainer config persists as JSON; enums serialize by name."""
        from rein48_tpu.train.a3c import A3CConfig

        cfg = A3CConfig(
            gamma=0.9, reward_transform="identity", obs_encoding="raw",
            model="mlp",
        )
        ckpt = Checkpointer(str(tmp_path / "ckpt"))
        ckpt.save_config(cfg)
        loaded = ckpt.load_config()
        assert loaded["gamma"] == 0.9
        assert loaded["reward_transform"] == "identity"
        assert loaded["obs_encoding"] == "raw"
        assert loaded["model"] == "mlp"
        assert loaded["reward_mode"] == "MERGE_SCORE"
        ckpt.close()

    def test_restore_via_host_matches_direct(self, tmp_path):
        """The batched host->device restore path (the TPU-tunnel fix)
        must produce the same state as orbax's direct restore, typed
        PRNG keys included."""
        from rein48_tpu.train.a3c import A3CConfig, init_a3c, make_a3c_step

        cfg = A3CConfig(
            batch_size=4, unroll_len=2, model="mlp", obs_encoding="onehot"
        )
        state, model, opt = init_a3c(cfg, jax.random.key(0))
        step = jax.jit(make_a3c_step(cfg, model, opt))
        state, _ = step(state)
        ckpt = Checkpointer(str(tmp_path / "ckpt"), save_every=1)
        ckpt.save(1, state)

        fresh, _, _ = init_a3c(cfg, jax.random.key(99))
        direct = ckpt.restore(fresh, via_host=False)
        hosted = ckpt.restore(fresh, via_host=True)
        for a, b in zip(
            jax.tree.leaves(direct), jax.tree.leaves(hosted), strict=True
        ):
            unkey = (
                lambda x: jax.random.key_data(x)
                if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
                else x
            )
            np.testing.assert_array_equal(
                np.asarray(unkey(a)), np.asarray(unkey(b))
            )
        # And the restored state trains on identically.
        s1, m1 = step(direct)
        s2, m2 = step(hosted)
        assert float(m1["loss"]) == float(m2["loss"])
        ckpt.close()

    def test_latest_step_ignores_crashed_tmp_checkpoint(self, tmp_path):
        """A crash mid-save leaves `N.orbax-checkpoint-tmp`; resume must
        restore the last GOOD step, not the garbage (VERDICT r2: a stale
        tmp dir in ckpt/ntuple_tpu was a live crash-on-resume hazard)."""
        state = {"w": np.arange(8.0), "step": np.asarray(3)}
        ckpt = Checkpointer(str(tmp_path / "ckpt"), save_every=1)
        ckpt.save(3, state)
        ckpt.close()

        # Fake the debris of a crash during the step-4 save.
        tmp_dir = tmp_path / "ckpt" / "4.orbax-checkpoint-tmp"
        tmp_dir.mkdir()
        (tmp_dir / "_METADATA").write_text("{}")

        fresh = Checkpointer(str(tmp_path / "ckpt"))
        assert fresh.latest_step() == 3
        restored = fresh.restore({"w": np.zeros(8), "step": np.asarray(0)})
        np.testing.assert_array_equal(restored["w"], state["w"])
        assert int(restored["step"]) == 3
        # The constructor's cleanup_tmp_directories sweep removed it.
        assert not tmp_dir.exists()
        fresh.close()

    def test_load_config_absent_returns_none(self, tmp_path):
        ckpt = Checkpointer(str(tmp_path / "ckpt"))
        assert ckpt.load_config() is None
        ckpt.close()


CLI_ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    REIN48_FORCE_CPU="1",
    # Unset (empty) skips the sitecustomize axon/TPU registration entirely
    # — CPU subprocesses must not touch the single shared TPU tunnel.
    PALLAS_AXON_POOL_IPS="",
    XLA_FLAGS="--xla_force_host_platform_device_count=8",
)


def _run_cli(*args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "rein48_tpu", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=CLI_ENV,
        cwd="/root/repo",
    )


class TestFlops:
    """FLOPs/MFU accounting (VERDICT r4 item 5)."""

    def test_program_flops_matches_analytic_matmul(self):
        """XLA's count for a bare matmul is the textbook 2*M*N*K."""
        import jax.numpy as jnp

        from rein48_tpu.utils import flops as F

        a = jnp.zeros((64, 128), jnp.float32)
        b = jnp.zeros((128, 32), jnp.float32)
        counted = F.program_flops(jnp.matmul, a, b)
        assert counted == pytest.approx(2 * 64 * 32 * 128, rel=0.01)

    def test_model_forward_flops_scale_sensible(self):
        """ResNet (64ch x 4 blocks on 4x4 boards) must dwarf the MLP, and
        the per-sample number must be batch-invariant."""
        from rein48_tpu.models import nets
        from rein48_tpu.utils import flops as F

        resnet = F.model_forward_flops(nets.make_model("resnet"), batch=64)
        mlp = F.model_forward_flops(nets.make_model("mlp"), batch=64)
        assert resnet > 50 * mlp
        assert resnet > 1e6  # ~7.2 MFLOPs measured; sanity floor
        again = F.model_forward_flops(nets.make_model("resnet"), batch=128)
        assert again == pytest.approx(resnet, rel=0.05)

    def test_train_flops_per_frame_accounting(self):
        from rein48_tpu.utils import flops as F

        fwd = 10.0
        # A3C: 1 acting fwd + 1 fwd+bwd pass = 1 + 3 forwards-equivalent.
        assert F.train_flops_per_frame(fwd, reuse_passes=1) == 40.0
        # PPO epochs=4: 1 + 4*3 = 13 forward-equivalents.
        assert F.train_flops_per_frame(fwd, reuse_passes=4) == 130.0
        # + afterstate critic of equal size, same epochs.
        assert F.train_flops_per_frame(
            fwd, reuse_passes=4, extra_forward_flops=fwd, extra_reuse_passes=4
        ) == 250.0

    def test_mfu(self):
        from rein48_tpu.utils import flops as F

        assert F.mfu(1e6, 98.5e6, peak=197e12) == pytest.approx(0.5)


class TestCLI:
    def test_play_rand(self):
        r = _run_cli("play", "-c", "rand", "--seed", "3", "--max-steps", "400")
        assert r.returncode == 0, r.stderr
        assert "tile_sum=" in r.stdout

    def test_play_alias_normalization(self):
        r = _run_cli("play", "-c", "bogus", "--max-steps", "1")
        assert r.returncode != 0
        assert "unknown control" in r.stderr

    def test_train_a3c_tiny(self):
        r = _run_cli(
            "train", "--algo", "a3c", "--model", "mlp", "--updates", "4",
            "--batch-size", "8", "--unroll", "2", "--log-every", "2",
        )
        assert r.returncode == 0, r.stderr
        assert "loss=" in r.stdout

    def test_train_eval_afterstate_roundtrip(self, tmp_path):
        """--afterstate checkpoints carry {policy, after} params; both
        policy eval and value-guided search eval must consume them."""
        import json

        ck = str(tmp_path / "ck")
        r = _run_cli(
            "train", "--algo", "ppo", "--model", "mlp", "--afterstate",
            "--updates", "2", "--batch-size", "8", "--unroll", "4",
            "--log-every", "1", "--checkpoint-dir", ck,
            "--checkpoint-every", "2",
        )
        assert r.returncode == 0, r.stderr
        r = _run_cli(
            "eval", "--algo", "ppo", "--checkpoint-dir", ck,
            "--num-envs", "4", "--max-steps", "32",
        )
        assert r.returncode == 0, r.stderr
        assert json.loads(r.stdout.strip().splitlines()[-1])["episodes"] >= 0
        r = _run_cli(
            "eval", "--algo", "search", "--checkpoint-dir", ck,
            "--depth", "0", "--num-envs", "4", "--max-steps", "32",
        )
        assert r.returncode == 0, r.stderr
        assert "afterstate-critic leaf" in r.stderr
        assert json.loads(r.stdout.strip().splitlines()[-1])["avg_score"] >= 0

    def test_bench_contract(self):
        import json

        r = _run_cli("bench", "--batch", "256", "--unroll", "64", "--rounds", "2")
        assert r.returncode == 0, r.stderr
        line = r.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        assert rec["metric"] == "env_steps_per_sec"
        assert rec["value"] > 0

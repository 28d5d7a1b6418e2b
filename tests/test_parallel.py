"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.core import emulate_chunk
from v2e_tpu.emulator.state import init_state
from v2e_tpu.parallel import emulate_chunk_sharded, make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data", "spatial")

    def test_sharded_emulator_matches_single_device(self, mesh):
        """Row-sharded emulation must produce identical count maps."""
        cfg = EmulatorConfig(sigma_thres=0.0, leak_rate_hz=0.0, cutoff_hz=0.0)
        rng = np.random.default_rng(0)
        F, H, W = 4, 32, 48
        frames = jnp.asarray(
            np.clip(128 * np.exp(rng.normal(0, 0.3, (F, H, W))), 0, 255
                    ).astype(np.float32)
        )
        times = jnp.arange(1, F + 1, dtype=jnp.float32) * 0.01
        params, state = init_state(cfg, frames[0], jnp.float32(0.0), jax.random.key(3))

        _, outs_single = emulate_chunk(cfg, params, state, frames, times)
        _, outs_sharded = emulate_chunk_sharded(cfg, mesh, params, state, frames, times)

        np.testing.assert_array_equal(
            np.asarray(outs_single["ev_count"]), np.asarray(outs_sharded["ev_count"])
        )
        np.testing.assert_array_equal(
            np.asarray(outs_single["K"]), np.asarray(outs_sharded["K"])
        )

    def test_sharded_training_step(self, mesh):
        from v2e_tpu.models.train import (
            create_train_state,
            make_train_step,
            replicate_state,
            shard_batch,
        )

        state, tx = create_train_state(seed=0)
        state = replicate_state(mesh, state)
        rng = np.random.default_rng(0)
        B, H, W = 2, 32, 32
        batch = {
            "I0": jnp.asarray(rng.normal(size=(B, 1, H, W)).astype(np.float32)),
            "I1": jnp.asarray(rng.normal(size=(B, 1, H, W)).astype(np.float32)),
            "It": jnp.asarray(rng.normal(size=(B, 1, H, W)).astype(np.float32)),
            "t": jnp.asarray(rng.uniform(0.1, 0.9, (B,)).astype(np.float32)),
        }
        batch = shard_batch(mesh, batch)
        step = make_train_step(tx)
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state2.step) == 1

    def test_training_loss_decreases(self):
        """Single-device sanity: adam on the Super-SloMo loss reduces it."""
        from v2e_tpu.models.train import create_train_state, make_train_step

        state, tx = create_train_state(seed=1, learning_rate=2e-4)
        rng = np.random.default_rng(1)
        B, H, W = 2, 32, 32
        # trivial static scene: It == I0 == I1 -> easily learnable
        img = rng.normal(size=(B, 1, H, W)).astype(np.float32) * 0.2
        batch = {
            "I0": jnp.asarray(img),
            "I1": jnp.asarray(img),
            "It": jnp.asarray(img),
            "t": jnp.full((B,), 0.5, jnp.float32),
        }
        step = make_train_step(tx)
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]


class TestShardedEmulatorFacade:
    def test_event_emulator_with_mesh_matches(self, mesh):
        """EventEmulator(mesh=...) produces the identical event stream."""
        from v2e_tpu.emulator import EventEmulator

        rng = np.random.default_rng(5)
        frames = np.clip(
            128 * np.exp(rng.normal(0, 0.25, (6, 32, 48))), 0, 255
        ).astype(np.float32)
        times = np.arange(6) * 0.01

        kw = dict(sigma_thres=0.03, leak_rate_hz=1.0, shot_noise_rate_hz=2.0,
                  cutoff_hz=50.0, seed=9,
                  shuffle_events_within_iteration=False)
        ev_plain = EventEmulator(**kw).generate_events_batch(frames, times)
        ev_mesh = EventEmulator(mesh=mesh, **kw).generate_events_batch(
            frames, times
        )
        np.testing.assert_allclose(ev_plain, ev_mesh, atol=1e-9)

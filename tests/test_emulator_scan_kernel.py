"""Fused Pallas emulator-scan kernel: parity with the XLA scan path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.core import emulate_chunk
from v2e_tpu.emulator.state import init_state
from v2e_tpu.ops.pallas.emulator_scan import emulator_scan_pallas


class TestKernelParity:
    def test_oracle_parity_interpret(self):
        rng = np.random.default_rng(0)
        F, H, W = 6, 20, 30
        lp = jnp.asarray(rng.normal(4.0, 0.3, (F, H, W)).astype(np.float32))
        pos = jnp.full((H, W), 0.2)
        neg = jnp.full((H, W), 0.25)
        base0 = jnp.asarray(rng.normal(4.0, 0.1, (H, W)).astype(np.float32))
        leak = jnp.asarray((rng.random((F, H, W)) * 0.01).astype(np.float32))
        shot = jnp.asarray(rng.random((F, H, W)) < 0.01)
        nb, counts = emulator_scan_pallas(lp, leak, shot, pos, neg, base0, True)

        b = np.asarray(base0).copy()
        want = np.zeros((F, H, W), np.int16)
        for f in range(F):
            b = b - np.asarray(leak)[f]
            d = np.asarray(lp)[f] - b
            p = np.floor(np.maximum(d, 0) / 0.2)
            n = np.floor(np.maximum(-d, 0) / 0.25)
            b = b + p * 0.2 - n * 0.25
            b = np.where(np.asarray(shot)[f], np.asarray(lp)[f], b)
            want[f] = (p - n).astype(np.int16)
        np.testing.assert_array_equal(np.asarray(counts), want)
        np.testing.assert_allclose(np.asarray(nb), b, atol=1e-5)

    def test_chunk_outputs_match_xla_scan(self):
        """emulate_chunk with/without the kernel must agree (interpret mode
        substitutes for the TPU-only dispatch on CPU)."""
        from unittest import mock

        rng = np.random.default_rng(1)
        F, H, W = 8, 24, 32
        frames = jnp.asarray(
            np.clip(128 * np.exp(rng.normal(0, 0.25, (F, H, W))), 0, 255
                    ).astype(np.float32)
        )
        times = jnp.arange(1, F + 1, dtype=jnp.float32) * 0.01
        kw = dict(sigma_thres=0.03, leak_rate_hz=2.0, shot_noise_rate_hz=5.0,
                  cutoff_hz=50.0)
        cfg_scan = EmulatorConfig(use_pallas_scan=False, **kw)
        cfg_kern = EmulatorConfig(use_pallas_scan=True, **kw)
        params, state = init_state(
            cfg_scan, frames[0], jnp.float32(0.0), jax.random.key(4)
        )
        _, outs_scan = emulate_chunk(cfg_scan, params, state, frames, times)

        import v2e_tpu.emulator.core as core
        import v2e_tpu.ops.pallas.emulator_scan as es

        orig = es.emulator_scan_pallas
        with mock.patch.object(core.jax, "default_backend", lambda: "tpu"), \
             mock.patch.object(
                 es, "emulator_scan_pallas",
                 lambda lp, le, sh, p, n, b: orig(lp, le, sh, p, n, b, True),
             ):
            _, outs_kern = emulate_chunk(cfg_kern, params, state, frames, times)
        np.testing.assert_array_equal(
            np.asarray(outs_scan["ev_count"]), np.asarray(outs_kern["ev_count"])
        )
        np.testing.assert_array_equal(
            np.asarray(outs_scan["K"]), np.asarray(outs_kern["K"])
        )


class TestRefractoryKernelParity:
    def test_refractory_chunk_matches_xla_scan(self):
        """emulate_chunk with refractory>0 via the frame-major Pallas kernel
        (interpret mode) must match the XLA scan exactly — ev_count, i0,
        stride, K, and the carried base/timestamp state."""
        from unittest import mock

        from v2e_tpu.ops.pallas import emulator_scan as es

        rng = np.random.default_rng(5)
        F, H, W = 10, 24, 32
        frames = jnp.asarray(
            np.clip(128 * np.exp(rng.normal(0, 0.35, (F, H, W))), 0, 255
                    ).astype(np.float32)
        )
        times = jnp.arange(1, F + 1, dtype=jnp.float32) * 0.003
        kw = dict(sigma_thres=0.03, leak_rate_hz=2.0, shot_noise_rate_hz=5.0,
                  cutoff_hz=80.0, refractory_period_s=0.0005)
        cfg_scan = EmulatorConfig(use_pallas_scan=False, **kw)
        cfg_kern = EmulatorConfig(use_pallas_scan=True, **kw)
        params, state = init_state(
            cfg_scan, frames[0], jnp.float32(0.0), jax.random.key(4)
        )
        st_scan, outs_scan = emulate_chunk(cfg_scan, params, state, frames, times)

        import v2e_tpu.emulator.core as core

        orig = es.emulator_scan_refractory_pallas
        with mock.patch.object(core.jax, "default_backend", lambda: "tpu"), \
             mock.patch.object(
                 es, "emulator_scan_refractory_pallas",
                 lambda *a: orig(*a, True),
             ):
            st_kern, outs_kern = emulate_chunk(
                cfg_kern, params, state, frames, times
            )
        for k in ("ev_count", "i0", "stride", "K", "num_on", "num_off"):
            np.testing.assert_array_equal(
                np.asarray(outs_scan[k]), np.asarray(outs_kern[k]), err_msg=k
            )
        np.testing.assert_allclose(
            np.asarray(st_scan.base_log_frame),
            np.asarray(st_kern.base_log_frame), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(st_scan.timestamp_mem),
            np.asarray(st_kern.timestamp_mem), atol=1e-7,
        )

    def test_refractory_events_end_to_end(self):
        """Full generate_events_batch parity (events incl. sub-frame
        timestamps) between the kernel and the XLA scan, default-CLI-like
        refractory of 0.5 ms."""
        from unittest import mock

        from v2e_tpu.emulator import EventEmulator
        from v2e_tpu.ops.pallas import emulator_scan as es

        rng = np.random.default_rng(11)
        F, H, W = 12, 20, 28
        frames = np.clip(
            120 * np.exp(rng.normal(0, 0.4, (F, H, W))), 0, 255
        ).astype(np.float32)
        times = np.arange(F) * 0.002

        def run(use_kernel):
            em = EventEmulator(
                pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
                leak_rate_hz=1.0, shot_noise_rate_hz=2.0, cutoff_hz=100.0,
                refractory_period_s=0.0005, seed=9,
            )
            em.cfg = dataclasses.replace(em.cfg, use_pallas_scan=use_kernel)
            ev = em.generate_events_batch(jnp.asarray(frames), times)
            return np.asarray(ev) if ev is not None else np.zeros((0, 4))

        a = run(False)
        import v2e_tpu.emulator.core as core

        orig = es.emulator_scan_refractory_pallas
        with mock.patch.object(core.jax, "default_backend", lambda: "tpu"), \
             mock.patch.object(
                 es, "emulator_scan_refractory_pallas",
                 lambda *args: orig(*args, True),
             ):
            b = run(True)
        np.testing.assert_array_equal(a, b)

    def test_plane_budget_gate(self):
        from v2e_tpu.ops.pallas.emulator_scan import refractory_plane_ok

        assert refractory_plane_ok(260, 346)     # DAVIS346
        assert refractory_plane_ok(346, 640)
        assert not refractory_plane_ok(480, 640)  # VGA exceeds the 256K cap
        assert not refractory_plane_ok(720, 1280)

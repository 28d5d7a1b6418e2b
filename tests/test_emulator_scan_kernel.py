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

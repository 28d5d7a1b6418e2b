"""The hoisted-precompute chunk path must match the stepwise scan exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.emulator.config import EmulatorConfig
from v2e_tpu.emulator.core import emulate_chunk
from v2e_tpu.emulator.state import init_state


def run(cfg, frames, times, seed=5):
    params, state = init_state(
        cfg, jnp.asarray(frames[0]), jnp.float32(0.0), jax.random.key(seed)
    )
    state, outs = emulate_chunk(
        cfg, params, state,
        jnp.asarray(frames[1:]), jnp.asarray(times[1:], dtype=jnp.float32),
    )
    return state, jax.device_get(outs)


def make_frames(F=8, H=24, W=32, seed=0):
    rng = np.random.default_rng(seed)
    frames = np.clip(
        128 * np.exp(rng.normal(0, 0.25, (F, H, W))), 0, 255
    ).astype(np.float32)
    times = np.arange(F) * 0.005
    return frames, times


class TestFastPathParity:
    def _compare(self, cfg_kw):
        frames, times = make_frames()
        fast_cfg = EmulatorConfig(**cfg_kw)
        # the single-pixel probe forces the stepwise path without changing
        # the model outputs
        slow_cfg = EmulatorConfig(**cfg_kw, probe=(1, 1))
        assert not (fast_cfg.csdvs_enabled or fast_cfg.probe)
        st_f, outs_f = run(fast_cfg, frames, times)
        st_s, outs_s = run(slow_cfg, frames, times)
        np.testing.assert_array_equal(outs_f["ev_count"], outs_s["ev_count"])
        np.testing.assert_array_equal(outs_f["i0"], outs_s["i0"])
        np.testing.assert_array_equal(outs_f["K"], outs_s["K"])
        np.testing.assert_array_equal(outs_f["num_on"], outs_s["num_on"])
        np.testing.assert_array_equal(outs_f["num_off"], outs_s["num_off"])
        if "shot_on" in outs_f:
            np.testing.assert_array_equal(outs_f["shot_on"], outs_s["shot_on"])
        np.testing.assert_allclose(
            np.asarray(st_f.base_log_frame), np.asarray(st_s.base_log_frame),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(st_f.lp_log_frame), np.asarray(st_s.lp_log_frame),
            atol=1e-5,
        )

    def test_clean(self):
        self._compare(dict(sigma_thres=0.0, leak_rate_hz=0.0, cutoff_hz=0.0))

    def test_lowpass(self):
        self._compare(dict(sigma_thres=0.02, leak_rate_hz=0.0, cutoff_hz=80.0))

    def test_leak_and_shot(self):
        self._compare(dict(
            sigma_thres=0.03, leak_rate_hz=5.0, leak_jitter_fraction=0.1,
            noise_rate_cov_decades=0.1, shot_noise_rate_hz=20.0,
            cutoff_hz=100.0,
        ))

    def test_refractory(self):
        self._compare(dict(
            sigma_thres=0.0, leak_rate_hz=0.0, cutoff_hz=0.0,
            refractory_period_s=0.003,
        ))

    def test_photoreceptor_noise(self):
        frames, times = make_frames()
        kw = dict(sigma_thres=0.03, cutoff_hz=100.0, shot_noise_rate_hz=5.0,
                  photoreceptor_noise=True, leak_rate_hz=0.0)
        fast_cfg = EmulatorConfig(**kw)
        slow_cfg = EmulatorConfig(**kw, probe=(1, 1))

        def run_vrms(cfg):
            params, state = init_state(
                cfg, jnp.asarray(frames[0]), jnp.float32(0.0), jax.random.key(5)
            )
            params = params.replace(photoreceptor_noise_vrms=jnp.float32(0.1))
            state, outs = emulate_chunk(
                cfg, params, state, jnp.asarray(frames[1:]),
                jnp.asarray(times[1:], dtype=jnp.float32),
            )
            return jax.device_get(outs)

        outs_f = run_vrms(fast_cfg)
        outs_s = run_vrms(slow_cfg)
        np.testing.assert_array_equal(outs_f["ev_count"], outs_s["ev_count"])

    def test_scidvs(self):
        self._compare(dict(sigma_thres=0.0, leak_rate_hz=0.0, cutoff_hz=50.0,
                           scidvs=True))


class TestNativeSparseMaterialize:
    def _mk(self, seed=0, F=5, H=30, W=40, with_shot=True):
        rng = np.random.default_rng(seed)
        HW = H * W
        # sorted occupied cells across frames
        n = 300
        idx = np.sort(rng.choice(F * HW, size=n, replace=False)).astype(np.int32)
        count = rng.integers(-4, 5, n).astype(np.int16)
        shot = rng.integers(0, 4, n).astype(np.uint8) if with_shot else None
        if shot is None:
            # drop empty entries only when they carry no shot bit either
            keep = count != 0
            idx, count = idx[keep], count[keep]
        i0 = rng.integers(0, 2, len(idx)).astype(np.int16)
        stride = rng.integers(1, 3, F).astype(np.int64)
        K = rng.integers(0, 6, F).astype(np.int64)
        t_prev = (np.arange(F) * 0.01).astype(np.float32)
        t_frame = t_prev + 0.01
        return idx, count, i0, shot, stride, K, t_prev, t_frame, H, W

    @pytest.mark.parametrize("with_shot", [True, False])
    @pytest.mark.parametrize("shuffle", [False, True])
    def test_native_matches_numpy(self, with_shot, shuffle):
        """The C++ chunk materializer must be bit-identical to the numpy
        path — including the shuffled case, where both draw the same
        tie-break keys from identically seeded generators."""
        from unittest import mock

        from v2e_tpu.emulator import events as ev_mod
        from v2e_tpu.native import get_lib

        if get_lib() is None:
            pytest.skip("native kernels unavailable")
        args = self._mk(with_shot=with_shot)
        rng_a = np.random.default_rng(7) if shuffle else None
        rng_b = np.random.default_rng(7) if shuffle else None
        a = ev_mod.materialize_events_sparse(
            *args, 100.0, rng=rng_a, label_signal_noise=True
        )
        with mock.patch.object(ev_mod, "get_lib", lambda: None):
            b = ev_mod.materialize_events_sparse(
                *args, 100.0, rng=rng_b, label_signal_noise=True
            )
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])

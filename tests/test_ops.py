"""Golden-value tests for the core DVS math kernels.

Expected values are computed from the defining formulas of the reference
kernels (/root/reference/v2ecore/emulator_utils.py) in float64 numpy.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.ops import (
    compute_event_map,
    generate_shot_noise,
    lin_log,
    low_pass_filter,
    refractory_filter,
    rescale_intensity_frame,
    subtract_leak_current,
)


class TestLinLog:
    def test_linear_below_threshold(self):
        x = jnp.array([0.0, 5.0, 10.0, 20.0])
        y = np.asarray(lin_log(x))
        f = math.log(20.0) / 20.0
        np.testing.assert_allclose(y, np.array([0, 5, 10, 20]) * f, rtol=1e-6)

    def test_log_above_threshold(self):
        x = jnp.array([21.0, 100.0, 255.0])
        y = np.asarray(lin_log(x))
        np.testing.assert_allclose(y, np.log([21.0, 100.0, 255.0]), rtol=1e-6)

    def test_continuity_at_threshold(self):
        y = np.asarray(lin_log(jnp.array([20.0 - 1e-4, 20.0 + 1e-4])))
        assert abs(y[1] - y[0]) < 1e-4

    def test_matches_float64_reference(self):
        """Reference float64 semantics incl. 1e-8 rounding, within f32 eps."""
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 255, size=(64, 64))
        f = math.log(20.0) / 20.0
        ref = np.where(x <= 20, x * f, np.log(x))
        ref = np.round(ref * 1e8) / 1e8
        got = np.asarray(lin_log(jnp.asarray(x)))
        np.testing.assert_allclose(got, ref.astype(np.float32), atol=1e-6)


class TestRescale:
    def test_range(self):
        y = np.asarray(rescale_intensity_frame(jnp.array([0.0, 255.0])))
        np.testing.assert_allclose(y, [20 / 275, 1.0], rtol=1e-6)


class TestLowPass:
    def test_passthrough_when_disabled(self):
        new = jnp.full((4, 4), 3.0)
        old = jnp.zeros((4, 4))
        out = low_pass_filter(new, old, None, jnp.float32(0.1), cutoff_hz=0.0)
        np.testing.assert_allclose(np.asarray(out), 3.0)

    def test_iir_update(self):
        cutoff = 10.0
        tau = 1.0 / (2 * math.pi * cutoff)
        dt = 0.001
        inten = jnp.full((2, 2), 0.5)
        new = jnp.full((2, 2), 1.0)
        old = jnp.zeros((2, 2))
        out = low_pass_filter(new, old, inten, jnp.float32(dt), cutoff_hz=cutoff)
        eps = 0.5 * dt / tau
        np.testing.assert_allclose(np.asarray(out), eps, rtol=1e-5)

    def test_eps_clamped(self):
        """Huge dt must clamp eps to 1 (output = input) for stability."""
        inten = jnp.full((2, 2), 1.0)
        new = jnp.full((2, 2), 7.0)
        old = jnp.zeros((2, 2))
        out = low_pass_filter(new, old, inten, jnp.float32(100.0), cutoff_hz=100.0)
        np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-6)

    def test_converges_to_input(self):
        cutoff = 30.0
        dt = 0.001
        inten = jnp.full((1, 1), 1.0)
        new = jnp.full((1, 1), 2.0)
        lp = jnp.zeros((1, 1))
        for _ in range(3000):
            lp = low_pass_filter(new, lp, inten, jnp.float32(dt), cutoff_hz=cutoff)
        np.testing.assert_allclose(np.asarray(lp), 2.0, rtol=1e-3)


class TestLeak:
    def test_mean_leak_rate(self):
        """E[delta] = dt * leak_rate * pos_thres with jitter mean zero."""
        key = jax.random.key(1)
        shape = (256, 256)
        base = jnp.zeros(shape)
        pos_thres = jnp.full(shape, 0.2)
        rate_arr = jnp.ones(shape)
        out = subtract_leak_current(base, 0.1, jnp.float32(0.5), pos_thres, 0.1, rate_arr, key)
        # expected mean leak = 0.5 * 0.1 * 0.2 = 0.01
        assert abs(float(jnp.mean(base - out)) - 0.01) < 1e-4

    def test_no_jitter_exact(self):
        key = jax.random.key(1)
        base = jnp.zeros((4, 4))
        out = subtract_leak_current(
            base, 1.0, jnp.float32(0.1), jnp.full((4, 4), 0.3), 0.0, jnp.ones((4, 4)), key
        )
        np.testing.assert_allclose(np.asarray(out), -0.03, rtol=1e-6)


class TestEventMap:
    def test_quantization(self):
        diff = jnp.array([[0.45, -0.45], [0.19, 0.2]])
        pos, neg = compute_event_map(diff, jnp.full((2, 2), 0.2), jnp.full((2, 2), 0.2))
        np.testing.assert_array_equal(np.asarray(pos), [[2, 0], [0, 1]])
        np.testing.assert_array_equal(np.asarray(neg), [[0, 2], [0, 0]])

    def test_disjoint(self, rng):
        diff = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
        pos, neg = compute_event_map(diff, jnp.full((32, 32), 0.2), jnp.full((32, 32), 0.2))
        assert not np.any((np.asarray(pos) > 0) & (np.asarray(neg) > 0))


class TestShotNoise:
    def test_rate_statistics(self):
        key = jax.random.key(7)
        shape = (512, 512)
        rate_hz, dt = 5.0, 0.01
        inten = jnp.zeros(shape)  # darkest -> full rate
        ones = jnp.ones(shape)
        on, off = generate_shot_noise(key, rate_hz, jnp.float32(dt), 0.25, inten, ones, ones)
        # each polarity: p = rate/2 * dt = 0.025
        p_on = float(jnp.mean(on))
        p_off = float(jnp.mean(off))
        assert abs(p_on - 0.025) < 0.002
        assert abs(p_off - 0.025) < 0.002

    def test_intensity_reduction(self):
        key = jax.random.key(8)
        shape = (512, 512)
        inten = jnp.ones(shape)  # brightest -> rate * 0.25
        ones = jnp.ones(shape)
        on, off = generate_shot_noise(key, 5.0, jnp.float32(0.01), 0.25, inten, ones, ones)
        p = float(jnp.mean(on))
        assert abs(p - 0.025 * 0.25) < 0.002

    def test_on_off_exclusive(self):
        key = jax.random.key(9)
        shape = (256, 256)
        ones = jnp.ones(shape)
        on, off = generate_shot_noise(key, 50.0, jnp.float32(0.01), 0.25, jnp.zeros(shape), ones, ones)
        assert not bool(jnp.any(on & off))


def _reference_refractory_loop(count, T, t_prev, s, R):
    """Independent brute-force port of the reference iteration semantics
    (emulator.py:810-846) for one pixel."""
    n_emit = 0
    emitted = []
    for i in range(count):
        ts_i = t_prev + (i + 1) * s
        if R > s:
            if ts_i - T > R:
                emitted.append(i)
                T = ts_i
                n_emit += 1
        else:
            emitted.append(i)
            n_emit += 1
    return n_emit, emitted, T


class TestRefractory:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_bruteforce(self, seed):
        rng = np.random.default_rng(seed)
        n = 64
        counts = rng.integers(0, 12, size=(n, 1)).astype(np.int32)
        t_prev = 1.0
        dt = 0.01
        K = max(int(counts.max()), 1)
        s = dt / K
        R = float(rng.uniform(0, 4 * s))
        T = (t_prev - rng.uniform(0, 5 * R + 1e-6, size=(n, 1))).astype(np.float32)

        n_emit, i0, m, new_mem = refractory_filter(
            jnp.asarray(counts), jnp.asarray(T), jnp.float32(t_prev),
            jnp.float32(s), R,
        )
        n_emit = np.asarray(n_emit)
        i0 = np.asarray(i0)
        m = int(m)
        new_mem = np.asarray(new_mem)

        for p in range(n):
            ref_n, ref_emitted, ref_T = _reference_refractory_loop(
                int(counts[p, 0]), float(T[p, 0]), t_prev, s, R
            )
            got_emitted = [int(i0[p, 0]) + k * m for k in range(int(n_emit[p, 0]))]
            assert got_emitted == ref_emitted, (
                p, counts[p, 0], T[p, 0], R, s, got_emitted, ref_emitted)
            np.testing.assert_allclose(new_mem[p, 0], ref_T, atol=1e-5)

    def test_inactive_when_period_small(self):
        counts = jnp.array([[5]], dtype=jnp.int32)
        T = jnp.array([[0.0]], dtype=jnp.float32)
        n_emit, i0, m, new_mem = refractory_filter(
            counts, T, jnp.float32(0.0), jnp.float32(0.01), 0.005
        )
        assert int(n_emit[0, 0]) == 5
        assert int(m) == 1
        # timestamp_mem untouched when filter inactive (reference :830)
        assert float(new_mem[0, 0]) == 0.0

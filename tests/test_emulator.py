"""Integration tests of the stateful emulator against analytic expectations.

These encode the physics the reference validates manually (SURVEY.md §4):
threshold quantization, partial-threshold residual retention (hysteresis),
the sub-frame timestamp pyramid, leak/shot noise statistics on static
scenes (the leak_event_test.py scenario), and refractory filtering.
"""
import math

import numpy as np
import pytest

from v2e_tpu.emulator import EventEmulator


BG = 128.0


def make_emulator(**kw):
    defaults = dict(
        pos_thres=0.2,
        neg_thres=0.2,
        sigma_thres=0.0,
        cutoff_hz=0.0,
        leak_rate_hz=0.0,
        shot_noise_rate_hz=0.0,
        refractory_period_s=0.0,
        seed=42,
    )
    defaults.update(kw)
    return EventEmulator(**defaults)


def frame(value, shape=(16, 16)):
    return np.full(shape, value, dtype=np.float32)


class TestBasics:
    def test_first_frame_returns_none(self):
        em = make_emulator()
        assert em.generate_events(frame(BG), 0.0) is None

    def test_static_scene_no_events(self):
        em = make_emulator()
        em.generate_events(frame(BG), 0.0)
        for i in range(1, 5):
            assert em.generate_events(frame(BG), i * 0.01) is None

    def test_brightness_step_on_events(self):
        """+0.5 log units with thres 0.2 -> exactly 2 ON events per pixel."""
        em = make_emulator()
        em.generate_events(frame(BG), 0.0)
        v2 = BG * math.exp(0.5)
        ev = em.generate_events(frame(v2), 0.01)
        assert ev is not None
        assert ev.shape[0] == 2 * 16 * 16
        assert np.all(ev[:, 3] == 1)
        # timestamp pyramid: K=2 -> ts in {t_prev + dt/2, t_frame}
        ts = np.unique(ev[:, 0])
        np.testing.assert_allclose(ts, [0.005, 0.01], atol=1e-6)
        # first half of events at the earlier timestamp (iteration-major order)
        assert np.all(np.diff(ev[:, 0]) >= 0)

    def test_brightness_dim_off_events(self):
        em = make_emulator()
        em.generate_events(frame(BG), 0.0)
        v2 = BG * math.exp(-0.45)
        ev = em.generate_events(frame(v2), 0.01)
        assert ev.shape[0] == 2 * 16 * 16  # floor(0.45/0.2) = 2
        assert np.all(ev[:, 3] == -1)

    def test_residual_retention_hysteresis(self):
        """Only emitted thresholds are added to the memorized value; the
        sub-threshold residual is retained (reference emulator.py:925-937)."""
        em = make_emulator()
        em.generate_events(frame(BG), 0.0)
        v2 = BG * math.exp(0.5)
        ev = em.generate_events(frame(v2), 0.01)
        assert ev.shape[0] == 2 * 256  # residual 0.1 retained
        # same brightness again: residual 0.1 < 0.2 -> no events
        assert em.generate_events(frame(v2), 0.02) is None
        # +0.15 more -> 0.25 total -> 1 more event per pixel
        v3 = BG * math.exp(0.65)
        ev = em.generate_events(frame(v3), 0.03)
        assert ev is not None
        assert ev.shape[0] == 256

    def test_event_coordinates(self):
        """Events carry [t, x, y, p] with x = column (reference docstring
        emulator.py:628-633)."""
        em = make_emulator()
        base = frame(BG, (8, 12))
        em.generate_events(base, 0.0)
        f2 = base.copy()
        f2[3, 7] = BG * math.exp(0.3)  # one pixel at row y=3, col x=7
        ev = em.generate_events(f2, 0.01)
        assert ev.shape[0] == 1
        assert ev[0, 1] == 7  # x
        assert ev[0, 2] == 3  # y
        assert ev[0, 3] == 1

    def test_monotonic_timestamps(self):
        em = make_emulator(sigma_thres=0.03)
        rng = np.random.default_rng(0)
        em.generate_events(frame(BG), 0.0)
        all_ts = []
        for i in range(1, 10):
            f = (BG * np.exp(rng.normal(0, 0.3, (16, 16)))).astype(np.float32)
            ev = em.generate_events(np.clip(f, 0, 255), i * 0.01)
            if ev is not None:
                all_ts.append(ev[:, 0])
        ts = np.concatenate(all_ts)
        assert np.all(np.diff(ts) >= 0)

    def test_batch_matches_single_frame(self):
        """Chunked and frame-at-a-time paths produce identical events."""
        rng = np.random.default_rng(3)
        frames = np.clip(
            BG * np.exp(rng.normal(0, 0.25, (6, 8, 8))), 0, 255
        ).astype(np.float32)
        times = np.arange(6) * 0.01

        em1 = make_emulator(shuffle_events_within_iteration=False)
        evs = []
        for f, t in zip(frames, times):
            e = em1.generate_events(f, t)
            if e is not None:
                evs.append(e)
        single = np.concatenate(evs)

        em2 = make_emulator(shuffle_events_within_iteration=False)
        batch = em2.generate_events_batch(frames, times)

        np.testing.assert_allclose(single, batch, atol=1e-6)

    def test_stats_counters(self):
        em = make_emulator()
        em.generate_events(frame(BG), 0.0)
        em.generate_events(frame(BG * math.exp(0.5)), 0.01)
        assert em.num_events_on == 2 * 256
        assert em.num_events_off == 0
        assert em.num_events_total == 2 * 256


class TestNoise:
    def test_leak_rate_statistics(self):
        """Static scene with leak 2 Hz: ~2 ON events/pixel/s
        (the leak_event_test.py scenario, reference test/leak_event_test.py)."""
        em = make_emulator(leak_rate_hz=2.0, leak_jitter_fraction=0.0,
                           noise_rate_cov_decades=0.0)
        shape = (32, 32)
        n_steps = 200
        dt = 0.01  # 2 seconds total
        em.generate_events(frame(BG, shape), 0.0)
        total = 0
        for i in range(1, n_steps + 1):
            ev = em.generate_events(frame(BG, shape), i * dt)
            if ev is not None:
                assert np.all(ev[:, 3] == 1)  # leak makes ON events only
                total += ev.shape[0]
        expected = 2.0 * (n_steps * dt) * shape[0] * shape[1]
        assert abs(total - expected) / expected < 0.1

    def test_shot_noise_rate_statistics(self):
        em = make_emulator(shot_noise_rate_hz=10.0)
        shape = (64, 64)
        em.generate_events(frame(BG, shape), 0.0)
        n_steps, dt = 100, 0.001
        on = off = 0
        for i in range(1, n_steps + 1):
            ev = em.generate_events(frame(BG, shape), i * dt)
            if ev is not None:
                on += int(np.sum(ev[:, 3] == 1))
                off += int(np.sum(ev[:, 3] == -1))
        # inten01 for 128 DN = (128+20)/275 = 0.538; factor = (0.25-1)*i+1
        inten = (BG + 20) / 275.0
        factor = (0.25 - 1) * inten + 1
        expected_each = 10.0 / 2 * factor * n_steps * dt * shape[0] * shape[1]
        assert abs(on - expected_each) / expected_each < 0.15
        assert abs(off - expected_each) / expected_each < 0.15

    def test_shot_noise_labels(self):
        em = make_emulator(shot_noise_rate_hz=20.0, label_signal_noise=True,
                           output_folder=None)
        shape = (64, 64)
        em.generate_events(frame(BG, shape), 0.0)
        frames = np.stack([frame(BG, shape)] * 20)
        times = np.arange(1, 21) * 0.01
        em.generate_events_batch(frames, times)
        # direct: materialization labels checked via internals
        from v2e_tpu.emulator.events import materialize_frame

        ev, lab = materialize_frame(
            np.zeros((4, 4), np.int16), np.zeros((4, 4), np.int16), 1, 0,
            0.0, 0.01,
            shot_on=np.eye(4, dtype=bool), shot_off=np.zeros((4, 4), bool),
            label_signal_noise=True,
        )
        assert ev.shape[0] == 4
        assert not lab.any()

    def test_refractory_reduces_events(self):
        shape = (16, 16)
        em_free = make_emulator()
        em_ref = make_emulator(refractory_period_s=0.008)
        for em in (em_free, em_ref):
            em.generate_events(frame(BG, shape), 0.0)
        v2 = BG * math.exp(1.0)  # 5 events/pixel, ts_step = dt/5 = 2 ms
        ev_free = em_free.generate_events(frame(v2, shape), 0.01)
        ev_ref = em_ref.generate_events(frame(v2, shape), 0.01)
        assert ev_free.shape[0] == 5 * 256
        # refractory 8 ms, step 2 ms -> stride 5: only 1 event per pixel
        assert ev_ref.shape[0] == 1 * 256


class TestModes:
    def test_hdr_input(self):
        """HDR mode treats input as log directly (reference emulator.py:666)."""
        em = make_emulator(hdr=True)
        em.generate_events(np.full((8, 8), 1.0, np.float32), 0.0)
        ev = em.generate_events(np.full((8, 8), 1.5, np.float32), 0.01)
        assert ev.shape[0] == 2 * 64

    def test_lowpass_delays_events(self):
        """With a low cutoff, a brightness step needs several frames before
        the filtered signal crosses threshold."""
        em = make_emulator(cutoff_hz=10.0)
        em.generate_events(frame(BG), 0.0)
        v2 = BG * math.exp(0.3)
        ev1 = em.generate_events(frame(v2), 0.001)
        # after many frames the filter converges and events appear
        total = 0 if ev1 is None else ev1.shape[0]
        for i in range(2, 300):
            ev = em.generate_events(frame(v2), i * 0.001)
            if ev is not None:
                total += ev.shape[0]
        assert ev1 is None or ev1.shape[0] == 0
        assert total == 256  # one event per pixel once converged

    def test_scidvs_mode_runs(self):
        em = make_emulator(scidvs=True)
        em.generate_events(frame(BG), 0.0)
        ev = em.generate_events(frame(BG * math.exp(0.5)), 0.01)
        assert ev is not None and ev.shape[0] > 0

    def test_csdvs_mode_runs(self):
        em = make_emulator(cs_lambda_pixels=3.0, cs_tau_p_ms=10.0)
        em.generate_events(frame(BG), 0.0)
        f2 = frame(BG)
        f2[4:12, 4:12] = BG * math.exp(0.6)
        ev = em.generate_events(f2, 0.01)
        # center-surround: uniform background suppressed, edges respond
        assert ev is not None

    def test_probe_recording(self, tmp_path):
        em = make_emulator(
            record_single_pixel_states=(3, 2), output_folder=str(tmp_path)
        )
        em.generate_events(frame(BG), 0.0)
        em.generate_events(frame(BG * math.exp(0.5)), 0.01)
        em.cleanup()
        import pickle

        with open(tmp_path / "pixel-states.dat", "rb") as f:
            states = pickle.load(f)
        assert em.single_pixel_sample_count == 1
        assert states["final_pos_evts_frame"][0] == 2
        np.testing.assert_allclose(states["time"][0], 0.01)

    def test_seed_reproducibility(self):
        def run():
            em = make_emulator(sigma_thres=0.03, shot_noise_rate_hz=5.0, seed=7,
                               shuffle_events_within_iteration=False)
            em.generate_events(frame(BG), 0.0)
            ev = em.generate_events(frame(BG * math.exp(0.3)), 0.01)
            return ev

        e1, e2 = run(), run()
        np.testing.assert_array_equal(e1, e2)


class TestSelectOccupied:
    """Two-phase word-packed compaction select == first-k set indices."""

    @pytest.mark.parametrize(
        "total,cap,dens",
        [(160 * 89960, 262144, 0.007), (1024, 256, 0.3), (4096, 8192, 0.1),
         (1000, 64, 0.5), (89960, 16384, 0.0)],
    )
    def test_matches_flatnonzero(self, total, cap, dens):
        import jax.numpy as jnp

        from v2e_tpu.emulator.core import _select_occupied

        rng = np.random.default_rng(total % 97)
        occ = jnp.asarray(rng.random(total) < dens)
        idx = np.asarray(_select_occupied(occ, cap))
        ref = np.flatnonzero(np.asarray(occ))[:cap].astype(np.int32)
        ref = np.concatenate([ref, np.full(cap - len(ref), total, np.int32)])
        np.testing.assert_array_equal(idx, ref)

    def test_clustered_overflowing_words(self):
        """Dense clusters (every bit of some words set) and word overflow."""
        import jax.numpy as jnp

        from v2e_tpu.emulator.core import _select_occupied

        occ = np.zeros(4096, bool)
        occ[100:400] = True  # solid run spanning many full words
        occ[4000:4090] = True
        idx = np.asarray(_select_occupied(jnp.asarray(occ), 256))
        ref = np.flatnonzero(occ)[:256].astype(np.int32)
        np.testing.assert_array_equal(idx, ref)

    @pytest.mark.parametrize(
        "total,cap,dens",
        [(160 * 89960, 262144, 0.007), (1024, 256, 0.3), (4096, 8192, 0.1),
         (1000, 64, 0.5), (89960, 16384, 0.0)],
    )
    def test_scan_select_matches_topk(self, total, cap, dens):
        """Prefix-sum + binary-search select (V2E_SELECT=scan) is
        entry-for-entry identical to the top_k select, fills included."""
        import jax.numpy as jnp

        from v2e_tpu.emulator.core import _select_occupied, _select_occupied_scan

        rng = np.random.default_rng(total % 89)
        occ = jnp.asarray(rng.random(total) < dens)
        a = np.asarray(_select_occupied(occ, cap))
        b = np.asarray(_select_occupied_scan(occ, cap))
        np.testing.assert_array_equal(a, b)

    def test_scan_select_clustered(self):
        import jax.numpy as jnp

        from v2e_tpu.emulator.core import _select_occupied_scan

        occ = np.zeros(4096, bool)
        occ[100:400] = True
        occ[4000:4090] = True
        idx = np.asarray(_select_occupied_scan(jnp.asarray(occ), 256))
        ref = np.flatnonzero(occ)[:256].astype(np.int32)
        np.testing.assert_array_equal(idx, ref)

    @pytest.mark.parametrize(
        "total,frames,has_shot",
        [(14_387_200, 160, True),   # headline shape: idx16 + i0u8
         (14_387_200, 300, False),  # i0 stays i16
         (20_000_000, 64, True)],   # idx stays i32
    )
    def test_sparse_blob_roundtrip(self, total, frames, has_shot):
        """Compressed sparse-blob serialize/deserialize is lossless,
        including sorted-idx tails of fill entries (idx == total)."""
        import jax.numpy as jnp

        from v2e_tpu.emulator.core import slice_packed, unpack_sparse_blob

        rng = np.random.default_rng(total % 97)
        cap, n_real = 4096, 3000
        idx = np.sort(rng.choice(total, n_real, replace=False)).astype(np.int32)
        idx = np.concatenate([idx, np.full(cap - n_real, total, np.int32)])
        sparse = {
            "idx": jnp.asarray(idx),
            "count": jnp.asarray(
                rng.integers(-30000, 30000, cap).astype(np.int16)),
            "i0": jnp.asarray(
                rng.integers(0, frames, cap).astype(np.int16)),
        }
        if has_shot:
            sparse["shot"] = jnp.asarray(
                rng.integers(0, 4, cap).astype(np.uint8))
        blob = np.asarray(slice_packed(sparse, cap, total, frames))
        out = unpack_sparse_blob(blob, cap, has_shot, total, frames)
        np.testing.assert_array_equal(out["idx"], idx)
        np.testing.assert_array_equal(out["count"], np.asarray(sparse["count"]))
        np.testing.assert_array_equal(
            np.asarray(out["i0"], dtype=np.int16), np.asarray(sparse["i0"]))
        if has_shot:
            np.testing.assert_array_equal(out["shot"], np.asarray(sparse["shot"]))

    def test_compaction_select_kwarg(self):
        """EventEmulator(compaction_select=...) routes through the config
        and yields an identical event stream for both select schemes."""
        from v2e_tpu.emulator import EventEmulator

        rng = np.random.default_rng(3)
        frames = (rng.random((6, 16, 24)) * 255).astype(np.float32)
        times = np.arange(6, dtype=np.float64) * 0.01
        out = {}
        for sel in ("topk", "scan"):
            em = EventEmulator(seed=7, sigma_thres=0.0, leak_rate_hz=0.0,
                               shuffle_events_within_iteration=False,
                               compaction_select=sel)
            assert em.cfg.select == sel
            out[sel] = em.generate_events_batch(frames, times)
        np.testing.assert_array_equal(out["topk"], out["scan"])

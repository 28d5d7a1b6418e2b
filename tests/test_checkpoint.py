"""Conversion checkpoint/resume: restored state continues identically."""
import math

import numpy as np

from v2e_tpu.emulator import EventEmulator


def make(**kw):
    base = dict(sigma_thres=0.03, leak_rate_hz=1.0, shot_noise_rate_hz=2.0,
                cutoff_hz=50.0, seed=7, shuffle_events_within_iteration=False)
    base.update(kw)
    return EventEmulator(**base)


def frame(v, shape=(16, 16)):
    return np.full(shape, v, np.float32)


class TestCheckpointResume:
    def test_resume_matches_continuous(self, tmp_path):
        ckpt = str(tmp_path / "emu.npz")
        em1 = make()
        em1.generate_events_batch(np.stack([frame(128)] * 5), np.arange(5) * 0.01)
        em1.save_state(ckpt)
        ev_cont = em1.generate_events_batch(
            np.stack([frame(128 * math.exp(0.5))] * 5), (5 + np.arange(5)) * 0.01
        )

        em2 = make()
        em2.load_state(ckpt)
        assert em2.frame_counter == em1.frame_counter - 5
        ev_res = em2.generate_events_batch(
            np.stack([frame(128 * math.exp(0.5))] * 5), (5 + np.arange(5)) * 0.01
        )
        np.testing.assert_allclose(ev_cont, ev_res, atol=1e-9)
        assert em2.num_events_total == em1.num_events_total

    def test_save_requires_state(self, tmp_path):
        em = make()
        import pytest

        with pytest.raises(RuntimeError):
            em.save_state(str(tmp_path / "x.npz"))

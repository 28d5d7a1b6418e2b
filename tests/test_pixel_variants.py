"""Semantic tests of the CSDVS and SCIDVS pixel variants."""
import math

import numpy as np

from v2e_tpu.emulator import EventEmulator


def frame(v, shape=(24, 24)):
    return np.full(shape, v, np.float32)


def make(**kw):
    base = dict(pos_thres=0.2, neg_thres=0.2, sigma_thres=0.0,
                cutoff_hz=0.0, leak_rate_hz=0.0, shot_noise_rate_hz=0.0,
                seed=11, shuffle_events_within_iteration=False)
    base.update(kw)
    return EventEmulator(**base)


class TestSCIDVS:
    def test_highpass_gain_doubles_initial_response(self):
        """SCIDVS amplifies transient changes by SCIDVS_GAIN=2: a +0.3
        log-unit step yields floor(0.6/0.2)=3 events vs the standard
        pixel's floor(0.3/0.2)=1 (reference emulator.py:82,748)."""
        em_std = make()
        import dataclasses

        em_sci = make(scidvs=True, sigma_thres=0.0)
        # disable the per-pixel tau lognormal spread for determinism
        em_sci.cfg = dataclasses.replace(em_sci.cfg, scidvs_tau_cov=0.0)
        # settle both pixels on the static scene first (in SCIDVS mode the
        # memorized value starts at the log intensity while the amplified
        # highpass starts at 0, so the first frames emit a large adaptation
        # burst — inherited reference behavior, emulator.py:713,748)
        for em in (em_std, em_sci):
            for i in range(40):
                em.generate_events(frame(100), i * 0.0001)
        v2 = 100 * math.exp(0.3)
        ev_std = em_std.generate_events(frame(v2), 41 * 0.0001)
        ev_sci = em_sci.generate_events(frame(v2), 41 * 0.0001)
        n_std = 0 if ev_std is None else ev_std.shape[0]
        n_sci = 0 if ev_sci is None else ev_sci.shape[0]
        assert n_std == 1 * 24 * 24
        # gain 2: the same step crosses at least twice as many thresholds
        assert n_sci >= 2 * n_std
        assert np.all(ev_sci[:, 3] == 1)

    def test_highpass_decays(self):
        """After a step, the SCIDVS highpass decays back toward zero — the
        held input eventually produces OFF events (adaptation)."""
        em = make(scidvs=True)
        em.generate_events(frame(100), 0.0)
        v2 = 100 * math.exp(0.4)
        em.generate_events(frame(v2), 0.01)
        off = 0
        for i in range(2, 60):
            ev = em.generate_events(frame(v2), i * 0.01)
            if ev is not None:
                off += int(np.sum(ev[:, 3] == -1))
        assert off > 0  # adaptation produced OFF events on a static input


class TestCSDVS:
    def test_uniform_step_suppressed(self):
        """Center-surround cancels full-field brightness changes: a uniform
        step produces far fewer events than without the surround, while a
        local spot still responds (reference emulator.py:750-754)."""
        shape = (24, 24)
        em_plain = make()
        em_cs = make(cs_lambda_pixels=2.0, cs_tau_p_ms=1.0)
        for em in (em_plain, em_cs):
            em.generate_events(frame(100, shape), 0.0)
        v2 = 100 * math.exp(0.5)
        n_plain = em_plain.generate_events(frame(v2, shape), 0.01).shape[0]
        ev_cs = em_cs.generate_events(frame(v2, shape), 0.01)
        n_cs = 0 if ev_cs is None else ev_cs.shape[0]
        assert n_cs < 0.3 * n_plain

    def test_local_spot_passes(self):
        shape = (24, 24)
        em_cs = make(cs_lambda_pixels=2.0, cs_tau_p_ms=1.0)
        em_cs.generate_events(frame(100, shape), 0.0)
        f2 = frame(100, shape)
        f2[10:14, 10:14] = 100 * math.exp(0.6)
        ev = em_cs.generate_events(f2, 0.01)
        assert ev is not None
        # center-surround response: ON events at the spot, OFF ring around
        # it (the surround rises in the diffusion halo) — check the ON
        # response is concentrated at the spot
        on = ev[ev[:, 3] == 1]
        assert on.shape[0] > 0
        inside = (on[:, 1] >= 8) & (on[:, 1] <= 15) & (on[:, 2] >= 8) & (on[:, 2] <= 15)
        assert inside.mean() > 0.8

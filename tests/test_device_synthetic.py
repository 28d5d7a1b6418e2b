"""Device-side synthetic generators: pixel-exact parity with host plugins."""
import jax.numpy as jnp
import numpy as np

from v2e_tpu.synthetic.device import gradients_frames, moving_dot_frames
from v2e_tpu.synthetic.gradients import gradients
from v2e_tpu.synthetic.moving_dot import moving_dot


def collect(syn):
    frames, ts = [], []
    for _ in range(syn.total_frames()):
        fr, t = syn.next_frame()
        if fr is None:
            break
        frames.append(fr)
        ts.append(t)
    return np.stack(frames), np.array(ts)


class TestDeviceGenerators:
    def test_moving_dot_parity(self):
        syn = moving_dot(width=96, height=80, preview=False,
                         arg_list=["--t_total", "0.005", "--radius", "30"])
        host, ts = collect(syn)
        dev = np.asarray(
            moving_dot_frames(jnp.asarray(ts), 96, 80, 5, 10.0, 5.0, 30.0)
        )
        np.testing.assert_array_equal(host.astype(np.float32), dev)

    def test_gradients_parity(self):
        syn = gradients(width=96, height=32, preview=False,
                        arg_list=["--total_time", "0.003"])
        host, ts = collect(syn)
        dev = np.asarray(gradients_frames(jnp.asarray(ts), 96, 32))
        np.testing.assert_array_equal(host.astype(np.float32), dev)

    def test_feeds_emulator_without_host_roundtrip(self):
        from v2e_tpu.emulator import EventEmulator

        ts = np.arange(20) * 1e-3
        frames = moving_dot_frames(jnp.asarray(ts), 64, 48, 3, 10.0, 5.0, 15.0)
        em = EventEmulator(sigma_thres=0.0, leak_rate_hz=0.0, cutoff_hz=0.0,
                           seed=3)
        ev = em.generate_events_batch(frames, ts)  # jnp frames: no H2D
        assert ev is not None and ev.shape[0] > 0

    def test_barberpole_parity(self):
        from v2e_tpu.synthetic.barberpole import barberpole
        from v2e_tpu.synthetic.device import barberpole_frames

        syn = barberpole(width=96, height=64, preview=False,
                         arg_list=["--total_time", "0.002"])
        host, ts = collect(syn)
        dev = np.asarray(barberpole_frames(jnp.asarray(ts), 96, 64))
        np.testing.assert_array_equal(host.astype(np.float32), dev)

    def test_spots_parity(self):
        from v2e_tpu.synthetic.device import spots_frames
        from v2e_tpu.synthetic.spots import spots

        syn = spots(width=96, height=64, preview=False,
                    arg_list=["--total_time", "0.004"])
        host, ts = collect(syn)
        dev = np.asarray(
            spots_frames(jnp.asarray(ts), 96, 64, 1.5, 0.004, 20.0, 60.0)
        )
        np.testing.assert_array_equal(host.astype(np.float32), dev)

    def test_single_dot_parity(self):
        from v2e_tpu.synthetic.device import single_linearly_moving_dot_frames
        from v2e_tpu.synthetic.single_linearly_moving_dot import (
            single_linearly_moving_dot,
        )

        syn = single_linearly_moving_dot(width=96, height=64, preview=False)
        host, ts = [], []
        for _ in range(50):
            fr, t = syn.next_frame()
            if fr is None:
                break
            host.append(fr)
            ts.append(t)
        host = np.stack(host)
        dev = np.asarray(
            single_linearly_moving_dot_frames(jnp.asarray(np.array(ts)), 96, 64)
        )
        np.testing.assert_array_equal(host.astype(np.float32), dev)


class TestDeviceParticles:
    def _mk(self, **kw):
        from v2e_tpu.synthetic.particles import particles

        return particles(width=96, height=64, preview=False,
                         arg_list=["--total_time", "0.002", "--dt", "1e-4",
                                   "--num_particles", "40"])

    def test_renderer_matches_host_draw(self):
        """Same centers -> device scatter render == host overwrite loop,
        including overwrite (later particle wins) semantics."""
        from v2e_tpu.synthetic.device import particles_frames
        from v2e_tpu.synthetic.draw import fill_gaussian_dot

        rng = np.random.default_rng(7)
        F, P, H, W = 4, 25, 48, 64
        # cluster particles so patches overlap often (overwrite stress)
        centers = np.empty((F, P, 2), dtype=np.float32)
        centers[..., 0] = rng.uniform(8, 24, (F, P))
        centers[..., 1] = rng.uniform(8, 24, (F, P))
        bg, fg, sigma = 5.0, 6.25, 1.0
        d = int(sigma * 2) + 1

        host = np.empty((F, H, W), np.float32)
        for f in range(F):
            pix = np.full((H, W), bg, dtype=np.float32)
            for i in range(P):
                fill_gaussian_dot(pix, float(centers[f, i, 0]),
                                  float(centers[f, i, 1]), fg, bg, sigma,
                                  gain=2.0, d=d)
            host[f] = pix
        dev = np.asarray(
            particles_frames(jnp.asarray(centers), W, H, fg, bg, sigma, 2.0, d)
        )
        np.testing.assert_allclose(dev, host, atol=1e-5)

    def test_device_frames_matches_next_frame(self):
        """End-to-end: identical dynamics (deepcopied instance) rendered on
        device vs the host next_frame loop."""
        import copy

        syn = self._mk()
        syn2 = self._mk()
        # same initial walkers + RNG stream (instances seed independently)
        syn2.pos = syn.pos.copy()
        syn2.vel = syn.vel.copy()
        syn2._rng = copy.deepcopy(syn._rng)
        host, ts = collect(syn)
        dev = np.asarray(syn2.device_frames(ts))
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host.astype(np.float32), atol=1e-3)
        # occupancy must be identical (no lost/extra dots)
        np.testing.assert_array_equal(dev > 5.5, host > 5.5)

"""The fused single-dispatch chunk must equal the staged pipeline exactly.

The staged path (preprocess → flow → interpolate → postprocess →
emulate+compact as separate programs) and the fused path
(v2e_tpu.fused.fused_chunk, one program) share every impl function, so the
event streams must match event-for-event for any fixed-U configuration.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from v2e_tpu.emulator import EventEmulator
from v2e_tpu.fused import FusedConverter
from v2e_tpu.models.slomo import SuperSloMo


H, W, B, U = 48, 64, 4, 4
SRC_INTERVAL = 1 / 30.0


def make_src(n, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = np.empty((n, H, W), np.float32)
    for i in range(n):
        frames[i] = np.clip(
            110 + 60 * np.sin((xx + 1.7 * i) / 9.0) * np.cos(yy / 7.0), 0, 255
        )
    return frames


def emulator_kwargs(tmp_path, sub):
    out = tmp_path / sub
    out.mkdir()
    return dict(
        pos_thres=0.2, neg_thres=0.2, sigma_thres=0.03,
        cutoff_hz=200.0, leak_rate_hz=0.05, shot_noise_rate_hz=0.5,
        refractory_period_s=0.001,
        seed=7,
        shuffle_events_within_iteration=False,
        output_folder=str(out),
        dvs_text="ev.txt",
        output_width=W, output_height=H,
    )


def run_chunks(tmp_path, sub, use_fused):
    slomo = SuperSloMo(
        model=None, auto_upsample=False, upsampling_factor=U, batch_size=B
    )
    em = EventEmulator(**emulator_kwargs(tmp_path, sub))
    fused = FusedConverter(slomo, em)
    src = make_src(3 * B + 1)
    all_events = []
    pair_index = 0
    for c in range(3):
        chunk = src[c * B : c * B + B + 1]
        times = (pair_index + np.arange(B * U, dtype=np.float64) / U) * SRC_INTERVAL
        if use_fused:
            handle = fused.submit(chunk, times)
        else:
            interp, u = slomo.interpolate_batch(jnp.asarray(chunk), H, W)
            assert u == U
            handle = em.submit_batch(interp, times)
        pair_index += B
        if handle is not None:
            events, _, _ = em.collect(handle)
            fused.note_collected(handle)
            all_events.append(events)
    em.cleanup()
    return np.concatenate(all_events), em


class TestFusedEqualsStaged:
    def test_event_stream_identical(self, tmp_path):
        ev_staged, em_s = run_chunks(tmp_path, "staged", use_fused=False)
        ev_fused, em_f = run_chunks(tmp_path, "fused", use_fused=True)
        assert ev_staged.shape[0] > 50
        np.testing.assert_array_equal(ev_staged, ev_fused)
        assert em_s.num_events_total == em_f.num_events_total
        # the file sinks got identical streams too
        a = (tmp_path / "staged" / "ev.txt").read_text().splitlines()
        b = (tmp_path / "fused" / "ev.txt").read_text().splitlines()
        assert [l for l in a if not l.startswith("#")] == [
            l for l in b if not l.startswith("#")
        ]

    def test_fused_requires_initialized_state(self, tmp_path):
        slomo = SuperSloMo(
            model=None, auto_upsample=False, upsampling_factor=U, batch_size=B
        )
        em = EventEmulator(**emulator_kwargs(tmp_path, "x"))
        from v2e_tpu.fused import fused_chunk

        with pytest.raises(RuntimeError):
            em.submit_batch_fused(
                fused_chunk,
                (H, W, U, 96, jnp.bfloat16, False, 32, True),
                slomo.flow_params, slomo.interp_params,
                make_src(B + 1),
                np.arange(B * U) / (U * 30.0),
            )

    def test_usable_gating(self, tmp_path):
        em = EventEmulator(**emulator_kwargs(tmp_path, "y"))
        fixed = SuperSloMo(model=None, auto_upsample=False,
                           upsampling_factor=U, batch_size=B)
        auto = SuperSloMo(model=None, auto_upsample=True, batch_size=B)
        assert FusedConverter.usable(fixed, em, writes_slomo_video=False)
        # auto-U fuses too (lookahead bucket choice) since round 4
        assert FusedConverter.usable(auto, em, writes_slomo_video=False)
        assert not FusedConverter.usable(fixed, em, writes_slomo_video=True)

    def test_auto_u_lookahead_matches_forced_staged(self, tmp_path):
        """Auto-upsampling fused path: per-chunk U comes from the previous
        chunk's max flow (one-chunk lookahead).  Replaying the SAME U
        sequence through the staged path must reproduce the event stream
        event-for-event, including across a bucket transition."""
        import jax.numpy as jnp

        def scaled_slomo(**kw):
            # amplify the random flow UNet's output (random-weight flow is
            # ~0.01 px) so max-flow — and hence the auto-U bucket — sits in
            # a controllable 5-7 px range that crosses the 6->8 bucket edge
            # as the input amplitude ramps (calibrated by measurement)
            s = SuperSloMo(model=None, batch_size=B, allow_random=True, **kw)
            c3 = s.flow_params["conv3"]
            s.flow_params = dict(s.flow_params)
            s.flow_params["conv3"] = {"w": c3["w"] * 200.0, "b": c3["b"] * 0.0}
            return s

        def make_ramp_src(n):
            # amplitude ramps up over time -> flow magnitude (random
            # weights) drifts -> the auto-U bucket transitions mid-run
            yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
            frames = np.empty((n, H, W), np.float32)
            for i in range(n):
                amp = 20.0 + 90.0 * i / n
                frames[i] = np.clip(
                    120 + amp * np.sin((xx + 2.3 * i) / 6.0) * np.cos(yy / 5.0),
                    0, 255,
                )
            return frames

        n_chunks = 5
        src = make_ramp_src(n_chunks * B + 1)

        # ---- run A: fused auto-U (sequential collect -> exact 1-lookahead)
        slomo_a = scaled_slomo(auto_upsample=True)
        em_a = EventEmulator(**emulator_kwargs(tmp_path, "auto"))
        fused = FusedConverter(slomo_a, em_a)
        events_a, us, fused_flags = [], [], []
        for c in range(n_chunks):
            chunk = src[c * B : c * B + B + 1]
            handle, u, times = fused.submit_window(chunk, c * B, SRC_INTERVAL)
            us.append(u)
            fused_flags.append(bool(handle and handle.get("fused")))
            if handle is not None:
                ev, _, _ = em_a.collect(handle)
                fused.note_collected(handle)
                events_a.append(ev)
        em_a.cleanup()
        events_a = np.concatenate(events_a)

        assert len(set(us)) >= 2, f"no bucket transition exercised: {us}"
        assert not fused_flags[0] and all(fused_flags[1:]), fused_flags

        # ---- run B: staged path forced to the recorded U sequence ----
        em_b = EventEmulator(**emulator_kwargs(tmp_path, "forced"))
        events_b = []
        for c in range(n_chunks):
            chunk = src[c * B : c * B + B + 1]
            slomo_b = scaled_slomo(auto_upsample=False, upsampling_factor=us[c])
            interp, u = slomo_b.interpolate_batch(jnp.asarray(chunk), H, W)
            assert u == us[c]
            times = (c * B + np.arange(B * u, dtype=np.float64) / u) * SRC_INTERVAL
            handle = em_b.submit_batch(interp, times)
            if handle is not None:
                ev, _, _ = em_b.collect(handle)
                events_b.append(ev)
        em_b.cleanup()
        events_b = np.concatenate(events_b)

        assert events_a.shape[0] > 50
        np.testing.assert_array_equal(events_a, events_b)

    def test_cli_fused_matches_staged_pipeline(self, tmp_path):
        """End-to-end through the CLI: the fused pipeline (default for
        fixed U) produces the same stream as the forced-staged run
        (--vid_slomo keeps frames on host, disabling fusion)."""
        import cv2

        from v2e_tpu.cli import main

        vid = str(tmp_path / "in.avi")
        vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 30, (W, H))
        for fr in make_src(10).astype(np.uint8):
            vw.write(cv2.cvtColor(fr, cv2.COLOR_GRAY2BGR))
        vw.release()

        common = [
            "-i", vid, "--dvs_text", "ev.txt",
            "--timestamp_resolution", "0.01",
            "--auto_timestamp_resolution", "false",
            "--batch_size", "4", "--dvs_emulator_seed", "5",
            "--allow_random_slomo", "--no_shuffle",
            "--unique_output_folder", "false", "--overwrite",
        ]
        rc1 = main(common + [
            "--output_folder", str(tmp_path / "fused"),
            "--skip_video_output",
        ])
        # --vid_slomo requires host frames -> staged path
        rc2 = main(common + [
            "--output_folder", str(tmp_path / "staged"),
            "--vid_slomo", "slomo.avi", "--dvs_vid", "None",
        ])
        assert rc1 == 0 and rc2 == 0
        ev = lambda p: [
            l for l in (p / "ev.txt").read_text().splitlines()
            if not l.startswith("#")
        ]
        a, b = ev(tmp_path / "fused"), ev(tmp_path / "staged")
        assert len(a) > 20
        assert a == b

"""CLI coverage: auto-upsampling, time windows, slow-motion factor, HDR."""
import numpy as np
import pytest

from v2e_tpu.cli import main


@pytest.fixture
def small_video(tmp_path):
    import cv2

    vid = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 30, (64, 48))
    for i in range(10):
        fr = np.full((48, 64, 3), 70, np.uint8)
        fr[:, 4 * i : 4 * i + 8] = 190
        w.write(fr)
    w.release()
    return vid


def run(tmp_path, extra):
    return main([
        "--output_folder", str(tmp_path / "out"),
        "--unique_output_folder", "false", "--overwrite",
        "--dvs_params", "clean", "--skip_video_output", "--no_shuffle",
        "--dvs_text", "ev.txt",
    ] + extra)


class TestAutoUpsample:
    def test_auto_mode_runs_and_refines_timestamps(self, tmp_path, small_video):
        rc = run(tmp_path, [
            "-i", small_video, "--batch_size", "4", "--allow_random_slomo",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev.shape[0] > 0
        # auto upsampling must give sub-frame-interval timestamps
        assert np.min(np.diff(np.unique(ev[:, 0]))) < 1 / 30.0


class TestTimeWindows:
    def test_start_stop_time(self, tmp_path, small_video):
        rc = run(tmp_path, [
            "-i", small_video, "--disable_slomo",
            "--start_time", "0.1", "--stop_time", "0.2",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        # frames 3..5 only -> events exist but fewer than full run
        assert 0 < ev.shape[0]
        assert ev[:, 0].max() <= 0.2 + 1e-6

    def test_input_slowmotion_factor(self, tmp_path, small_video):
        rc = run(tmp_path, [
            "-i", small_video, "--disable_slomo",
            "--input_slowmotion_factor", "10",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        # 10 frames at (1/30)/10 s intervals -> all events within 33 ms
        assert ev[:, 0].max() < 0.04

    def test_input_frame_rate_override(self, tmp_path, small_video):
        rc = run(tmp_path, [
            "-i", small_video, "--disable_slomo",
            "--input_frame_rate", "300",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev[:, 0].max() < 0.04


class TestHDR:
    def test_hdr_synthetic_particles(self, tmp_path):
        rc = run(tmp_path, [
            "--synthetic_input", "v2e_tpu.synthetic.particles",
            "--disable_slomo", "--hdr",
            "--output_width", "64", "--output_height", "48",
            "--total_time", "0.005", "--num_particles", "20",
            "--contrast", "1.5", "--speed_min", "500", "--speed_max", "1000",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev.shape[0] > 0


class TestCrop:
    def test_crop(self, tmp_path, small_video):
        rc = run(tmp_path, [
            "-i", small_video, "--disable_slomo",
            "--crop", "8,8,4,4",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev[:, 1].max() < 64 - 16
        assert ev[:, 2].max() < 48 - 8


class TestImageFolderInput:
    def test_folder_of_images(self, tmp_path):
        import cv2

        folder = tmp_path / "frames"
        folder.mkdir()
        for i in range(8):
            fr = np.full((48, 64), 70, np.uint8)
            fr[:, 5 * i : 5 * i + 8] = 190
            cv2.imwrite(str(folder / f"{i:04d}.png"), fr)

        rc = run(tmp_path, [
            "-i", str(folder), "--disable_slomo",
            "--input_frame_rate", "30",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev.shape[0] > 0

    def test_folder_without_rate_fails(self, tmp_path):
        import cv2

        folder = tmp_path / "frames2"
        folder.mkdir()
        cv2.imwrite(str(folder / "0.png"), np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError):
            run(tmp_path, ["-i", str(folder), "--disable_slomo"])


class TestSignalNoiseLabeling:
    def test_label_column_through_cli(self, tmp_path):
        rc = main([
            "--output_folder", str(tmp_path / "out"),
            "--unique_output_folder", "false", "--overwrite",
            "--skip_video_output", "--no_shuffle",
            "--dvs_text", "ev.txt",
            "--synthetic_input", "v2e_tpu.synthetic.moving_dot",
            "--disable_slomo",
            "--output_width", "64", "--output_height", "48",
            "--cycles", "0.02", "--radius", "15",
            "--sigma_thres", "0", "--cutoff_hz", "0",
            "--leak_rate_hz", "0", "--shot_noise_rate_hz", "50",
            "--refractory_period", "0",
            "--label_signal_noise",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev.shape[1] == 5  # extra signal/noise column
        labels = ev[:, 4]
        assert set(np.unique(labels)) <= {0.0, 1.0}
        assert (labels == 0).any()  # shot noise present and labeled
        assert (labels == 1).any()  # dot signal present


class TestExposureModesCLI:
    def test_count_exposure(self, tmp_path, small_video):
        rc = main([
            "--output_folder", str(tmp_path / "out"),
            "--unique_output_folder", "false", "--overwrite",
            "-i", small_video, "--disable_slomo", "--no_shuffle",
            "--dvs_params", "clean",
            "--dvs_exposure", "count", "500",
            "--dvs_vid", "dvs.avi",
        ])
        assert rc == 0
        times = np.loadtxt(tmp_path / "out" / "dvs-frame_times.txt", comments="#")
        assert times.shape[0] > 1  # multiple count-mode frames written

    def test_area_count_exposure(self, tmp_path, small_video):
        rc = main([
            "--output_folder", str(tmp_path / "out"),
            "--unique_output_folder", "false", "--overwrite",
            "-i", small_video, "--disable_slomo", "--no_shuffle",
            "--dvs_params", "clean",
            "--dvs_exposure", "area_count", "50", "16",
            "--dvs_vid", "dvs.avi",
        ])
        assert rc == 0
        assert (tmp_path / "out" / "dvs.avi").exists()

    def test_source_exposure(self, tmp_path, small_video):
        rc = main([
            "--output_folder", str(tmp_path / "out"),
            "--unique_output_folder", "false", "--overwrite",
            "-i", small_video, "--disable_slomo", "--no_shuffle",
            "--dvs_params", "clean",
            "--dvs_exposure", "source",
            "--dvs_vid", "dvs.avi",
        ])
        assert rc == 0
        assert (tmp_path / "out" / "dvs.avi").exists()


class TestMultiDevice:
    """--devices N conversion (multi-chip via jax.sharding on the 8-device
    CPU mesh; SURVEY §5 scale-out obligation)."""

    def test_pixel_mode_stream_identical(self, tmp_path, small_video):
        """Pixel-plane sharding is bit-exact: the event stream with
        --devices 4 equals the single-device stream."""
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        rc1 = run(tmp_path / "a", [
            "-i", small_video, "--disable_slomo", "--dvs_emulator_seed", "3",
        ])
        rc2 = run(tmp_path / "b", [
            "-i", small_video, "--disable_slomo", "--dvs_emulator_seed", "3",
            "--devices", "4", "--parallel_mode", "pixel",
        ])
        assert rc1 == 0 and rc2 == 0
        ev1 = np.loadtxt(tmp_path / "a" / "out" / "ev.txt", comments="#")
        ev2 = np.loadtxt(tmp_path / "b" / "out" / "ev.txt", comments="#")
        np.testing.assert_array_equal(ev1, ev2)

    def test_pixel_mode_pads_nondivisor_device_count(self, tmp_path, small_video):
        """--devices 6 with H=64 (64 % 6 != 0): inert row padding shards
        over all 6 chips and the stream stays bit-exact (VERDICT r2 #6)."""
        import jax

        if len(jax.devices()) < 6:
            pytest.skip("needs 6 virtual devices")
        rc1 = run(tmp_path / "a", [
            "-i", small_video, "--disable_slomo", "--dvs_emulator_seed", "3",
        ])
        rc2 = run(tmp_path / "b", [
            "-i", small_video, "--disable_slomo", "--dvs_emulator_seed", "3",
            "--devices", "6", "--parallel_mode", "pixel",
        ])
        assert rc1 == 0 and rc2 == 0
        ev1 = np.loadtxt(tmp_path / "a" / "out" / "ev.txt", comments="#")
        ev2 = np.loadtxt(tmp_path / "b" / "out" / "ev.txt", comments="#")
        np.testing.assert_array_equal(ev1, ev2)

    def test_segment_mode_runs_and_is_close(self, tmp_path, small_video):
        import jax

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        rc1 = run(tmp_path / "a", [
            "-i", small_video, "--disable_slomo", "--dvs_emulator_seed", "3",
        ])
        rc2 = run(tmp_path / "b", [
            "-i", small_video, "--disable_slomo", "--dvs_emulator_seed", "3",
            "--devices", "8", "--parallel_mode", "segment",
            "--segment_warmup", "2",
        ])
        assert rc1 == 0 and rc2 == 0
        ev1 = np.loadtxt(tmp_path / "a" / "out" / "ev.txt", comments="#")
        ev2 = np.loadtxt(tmp_path / "b" / "out" / "ev.txt", comments="#")
        assert ev2.shape[0] > 0
        assert abs(ev1.shape[0] - ev2.shape[0]) <= max(0.15 * ev1.shape[0], 30)


class TestTorchCkptCLI:
    """--slomo_model accepts the reference's torch .ckpt format directly
    (reference v2e_args.py:260-263 takes SuperSloMo39.ckpt verbatim; keys
    state_dictFC/state_dictAT per reference slomo.py:225-227)."""

    def _make_ckpt(self, path):
        torch = pytest.importorskip("torch")
        from v2e_tpu.models.convert_ckpt import FLOW_SPEC, INTERP_SPEC

        torch.manual_seed(3)
        ckpt = {"epoch": 39}
        for key, spec in (("state_dictFC", FLOW_SPEC),
                          ("state_dictAT", INTERP_SPEC)):
            state = {}
            for name, ci, co, k in spec.conv_specs:
                state[f"{name}.weight"] = torch.randn(co, ci, k, k) * 0.05
                state[f"{name}.bias"] = torch.randn(co) * 0.01
            ckpt[key] = state
        torch.save(ckpt, str(path))

    def test_ckpt_end_to_end_with_npz_cache(self, tmp_path, small_video):
        ckpt = tmp_path / "SuperSloMo39.ckpt"
        self._make_ckpt(ckpt)
        rc = run(tmp_path / "a", [
            "-i", small_video,
            "--slomo_model", str(ckpt),
            "--timestamp_resolution", "0.01",
            "--auto_timestamp_resolution", "false",
            "--batch_size", "4",
            "--dvs_emulator_seed", "3",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "a" / "out" / "ev.txt", comments="#")
        assert ev.shape[0] > 0
        # first load caches the converted npz alongside the ckpt
        cached = tmp_path / "SuperSloMo39.npz"
        assert cached.exists()
        # second run (served from the npz cache) produces the same stream
        mtime = cached.stat().st_mtime
        rc = run(tmp_path / "b", [
            "-i", small_video,
            "--slomo_model", str(ckpt),
            "--timestamp_resolution", "0.01",
            "--auto_timestamp_resolution", "false",
            "--batch_size", "4",
            "--dvs_emulator_seed", "3",
        ])
        assert rc == 0
        assert cached.stat().st_mtime == mtime  # cache reused, not rebuilt
        ev2 = np.loadtxt(tmp_path / "b" / "out" / "ev.txt", comments="#")
        np.testing.assert_array_equal(ev, ev2)


class TestSlomoUseSaved:
    """--slomo_use_saved: first run records the interpolated stream, later
    runs replay it without loading/running SuperSloMo (the reference's
    unimplemented TODO, v2e_args.py:280-285)."""

    def test_record_then_replay_identical(self, tmp_path, small_video):
        import glob

        common = [
            "-i", small_video, "--slomo_use_saved",
            "--timestamp_resolution", "0.01",
            "--auto_timestamp_resolution", "false",
            "--batch_size", "4", "--dvs_emulator_seed", "3",
            "--allow_random_slomo",
        ]
        rc = run(tmp_path / "a", common)
        assert rc == 0
        caches = glob.glob(str(tmp_path / "a" / "slomo-cache-*.h5"))
        assert len(caches) == 1

        # replay into a sibling output folder: same parent -> same cache.
        # --allow_random_slomo is dropped: if the replay path tried to
        # build SuperSloMo, the (missing) default checkpoint would raise.
        rc = run(tmp_path / "a", [
            "-i", small_video, "--slomo_use_saved",
            "--timestamp_resolution", "0.01",
            "--auto_timestamp_resolution", "false",
            "--batch_size", "4", "--dvs_emulator_seed", "3",
            "--output_folder", str(tmp_path / "a" / "out2"),
        ])
        assert rc == 0
        ev = lambda p: [
            l for l in (p / "ev.txt").read_text().splitlines()
            if not l.startswith("#")
        ]
        a = ev(tmp_path / "a" / "out")
        b = ev(tmp_path / "a" / "out2")
        assert len(a) > 20
        assert a == b

    def test_replay_sweeps_thresholds(self, tmp_path, small_video):
        """The sweep use case: replay runs with different emulator params
        produce different streams from the same cached interpolation."""
        def go(out, thres):
            # no --dvs_params preset: it would override the threshold sweep
            return main([
                "-i", small_video, "--slomo_use_saved",
                "--unique_output_folder", "false", "--overwrite",
                "--skip_video_output", "--no_shuffle",
                "--dvs_text", "ev.txt",
                "--timestamp_resolution", "0.01",
                "--auto_timestamp_resolution", "false",
                "--batch_size", "4", "--dvs_emulator_seed", "3",
                "--allow_random_slomo",
                "--pos_thres", thres, "--neg_thres", thres,
                "--sigma_thres", "0.0", "--cutoff_hz", "0",
                "--leak_rate_hz", "0", "--shot_noise_rate_hz", "0",
                "--output_folder", str(tmp_path / "s" / out),
            ])
        assert go("lo", "0.1") == 0
        assert go("hi", "0.4") == 0
        n = lambda p: len(np.loadtxt(tmp_path / "s" / p / "ev.txt", comments="#"))
        assert n("lo") > n("hi")  # lower threshold -> more events

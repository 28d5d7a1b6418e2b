"""End-to-end CLI tests: the minimum conversion slice (BASELINE config #1)."""
import os

import numpy as np
import pytest

from v2e_tpu.cli import main
from v2e_tpu.io.aedat4 import read_aedat4


def run_cli(tmp_path, extra):
    argv = [
        "--output_folder", str(tmp_path / "out"),
        "--unique_output_folder", "false",
        "--overwrite",
        "--dvs_exposure", "duration", "0.005",
        "--no_shuffle",
    ] + extra
    return main(argv)


class TestSyntheticCLI:
    def test_moving_dot_aedat(self, tmp_path):
        rc = run_cli(tmp_path, [
            "--synthetic_input", "scripts.moving_dot",
            "--disable_slomo",
            "--dvs_aedat2", "v2e.aedat",
            "--dvs_text", "v2e.txt",
            "--output_width", "240", "--output_height", "180",
            "--dvs_params", "clean",
            "--dvs_emulator_seed", "7",
            "--cycles", "0.02",
            "--skip_video_output",
        ])
        assert rc == 0
        out = tmp_path / "out"
        assert (out / "v2e.aedat").exists()
        assert (out / "v2e-args.txt").exists()
        ev = np.loadtxt(out / "v2e.txt", comments="#")
        assert ev.shape[0] > 100  # the dots make events
        assert np.all(np.diff(ev[:, 0]) >= 0)  # monotonic time
        assert set(np.unique(ev[:, 3])) <= {0.0, 1.0}

    def test_device_generator_path_matches_host(self, tmp_path, monkeypatch):
        """The CLI's device-rendered synthetic path (cli.py auto-selects it
        when the generator has `device_frames`) yields the same events as
        the host next_frame loop."""
        args = [
            "--synthetic_input", "v2e_tpu.synthetic.moving_dot",
            "--disable_slomo",
            "--dvs_text", "v2e.txt",
            "--output_width", "96", "--output_height", "80",
            "--dvs_params", "clean",
            "--dvs_emulator_seed", "7",
            "--cycles", "0.02",
            "--radius", "30",
            "--skip_video_output",
        ]
        assert run_cli(tmp_path / "dev", args) == 0
        from v2e_tpu.synthetic.moving_dot import moving_dot

        monkeypatch.delattr(moving_dot, "device_frames")
        assert run_cli(tmp_path / "host", args) == 0
        def events(p):  # header carries a creation timestamp
            return [l for l in p.read_text().splitlines()
                    if not l.startswith("#")]

        dev = events(tmp_path / "dev" / "out" / "v2e.txt")
        host = events(tmp_path / "host" / "out" / "v2e.txt")
        assert len(dev) > 100
        assert dev == host

    def test_gradients_h5(self, tmp_path):
        rc = run_cli(tmp_path, [
            "--synthetic_input", "v2e_tpu.synthetic.gradients",
            "--disable_slomo",
            "--dvs_h5", "events.h5",
            "--output_width", "64", "--output_height", "48",
            "--dvs_params", "clean",
            "--total_time", "0.01",
            "--skip_video_output",
        ])
        assert rc == 0
        import h5py

        with h5py.File(tmp_path / "out" / "events.h5", "r") as f:
            assert f["events"].shape[0] > 0

    def test_video_file_input(self, tmp_path):
        import cv2

        # build a tiny test video: a bright bar sweeping right
        vid = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"XVID"), 30, (64, 48))
        for i in range(12):
            fr = np.full((48, 64, 3), 60, np.uint8)
            fr[:, 4 * i : 4 * i + 8] = 200
            w.write(fr)
        w.release()

        rc = run_cli(tmp_path, [
            "-i", vid,
            "--disable_slomo",
            "--dvs_aedat4", "v2e.aedat4",
            "--dvs_params", "clean",
            "--skip_video_output",
        ])
        assert rc == 0
        ev = read_aedat4(str(tmp_path / "out" / "v2e.aedat4"))
        assert ev.shape[0] > 0
        # bar sweep makes both ON (leading edge) and OFF (trailing edge)
        assert (ev[:, 3] == 1).any() and (ev[:, 3] == -1).any()

    def test_dvs_camera_preset(self, tmp_path):
        rc = run_cli(tmp_path, [
            "--synthetic_input", "v2e_tpu.synthetic.spots",
            "--disable_slomo",
            "--dvs128",
            "--dvs_params", "clean",
            "--total_time", "0.005",
            "--dvs_text", "ev.txt",
            "--skip_video_output",
        ])
        assert rc == 0
        ev = np.loadtxt(tmp_path / "out" / "ev.txt", comments="#")
        assert ev[:, 1].max() < 128 and ev[:, 2].max() < 128


class TestSyntheticGenerators:
    @pytest.mark.parametrize("name", [
        "moving_dot", "particles", "gradients", "spots", "barberpole",
        "single_linearly_moving_dot",
    ])
    def test_generator_produces_frames(self, name):
        from v2e_tpu.synthetic import load_synthetic_input

        cls = load_synthetic_input(f"v2e_tpu.synthetic.{name}")
        kw = {}
        syn = cls(width=64, height=48, avi_path=None, preview=False,
                  arg_list=(["--cycles", "0.01"] if name == "moving_dot" else []),
                  parent_args=None)
        frame, t = syn.next_frame()
        assert frame is not None
        assert frame.shape == (48, 64)
        assert syn.total_frames() > 0
        frame2, t2 = syn.next_frame()
        assert t2 > t

    def test_reference_style_module_path(self):
        from v2e_tpu.synthetic import load_synthetic_input

        cls = load_synthetic_input("scripts.moving_dot")
        assert cls.__name__ == "moving_dot"

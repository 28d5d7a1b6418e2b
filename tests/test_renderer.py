"""Event-frame renderer tests: the four exposure modes + histogramming."""
import numpy as np
import pytest

from v2e_tpu.render import EventRenderer, ExposureMode
from v2e_tpu.render.renderer import accumulate_histogram


def uniform_events(n, t0, t1, h, w, seed=0, pol=1):
    rng = np.random.default_rng(seed)
    ev = np.empty((n, 4))
    ev[:, 0] = np.sort(rng.uniform(t0, t1, n))
    ev[:, 1] = rng.integers(0, w, n)
    ev[:, 2] = rng.integers(0, h, n)
    ev[:, 3] = pol
    return ev


class TestHistogram:
    def test_on_off_accumulation(self):
        frame = np.zeros((4, 6), np.float32)
        ev = np.array([
            [0.0, 1, 2, 1],
            [0.0, 1, 2, 1],
            [0.0, 3, 0, -1],
        ], np.float64)
        accumulate_histogram(frame, ev, full_scale=3)
        assert frame[2, 1] == 2
        assert frame[0, 3] == -1

    def test_clipping(self):
        frame = np.zeros((2, 2), np.float32)
        ev = np.tile([0.0, 0, 0, 1], (10, 1)).astype(np.float64)
        accumulate_histogram(frame, ev, full_scale=3)
        assert frame[0, 0] == 3

    def test_out_of_bounds_ignored(self):
        frame = np.zeros((2, 2), np.float32)
        ev = np.array([[0.0, 5, 5, 1]], np.float64)
        accumulate_histogram(frame, ev, full_scale=3)
        assert frame.sum() == 0


class TestExposureModes:
    def test_duration_mode_frame_count(self, tmp_path):
        r = EventRenderer(
            output_path=str(tmp_path), dvs_vid="dvs.avi",
            exposure_mode=ExposureMode.DURATION, exposure_value=0.01,
        )
        ev = uniform_events(5000, 0.0, 0.1, 32, 48)
        frames = r.render_events_to_frames(ev, 32, 48, return_frames=True)
        # ~0.1s at 10ms exposure -> ~9 completed frames (last partial held)
        assert frames is not None and 8 <= frames.shape[0] <= 10
        assert frames.min() >= 0 and frames.max() <= 1
        r.cleanup()
        assert (tmp_path / "dvs.avi").exists()
        times = np.loadtxt(tmp_path / "dvs-frame_times.txt", comments="#")
        assert times.shape[0] == r.numFramesWritten

    def test_count_mode(self, tmp_path):
        r = EventRenderer(
            output_path=None, dvs_vid=None,
            exposure_mode=ExposureMode.COUNT, exposure_value=1000,
        )
        ev = uniform_events(5050, 0.0, 0.1, 32, 48)
        frames = r.render_events_to_frames(ev, 32, 48, return_frames=True)
        assert frames.shape[0] == 5  # 5 full frames of 1000 events

    def test_source_mode(self):
        r = EventRenderer(
            output_path=None, dvs_vid=None,
            exposure_mode=ExposureMode.SOURCE,
        )
        ev = uniform_events(500, 0.0, 0.01, 16, 16)
        frames = r.render_events_to_frames(ev, 16, 16, return_frames=True)
        assert frames.shape[0] == 1  # one frame per packet

    def test_area_count_mode(self):
        r = EventRenderer(
            output_path=None, dvs_vid=None,
            exposure_mode=ExposureMode.AREA_COUNT, exposure_value=50,
            area_dimension=8,
        )
        # all events in one 8x8 area: a frame completes every 50 events
        ev = uniform_events(520, 0.0, 0.1, 8, 8)
        frames = r.render_events_to_frames(ev, 32, 48, return_frames=True)
        assert frames is not None and 9 <= frames.shape[0] <= 11

    def test_polarity_rendering(self):
        r = EventRenderer(
            output_path=None, dvs_vid=None, full_scale_count=2,
            exposure_mode=ExposureMode.SOURCE,
        )
        ev = np.array([
            [0.0, 1, 1, 1], [0.0, 1, 1, 1],  # saturated ON
            [0.0, 3, 3, -1], [0.0, 3, 3, -1],  # saturated OFF
            [0.001, 5, 5, 1],
        ], np.float64)
        frames = r.render_events_to_frames(ev, 8, 8, return_frames=True)
        img = frames[0]
        assert img[1, 1] == 1.0  # +full_scale -> white
        assert img[3, 3] == 0.0  # -full_scale -> black
        assert img[0, 0] == 0.5  # background mid-gray

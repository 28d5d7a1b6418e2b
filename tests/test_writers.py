"""Event sink round-trip / byte-format tests."""
import struct

import numpy as np
import pytest

from v2e_tpu.io import AEDat2Output, AEDat4Output, DVSH5Output, DVSTextOutput
from v2e_tpu.io.aedat4 import read_aedat4


@pytest.fixture
def events():
    # [t, x, y, p]
    return np.array(
        [
            [0.001, 10, 20, 1],
            [0.002, 100, 200, -1],
            [0.003, 345, 259, 1],
            [0.004, 0, 0, -1],
        ],
        dtype=np.float64,
    )


def parse_aedat2(path):
    """Independent AEDAT-2.0 parser for validation."""
    with open(path, "rb") as f:
        data = f.read()
    # skip header lines starting with '#'
    pos = 0
    while data[pos : pos + 1] == b"#":
        pos = data.index(b"\n", pos) + 1
    body = data[pos:]
    n = len(body) // 8
    vals = struct.unpack(f">{2*n}i", body[: 8 * n])
    addr = np.array(vals[0::2])
    ts = np.array(vals[1::2])
    return addr, ts


class TestAEDat2:
    def test_round_trip_346(self, tmp_path, events):
        path = str(tmp_path / "test.aedat")
        w = AEDat2Output(path, 346, 260)
        w.appendEvents(events)
        w.close()
        addr, ts = parse_aedat2(path)
        assert len(addr) == 4
        np.testing.assert_array_equal(ts, (events[:, 0] * 1e6).astype(int))
        x = (addr >> 12) & 0x3FF
        y = (addr >> 22) & 0x1FF
        p = (addr >> 11) & 1
        # flipped coordinates
        np.testing.assert_array_equal(x, 345 - events[:, 1])
        np.testing.assert_array_equal(y, 259 - events[:, 2])
        np.testing.assert_array_equal(p, (events[:, 3] + 1) / 2)

    def test_noise_labeling(self, tmp_path, events):
        path = str(tmp_path / "test.aedat")
        w = AEDat2Output(path, 346, 260, label_signal_noise=True)
        labels = np.array([True, False, True, False])
        w.appendEvents(events, signnoise_label=labels)
        w.close()
        addr, _ = parse_aedat2(path)
        special = (addr >> 10) & 1
        np.testing.assert_array_equal(special, [0, 1, 0, 1])

    def test_counts(self, tmp_path, events):
        path = str(tmp_path / "t.aedat")
        w = AEDat2Output(path, 240, 180)
        small = events.copy()
        small[:, 1] %= 240
        small[:, 2] %= 180
        w.appendEvents(small)
        assert w.numEventsWritten == 4
        assert w.numOnEvents == 2
        assert w.numOffEvents == 2
        w.close()

    def test_unsupported_size_raises(self, tmp_path):
        with pytest.raises(ValueError):
            AEDat2Output(str(tmp_path / "t.aedat"), 100, 100)


class TestText:
    def test_round_trip(self, tmp_path, events):
        path = str(tmp_path / "test.txt")
        w = DVSTextOutput(path)
        w.appendEvents(events)
        w.close()
        got = np.loadtxt(path, comments="#")
        np.testing.assert_allclose(got[:, 0], events[:, 0])
        np.testing.assert_array_equal(got[:, 1], events[:, 1])
        np.testing.assert_array_equal(got[:, 2], events[:, 2])
        np.testing.assert_array_equal(got[:, 3], (events[:, 3] + 1) / 2)

    def test_label_column(self, tmp_path, events):
        path = str(tmp_path / "test.txt")
        w = DVSTextOutput(path, label_signal_noise=True)
        w.appendEvents(events, signnoise_label=np.array([1, 0, 1, 0], bool))
        w.close()
        got = np.loadtxt(path, comments="#")
        assert got.shape[1] == 5
        np.testing.assert_array_equal(got[:, 4], [1, 0, 1, 0])


class TestH5:
    def test_round_trip(self, tmp_path, events):
        import h5py

        path = str(tmp_path / "test.h5")
        w = DVSH5Output(path)
        w.appendEvents(events)
        w.close()
        with h5py.File(path, "r") as f:
            ev = f["events"][:]
        np.testing.assert_array_equal(ev[:, 0], (events[:, 0] * 1e6).astype(np.uint32))
        np.testing.assert_array_equal(ev[:, 1], events[:, 1])
        np.testing.assert_array_equal(ev[:, 3], [1, 0, 1, 0])

    def test_ddd_frame_storage(self, tmp_path, events):
        import h5py

        path = str(tmp_path / "ddd.h5")
        w = DVSH5Output(path)
        w.prepare_frame_storage(2, [0.0, 0.01], 4, 4)
        w.appendFrame(np.ones((4, 4)) * 7)
        w.appendEvents(events)
        w.appendFrame(np.ones((4, 4)) * 9)
        w.close()
        with h5py.File(path, "r") as f:
            assert f["frame"].shape == (2, 4, 4)
            assert f["frame"][0, 0, 0] == 7
            np.testing.assert_array_equal(f["frame_ts"][:], [0, 10000])
            # second frame was appended after the 4 events
            np.testing.assert_array_equal(f["frame_idx"][:], [0, 4])


class TestAEDat4:
    def test_round_trip_none(self, tmp_path, events):
        path = str(tmp_path / "test.aedat4")
        w = AEDat4Output(path, 640, 480)
        w.appendEvents(events[:2])
        w.appendEvents(events[2:])
        w.close()
        got = read_aedat4(path)
        np.testing.assert_allclose(got[:, 0], events[:, 0], atol=1e-6)
        np.testing.assert_array_equal(got[:, 1:], events[:, 1:])

    def test_round_trip_zstd(self, tmp_path, events):
        path = str(tmp_path / "test.aedat4")
        w = AEDat4Output(path, 640, 480, compression="zstd")
        w.appendEvents(events)
        w.close()
        got = read_aedat4(path)
        np.testing.assert_allclose(got[:, 0], events[:, 0], atol=1e-6)
        np.testing.assert_array_equal(got[:, 1:], events[:, 1:])

    def test_header_magic(self, tmp_path, events):
        path = str(tmp_path / "test.aedat4")
        w = AEDat4Output(path)
        w.appendEvents(events)
        w.close()
        with open(path, "rb") as f:
            assert f.readline() == b"#!AER-DAT4.0\r\n"
            hdr_size = struct.unpack("<I", f.read(4))[0]
            hdr = f.read(hdr_size)
            assert b"IOHE" == hdr[4:8]
            assert b"sizeX" in hdr


class TestDDDOutputSemantics:
    def test_frame_ts_and_idx_through_emulator(self, tmp_path):
        """DDD output: frame_ts in us and frame_idx = cumulative events
        including each frame's events (reference emulator.py:979-983)."""
        import math

        import h5py

        from v2e_tpu.emulator import EventEmulator

        em = EventEmulator(
            sigma_thres=0.0, leak_rate_hz=0.0, cutoff_hz=0.0, seed=1,
            output_folder=str(tmp_path), dvs_h5="ddd.h5",
            output_width=8, output_height=8,
            shuffle_events_within_iteration=False,
        )
        em.prepare_storage(None, None)
        vals = [100, 100 * math.exp(0.25), 100 * math.exp(0.5), 100 * math.exp(0.5)]
        frames = np.stack([np.full((8, 8), v, np.float32) for v in vals])
        times = np.arange(4) * 0.01
        em.generate_events_batch(frames, times)
        em.cleanup()
        with h5py.File(tmp_path / "ddd.h5", "r") as f:
            np.testing.assert_array_equal(
                f["frame_ts"][:], (times * 1e6).astype(np.uint32)
            )
            # per frame: init, 1 ON/px (0.25/0.2), 1 ON/px, 0
            np.testing.assert_array_equal(f["frame_idx"][:], [0, 64, 128, 128])
            assert f["events"].shape[0] == 128
            assert f["frame"].shape == (4, 8, 8)

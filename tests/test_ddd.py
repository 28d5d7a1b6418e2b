"""DDD20 reader/codec tests against a synthetically constructed recording."""
import struct

import numpy as np
import pytest

from v2e_tpu.io.ddd import (
    DDD20SimpleReader,
    DVS_SHAPE,
    unpack_events,
    unpack_frame,
    unpack_header,
)

H, W = DVS_SHAPE


def caer_header(etype: int, esize: int, ecapacity: int) -> bytes:
    # fields: etype, esource, esize, eoffset, eoverflow, ecapacity,
    # enumber, evalid
    return struct.pack("hhiiiiii", etype, 0, esize, 0, 0, ecapacity,
                       ecapacity, ecapacity)


def polarity_packet(events):
    """events: list of (ts_us, x, y, pol) in RAW sensor coords."""
    n = len(events)
    arr = np.zeros((n, 2), dtype=np.uint32)
    for i, (ts, x, y, p) in enumerate(events):
        arr[i, 0] = (x << 17) | (y << 2) | (p << 1)
        arr[i, 1] = ts
    return caer_header(1, 8, n), arr.tobytes()


def frame_packet(ts_us, img16):
    head = np.zeros(9, dtype=np.uint32)
    head[2] = ts_us
    return caer_header(2, 36 + img16.nbytes, 1), head.tobytes() + img16.tobytes()


@pytest.fixture
def ddd_file(tmp_path):
    import h5py

    path = str(tmp_path / "rec.hdf5")
    rows = []
    img = (np.ones((H, W), dtype=np.uint16) * (100 * 256))
    rows.append(frame_packet(1_000_000, img))
    rows.append(polarity_packet([(1_100_000, 10, 20, 1), (1_200_000, 30, 40, 0)]))
    img2 = (np.ones((H, W), dtype=np.uint16) * (160 * 256))
    rows.append(frame_packet(1_500_000, img2))
    rows.append(polarity_packet([(1_600_000, 5, 6, 1)]))

    with h5py.File(path, "w") as f:
        dt = h5py.special_dtype(vlen=np.dtype("uint8"))
        ds = f.create_dataset("dvs/data", shape=(len(rows), 3), dtype=dt)
        for i, (hdr, payload) in enumerate(rows):
            ds[i, 0] = np.frombuffer(struct.pack("<q", i), dtype=np.uint8)
            ds[i, 1] = np.frombuffer(hdr, dtype=np.uint8)
            ds[i, 2] = np.frombuffer(payload, dtype=np.uint8)
    return path


class TestCaerCodec:
    def test_header(self):
        h = unpack_header(caer_header(1, 8, 5))
        assert h["etype"] == "polarity_event"
        assert h["esize"] == 8
        assert h["ecapacity"] == 5

    def test_events_rotate(self):
        hdr, payload = polarity_packet([(42, 10, 20, 1)])
        p = unpack_header(hdr)
        p["dvs_data"] = payload
        p["etype"] = "polarity_event"
        ts, ev = unpack_events(p, rotate180=True)
        assert ts == pytest.approx(42e-6)
        assert ev[0, 1] == W - 10 - 1  # x rotated
        assert ev[0, 2] == H - 20 - 1  # y rotated
        assert ev[0, 3] == 1

    def test_frame(self):
        img = np.arange(H * W, dtype=np.uint16).reshape(H, W)
        hdr, payload = frame_packet(7_000_000, img)
        p = unpack_header(hdr)
        p["dvs_data"] = payload
        ts, out = unpack_frame(p, rotate180=False)
        assert ts == pytest.approx(7.0)
        np.testing.assert_array_equal(out, img)


class TestReader:
    def test_read_entire(self, ddd_file):
        r = DDD20SimpleReader(ddd_file, rotate180=False)
        assert r.numPackets == 4
        frames, events = r.readEntire()
        assert len(frames) == 2
        assert frames["frame"][0][0, 0] == 100  # 16->8 bit
        assert frames["frame"][1][0, 0] == 160
        # times rebased to 0
        assert frames["ts"][0] == 0.0
        assert frames["ts"][1] == pytest.approx(0.5)
        assert events.shape[0] == 3
        assert events[0, 0] == 0.0
        np.testing.assert_array_equal(events[:, 3], [1, -1, 1])
        r.close()

    def test_read_packet(self, ddd_file):
        r = DDD20SimpleReader(ddd_file, rotate180=False)
        p = r.readPacket(0)
        assert p["etype"] == "frame_event"
        p = r.readPacket(1)
        assert p["etype"] == "polarity_event"
        assert p["data"].shape == (2, 4)
        r.close()

    def test_feeds_emulator(self, ddd_file):
        """DDD APS frames drive the emulator (the ddd-v2e path)."""
        from v2e_tpu.emulator import EventEmulator

        r = DDD20SimpleReader(ddd_file, rotate180=False)
        frames, _ = r.readEntire()
        r.close()
        em = EventEmulator(sigma_thres=0.0, leak_rate_hz=0.0, cutoff_hz=0.0,
                           seed=1)
        ev = em.generate_events_batch(
            frames["frame"].astype(np.float32), frames["ts"].astype(np.float64)
        )
        # 100 -> 160 DN is ln(1.6)=0.47 -> 2 ON events/pixel at thres 0.2
        assert ev is not None
        assert ev.shape[0] == 2 * H * W


class TestDDDH5Writer:
    def test_packet_roundtrip(self, tmp_path):
        """Packets written by DDDH5Writer read back through
        DDD20SimpleReader (write -> read round trip, PARITY.md row 17)."""
        from v2e_tpu.io.ddd import DDDH5Writer

        path = str(tmp_path / "rec_rt.hdf5")
        w = DDDH5Writer(path)
        img = np.ones((H, W), dtype=np.uint16) * (100 * 256)
        w.append_packet(*frame_packet(1_000_000, img))
        w.append_packet(*polarity_packet(
            [(1_100_000, 10, 20, 1), (1_200_000, 30, 40, 0)]))
        img2 = np.ones((H, W), dtype=np.uint16) * (160 * 256)
        w.append_packet(*frame_packet(1_500_000, img2))
        w.append_packet(*polarity_packet([(1_600_000, 5, 6, 1)]))
        w.close()

        r = DDD20SimpleReader(path, rotate180=False)
        assert r.numPackets == 4
        frames, events = r.readEntire()
        r.close()
        assert len(frames) == 2
        assert frames["frame"][0][0, 0] == 100
        assert frames["frame"][1][0, 0] == 160
        assert frames["ts"][1] == pytest.approx(0.5)
        assert events.shape[0] == 3
        np.testing.assert_array_equal(events[:, 3], [1, -1, 1])
        np.testing.assert_array_equal(events[0, 1:3], [10, 20])

    def test_named_dataset_append(self, tmp_path):
        """The generic (ts, data) append API grows chunked datasets that
        read back in order (reference ddd20_utils/datasets.py behavior)."""
        import h5py

        from v2e_tpu.io.ddd import DDDH5Writer

        path = str(tmp_path / "rec_named.hdf5")
        w = DDDH5Writer(path)
        for i in range(300):  # > 2 chunks of 128
            w.append("imu", 0.01 * i, np.full((6,), i, dtype=np.float32))
        w.append("gps", 1.0, np.array([47.0, 8.0]))
        w.close()

        with h5py.File(path, "r") as f:
            imu = f["dvs"]["imu"][...]
            assert imu.shape[0] == 300
            np.testing.assert_allclose(imu["ts"], 0.01 * np.arange(300))
            np.testing.assert_array_equal(imu["data"][7], np.full((6,), 7))
            assert f["dvs"]["gps"].shape[0] == 1


class TestThresholdEstimator:
    def test_recovers_threshold(self):
        """Generate 'real' counts with a known threshold; the estimator must
        find a threshold reproducing those counts."""
        from v2e_tpu.analysis import estimate_thresholds
        from v2e_tpu.emulator import EventEmulator

        rng = np.random.default_rng(0)
        frames = np.clip(
            128 * np.exp(rng.normal(0, 0.2, (10, 32, 32))), 0, 255
        ).astype(np.float32)
        times = np.arange(10) * 0.01

        kw = dict(sigma_thres=0.0, leak_rate_hz=0.0, cutoff_hz=0.0,
                  shot_noise_rate_hz=0.0)
        em = EventEmulator(pos_thres=0.3, neg_thres=0.3, seed=42, **kw)
        em.generate_events_batch(frames, times)
        target_on, target_off = em.num_events_on, em.num_events_off

        pos, neg = estimate_thresholds(
            frames, times, target_on, target_off, rel_tol=0.03, **kw
        )
        assert abs(pos - 0.3) < 0.1
        assert abs(neg - 0.3) < 0.1


class TestStreamingReader:
    def test_stream_matches_sequential(self, ddd_file):
        from v2e_tpu.io.ddd import DDD20StreamingReader

        stream = DDD20StreamingReader(ddd_file, rotate180=False)
        types = [p["etype"] for p in stream]
        stream.close()
        assert types == ["frame_event", "polarity_event", "frame_event",
                         "polarity_event"]

    def test_stream_early_close(self, ddd_file):
        from v2e_tpu.io.ddd import DDD20StreamingReader

        stream = DDD20StreamingReader(ddd_file, rotate180=False)
        it = iter(stream)
        next(it)
        stream.close()  # must not hang


class TestDDDTools:
    def test_ddd_v2e_tool(self, ddd_file, tmp_path):
        """End-to-end real-vs-synthetic comparison tool on a tiny recording."""
        from dataset_tools.ddd_v2e import main

        out = str(tmp_path / "out")
        rc = main([
            "-i", ddd_file, "-o", out, "--disable_slomo",
            "--rotate180", "false", "--numpy_output",
            "--cutoff_hz", "0", "--leak_rate_hz", "0",
            "--shot_noise_rate_hz", "0", "--sigma_thres", "0",
        ])
        assert rc == 0
        import os

        for f in ("ddd-real.aedat", "ddd-v2e.aedat", "dvs-video-real.avi",
                  "dvs-video-fake.avi", "events-real.npy", "events-v2e.npy"):
            assert os.path.exists(os.path.join(out, f)), f
        real = np.load(os.path.join(out, "events-real.npy"))
        syn = np.load(os.path.join(out, "events-v2e.npy"))
        assert real.shape[0] == 3
        # 100->160 step at thres 0.2: 2 ON events/pixel
        assert syn.shape[0] == 2 * H * W

    def test_ddd_extract_tool(self, ddd_file, tmp_path):
        from dataset_tools.ddd_extract_data import main

        out = str(tmp_path / "out")
        rc = main(["-i", ddd_file, "-o", out, "--rotate180", "false"])
        assert rc == 0
        import os

        assert os.path.exists(os.path.join(out, "aps.avi"))
        assert os.path.exists(os.path.join(out, "dvs.aedat"))

    def test_ddd_plot_tool(self, tmp_path):
        from dataset_tools.ddd_plot_event_counts import main

        rng = np.random.default_rng(0)
        def mk(n):
            ev = np.empty((n, 4))
            ev[:, 0] = np.sort(rng.uniform(0, 1, n))
            ev[:, 1] = rng.integers(0, 346, n)
            ev[:, 2] = rng.integers(0, 260, n)
            ev[:, 3] = rng.choice([-1, 1], n)
            return ev
        np.save(tmp_path / "real.npy", mk(500))
        np.save(tmp_path / "v2e.npy", mk(480))
        out = str(tmp_path / "counts.png")
        rc = main(["--real", str(tmp_path / "real.npy"),
                   "--v2e", str(tmp_path / "v2e.npy"),
                   "--roi_x", "50", "300", "--roi_y", "50", "200",
                   "-o", out])
        assert rc == 0
        import os
        assert os.path.getsize(out) > 1000

    def test_ddd_find_thresholds_tool(self, tmp_path, capsys):
        """The calibration CLI must recover a known threshold: 'real' DVS
        counts are generated by our own emulator at thres 0.3 and embedded
        in a synthetic DDD recording (reference
        dataset_scripts/ddd/ddd_find_thresholds.py)."""
        import h5py

        from v2e_tpu.emulator import EventEmulator
        from v2e_tpu.io.ddd import DDD20SimpleReader

        rng = np.random.default_rng(3)
        F = 6
        times_us = (1_000_000 + np.arange(F) * 33_000).astype(np.int64)
        vals = np.clip(
            128 * np.exp(np.cumsum(rng.normal(0, 0.12, (F, H, W)), axis=0)),
            1, 255,
        ).astype(np.uint8)

        path = str(tmp_path / "rec.hdf5")
        rows = [frame_packet(int(t), v.astype(np.uint16) * 256)
                for t, v in zip(times_us, vals)]
        # placeholder polarity packet; real counts appended after measuring
        with h5py.File(path, "w") as f:
            dt = h5py.special_dtype(vlen=np.dtype("uint8"))
            # reserve one extra row for the events packet
            ds = f.create_dataset("dvs/data", shape=(len(rows) + 1, 3), dtype=dt)
            for i, (hdr, payload) in enumerate(rows):
                ds[i, 0] = np.frombuffer(struct.pack("<q", i), dtype=np.uint8)
                ds[i, 1] = np.frombuffer(hdr, dtype=np.uint8)
                ds[i, 2] = np.frombuffer(payload, dtype=np.uint8)
            # measure the emulator at the true threshold on the frames as
            # the reader will decode them
            em = EventEmulator(pos_thres=0.3, neg_thres=0.3, sigma_thres=0.0,
                               leak_rate_hz=0.0, cutoff_hz=0.0,
                               shot_noise_rate_hz=0.0, seed=42)
            em.generate_events_batch(
                vals.astype(np.float32), times_us.astype(np.float64) / 1e6
            )
            n_on, n_off = int(em.num_events_on), int(em.num_events_off)
            assert n_on > 100 and n_off > 100
            evs = [(1_010_000 + k, 10 + (k % 300), 20 + (k % 200), 1)
                   for k in range(n_on)]
            evs += [(1_020_000 + k, 11 + (k % 300), 21 + (k % 200), 0)
                    for k in range(n_off)]
            hdr, payload = polarity_packet(evs)
            i = len(rows)
            ds[i, 0] = np.frombuffer(struct.pack("<q", i), dtype=np.uint8)
            ds[i, 1] = np.frombuffer(hdr, dtype=np.uint8)
            ds[i, 2] = np.frombuffer(payload, dtype=np.uint8)

        from dataset_tools.ddd_find_thresholds import main

        rc = main([
            "-i", path, "--rotate180", "false", "--max_iter", "7",
            "--cutoff_hz", "0", "--leak_rate_hz", "0",
            "--shot_noise_rate_hz", "0", "--sigma_thres", "0",
        ])
        assert rc == 0
        line = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("pos_thres=")][0]
        pos = float(line.split()[0].split("=")[1])
        neg = float(line.split()[1].split("=")[1])
        assert abs(pos - 0.3) < 0.1
        assert abs(neg - 0.3) < 0.1


class TestBatchConvert:
    def test_two_video_tree(self, tmp_path):
        """batch_convert walks a directory tree and mirrors it in the output
        (reference dataset_scripts/ucf101/produce_dvs_dataset.py flow)."""
        import cv2

        rng = np.random.default_rng(0)
        for sub, name in (("classA", "v1"), ("classB", "v2")):
            d = tmp_path / "in" / sub
            d.mkdir(parents=True, exist_ok=True)
            vw = cv2.VideoWriter(
                str(d / f"{name}.avi"), cv2.VideoWriter_fourcc(*"XVID"),
                30, (48, 36), False,
            )
            base = rng.integers(50, 200, (36, 48), dtype=np.uint8)
            for i in range(8):
                fr = np.roll(base, i * 2, axis=1)
                vw.write(fr)
            vw.release()

        from dataset_tools.batch_convert import main

        rc = main([
            "-i", str(tmp_path / "in"), "-o", str(tmp_path / "out"),
            "--disable_slomo", "--dvs_h5", "events.h5",
            "--output_width", "48", "--output_height", "36",
            "--dvs_params", "clean",
        ])
        assert rc == 0
        import h5py

        for sub, name in (("classA", "v1"), ("classB", "v2")):
            h5 = tmp_path / "out" / sub / name / "events.h5"
            assert h5.exists()
            with h5py.File(h5, "r") as f:
                assert f["events"].shape[0] > 0

"""AEDAT-4 external validation against the generic flatbuffers runtime.

The writer (v2e_tpu/io/aedat4.py) lays its two flatbuffer tables out by
hand; the reference writes via the dv-processing C++ library
(/root/reference/v2ecore/output/aedat4_output.py:35-42), which is not
installable here.  Instead this file validates both directions against the
*independent* flatbuffers runtime:

  * a golden file is CONSTRUCTED with flatbuffers.Builder (canonical
    vtable/offset layout, not ours) and our reader must parse it;
  * our writer's bytes are DECODED with flatbuffers.table.Table vtable
    accessors (runtime code, not ours) field by field.

Plus FileDataTable round-trip: entries must index the real packet
positions/sizes/timestamps.
"""
import struct

import numpy as np
import pytest

flatbuffers = pytest.importorskip("flatbuffers")

from v2e_tpu.io.aedat4 import (
    AEDat4Output,
    read_aedat4,
    read_aedat4_data_table,
)


def _events(n, seed=0, t0=0.001):
    rng = np.random.default_rng(seed)
    ev = np.empty((n, 4))
    ev[:, 0] = t0 + np.sort(rng.uniform(0, 0.5, n))
    ev[:, 1] = rng.integers(0, 346, n)
    ev[:, 2] = rng.integers(0, 260, n)
    ev[:, 3] = rng.choice([-1.0, 1.0], n)
    return ev


def _build_golden_with_runtime(path, ev, compression=0, data_table_pos=-1):
    """Write an AEDAT-4 file using flatbuffers.Builder for both tables."""
    # ---- EventPacket: table { elements: [Event struct] } ----
    b = flatbuffers.Builder(1024)
    n = ev.shape[0]
    b.StartVector(16, n, 8)
    for row in reversed(ev):
        t_us = int(round(row[0] * 1e6))
        b.Prep(8, 16)
        b.Pad(3)
        b.PrependInt8(1 if row[3] > 0 else 0)
        b.PrependInt16(int(row[2]))
        b.PrependInt16(int(row[1]))
        b.PrependInt64(t_us)
    vec = b.EndVector()
    b.StartObject(1)
    b.PrependUOffsetTRelativeSlot(0, vec, 0)
    root = b.EndObject()
    b.FinishSizePrefixed(root, b"EVTS")
    packet = bytes(b.Output())

    # ---- IOHeader: table { compression:int32; dataTablePosition:int64;
    #                        infoNode:string } ----
    b2 = flatbuffers.Builder(1024)
    info = b2.CreateString(
        '<dv version="2.0"><node name="outInfo" path="/mainloop/outInfo/">'
        "</node></dv>"
    )
    b2.StartObject(3)
    b2.PrependUOffsetTRelativeSlot(2, info, 0)
    b2.PrependInt64Slot(1, data_table_pos, -1)
    b2.PrependInt32Slot(0, compression, 0)
    hdr_root = b2.EndObject()
    b2.FinishSizePrefixed(hdr_root, b"IOHE")
    header = bytes(b2.Output())

    with open(path, "wb") as f:
        f.write(b"#!AER-DAT4.0\r\n")
        f.write(header)
        f.write(struct.pack("<ii", 0, len(packet)))
        f.write(packet)


class TestReaderOnRuntimeBuiltFile:
    def test_reads_runtime_built_golden(self, tmp_path):
        ev = _events(257)
        path = str(tmp_path / "golden.aedat4")
        _build_golden_with_runtime(path, ev)
        got = read_aedat4(path)
        assert got.shape == ev.shape
        np.testing.assert_allclose(got[:, 0], np.round(ev[:, 0] * 1e6) / 1e6,
                                   atol=1e-9)
        np.testing.assert_array_equal(got[:, 1:3], ev[:, 1:3])
        np.testing.assert_array_equal(got[:, 3], ev[:, 3])

    def test_empty_golden(self, tmp_path):
        path = str(tmp_path / "empty.aedat4")
        _build_golden_with_runtime(path, _events(0).reshape(0, 4))
        assert read_aedat4(path).shape == (0, 4)


class TestWriterBytesAgainstRuntime:
    def _decode_packet_with_runtime(self, body):
        """Decode a size-prefixed EventPacket using flatbuffers.table.Table."""
        import flatbuffers.number_types as N
        from flatbuffers.table import Table

        (root_rel,) = struct.unpack_from("<I", body, 4)
        t = Table(bytearray(body), 4 + root_rel)
        # field 0 lives at vtable slot 4
        o = t.Offset(4)
        assert o != 0, "elements vector missing"
        n = t.VectorLen(4)
        a = t.Vector(4)
        out = np.empty((n, 4))
        for i in range(n):
            base = a + 16 * i
            t_us = t.Get(N.Int64Flags, base)
            x = t.Get(N.Int16Flags, base + 8)
            y = t.Get(N.Int16Flags, base + 10)
            p = t.Get(N.Int8Flags, base + 12)
            out[i] = (t_us * 1e-6, x, y, 1.0 if p else -1.0)
        return out

    def test_writer_packets_decode_with_runtime(self, tmp_path):
        from flatbuffers.table import Table
        import flatbuffers.number_types as N

        ev = _events(123, seed=3)
        path = str(tmp_path / "ours.aedat4")
        w = AEDat4Output(path, 346, 260)
        w.appendEvents(ev[:60])
        w.appendEvents(ev[60:])
        w.close()

        with open(path, "rb") as f:
            assert f.readline().startswith(b"#!AER-DAT4.0")
            (hdr_size,) = struct.unpack("<I", f.read(4))
            hdr = f.read(hdr_size)
            # decode IOHeader with the runtime
            (root_rel,) = struct.unpack_from("<I", hdr, 0)
            t = Table(bytearray(hdr), root_rel)
            comp = t.Get(N.Int32Flags, t.Offset(4) + t.Pos) if t.Offset(4) else 0
            dtp_off = t.Offset(6)
            assert dtp_off != 0
            dtp = t.Get(N.Int64Flags, dtp_off + t.Pos)
            info_off = t.Offset(8)
            assert info_off != 0
            info = t.String(info_off + t.Pos).decode()
            assert comp == 0
            assert dtp > 0  # data table written by default
            assert "sizeX" in info and "346" in info

            packets = []
            while f.tell() < dtp:
                sid, size = struct.unpack("<ii", f.read(8))
                assert sid == 0
                packets.append(self._decode_packet_with_runtime(f.read(size)))
        got = np.concatenate(packets)
        # reference semantics truncate to whole microseconds
        # (aedat4_output.py:82)
        np.testing.assert_allclose(
            got[:, 0], (ev[:, 0] * 1e6).astype(np.int64) / 1e6, atol=1e-9
        )
        np.testing.assert_array_equal(got[:, 1:], ev[:, 1:])


class TestFileDataTable:
    def test_data_table_indexes_packets(self, tmp_path):
        ev = _events(100, seed=5)
        path = str(tmp_path / "dt.aedat4")
        w = AEDat4Output(path, 346, 260)
        w.appendEvents(ev[:30])
        w.appendEvents(ev[30:])
        w.close()

        table = read_aedat4_data_table(path)
        assert table is not None and len(table) == 2
        assert table[0]["num_elements"] == 30
        assert table[1]["num_elements"] == 70
        # entries index real packets: seek to each offset and re-read
        with open(path, "rb") as f:
            for entry in table:
                f.seek(entry["byte_offset"])
                sid, size = struct.unpack("<ii", f.read(8))
                assert sid == entry["stream_id"] == 0
                assert size == entry["size"]
                body = f.read(size)
                (root_rel,) = struct.unpack_from("<I", body, 4)
                assert body[8:12] == b"EVTS"
        # timestamps (us) must match the event stream boundaries
        assert table[0]["timestamp_start"] == int(ev[0, 0] * 1e6)
        assert table[1]["timestamp_end"] == int(ev[-1, 0] * 1e6)
        # events still read back identically with the table present
        got = read_aedat4(path)
        np.testing.assert_array_equal(got[:, 1:], ev[:, 1:])

    def test_data_table_optional(self, tmp_path):
        path = str(tmp_path / "nodt.aedat4")
        w = AEDat4Output(path, 346, 260, data_table=False)
        w.appendEvents(_events(10))
        w.close()
        assert read_aedat4_data_table(path) is None
        assert read_aedat4(path).shape[0] == 10

    def test_data_table_zstd(self, tmp_path):
        pytest.importorskip("zstandard")
        ev = _events(50, seed=7)
        path = str(tmp_path / "z.aedat4")
        w = AEDat4Output(path, 346, 260, compression="zstd")
        w.appendEvents(ev)
        w.close()
        table = read_aedat4_data_table(path)
        assert table is not None and table[0]["num_elements"] == 50
        got = read_aedat4(path)
        np.testing.assert_array_equal(got[:, 1:], ev[:, 1:])

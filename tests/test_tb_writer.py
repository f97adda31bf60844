"""TensorBoard event writer: wire format, CRCs, round-trip."""

import glob
import struct

from mydetection_tpu.utils import tb_writer as tb


def test_crc32c_rfc3720_vector():
    # the external anchor: RFC 3720 B.4 test vector for CRC32C
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(b"") == 0


def test_varint_encoding():
    assert tb._varint(0) == b"\x00"
    assert tb._varint(1) == b"\x01"
    assert tb._varint(127) == b"\x7f"
    assert tb._varint(128) == b"\x80\x01"
    assert tb._varint(300) == b"\xac\x02"


def test_round_trip_scalars(tmp_path):
    with tb.TBWriter(str(tmp_path)) as w:
        w.add_scalar("loss/total", 3.25, step=10)
        w.add_scalars({"lr": 0.001, "loss/obj": 1.5}, step=20)
        path = w.path
    rows = tb.read_scalars(path)
    assert (10, "loss/total", 3.25) in rows
    by_tag = {(s, t): v for s, t, v in rows}
    assert abs(by_tag[(20, "lr")] - 0.001) < 1e-9
    assert by_tag[(20, "loss/obj")] == 1.5
    assert glob.glob(str(tmp_path / "events.out.tfevents.*"))


def test_file_version_header_and_framing(tmp_path):
    w = tb.TBWriter(str(tmp_path))
    w.add_scalar("a", 1.0, step=1)
    w.close()
    with open(w.path, "rb") as fh:
        data = fh.read()
    # first record: Event{wall_time, file_version="brain.Event:2"}
    (ln,) = struct.unpack_from("<Q", data, 0)
    payload = data[12:12 + ln]
    assert b"brain.Event:2" in payload
    # framing CRCs verified by the reader on the whole file
    assert tb.read_scalars(w.path) == [(1, "a", 1.0)]


def test_corruption_detected(tmp_path):
    w = tb.TBWriter(str(tmp_path))
    w.add_scalar("a", 1.0, step=1)
    w.close()
    data = bytearray(open(w.path, "rb").read())
    data[-6] ^= 0xFF  # flip a payload byte of the last record
    open(w.path, "wb").write(bytes(data))
    try:
        tb.read_scalars(w.path)
        raise AssertionError("corruption not detected")
    except ValueError as e:
        assert "crc" in str(e)


def test_varint_negative_terminates_as_twos_complement():
    """Negative ints encode as their unsigned two's complement (proto
    int64 semantics) instead of looping forever on Python's arithmetic
    right-shift."""
    enc = tb._varint(-1)
    assert enc == b"\xff" * 9 + b"\x01"  # 64 one-bits -> 10 bytes
    assert tb._varint(-2) == b"\xfe" + b"\xff" * 8 + b"\x01"

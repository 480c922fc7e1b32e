"""Binary daqdataformats wire-layout pins (formats/wire.py).

Field-offset tests pin the 72-byte FragmentHeader POD and the 48-byte
TriggerPrimitive POD byte-for-byte (VERDICT r4 #3): a DUNE tool reading
raw fragment bytes and this framework must agree on every field position.
"""

import numpy as np
import pytest

from fdreadoutlibs_tpu.formats import wire
from fdreadoutlibs_tpu.formats.fragment import (Fragment, FragmentHeader,
                                                build_fragment)
from fdreadoutlibs_tpu.formats.trigprim import TPSet, TPSetType, make_tps


# ---- FragmentHeader POD ---------------------------------------------------

FRAGMENT_FIELD_OFFSETS = {
    # daqdataformats FragmentHeader.hpp (v4 series): field -> (offset, size)
    "fragment_header_marker": (0, 4),
    "version": (4, 4),
    "size": (8, 8),
    "trigger_number": (16, 8),
    "trigger_timestamp": (24, 8),
    "window_begin": (32, 8),
    "window_end": (40, 8),
    "run_number": (48, 4),
    "error_bits": (52, 4),
    "fragment_type": (56, 4),
    "sequence_number": (60, 2),
    "detector_id": (62, 2),
    "elem_version": (64, 2),
    "elem_subsystem": (66, 2),
    "elem_id": (68, 4),
}


def test_fragment_header_is_72_bytes():
    assert wire.FRAGMENT_HEADER_DTYPE.itemsize == 72


def test_fragment_header_field_offsets():
    fields = wire.FRAGMENT_HEADER_DTYPE.fields
    assert set(fields) == set(FRAGMENT_FIELD_OFFSETS)
    for name, (off, size) in FRAGMENT_FIELD_OFFSETS.items():
        dt, field_off = fields[name][:2]
        assert field_off == off, name
        assert dt.itemsize == size, name
        assert dt.byteorder in ("<", "|", "="), name   # little-endian


def test_header_bytes_field_for_field():
    """Hand-place every field into a 72-byte buffer and compare against
    pack_header — the layout is pinned against raw bytes, not just against
    the dtype that produced them."""
    buf = bytearray(72)

    def put(off, size, value):
        buf[off:off + size] = int(value).to_bytes(size, "little")

    put(0, 4, 0x11112222)
    put(4, 4, 5)
    put(8, 8, 72 + 7200)
    put(16, 8, 12345)
    put(24, 8, 0xDEADBEEFCAFE)
    put(32, 8, 0xDEADBEEF0000)
    put(40, 8, 0xDEADBEEFFFFF)
    put(48, 4, 33)
    put(52, 4, 0b101)
    put(56, 4, wire.fragment_type_code("kWIBEth"))
    put(60, 2, 9)
    put(62, 2, 3)
    put(64, 2, 2)                                  # SourceID version
    put(66, 2, wire.Subsystem.kDetectorReadout)
    put(68, 4, 17)

    packed = wire.pack_header(
        run_number=33, trigger_number=12345,
        trigger_timestamp=0xDEADBEEFCAFE, window_begin=0xDEADBEEF0000,
        window_end=0xDEADBEEFFFFF, source_id=17, fragment_type="kWIBEth",
        sequence_number=9, detector_id=3, error_bits=0b101,
        subsystem="kDetectorReadout", payload_bytes=7200)
    assert packed == bytes(buf)


def test_fragment_roundtrip_raw_payload():
    payloads = np.arange(3 * 16, dtype=np.uint8).reshape(3, 16)
    frag = build_fragment(
        payloads, run_number=7, trigger_number=42, window_begin=1000,
        window_end=2000, source_id=5, fragment_type="kWIBEth",
        sequence_number=2)
    buf = frag.to_bytes()
    assert len(buf) == 72 + payloads.nbytes
    back = Fragment.from_bytes(buf, payload_stride=16)
    assert back.header == frag.header
    assert np.array_equal(back.payloads, payloads)


def test_fragment_size_field_and_marker_checks():
    frag = build_fragment(np.zeros((2, 8), np.uint8), run_number=1,
                          trigger_number=1, window_begin=0, window_end=1,
                          source_id=0, fragment_type="kWIB")
    buf = bytearray(frag.to_bytes())
    assert int.from_bytes(buf[8:16], "little") == len(buf)   # size field
    with pytest.raises(ValueError, match="size"):
        Fragment.from_bytes(bytes(buf) + b"x")
    buf[0] ^= 0xFF
    with pytest.raises(ValueError, match="marker"):
        Fragment.from_bytes(bytes(buf))


# ---- TriggerPrimitive POD -------------------------------------------------

TP_FIELD_OFFSETS = {
    "time_start": (0, 8), "time_peak": (8, 8),
    "time_over_threshold": (16, 8), "channel": (24, 4),
    "adc_integral": (28, 4), "adc_peak": (32, 4),
    "detid": (36, 2), "type": (38, 2), "algorithm": (40, 2),
    "version": (42, 2), "flag": (44, 2),
}


def test_tp_wire_is_48_bytes_with_pinned_offsets():
    assert wire.TP_WIRE_DTYPE.itemsize == 48      # sizeof(TriggerPrimitive)
    for name, (off, size) in TP_FIELD_OFFSETS.items():
        dt, field_off = wire.TP_WIRE_DTYPE.fields[name][:2]
        assert field_off == off, name
        assert dt.itemsize == size, name


def test_tp_wire_roundtrip():
    tps = make_tps(5)
    tps["time_start"] = np.arange(5, dtype=np.uint64) * 1000 + (1 << 62)
    tps["time_peak"] = tps["time_start"] + 64
    tps["time_over_threshold"] = 96
    tps["channel"] = [3, -1, 2560, 7, 9]
    tps["adc_integral"] = [10, 20, 30, 40, 50]
    tps["adc_peak"] = 4095
    tps["detid"] = 3
    buf = wire.tps_to_wire(tps)
    assert len(buf) == 5 * 48
    back = wire.wire_to_tps(buf)
    assert np.array_equal(back, tps)
    # tail padding bytes (46..48 of each record) are zero
    raw = np.frombuffer(buf, np.uint8).reshape(5, 48)
    assert not raw[:, 46:].any()


def test_tp_fragment_roundtrip_via_pod():
    tps = make_tps(4)
    tps["time_start"] = [100, 200, 300, 400]
    tps["channel"] = [1, 2, 3, 4]
    frag = build_fragment(tps, run_number=3, trigger_number=8,
                          window_begin=50, window_end=500, source_id=2,
                          fragment_type="kTriggerPrimitive",
                          subsystem="kTrigger")
    buf = frag.to_bytes()
    assert len(buf) == 72 + 4 * 48                # POD stride on the wire
    back = Fragment.from_bytes(buf)
    assert back.header.subsystem == "kTrigger"
    assert np.array_equal(back.payloads, tps)


# ---- TPSet framing --------------------------------------------------------

def test_tpset_roundtrip():
    tps = make_tps(3)
    tps["time_start"] = [10, 20, 30]
    tpset = TPSet(run_number=4, type=TPSetType.kPayload, origin=11,
                  start_time=10, end_time=30, seqno=99, objects=tps)
    back = wire.tpset_from_bytes(wire.tpset_to_bytes(tpset))
    assert (back.run_number, back.type, back.origin, back.seqno) == \
        (4, TPSetType.kPayload, 11, 99)
    assert (back.start_time, back.end_time) == (10, 30)
    assert np.array_equal(back.objects, tps)


def test_tpset_heartbeat_roundtrip():
    tpset = TPSet(run_number=1, type=TPSetType.kHeartbeat, origin=0,
                  start_time=5, end_time=6, seqno=0, objects=make_tps(0))
    back = wire.tpset_from_bytes(wire.tpset_to_bytes(tpset))
    assert back.type == TPSetType.kHeartbeat and len(back.objects) == 0


def test_tpset_truncation_raises():
    """A partial write at any 48-byte boundary must raise, not decode
    silently short (round-5 review)."""
    tps = make_tps(3)
    tps["time_start"] = [10, 20, 30]
    buf = wire.tpset_to_bytes(TPSet(run_number=4, type=TPSetType.kPayload,
                                    origin=1, start_time=10, end_time=30,
                                    seqno=0, objects=tps))
    with pytest.raises(ValueError, match="truncated"):
        wire.tpset_from_bytes(buf[:-48])        # one whole TP short
    with pytest.raises(ValueError, match="truncated"):
        wire.tpset_from_bytes(buf[:-1])
    with pytest.raises(ValueError, match="short"):
        wire.tpset_from_bytes(buf[:10])


def test_unknown_fragment_type_code_roundtrips():
    """A forward-compat code absent from this build's table must survive
    unpack->repack byte-faithfully, not collapse to kUnknown/0."""
    frag = build_fragment(np.zeros((1, 8), np.uint8), run_number=1,
                          trigger_number=1, window_begin=0, window_end=1,
                          source_id=0, fragment_type="kWIB")
    buf = bytearray(frag.to_bytes())
    assert wire.FRAGMENT_HEADER_DTYPE.fields["fragment_type"][1] == 56
    buf[56:60] = (20).to_bytes(4, "little")       # unassigned code
    back = Fragment.from_bytes(bytes(buf))
    assert back.header.fragment_type == 20
    assert back.to_bytes() == bytes(buf)


# ---- recorder store + request path emit the binary form -------------------

def test_recorder_stores_wire_bytes(tmp_path):
    from fdreadoutlibs_tpu.tp.recorder import FragmentRecorder
    rec = FragmentRecorder(tmp_path, run_number=12)
    payloads = np.arange(2 * 7200, dtype=np.uint8).reshape(2, 7200) % 251
    frag = build_fragment(payloads, run_number=12, trigger_number=1,
                          window_begin=0, window_end=4096, source_id=3,
                          fragment_type="kWIBEth")
    path = rec.write(frag)
    assert path.suffix == ".frag"
    # the stored file IS the wire format: re-parse it directly
    direct = Fragment.from_bytes(path.read_bytes(), payload_stride=7200)
    assert np.array_equal(direct.payloads, payloads)
    back = rec.read(0)
    assert back.header == frag.header
    assert np.array_equal(back.payloads, payloads)


def test_recorder_reads_legacy_npz(tmp_path):
    """Pre-round-5 npz stores stay readable."""
    import json
    payloads = np.ones((1, 8), np.uint8)
    np.savez_compressed(tmp_path / "old.npz", payloads=payloads)
    meta = {"run_number": 1, "trigger_number": 2, "trigger_timestamp": 3,
            "window_begin": 3, "window_end": 4, "source_id": 5,
            "fragment_type": "kWIB", "sequence_number": 0,
            "detector_id": 0, "error_bits": 0, "version": 5,
            "file": "old.npz", "n_payloads": 1, "size_bytes": 8}
    (tmp_path / "index.jsonl").write_text(json.dumps(meta) + "\n")
    from fdreadoutlibs_tpu.tp.recorder import FragmentRecorder
    rec = FragmentRecorder(tmp_path)
    assert len(rec) == 1
    back = rec.read(0)
    assert back.header.fragment_type == "kWIB"
    assert np.array_equal(back.payloads, payloads)


def test_request_fragment_emits_wire(tmp_path):
    """ReadoutRequestHandler -> Fragment -> wire bytes round trip, with the
    adapter's subsystem carried into the SourceID."""
    from fdreadoutlibs_tpu.formats import wibeth
    from fdreadoutlibs_tpu.formats.adapters import get_adapter
    from fdreadoutlibs_tpu.tp.readout_buffer import ReadoutRequestHandler
    rh = ReadoutRequestHandler(get_adapter("wibeth"), capacity=64)
    frames = wibeth.empty_frames(4)
    wibeth.fake_timestamps(frames, 1 << 20)
    rh.insert_payloads(frames)
    frag = rh.request_fragment((1 << 20), (1 << 20) + 3 * 2048 + 1,
                               run_number=9, trigger_number=77, source_id=6)
    assert len(frag) >= 3
    buf = frag.to_bytes()
    h = np.frombuffer(buf[:72], dtype=wire.FRAGMENT_HEADER_DTYPE)[0]
    assert int(h["fragment_header_marker"]) == 0x11112222
    assert int(h["fragment_type"]) == wire.fragment_type_code("kWIBEth")
    assert int(h["elem_subsystem"]) == wire.Subsystem.kDetectorReadout
    assert int(h["elem_id"]) == 6
    back = Fragment.from_bytes(buf, payload_stride=wibeth.FRAME_SIZE)
    assert np.array_equal(back.payloads, frag.payloads)


def test_fragment_type_code_override(tmp_path, monkeypatch):
    import json
    override = tmp_path / "codes.json"
    override.write_text(json.dumps({"kWIBEth": 99}))
    monkeypatch.setenv("FDREADOUT_FRAGMENT_TYPE_CODES", str(override))
    assert wire.fragment_type_code("kWIBEth") == 99
    assert wire.fragment_type_name(99) == "kWIBEth"
    monkeypatch.delenv("FDREADOUT_FRAGMENT_TYPE_CODES")
    assert wire.fragment_type_code("kWIBEth") == 12

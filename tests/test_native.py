"""Native C++ runtime tests (skipped when no toolchain/library)."""

import numpy as np
import pytest

from fdreadoutlibs_tpu import native
from fdreadoutlibs_tpu.formats import wibeth
from fdreadoutlibs_tpu.formats.trigprim import TP_DTYPE, make_tps
from fdreadoutlibs_tpu.tp.latency_buffer import make_latency_buffer

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestNativeCodec:
    def test_unpack_matches_numpy(self):
        rng = np.random.default_rng(0)
        frames = wibeth.empty_frames(4)
        adcs = rng.integers(0, 1 << 14, size=(4, 64, 64), dtype=np.uint16)
        wibeth.set_adcs(frames, adcs)
        out = native.wibeth_unpack(frames)
        np.testing.assert_array_equal(out.reshape(4, 64, 64), adcs)

    def test_pack_matches_numpy(self):
        rng = np.random.default_rng(1)
        adcs = rng.integers(0, 1 << 14, size=(3, 64, 64), dtype=np.uint16)
        f_native = wibeth.empty_frames(3)
        f_numpy = wibeth.empty_frames(3)
        native.wibeth_pack(f_native, adcs.reshape(-1, 64))
        wibeth.set_adcs(f_numpy, adcs)
        np.testing.assert_array_equal(f_native, f_numpy)

    def test_fake_headers(self):
        frames = wibeth.empty_frames(5)
        native.wibeth_fake_headers(frames, 1000, 2048, 0xFFE)
        np.testing.assert_array_equal(
            native.wibeth_timestamps(frames),
            1000 + 2048 * np.arange(5, dtype=np.uint64))
        np.testing.assert_array_equal(
            wibeth.get_header_field(frames, "seq_id"),
            [0xFFE, 0xFFF, 0, 1, 2])


class TestNativeLatencyBuffer:
    def test_same_semantics_as_python(self):
        """Drive native and Python buffers identically; results must match."""
        rng = np.random.default_rng(2)
        nat = make_latency_buffer(TP_DTYPE, prefer_native=True)
        py = make_latency_buffer(None, prefer_native=False)
        assert type(nat).__name__ == "NativeLatencyBufferAdapter"
        for seed in range(3):
            tps = make_tps(50)
            tps["time_start"] = rng.integers(0, 10_000, size=50)
            tps["channel"] = np.arange(50)
            nat.insert(tps)
            py.insert(tps)
        assert nat.occupancy() == py.occupancy() == 150
        assert nat.oldest_ts() == py.oldest_ts()
        assert nat.newest_ts() == py.newest_ts()
        w_nat = nat.extract_window(2_000, 8_000)
        w_py = py.extract_window(2_000, 8_000)
        np.testing.assert_array_equal(np.sort(w_nat, order=["time_start", "channel"]),
                                      np.sort(w_py, order=["time_start", "channel"]))
        assert nat.pop_until(5_000) == py.pop_until(5_000)
        assert nat.cleanup_max_ts_diff(1_000) == py.cleanup_max_ts_diff(1_000)
        assert nat.occupancy() == py.occupancy()

    def test_capacity(self):
        buf = make_latency_buffer(TP_DTYPE, capacity=3)
        tps = make_tps(5)
        tps["time_start"] = np.arange(5)
        assert buf.insert(tps) == 3
        assert buf.occupancy() == 3

    def test_request_handler_with_native_buffer(self):
        from fdreadoutlibs_tpu.stream.transport import QueueSender
        from fdreadoutlibs_tpu.tp import TPRequestHandler
        sink = QueueSender()
        h = TPRequestHandler(tpset_sink=sink,
                             latency_buffer=make_latency_buffer(TP_DTYPE))
        h.conf({"tpset_transmission_rate_hz": 1000,
                "tpset_min_latency_ticks": 100,
                "tardy_tp_quiet_time_at_start_sec": 0})
        h.start(run_number=1)
        tps = make_tps(3)
        tps["time_start"] = [1000, 1050, 1200]
        h.insert_tps(tps)
        tpset = h.send_tp_sets_once()
        assert tpset is not None
        np.testing.assert_array_equal(tpset.objects["time_start"], [1000, 1050])


class TestConcurrency:
    def test_concurrent_insert_extract(self):
        """The ordered buffer is shared between the ingest thread and the
        TPSet sender thread in deployment; hammer it from both sides."""
        import threading
        buf = make_latency_buffer(TP_DTYPE, prefer_native=True)
        errors = []

        def inserter(tid):
            try:
                rng = np.random.default_rng(tid)
                for i in range(50):
                    tps = make_tps(100)
                    tps["time_start"] = rng.integers(0, 1_000_000, size=100)
                    buf.insert(tps)
            except Exception as e:   # pragma: no cover
                errors.append(e)

        def extractor():
            try:
                for _ in range(100):
                    w = buf.extract_window(100_000, 900_000)
                    if len(w) > 1:
                        assert (np.diff(w["time_start"].astype(np.int64))
                                >= 0).all()
                    buf.pop_until(50_000)
            except Exception as e:   # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=inserter, args=(t,))
                   for t in range(3)] + [threading.Thread(target=extractor)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert buf.occupancy() <= 3 * 50 * 100

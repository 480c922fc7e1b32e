"""Latency buffer + TP request handler (TPSet windowing) tests."""

import numpy as np

from fdreadoutlibs_tpu.formats.trigprim import TPSetType, make_tps
from fdreadoutlibs_tpu.stream.transport import QueueSender
from fdreadoutlibs_tpu.tp import LatencyBuffer, TPRequestHandler


def tps_at(times, channels=None):
    tps = make_tps(len(times))
    tps["time_start"] = times
    tps["channel"] = channels if channels is not None else np.arange(len(times))
    return tps


class TestLatencyBuffer:
    def test_ordered_insertion(self):
        buf = LatencyBuffer()
        buf.insert(tps_at([50, 10, 30]))
        buf.insert(tps_at([20, 40]))
        arr = buf.snapshot()
        np.testing.assert_array_equal(arr["time_start"], [10, 20, 30, 40, 50])
        assert buf.oldest_ts() == 10 and buf.newest_ts() == 50

    def test_window_extraction_is_half_open(self):
        buf = LatencyBuffer()
        buf.insert(tps_at([10, 20, 30, 40]))
        win = buf.extract_window(20, 40)
        np.testing.assert_array_equal(win["time_start"], [20, 30])
        assert buf.occupancy() == 4  # non-consuming

    def test_pop_until(self):
        buf = LatencyBuffer()
        buf.insert(tps_at([10, 20, 30, 40]))
        assert buf.pop_until(25) == 2
        assert buf.oldest_ts() == 30

    def test_cleanup_max_ts_diff(self):
        """DAPHNEListRequestHandler: trim until newest-oldest <= limit."""
        buf = LatencyBuffer()
        buf.insert(tps_at([0, 100, 10_000_100, 10_000_200]))
        dropped = buf.cleanup_max_ts_diff(10_000_000)
        assert dropped == 2
        assert buf.oldest_ts() == 10_000_100

    def test_capacity(self):
        buf = LatencyBuffer(capacity=3)
        assert buf.insert(tps_at([1, 2])) == 2
        assert buf.insert(tps_at([3, 4])) == 1
        assert buf.occupancy() == 3

    def test_stable_order_for_equal_keys(self):
        buf = LatencyBuffer()
        buf.insert(tps_at([10, 10], channels=[5, 2]))
        arr = buf.snapshot()
        np.testing.assert_array_equal(arr["channel"], [5, 2])


class TestTPRequestHandler:
    def make(self, min_latency=100, rate=1000):
        sink = QueueSender()
        h = TPRequestHandler(tpset_sink=sink)
        h.conf({"tpset_transmission_rate_hz": rate,
                "tpset_min_latency_ticks": min_latency,
                "tardy_tp_quiet_time_at_start_sec": 0,
                "tpset_sourceid": 42})
        h.start(run_number=123)
        return h, sink

    def test_no_tpset_until_latency_margin(self):
        h, sink = self.make(min_latency=100)
        h.insert_tps(tps_at([1000, 1050]))
        assert h.send_tp_sets_once() is None  # newest-start <= margin
        h.insert_tps(tps_at([1200]))
        tpset = h.send_tp_sets_once()
        assert tpset is not None
        assert tpset.type == TPSetType.kPayload
        assert tpset.run_number == 123
        assert tpset.origin == 42
        # window closed at newest - margin = 1100 -> contains 1000, 1050
        np.testing.assert_array_equal(tpset.objects["time_start"], [1000, 1050])
        assert tpset.start_time == 1000 and tpset.end_time == 1050
        assert h.cutoff_timestamp == 1050

    def test_sequential_windows_and_seqno(self):
        h, sink = self.make(min_latency=50)
        h.insert_tps(tps_at([0, 10, 100, 200, 300]))
        sets = []
        while (s := h.send_tp_sets_once()) is not None:
            sets.append(s)
        assert [s.seqno for s in sets] == list(range(len(sets)))
        all_tps = np.concatenate([s.objects for s in sets])
        # everything below newest-margin=250 shipped exactly once
        np.testing.assert_array_equal(all_tps["time_start"], [0, 10, 100, 200])

    def test_heartbeat_for_empty_window(self):
        h, sink = self.make(min_latency=10)
        h.insert_tps(tps_at([1000, 5000]))
        s1 = h.send_tp_sets_once()       # ships 1000..4990 window: has 1000
        s2 = h.send_tp_sets_once()       # nothing new below margin
        assert s1.type == TPSetType.kPayload
        assert s2 is None
        h.insert_tps(tps_at([9000]))     # window 4990..8990 contains 5000
        s3 = h.send_tp_sets_once()
        assert s3.type == TPSetType.kPayload
        # clean the buffered tail, then close a window over the cleaned span:
        # no TPs in it -> heartbeat (TPCTPRequestHandler.cpp:147, 177-179)
        h.buffer.pop_until(10_000)
        h.insert_tps(tps_at([50_000]))   # window 8990..49990: empty
        s4 = h.send_tp_sets_once()
        assert s4.type == TPSetType.kHeartbeat
        assert len(s4.objects) == 0
        assert h.metrics.count("num_heartbeats") == 1

    def test_tardy_tp_suppressed(self):
        h, sink = self.make(min_latency=10)
        h.insert_tps(tps_at([1000, 2000]))
        h.send_tp_sets_once()
        assert h.cutoff_timestamp == 1000
        accepted = h.insert_tps(tps_at([500]))  # older than cutoff
        assert accepted == 0
        assert h.metrics.count("num_tps_suppressed_tardy") == 1

    def test_data_request_window(self):
        h, sink = self.make()
        h.insert_tps(tps_at([10, 20, 30, 40]))
        win = h.request(15, 35)
        np.testing.assert_array_equal(win["time_start"], [20, 30])
        assert h.metrics.count("num_requests") == 1

    def test_tp_fragment_request_and_record(self, tmp_path=None):
        """TP window -> kTriggerPrimitive Fragment, recordable/readable."""
        import tempfile
        from fdreadoutlibs_tpu.tp.recorder import FragmentRecorder
        h, sink = self.make()
        h.insert_tps(tps_at([10, 20, 30, 40]))
        frag = h.request_fragment(15, 35, run_number=123, trigger_number=9,
                                  source_id=42)
        assert frag.header.fragment_type == "kTriggerPrimitive"
        assert len(frag) == 2
        np.testing.assert_array_equal(frag.payloads["time_start"], [20, 30])
        with tempfile.TemporaryDirectory() as d:
            rec = FragmentRecorder(d, run_number=123)
            rec.write(frag)
            back = rec.read(0)
            assert back.payloads.dtype == frag.payloads.dtype
            np.testing.assert_array_equal(back.payloads, frag.payloads)

    def test_requests_survive_tpset_emission(self):
        """Shipped TPs remain available to data requests until cleanup."""
        h, sink = self.make(min_latency=10)
        h.insert_tps(tps_at([100, 200, 5000]))
        h.send_tp_sets_once()
        win = h.request(50, 300)
        assert len(win) == 2
        h.cleanup(max_ts_diff=1000)
        assert h.buffer.occupancy() == 1

    def test_cleanup_occupancy(self):
        h, sink = self.make()
        h.insert_tps(tps_at(np.arange(100) * 10))
        dropped = h.cleanup(max_occupancy=40)
        assert dropped == 60
        assert h.buffer.occupancy() == 40

    def test_sender_thread(self):
        import time
        h, sink = self.make(min_latency=10, rate=2000)
        h.start_sender_thread()
        h.insert_tps(tps_at([100, 900]))
        time.sleep(0.1)
        h.stop()
        assert sink.sent >= 1

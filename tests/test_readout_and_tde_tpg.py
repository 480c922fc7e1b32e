"""Raw-payload readout buffer + TDE waveform TPG tests."""

import numpy as np
import pytest

from fdreadoutlibs_tpu.formats import tde, wibeth
from fdreadoutlibs_tpu.formats.adapters import get_adapter
from fdreadoutlibs_tpu.stream.tde import TDEFrameProcessor
from fdreadoutlibs_tpu.stream.transport import QueueSender
from fdreadoutlibs_tpu.tp.readout_buffer import ReadoutRequestHandler


class TestReadoutRequestHandler:
    def make(self, prefer_native):
        return ReadoutRequestHandler(get_adapter("wibeth"),
                                     prefer_native=prefer_native)

    @pytest.mark.parametrize("native", [False, True])
    def test_window_request(self, native):
        h = self.make(native)
        frames = wibeth.empty_frames(8)
        wibeth.fake_timestamps(frames, 10_000)       # +2048 each
        h.insert_payloads(frames)
        assert h.occupancy() == 8
        # request [12048, 16144): frames at 12048, 14096 start inside;
        # the frame at 10000 covers the window start -> included
        got = h.request(12_100, 16_145)
        ts = wibeth.get_timestamp(got)
        np.testing.assert_array_equal(ts, [12_048, 14_096, 16_144])

    def test_covering_payload_included(self):
        h = self.make(False)
        frames = wibeth.empty_frames(2)
        wibeth.fake_timestamps(frames, 10_000)
        h.insert_payloads(frames)
        got = h.request(10_500, 11_000)   # inside frame 0's 2048-tick span
        assert len(got) == 1
        assert wibeth.get_timestamp(got)[0] == 10_000

    def test_cleanup(self):
        h = self.make(False)
        frames = wibeth.empty_frames(10)
        wibeth.fake_timestamps(frames, 0)
        h.insert_payloads(frames)
        h.cleanup(max_occupancy=4)
        assert h.occupancy() == 4
        h.cleanup(max_ts_diff=2048)
        assert h.occupancy() == 2


class TestTDETPG:
    def make_cycle_frames(self, n_channels=4, pulse_chan=2, ts0=50_000):
        frames = tde.empty_frames(n_channels)
        tde.set_channel(frames, np.arange(n_channels))
        tde.set_timestamp(frames, np.full(n_channels, ts0))
        samples = np.full((n_channels, tde.TOT_ADC16_SAMPLES), 700,
                          dtype=np.uint16)
        samples[pulse_chan, 1000:1010] += 900
        tde.set_adc_samples(frames, samples)
        return frames

    def test_pulse_found(self):
        sink = QueueSender()
        proc = TDEFrameProcessor(tp_sink=sink)
        proc.conf({"enable_tpg": True, "tpg_threshold": 500})
        proc.start()
        proc.process(self.make_cycle_frames())
        tps = np.concatenate(sink.drain())
        assert len(tps) == 1
        tp = tps[0]
        assert tp["channel"] == 2
        assert tp["adc_integral"] == 10 * 900
        # samples are 32 ticks apart
        assert tp["time_start"] == 50_000 + 32 * 1000
        assert tp["time_over_threshold"] == 10 * 32

    def test_incomplete_batch_skipped(self):
        sink = QueueSender()
        proc = TDEFrameProcessor(tp_sink=sink)
        proc.conf({"enable_tpg": True, "tpg_threshold": 500})
        proc.start()
        frames = self.make_cycle_frames(n_channels=3)
        tde.set_channel(frames, [0, 1, 1])   # unbalanced channel counts
        proc.process(frames)
        assert proc.metrics.count("num_incomplete_tpg_batches") == 1
        assert len(sink) == 0


class TestFragments:
    def test_request_fragment(self):
        from fdreadoutlibs_tpu.formats.fragment import Fragment
        h = ReadoutRequestHandler(get_adapter("wibeth"), prefer_native=False)
        frames = wibeth.empty_frames(4)
        wibeth.fake_timestamps(frames, 10_000)
        h.insert_payloads(frames)
        frag = h.request_fragment(12_100, 16_145, run_number=7,
                                  trigger_number=42, source_id=3)
        assert isinstance(frag, Fragment)
        assert len(frag) == 3
        assert frag.header.run_number == 7
        assert frag.header.trigger_number == 42
        assert frag.header.window_begin == 12_100
        assert frag.header.fragment_type == "kWIBEth"
        assert frag.size_bytes == 3 * 7200


class TestFragmentRecorder:
    def test_write_read_roundtrip(self, tmp_path):
        from fdreadoutlibs_tpu.tp.recorder import FragmentRecorder
        h = ReadoutRequestHandler(get_adapter("wibeth"), prefer_native=False)
        frames = wibeth.empty_frames(6)
        wibeth.fake_timestamps(frames, 10_000)
        h.insert_payloads(frames)
        rec = FragmentRecorder(tmp_path / "run", run_number=12)
        frag = h.request_fragment(10_000, 10_000 + 3 * 2048, run_number=12,
                                  trigger_number=1, source_id=4)
        rec.write(frag)
        frag2 = h.request_fragment(10_000 + 3 * 2048, 10_000 + 6 * 2048,
                                   run_number=12, trigger_number=2,
                                   source_id=4, sequence_number=1)
        rec.write(frag2)
        assert len(rec) == 2
        back = rec.read(0)
        assert back.header.trigger_number == 1
        assert back.header.fragment_type == "kWIBEth"
        np.testing.assert_array_equal(back.payloads, frag.payloads)
        idx = rec.index()
        assert idx[1]["trigger_number"] == 2
        assert idx[1]["n_payloads"] == len(frag2)
        # a new recorder instance resumes the index
        rec2 = FragmentRecorder(tmp_path / "run", run_number=12)
        assert len(rec2) == 2

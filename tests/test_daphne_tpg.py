"""DAPHNE PDS TP generation (superset of reference) + register-parity extras."""

import numpy as np
import pytest

from fdreadoutlibs_tpu.formats import daphne, wib2
from fdreadoutlibs_tpu.formats.trigprim import TPType
from fdreadoutlibs_tpu.stream.daphne import (DAPHNEFrameProcessor,
                                             DAPHNEStreamFrameProcessor)
from fdreadoutlibs_tpu.stream.transport import QueueSender
from fdreadoutlibs_tpu.utils.channel_map import (IdentityChannelMap,
                                                 register_map_via_expansion)


class TestSelfTriggeredPDS:
    def test_pulse_analysis(self):
        sink = QueueSender()
        proc = DAPHNEFrameProcessor(tp_sink=sink)
        proc.conf({"enable_tpg": True, "tpg_threshold": 50, "det_id": 2})
        proc.start()

        sc = daphne.empty_superchunks(1)
        frames = daphne.superchunk_frames(sc).reshape(-1, daphne.FRAME_SIZE)
        wf = np.full((12, 1024), 1000, dtype=np.uint16)
        # frame 3: clean pulse; others: flat (no TP)
        wf[3, 500:520] = 1000 + np.concatenate([
            np.linspace(0, 400, 10), np.linspace(400, 0, 10)]).astype(int)
        daphne.set_waveform(frames, wf)
        daphne.fake_timestamps(sc, 10_000, offset=16)
        daphne.set_header_field(frames, "link_id", np.arange(12))
        proc.process(sc)

        tps = np.concatenate(sink.drain())
        assert len(tps) == 1
        tp = tps[0]
        assert tp["type"] == TPType.kPDS
        assert tp["channel"] == 3
        assert tp["adc_peak"] == 400
        assert tp["time_peak"] == 10_000 + 3 * 16 + 509  # peak position
        assert tp["time_over_threshold"] > 10

    def test_no_pulse_no_tp(self):
        sink = QueueSender()
        proc = DAPHNEFrameProcessor(tp_sink=sink)
        proc.conf({"enable_tpg": True, "tpg_threshold": 50})
        proc.start()
        sc = daphne.empty_superchunks(2)
        frames = daphne.superchunk_frames(sc).reshape(-1, daphne.FRAME_SIZE)
        daphne.set_waveform(frames, np.full((24, 1024), 900, dtype=np.uint16))
        proc.process(sc)
        assert len(sink) == 0


class TestStreamingPDSTPG:
    def test_swtpg_over_stream(self):
        sink = QueueSender()
        proc = DAPHNEStreamFrameProcessor(tp_sink=sink)
        proc.conf({"enable_tpg": True, "tpg_threshold": 100})
        proc.start()
        sc = daphne.empty_superchunks(1, stream=True)
        frames = daphne.superchunk_frames(sc, stream=True) \
            .reshape(-1, daphne.STREAM_FRAME_SIZE)
        adcs = np.full((12, 64, 4), 800, dtype=np.uint16)
        adcs[5, 10:18, 2] += 500          # pulse on channel 2, frame 5
        daphne.stream_set_adcs(frames, adcs)
        daphne.fake_timestamps(sc, 20_000, offset=64, stream=True)
        proc.process(sc)
        tps = np.concatenate(sink.drain())
        assert len(tps) == 1
        tp = tps[0]
        assert tp["type"] == TPType.kPDS
        assert tp["channel"] == 2
        assert tp["adc_integral"] == 8 * 500
        # global tick of pulse start = 5*64 + 10
        assert tp["time_start"] == 20_000 + 5 * 64 + 10

    def test_state_carries(self):
        sink = QueueSender()
        proc = DAPHNEStreamFrameProcessor(tp_sink=sink)
        proc.conf({"enable_tpg": True, "tpg_threshold": 100})
        proc.start()
        for i in range(3):
            sc = daphne.empty_superchunks(1, stream=True)
            frames = daphne.superchunk_frames(sc, stream=True) \
                .reshape(-1, daphne.STREAM_FRAME_SIZE)
            adcs = np.full((12, 64, 4), 800, dtype=np.uint16)
            daphne.stream_set_adcs(frames, adcs)
            daphne.fake_timestamps(sc, 20_000 + i * 768, offset=64,
                                   stream=True)
            proc.process(sc)
        assert proc.metrics.count("num_ts_errors") == 0
        assert proc._state is not None


class TestRegisterParityExtras:
    def test_wib2_register_order(self):
        frames = wib2.empty_frames(1)
        wib2.set_adcs(frames, np.arange(256, dtype=np.uint16)[None])
        adcs = wib2.get_adcs(frames)
        indices = np.array([0, 1, 2, 3, 4, 5, 6, 7, 15, 8, 9, 10, 11, 12, 13, 14])
        for sel in (0, 1):
            reg = wib2.to_register_order(adcs, sel)[0]
            for i in range(128):
                expected = sel * 128 + 16 * (i // 16) + indices[i % 16]
                assert reg[i] == expected

    def test_register_map_via_expansion(self):
        cmap = IdentityChannelMap(channels_per_stream=64)
        out = register_map_via_expansion(cmap, crate=1, slot=2, stream=3)
        np.testing.assert_array_equal(
            out, cmap.offline_channels(1, 2, 3, 64))

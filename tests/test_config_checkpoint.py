"""Config schema + checkpoint/resume tests."""

import numpy as np
import pytest

from fdreadoutlibs_tpu.formats import wibeth
from fdreadoutlibs_tpu.ops import patterns
from fdreadoutlibs_tpu.stream import WIBEthFrameProcessor
from fdreadoutlibs_tpu.stream.transport import QueueSender
from fdreadoutlibs_tpu.utils.checkpoint import (checkpoint_processor,
                                                restore_processor)
from fdreadoutlibs_tpu.utils.config import (RawDataProcessorConf,
                                            ReadoutModelConf, load_config)


class TestConfig:
    def test_defaults_roundtrip(self):
        c = RawDataProcessorConf(tpg_algorithm="AbsRS", tpg_threshold=150)
        d = c.as_dict()
        assert d["tpg_algorithm"] == "AbsRS"
        blob = {"rawdataprocessorconf": d,
                "readoutmodelconf": ReadoutModelConf().as_dict()}
        out = load_config(blob)
        assert out["rawdataprocessorconf"].tpg_threshold == 150
        assert out["readoutmodelconf"].tpset_transmission_rate_hz == 200

    def test_unknown_key_rejected(self):
        with pytest.raises(KeyError):
            load_config({"rawdataprocessorconf": {"tppg_threshold": 1}})

    def test_json_file(self, tmp_path):
        import json
        p = tmp_path / "conf.json"
        p.write_text(json.dumps({"rawdataprocessorconf":
                                 {"tpg_threshold": 42, "enable_tpg": True}}))
        out = load_config(p)
        assert out["rawdataprocessorconf"].tpg_threshold == 42

    def test_processor_accepts_dataclass_dict(self):
        conf = RawDataProcessorConf(enable_tpg=True, tpg_threshold=499,
                                    crate_id=1, slot_id=2, link_id=3,
                                    tpg_backend="reference").as_dict()
        proc = WIBEthFrameProcessor(tp_sink=QueueSender())
        proc.conf(conf)
        proc.start()
        assert proc.tpg_cfg.threshold == 499


class TestCheckpointResume:
    def test_bitexact_resume_mid_stream(self, tmp_path):
        """A checkpointed processor resumes bit-exactly mid-stream —
        including an in-flight hit spanning the checkpoint."""
        def make():
            proc = WIBEthFrameProcessor(tp_sink=QueueSender())
            proc.conf({"crate_id": 1, "slot_id": 2, "link_id": 3,
                       "enable_tpg": True, "tpg_threshold": 499,
                       "tp_timeout": 100_000, "tpg_backend": "reference"})
            proc.start()
            return proc

        frames, _ = patterns.pattern_frames(
            "golden", first_timestamp=10_000, crate_id=1, slot_id=2,
            stream_id=3, n_frames=4, channel=7, offset=60)  # spans frames
        wibeth.fake_seq_ids(frames, 0)

        # continuous run
        p_cont = make()
        p_cont.process(frames)
        tps_cont = np.concatenate(p_cont.tp_sink.drain())

        # checkpoint after 2 frames, restore into a fresh processor
        p1 = make()
        p1.process(frames[:2])
        ckpt = tmp_path / "ckpt.npz"
        checkpoint_processor(p1, ckpt)
        part1 = p1.tp_sink.drain()

        p2 = make()
        restore_processor(p2, ckpt)
        p2.process(frames[2:])
        part2 = p2.tp_sink.drain()

        tps_resumed = np.concatenate(part1 + part2)
        np.testing.assert_array_equal(tps_resumed, tps_cont)
        assert p2.metrics.count("num_ts_errors") == 0
        assert p2.metrics.count("num_seq_id_errors") == 0

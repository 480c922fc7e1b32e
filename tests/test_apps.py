"""End-to-end application test (CPU, interpret mode, small config)."""

import numpy as np
import pytest

import fdreadoutlibs_tpu.ops.ingest as ingest_mod
from fdreadoutlibs_tpu.formats import wibeth


@pytest.fixture
def interpret_ingest(monkeypatch):
    orig = ingest_mod.process_packed_frames

    def patched(words, stack, cfg, C, **kw):
        kw["interpret"] = True
        return orig(words, stack, cfg, C, **kw)

    monkeypatch.setattr(ingest_mod, "process_packed_frames", patched)


def test_apa_readout_end_to_end(interpret_ingest):
    from fdreadoutlibs_tpu.apps.apa_readout import APAReadoutApp
    app = APAReadoutApp(n_links=2, threshold=499)
    ts = 100_000
    for b in range(3):
        frames = np.zeros((2, 1, wibeth.FRAME_SIZE), np.uint8)
        adcs = np.full((2, 1, 64, 64), 800, np.uint16)
        if b == 1:
            adcs[1, 0, 10:19, 7] += np.array(
                [500, 502, 504, 505, 506, 505, 504, 502, 500], np.uint16)
        for l in range(2):
            wibeth.set_adcs(frames[l], adcs[l])
            wibeth.fake_timestamps(frames[l], ts)
            wibeth.fake_seq_ids(frames[l], b)
            wibeth.fake_geoid(frames[l], 1, l // 8, l % 8)
        app.process_batch(frames)
        ts += 2048
    info = app.get_info()
    assert info["total_hits"] == 1
    assert info["total_tps_sent"] == 1
    assert info["ts_errors"] == 0
    assert info["raw_buffered"] == 6
    # trigger data request on the hit link returns the covering frames
    raw = app.request_raw(1, 100_000 + 2048, 100_000 + 2 * 2048)
    assert len(raw) >= 1
    # TP landed in the latency buffer with the right absolute time
    tps = app.handler.buffer.snapshot()
    assert len(tps) == 1
    assert tps["time_start"][0] == 100_000 + 2048 + 32 * 10

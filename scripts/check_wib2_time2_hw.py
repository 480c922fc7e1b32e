"""WIB2 tpg_time2_feed vs fused-packed TP parity on the real chip.

The CPU tests pin the two processor paths bit-exact in interpret mode
(tests/test_stream_others.py); this check exercises the real Mosaic
compiles of both paths — process_time2_feed on the host-relayout feed
(stream/wibeth.py _run_pallas_time2, generic over ch_per_link) vs the
fused process_packed_wib2 — on the same superchunk stream, split
mid-stream so the carried state crosses a batch boundary.

Reference chain being validated: src/wib2/WIB2FrameProcessor.cpp
(superchunk preprocess + 2x128-ch SWTPG tasks) — here one 256-lane
kernel either way; only the ingest layout differs.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdreadoutlibs_tpu.formats import wib2  # noqa: E402
from fdreadoutlibs_tpu.ops import patterns  # noqa: E402
from fdreadoutlibs_tpu.stream import WIB2FrameProcessor  # noqa: E402
from fdreadoutlibs_tpu.stream.transport import QueueSender  # noqa: E402


def make(**conf):
    sink = QueueSender()
    proc = WIB2FrameProcessor(tp_sink=sink)
    c = {"crate_id": 1, "slot_id": 2, "link_id": 3, "enable_tpg": True,
         "tpg_algorithm": "SimpleThreshold", "tpg_threshold": 499,
         "tp_timeout": 100_000, "tpg_backend": "pallas"}
    c.update(conf)
    proc.conf(c)
    proc.start()
    return proc, sink


def main() -> int:
    rng = np.random.default_rng(99)
    n = 16
    T = n * wib2.FRAMES_PER_SUPERCHUNK
    adcs = (400 + rng.normal(0, 20, size=(T, 256))).astype(np.uint16)
    for _ in range(40):
        c, t0 = rng.integers(0, 256), rng.integers(0, T - 12)
        adcs[t0:t0 + 9, c] += patterns.GOLDEN_ADCS[:9].astype(np.uint16)
    sc = wib2.empty_superchunks(n)
    frames = wib2.superchunk_frames(sc)
    wib2.set_adcs(frames, adcs.reshape(n, 12, 256))
    wib2.fake_timestamps(sc, 100_000)
    wib2.fake_geoid(sc, 1, 2, 3)

    p_t, s_t = make(tpg_time2_feed=True)
    p_f, s_f = make()
    # split mid-stream: carried state crosses the hardware batch boundary
    p_t.process(sc[:5].copy())
    p_t.process(sc[5:].copy())
    p_f.process(sc[:5].copy())
    p_f.process(sc[5:].copy())
    got = np.concatenate(s_t.drain())
    ref = np.concatenate(s_f.drain())
    np.testing.assert_array_equal(got, ref)
    assert len(ref) > 10, f"want a real TP population, got {len(ref)}"
    print(f"WIB2 TIME2 HW PARITY OK: {len(ref)} TPs bit-exact")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Hardware check: ProtoWIB time2 host feed vs fused packed ingest,
compiled Mosaic on the real chip (the CPU-mesh equivalence lives in
tests/test_stream_protowib.py::test_pallas_time2_feed_matches_packed;
this runs the same dual-plane carried-state comparison with
tpg_pallas_interpret=False).  Prints one JSON line with the TP counts.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    assert jax.default_backend() == "tpu", "needs the real chip"
    from fdreadoutlibs_tpu.utils.preflight import device_preflight
    device_preflight()

    from fdreadoutlibs_tpu.formats import protowib
    from fdreadoutlibs_tpu.stream.protowib import WIBFrameProcessor
    from fdreadoutlibs_tpu.stream.transport import QueueSender
    from fdreadoutlibs_tpu.tp.wib_tp_handler import WIBTPHandler

    rng = np.random.default_rng(31)
    batches = []
    ts = 50_000
    n_sc = 32                                   # 384 ticks per batch
    pulse_c = int(protowib.COLLECTION_INDEX_TO_CHAN[11])
    pulse_i = int(protowib.INDUCTION_INDEX_TO_CHAN[3])
    for b in range(3):
        sc = protowib.empty_superchunks(n_sc)
        frames = protowib.superchunk_frames(sc).reshape(
            -1, protowib.FRAME_SIZE)
        adcs = (900 + rng.normal(0, 10, (len(frames), 256))).astype(np.uint16)
        for _ in range(6):
            t0 = rng.integers(0, len(frames) - 16)
            adcs[t0:t0 + 9, pulse_c] += 700
            adcs[t0 + 4:t0 + 10, pulse_i] += 700
        protowib.set_adcs(frames, adcs)
        protowib.fake_timestamps(sc, ts)
        batches.append(sc)
        ts += n_sc * 300

    results = {}
    for name, conf in (("packed", {}), ("time2", {"tpg_time2_feed": True})):
        handler = WIBTPHandler(tp_sink=QueueSender(), tpset_sink=QueueSender(),
                               tp_timeout=100_000, tpset_window_size=2_000)
        proc = WIBFrameProcessor(tp_handler=handler,
                                 errored_frame_sink=QueueSender())
        proc.conf({"crate_id": 0, "slot_id": 0, "link_id": 0,
                   "enable_tpg": True, "tpg_backend": "pallas",
                   "tpg_pallas_interpret": False, **conf})
        proc.start()
        for sc in batches:
            proc.process(sc.copy())
        # drain EVERY window (one try_sending_tpsets call emits one
        # aligned tpset_window_size window — review r3)
        tps = []
        while (tpset := handler.try_sending_tpsets(10 ** 12)) is not None:
            tps.extend(tpset.objects)
        results[name] = (np.sort(np.array(tps),
                                 order=["time_start", "channel"])
                         if tps else np.zeros(0))

    assert len(results["packed"]) >= 6, len(results["packed"])
    np.testing.assert_array_equal(results["packed"], results["time2"])
    print(json.dumps({"ok": True, "tps": int(len(results["packed"])),
                      "batches": len(batches),
                      "ticks_per_batch": n_sc * 12}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

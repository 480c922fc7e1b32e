#!/usr/bin/env python
"""End-to-end TP-emission latency: data-arrival -> TP-available.

The reference's defining real-time constraint is a latency budget, not a
throughput number: 6 us per superchunk in the spin-wait handshake
(/root/reference/include/fdreadoutlibs/wib/WIBFrameProcessor.hpp:516-518)
and a `tpset_min_latency_ticks` windowing margin that bounds how stale a
TP may be before the cutoff tardy-drops it
(/root/reference/src/TPCTPRequestHandler.cpp:131-133).  The TPU rebuild
trades per-superchunk latency for batched throughput; this harness
quantifies that trade so the margin can be SPECIFIED instead of guessed:

  latency(oldest sample in a batch) = batch_span + processing
  processing = preprocess + retention + host codec + (H2D + kernel + D2H)
               + TP assembly + handler insert/window

Each APAReadoutApp batch records its stage breakdown (app.batch_timings);
this harness drives the production app config over the ingest arms at one
or more batch sizes on the REAL chip and reports p50/p95/max, the implied
minimum safe `tpset_min_latency_ticks` (2x margin on p95), and a
tunnel-corrected estimate.

Tunnel correction: on this rig every device sync pays a 40-600 ms remote
round trip that production (PCIe/ICI-attached) does not.  A null-sync RTT
probe (tiny jitted op, block_until_ready) is interleaved with the timed
batches; `proc_ms_p50_corrected` subtracts ONE null RTT per batch — a
deliberately conservative correction (the device stage contains exactly
one blocking fetch since compact_on_device packs its outputs into a
single array, but H2D enqueue may add partial round trips), so corrected
numbers remain an UPPER bound on production latency.

Usage:
  python scripts/bench_latency.py [--arms time2,words14,fused,packed]
      [--links 40] [--frames 8,32] [--batches 20]
Output: one JSON document; record the summary in BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARM_KWARGS = {
    "packed": {},
    "fused": {"fused_unpack": True},
    "words14": {"words14_feed": True},
    "time2": {"time2_feed": True},
}


def gen_batch(rng, L, N, batch_idx, ts, signal_rate=0.02):
    """One realistic APA batch: emulated noise + Poisson signal pulses
    (the apa_readout demo generator, kept outside the timed region)."""
    from fdreadoutlibs_tpu.formats import wibeth
    frames = np.zeros((L, N, wibeth.FRAME_SIZE), dtype=np.uint8)
    adcs = (900 + rng.normal(0, 30, size=(L, N, 64, 64))).astype(np.uint16)
    for _ in range(rng.poisson(signal_rate * L * 64)):
        l, c = rng.integers(0, L), rng.integers(0, 64)
        f, t = rng.integers(0, N), rng.integers(0, 50)
        adcs[l, f, t:t + 8, c] += np.uint16(rng.integers(300, 3000))
    for l in range(L):
        wibeth.set_adcs(frames[l], adcs[l])
        wibeth.fake_timestamps(frames[l], ts)
        wibeth.fake_seq_ids(frames[l], batch_idx * N)
        wibeth.fake_geoid(frames[l], 1, l // 8, l % 8)
    return frames


def make_rtt_probe():
    """Pre-compiled null device sync: one enqueue + one blocking fetch —
    the per-sync tunnel/dispatch overhead a timed batch pays at least
    once."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1)
    x = jax.device_put(jnp.zeros((8,), jnp.int32))
    jax.block_until_ready(f(x))

    def probe():
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        return (time.perf_counter() - t0) * 1e3

    return probe


def run_arm(arm, links, frames_n, batches, warmup, algorithm, threshold,
            threshold_on_collection, codec_threads, signal_rate,
            backend="pallas", interpret=False, pipelined=False):
    from fdreadoutlibs_tpu.apps.apa_readout import APAReadoutApp
    from fdreadoutlibs_tpu.formats import wibeth
    app = APAReadoutApp(
        n_links=links, algorithm=algorithm, threshold=threshold,
        threshold_on_collection=threshold_on_collection,
        codec_threads=codec_threads, backend=backend,
        pallas_interpret=interpret, pipelined=pipelined,
        raw_capacity_frames=max(4096, 4 * frames_n),
        **ARM_KWARGS[arm])
    probe = make_rtt_probe()
    # crc32, not hash(): str hash is salted per interpreter (PEP 456),
    # which would time different data every run.
    rng = np.random.default_rng(zlib.crc32(arm.encode()) % 2 ** 31)
    ts = 0x1000000
    rtts = []
    for b in range(warmup + batches):
        frames = gen_batch(rng, links, frames_n, b, ts, signal_rate)
        if b == warmup:
            # pipelined: one warmup batch is still in flight; its timing
            # row lands after this clear (one stale sample, negligible
            # at the 20-batch default)
            app.batch_timings.clear()
        app.process_batch(frames)
        if b >= warmup:
            rtts.append(probe())
        ts += frames_n * wibeth.EXPECTED_TICK_DIFFERENCE
    app.flush()
    info = app.latency_info(frames_per_batch=frames_n)
    if pipelined:
        info["pipelined"] = True
    # pairwise tunnel correction (module docstring): batch k minus the
    # null RTT measured immediately after it (pipelined rows land one
    # call later; the pairing — and so the correction — stays approximate
    # there, and row/probe counts can differ by one: align on the min)
    tot = np.array([r["total_ms"] for r in app.batch_timings])
    n = min(len(tot), len(rtts))
    tot = tot[:n]
    corr = np.maximum(0.0, tot - np.array(rtts[:n]))
    span = info["batch_span_ms"]
    p95c = float(np.percentile(corr, 95))
    info.update({
        "rtt_null_ms_p50": round(float(np.median(rtts)), 3),
        "proc_ms_p50_corrected": round(float(np.percentile(corr, 50)), 3),
        "proc_ms_p95_corrected": round(p95c, 3),
        "latency_ms_p95_corrected": round(span + p95c, 3),
        "min_latency_ticks_corrected": int(np.ceil(
            2.0 * (span + p95c) * 62_500)),
        "total_hits": app.get_info()["total_hits"],
    })
    return info


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="time2,words14,fused,packed")
    ap.add_argument("--links", type=int, default=40)
    ap.add_argument("--frames", default="8,32",
                    help="frames per batch (comma list); span = N x 32.768 us")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--algorithm", default="AbsRS")
    ap.add_argument("--threshold", type=int, default=120)
    ap.add_argument("--no-threshold-on-collection", action="store_true")
    ap.add_argument("--codec-threads", type=int, default=2)
    ap.add_argument("--signal-rate", type=float, default=0.02)
    ap.add_argument("--backend", default="pallas",
                    help="pallas (production) | scan (XLA; CPU smoke runs)")
    ap.add_argument("--interpret", action="store_true",
                    help="pallas interpret mode (off-TPU smoke only)")
    ap.add_argument("--pipelined", action="store_true",
                    help="measure the depth-2 pipelined app: quantifies "
                         "the ~one-batch-period latency the mode trades "
                         "for throughput")
    ap.add_argument("--no-tunnel-gate", action="store_true")
    args = ap.parse_args(argv)

    out = {"links": args.links, "algorithm": args.algorithm,
           "threshold_on_collection": not args.no_threshold_on_collection,
           "arms": {}}
    if not args.no_tunnel_gate:
        import bench as bench_mod
        out["tunnel"] = bench_mod._tunnel_gate()
    for arm in args.arms.split(","):
        arm = arm.strip()
        out["arms"][arm] = {}
        for frames_n in (int(f) for f in args.frames.split(",")):
            res = run_arm(arm, args.links, frames_n, args.batches,
                          args.warmup, args.algorithm, args.threshold,
                          not args.no_threshold_on_collection,
                          args.codec_threads, args.signal_rate,
                          backend=args.backend, interpret=args.interpret,
                          pipelined=args.pipelined)
            out["arms"][arm][f"N{frames_n}"] = res
            print(f"# {arm} N={frames_n}: proc p50 "
                  f"{res['proc_ms_p50']} ms (corrected "
                  f"{res['proc_ms_p50_corrected']} ms), p95 latency "
                  f"{res['latency_ms_p95']} ms -> min_latency_ticks "
                  f"{res['min_latency_ticks']} "
                  f"(corrected {res['min_latency_ticks_corrected']})",
                  file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Whole-application sustained RTF on the chip (VERDICT r4 #1).

Every prior artifact measures a STAGE (kernel slope, ingest feed, host TP
path, latency); this one drives ``APAReadoutApp`` end-to-end — packed
WIBEth bytes -> batched sequence/timestamp preprocess -> zero-copy raw
retention -> host time2 codec -> device Pallas TPG -> one compact-hit
fetch -> batched whole-APA TP assembly -> TP latency buffer -> TPSet
windowing + cleanup — at the production configuration, and records the
sustained data-time / wall-time ratio plus per-stage accounting.

Reference chain being matched: the full processor+handler deployment unit,
src/wibeth/WIBEthFrameProcessor.cpp:411-572 feeding
src/TPCTPRequestHandler.cpp:100-193 (the reference's unit of deployment is
this assembled chain, not any one kernel).

Accounting honesty (the numbers this box can and cannot give):

* This box exposes ONE CPU core and reaches the TPU through the axon
  tunnel (per-sync RTT 40-600 ms).  All host stages therefore run
  SERIALIZED on one core, and the device stage pays tunnel transfer that
  a production PCIe/ICI attachment would not.  The recorded
  ``rtf_pipelined`` is the honest bytes->TPSets number for THIS rig.
* A production deployment fans the stages over dedicated cores (the
  reference does exactly this with per-link threads): the feed codec owns
  ~2 AVX-512 cores/APA, the preprocess+assembly+handler tail owns ~1-2
  cores, and the depth-2 pipelined device overlaps them all.  The
  ``projection`` object models that: projected_rtf = batch span / the
  slowest single stage, with every stage p50 published so the model is
  checkable.  Device time in the projection comes from the UNPIPELINED
  pass (submit->fetch wall minus host codec), which still includes tunnel
  transfer — the projection is therefore a LOWER bound on what local
  attachment would sustain.

Run:  python scripts/bench_app_rtf.py [--frames 128 --timed 12]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fdreadoutlibs_tpu.formats import wibeth  # noqa: E402

TS0 = 0x1000000
SPAN_S_PER_FRAME = wibeth.N_TIME_SAMPLES * 32 / 62.5e6


def generate_batches(L: int, N: int, B: int, signal_rate_per_frame: float,
                     seed: int = 0):
    """B distinct (L, N, 7200) uint8 WIBEth batches with continuous
    timestamps and sequence ids (the emulated 40-link source).  Generated
    UP FRONT so source emulation never pollutes the timed loop — and never
    mutated afterwards, which the zero-copy retention contract requires."""
    rng = np.random.default_rng(seed)
    ts = TS0
    batches = []
    for b in range(B):
        frames = np.zeros((L, N, wibeth.FRAME_SIZE), dtype=np.uint8)
        adcs = (900 + rng.normal(0, 30, size=(L, N, 64, 64))) \
            .astype(np.uint16)
        n_sig = int(rng.poisson(signal_rate_per_frame * N * L * 64))
        for _ in range(n_sig):
            link, c = rng.integers(0, L), rng.integers(0, 64)
            f, t = rng.integers(0, N), rng.integers(0, 50)
            adcs[link, f, t:t + 8, c] += np.uint16(rng.integers(300, 3000))
        for link in range(L):
            wibeth.set_adcs(frames[link], adcs[link])
            wibeth.fake_timestamps(frames[link], ts)
            wibeth.fake_seq_ids(frames[link], b * N)
            wibeth.fake_geoid(frames[link], 1, link // 8, link % 8)
        batches.append(frames)
        ts += N * wibeth.EXPECTED_TICK_DIFFERENCE
    return batches


def _build_app(L: int, N: int, pipelined: bool, algorithm: str,
               threshold: int, codec_threads: int, interpret: bool):
    from fdreadoutlibs_tpu.apps.apa_readout import APAReadoutApp
    return APAReadoutApp(
        n_links=L, algorithm=algorithm, threshold=threshold,
        threshold_on_collection=True, time2_feed=True,
        codec_threads=codec_threads, batched_assembly=True,
        raw_capacity_frames=max(4096, 4 * N), raw_retention="zerocopy",
        pipelined=pipelined, pallas_interpret=interpret)


def _stage_p50s(rows):
    keys = [k for k in rows[0] if k != "total_ms"]
    return {k: round(float(np.percentile([r[k] for r in rows], 50)), 3)
            for k in keys}


def run_mode(batches, L: int, N: int, warm: int, timed: int,
             pipelined: bool, algorithm: str, threshold: int,
             codec_threads: int, interpret: bool = False) -> dict:
    """One timed pass over the pregenerated stream; returns the sustained
    RTF and per-stage p50s, plus proof that TPSets flowed during the
    timed region (not just during warmup)."""
    app = _build_app(L, N, pipelined, algorithm, threshold, codec_threads,
                     interpret)
    for fb in batches[:warm]:
        app.process_batch(fb)
    app.batch_timings.clear()
    tpsets0 = app.handler.metrics.count("num_tpsets_sent")
    drained = 0

    t0 = time.perf_counter()
    for fb in batches[warm:warm + timed]:
        app.process_batch(fb)
        # the downstream trigger consumer: draining the TPSet queue is part
        # of a sustained deployment (an undrained queue eventually refuses
        # sends and the handler stops doing windowing work)
        drained += len(app.tpset_q.drain())
    app.flush()
    wall = time.perf_counter() - t0

    drained += len(app.tpset_q.drain())
    info = app.get_info()
    data_seconds = timed * N * SPAN_S_PER_FRAME
    rows = list(app.batch_timings)
    out = {
        "rtf": round(data_seconds / wall, 3),
        "wall_s": round(wall, 3),
        "data_s": round(data_seconds, 4),
        "stages_ms_p50": _stage_p50s(rows),
        "tpsets_sent_timed": app.handler.metrics.count("num_tpsets_sent")
        - tpsets0,
        "tpsets_drained": drained,
        "total_tps_sent": info["total_tps_sent"],
        "total_hits": info["total_hits"],
        "ts_errors": info["ts_errors"],
        "raw_frames_buffered": info["raw_buffered"],
    }
    # proof the data-request path is live on the SAME run: serve a raw
    # fragment for a recent window on link 0 and round-trip its binary
    # daqdataformats form
    last_ts = TS0 + (warm + timed) * N * wibeth.EXPECTED_TICK_DIFFERENCE
    start = last_ts - 64 * wibeth.EXPECTED_TICK_DIFFERENCE
    frag = app.readout[0].request_fragment(
        start, last_ts, run_number=app.run_number, trigger_number=1,
        source_id=0)
    from fdreadoutlibs_tpu.formats.fragment import Fragment
    blob = frag.to_bytes()
    rt = Fragment.from_bytes(blob)
    assert rt.header.window_begin == frag.header.window_begin
    out["fragment_payloads"] = len(frag)
    out["fragment_bytes"] = len(blob)
    return out


def projection(span_ms: float, unpiped: dict,
               host_codec_cores: float = 2.0,
               host_tail_cores: float = 2.0) -> dict:
    """Production multi-core stage-overlap model (module docstring): every
    stage owns its core budget and the depth-2 pipeline overlaps the
    device, so the sustained rate is set by the slowest stage alone.
    Codec and host-tail stage times divide by their production core
    budgets (the codec is native std::thread-parallel — measured ~linear
    to 2-4 threads; the tail's batched assembly/windowing shards by link
    subsets the same way the reference fans links over threads)."""
    st = unpiped["stages_ms_p50"]
    host_tail_ms = sum(st[k] for k in ("preprocess_ms", "retention_ms",
                                       "assembly_ms", "handler_ms"))
    stages = {
        "codec_ms": st["codec_ms"] / host_codec_cores,
        "host_tail_ms": host_tail_ms / host_tail_cores,
        "device_ms": st["device_ms"],      # tunnel-inclusive: conservative
    }
    bottleneck = max(stages, key=stages.get)
    return {
        "assumes": {"codec_cores": host_codec_cores,
                    "host_tail_cores": host_tail_cores,
                    "device": "depth-2 pipelined, tunnel-inclusive time"},
        "stage_ms": {k: round(v, 3) for k, v in stages.items()},
        "bottleneck_stage": bottleneck,
        "projected_rtf": round(span_ms / stages[bottleneck], 2),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", type=int, default=40)
    ap.add_argument("--frames", type=int, default=128,
                    help="frames per batch per link (batch span = "
                         "frames * 32.768 us)")
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--timed", type=int, default=12)
    ap.add_argument("--algorithm", default="AbsRS")
    ap.add_argument("--threshold", type=int, default=150)
    ap.add_argument("--signal-rate", type=float, default=0.0025,
                    help="signals per channel per frame")
    ap.add_argument("--codec-threads", type=int, default=1,
                    help="this box has one core; production uses ~2")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke run (tiny shapes advised)")
    args = ap.parse_args(argv)

    L, N = args.links, args.frames
    B = args.warm + args.timed
    t_gen = time.perf_counter()
    batches = generate_batches(L, N, B, args.signal_rate)
    gen_s = time.perf_counter() - t_gen

    span_ms = N * SPAN_S_PER_FRAME * 1e3
    common = dict(L=L, N=N, warm=args.warm, timed=args.timed,
                  algorithm=args.algorithm, threshold=args.threshold,
                  codec_threads=args.codec_threads,
                  interpret=args.interpret)
    unpiped = run_mode(batches, pipelined=False, **common)
    piped = run_mode(batches, pipelined=True, **common)

    out = {
        "metric": "app_rtf",
        "config": {"links": L, "frames_per_batch": N,
                   "batches_timed": args.timed,
                   "algorithm": args.algorithm,
                   "threshold_on_collection": True,
                   "feed": "time2", "retention": "zerocopy",
                   "assembly": "batched", "source_pregen_s": round(gen_s, 1)},
        "batch_span_ms": round(span_ms, 3),
        "rtf_pipelined": piped["rtf"],
        "rtf_unpipelined": unpiped["rtf"],
        "pipelined": piped,
        "unpipelined": unpiped,
        "projection": projection(span_ms, unpiped),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Hardware soak: a production configuration (default AbsRS with
threshold-on-collection; --alg FIR runs the legacy family on its blocked
layout) over a long carried-state stream, with a mid-stream
checkpoint/resume equivalence check.

Runs N windows of T ticks x C channels through the compiled Pallas kernel
with deterministic injected pulses; asserts (a) the exact expected hit
count (every pulse found, nothing dropped, nothing invented), (b) a run
that checkpoints at the midpoint and resumes in a fresh state stack ends
bit-identical to the uninterrupted run.  Prints one JSON line.

Usage: python scripts/soak_hardware.py [--windows 200] [--ticks 4096]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=200)
    ap.add_argument("--ticks", type=int, default=4096)
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--alg", default="AbsRS",
                    choices=["AbsRS", "SimpleThreshold", "StandardRS",
                             "FIR"])
    ap.add_argument("--fused", action="store_true",
                    help="soak the fused byte-ingest path instead "
                         "(in-kernel words14 unpack; BENCH_NOTES r3)")
    ap.add_argument("--words14-feed", action="store_true",
                    help="soak the words14-ordered FEED path: host C++ "
                         "relayout (native.relayout_words14) -> zero "
                         "device relayout (implies the fused kernel)")
    ap.add_argument("--time2-feed", action="store_true",
                    help="soak the time-paired FEED path: host C++ unpack "
                         "+ pairing (native.relayout_time2) -> plain "
                         "kernel datapath at half the ADC HBM traffic")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (
        decode_pallas_hits, default_block_sublanes, pack_adcs, pack_state,
        process_window_pallas)

    assert jax.default_backend() == "tpu", "soak needs the real chip"
    from fdreadoutlibs_tpu.utils.preflight import device_preflight
    device_preflight()   # fail fast on libtpu client/terminal skew
    C, T, W = args.channels, args.ticks, args.windows
    if args.alg == "FIR":
        cfg = TPGConfig.from_raw("FIR", threshold=5, track_peaks=False)
        rmf = np.full(C, cfg.rs_memory_factor_x10)
    else:
        cfg = TPGConfig.from_raw(args.alg, threshold=150)
        rmf = np.where(np.arange(C) % 8 < 3, 0, cfg.rs_memory_factor_x10) \
            if args.alg == "AbsRS" else np.full(C, cfg.rs_memory_factor_x10)

    rng = np.random.default_rng(42)
    base = (900 + rng.normal(0, 10, size=(T, C))).astype(np.int32)
    # deterministic pulses: 8 channels, one clean pulse per window each,
    # amplitude far above noise and the RS decay tail
    pulse_chans = np.array([5, 300, 777, 1201, 1600, 1999, 2222, 2500])
    adcs = base.copy()
    for c in pulse_chans:
        adcs[1000:1008, c] += 2500

    # channels are independent, so the numpy oracle on just the pulse
    # channels gives the exact expected hit count (AbsRS on memory
    # channels can legitimately close more than once per pulse)
    from fdreadoutlibs_tpu.ops.reference import process_window_reference
    sub = adcs[:, pulse_chans]
    sub_rmf = rmf[pulse_chans]
    st_sub = seed_chanstate(init_chanstate(len(pulse_chans)), sub[0],
                            sub_rmf)
    expected_per_window = []
    for _ in range(3):
        h, st_sub = process_window_reference(sub, st_sub, cfg)
        expected_per_window.append(len(h))
    assert expected_per_window[1] == expected_per_window[2], \
        "oracle not steady-state by window 2"

    def expected_total(n):
        return expected_per_window[0] + (n - 1) * expected_per_window[1]

    seeded = seed_chanstate(init_chanstate(C), adcs[0], rmf)
    positions = None
    if args.words14_feed:
        args.fused = True
    if args.fused:
        # fused byte-ingest: the stream enters as packed WIBEth frame
        # words and the 14-bit unpack happens IN the kernel (words14
        # layout), so the soak covers encode -> in-kernel decode -> TPG
        # -> compaction with carried state
        from fdreadoutlibs_tpu.formats import wibeth
        from fdreadoutlibs_tpu.ops.ingest import process_packed_frames_fused
        from fdreadoutlibs_tpu.ops.pallas_tpg import words14_positions
        assert C % wibeth.N_CHANNELS == 0 and \
            T % wibeth.N_TIME_SAMPLES == 0, "fused soak needs whole frames"
        L = C // wibeth.N_CHANNELS
        n_frames = T // wibeth.N_TIME_SAMPLES
        frames = wibeth.empty_frames(L * n_frames)
        a = adcs.reshape(n_frames, wibeth.N_TIME_SAMPLES, L,
                         wibeth.N_CHANNELS).transpose(2, 0, 1, 3)
        wibeth.set_adcs(frames, a.reshape(L * n_frames,
                                          wibeth.N_TIME_SAMPLES,
                                          wibeth.N_CHANNELS)
                        .astype(np.uint16))
        host_words = wibeth.frames_bytes_to_u32(frames).reshape(L, T, 28)
        positions = words14_positions(C)
        # words14 blocks are 16-row multiples; whole-block otherwise
        state0 = pack_state(seeded, C, positions=positions,
                            block_sublanes=16 if args.alg == "FIR" else None)
        if args.words14_feed:
            # host/NIC-side relayout (the C++ codec): the device consumes
            # kernel-ordered rows with zero relayout
            from fdreadoutlibs_tpu import native
            from fdreadoutlibs_tpu.ops.ingest import process_words14_feed
            feed = jnp.asarray(native.relayout_words14(host_words))

            def step(stack):
                return process_words14_feed(
                    feed, stack, cfg, C, tc=512, k_slots=2, unroll=16,
                    vmem_limit_mb=64)
        else:
            words = jnp.asarray(host_words)

            def step(stack):
                return process_packed_frames_fused(
                    words, stack, cfg, C, tc=512, k_slots=2, unroll=16,
                    vmem_limit_mb=64)
    elif args.time2_feed:
        # host-side unpack + time-pairing: encode the stream into WIBEth
        # frames, relayout with the C++ codec, soak the time_packed
        # kernel datapath with carried state
        from fdreadoutlibs_tpu import native
        from fdreadoutlibs_tpu.formats import wibeth
        from fdreadoutlibs_tpu.ops.ingest import process_time2_feed
        assert C % wibeth.N_CHANNELS == 0 and \
            T % wibeth.N_TIME_SAMPLES == 0, "time2 soak needs whole frames"
        L = C // wibeth.N_CHANNELS
        n_frames = T // wibeth.N_TIME_SAMPLES
        frames = wibeth.empty_frames(L * n_frames)
        a = adcs.reshape(n_frames, wibeth.N_TIME_SAMPLES, L,
                         wibeth.N_CHANNELS).transpose(2, 0, 1, 3)
        wibeth.set_adcs(frames, a.reshape(L * n_frames,
                                          wibeth.N_TIME_SAMPLES,
                                          wibeth.N_CHANNELS)
                        .astype(np.uint16))
        host_words = wibeth.frames_bytes_to_u32(frames).reshape(L, T, 28)
        # pad8=False: the production app ships UNPADDED rows and pads on
        # device (apa_readout time2 transfer cut) — soak the same path
        feed = jnp.asarray(native.relayout_time2(host_words, pad8=False))
        state0 = pack_state(seeded, C,
                            block_sublanes=default_block_sublanes(cfg, C))

        def step(stack):
            return process_time2_feed(
                feed, stack, cfg, C, tc=512, k_slots=2, unroll=16,
                vmem_limit_mb=64)
    else:
        packed = jnp.asarray(pack_adcs(adcs))
        state0 = pack_state(seeded, C,
                            block_sublanes=default_block_sublanes(cfg, C))

        def step(stack):
            return process_window_pallas(
                packed, stack, cfg, tc=512, k_slots=2, unroll=16,
                vmem_limit_mb=64)

    def run(stack, n_windows):
        hits_total = 0
        dropped_total = 0
        for _ in range(n_windows):
            slots, nclose, stack = step(stack)
            h, d = decode_pallas_hits(slots, nclose, C,
                                      positions=positions)
            hits_total += len(h)
            dropped_total += d
        return stack, hits_total, dropped_total

    t0 = time.perf_counter()
    # uninterrupted run
    final_a, hits_a, drop_a = run(state0, W)
    # checkpointed run: halt at the midpoint, round-trip the state through
    # host numpy (the checkpoint format), resume in a fresh buffer
    mid, hits_b1, drop_b1 = run(state0, W // 2)
    ckpt = np.asarray(mid)                       # device -> host snapshot
    resumed = jnp.asarray(ckpt.copy())           # fresh device buffer
    final_b, hits_b2, drop_b2 = run(resumed, W - W // 2)
    wall = time.perf_counter() - t0

    same = bool((np.asarray(final_a) == np.asarray(final_b)).all())
    hits_b = hits_b1 + hits_b2
    samples = W * T * C
    result = {
        "windows": W, "ticks": T, "channels": C,
        "gsamples": round(samples / 1e9, 2),
        "data_seconds": round(W * T / (62.5e6 / 32), 2),
        "wall_seconds": round(wall, 1),
        "hits": hits_a, "expected": expected_total(W),
        "dropped": drop_a,
        "resume_hits": hits_b,
        "state_bitexact_after_resume": same,
    }
    print(json.dumps(result))
    assert same, "resumed state diverged"
    assert hits_a == hits_b, "resumed run found different hits"
    assert drop_a == 0, f"{drop_a} hits dropped"
    assert hits_a == expected_total(W), \
        f"hits {hits_a} != expected {expected_total(W)}"
    print("SOAK OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

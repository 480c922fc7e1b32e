#!/usr/bin/env python
"""Kernel A/B bench harness (real chip): slope-timed GS/s for one config.

Usage: python scripts/bench_kernel.py --alg AbsRS --tc 1024 --k 2 \
         --unroll 8 --channels 2560 [--mf-shift 3] [--trials 5]

Method matches bench.py: N-window lax.scan inside one jit, slope timing
(difference of 1-call vs 6-call chains, one hard sync each) with medians
over positive-slope trials — see BENCH_NOTES.md for why.
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
    ap.add_argument("--alg", default="SimpleThreshold")
    ap.add_argument("--threshold", type=int, default=150)
    ap.add_argument("--tc", type=int, default=1024)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--ticks", type=int, default=8192)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--vmem", type=int, default=64)
    ap.add_argument("--sub", type=int, default=0,
                    help="channel-block sublane rows (0 = one whole block); "
                         "smaller blocks cut loop-carried vreg pressure for "
                         "state-heavy kernels (FIR)")
    ap.add_argument("--fir-packed", default="auto",
                    choices=["auto", "on", "off"],
                    help="FIR packed SWAR carry (IQR pairs + ct word)")
    ap.add_argument("--mf-shift", default="auto",
                    help="'auto' (from_raw default), 'none', or an int")
    ap.add_argument("--track-peaks", action="store_true",
                    help="force peak tracking on (FIR defaults off, like "
                         "the reference kernels)")
    ap.add_argument("--mf-mixed", action="store_true",
                    help="zero memory factor on even channels "
                         "(threshold-on-collection shape)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (
        decode_pallas_hits, pack_adcs, pack_state, process_window_pallas)

    assert jax.default_backend() == "tpu", "A/B harness needs the real chip"
    C, T = args.channels, args.ticks
    kw = {}
    if args.mf_shift != "auto":
        kw["rs_mf_shift"] = None if args.mf_shift == "none" \
            else int(args.mf_shift)
    if not args.track_peaks and args.alg == "FIR":
        kw["track_peaks"] = False   # reference-shaped FIR records
    cfg = TPGConfig.from_raw(args.alg, threshold=args.threshold, **kw)
    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    packed = jnp.asarray(pack_adcs(adcs))
    rmf = cfg.rs_memory_factor_x10
    if args.mf_mixed:
        rmf = np.where(np.arange(C) % 2 == 0, 0, rmf)
    state0 = pack_state(seed_chanstate(init_chanstate(C), adcs[0], rmf), C,
                        block_sublanes=args.sub or None)

    fir_packed = {"auto": None, "on": True, "off": False}[args.fir_packed]

    @jax.jit
    def multi_window(s):
        def body(s, _):
            slots, nclose, s = process_window_pallas(
                packed, s, cfg, tc=args.tc, k_slots=args.k,
                unroll=args.unroll, vmem_limit_mb=args.vmem,
                fir_packed=fir_packed)
            return s, jnp.sum(nclose)
        s, counts = jax.lax.scan(body, s, None, length=args.windows)
        return s, counts

    def chain(n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = multi_window(s)
        _ = float(jnp.sum(s[:, 0]))
        return time.perf_counter() - t0, s

    slots, nclose, _ = process_window_pallas(
        packed, state0, cfg, tc=args.tc, k_slots=args.k,
        unroll=args.unroll, vmem_limit_mb=args.vmem, fir_packed=fir_packed)
    hits, dropped = decode_pallas_hits(slots, nclose, C)
    chain(1, state0)  # compile multi_window

    per_call = []
    for _ in range(2 * args.trials):
        t_a, _ = chain(1, state0)
        t_b, _ = chain(6, state0)
        slope = (t_b - t_a) / 5 / args.windows
        if slope > 0:
            per_call.append(slope)
        if len(per_call) >= args.trials:
            break
    dt = float(np.median(per_call)) if per_call else float("nan")
    gsps = T * C / dt / 1e9
    rtf = (T / (62.5e6 / 32)) / dt
    print(json.dumps({
        "alg": args.alg, "tc": args.tc, "k": args.k, "unroll": args.unroll,
        "sub": args.sub or None, "fir_packed": args.fir_packed,
        "channels": C, "mf_shift": cfg.rs_mf_shift, "mf_mixed": args.mf_mixed,
        "track_peaks": cfg.track_peaks,
        "ms_per_window": round(dt * 1e3, 4), "gsps": round(gsps, 1),
        "rtf": round(rtf, 2), "hits": len(hits), "dropped": dropped,
        "trials": len(per_call),
    }))


if __name__ == "__main__":
    main()

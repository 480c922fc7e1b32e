#!/usr/bin/env python
"""SWTPG benchmark: sustained APA real-time factors on one chip, all four
algorithm families.

Headline metric: real-time factor for a full 2560-channel APA running the
PRODUCTION configuration — AbsRS with threshold-on-collection (per-channel
memory factor 0 on collection channels, the deployed DUNE config;
reference src/wibeth/WIBEthFrameProcessor.cpp:441-450).  value = (data
time span processed) / (wall clock) at the WIBEth sampling rate
(2560 ch x 62.5 MHz / 32 = 5.0 GS/s aggregate).  Reference parity is 1.0
(the C++/AVX2 reference achieves ~real-time on a multicore CPU at
<256 ch/thread, BASELINE.md); the north-star target is >= 10x.  The JSON
line additionally reports every algorithm family so the headline cannot
over-represent the cheapest kernel.

Timing is slope-based (difference of two chained-iteration counts with one
hard sync each) to cancel the remote-TPU tunnel's per-sync latency; see
BENCH_NOTES.md.
"""

import json
import sys
import time

import numpy as np


def bench_algorithm(cfg, tc, k_slots, unroll, on_tpu, adcs, rmf,
                    n_windows, trials=5):
    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (
        decode_pallas_hits, default_block_sublanes, pack_adcs, pack_state,
        process_window_pallas)

    T, C = adcs.shape
    packed = jnp.asarray(pack_adcs(adcs))
    # FIR runs in 8-row channel blocks (register pressure; the other
    # families stay whole-block — default_block_sublanes docs)
    state0 = pack_state(seed_chanstate(init_chanstate(C), adcs[0], rmf), C,
                        block_sublanes=default_block_sublanes(cfg, C))

    def one_window(s):
        return process_window_pallas(packed, s, cfg, tc=tc, k_slots=k_slots,
                                     unroll=unroll,
                                     vmem_limit_mb=64 if on_tpu else None,
                                     interpret=not on_tpu)

    # scan N windows inside one jit so the (tunnel-inflated) per-dispatch
    # overhead is amortized device-side, as a streaming deployment would
    @jax.jit
    def multi_window(s):
        def body(s, _):
            slots, nclose, s = one_window(s)
            return s, jnp.sum(nclose)
        s, counts = jax.lax.scan(body, s, None, length=n_windows)
        return s, counts

    def chain(n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = multi_window(s)
        _ = float(jnp.sum(s[:, 0]))             # hard sync
        return time.perf_counter() - t0, s

    # warm up / compile, and sanity-check the hit path
    slots, nclose, _ = one_window(state0)
    hits, _ = decode_pallas_hits(slots, nclose, C)
    min_hits = 50 if on_tpu else 3
    assert len(hits) > min_hits, \
        f"{cfg.algorithm}: hit path produced only {len(hits)} hits"
    chain(1, state0)

    if on_tpu:
        # slope timing with positive-slope filtering: the tunnel's per-sync
        # latency is large and variable enough to occasionally invert a
        # single (short, long) pair
        per_call = []
        for _ in range(2 * trials):
            t_a, _ = chain(1, state0)
            t_b, _ = chain(6, state0)
            slope = (t_b - t_a) / 5 / n_windows
            if slope > 0:
                per_call.append(slope)
            if len(per_call) >= trials:
                break
        assert per_call, "all timing trials inverted; tunnel too unstable"
        dt = float(np.median(per_call))
    else:  # interpret mode is not a performance path; time one call
        dt, _ = chain(1, state0)
        dt /= n_windows

    sample_hz = 62.5e6 / 32                     # 1.953125 MHz per channel
    return (T / sample_hz) / dt


def main():
    import jax
    from fdreadoutlibs_tpu.ops import TPGConfig

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # fail fast (with both build strings) on libtpu client/terminal
        # skew instead of deep inside the first device_put (VERDICT r2 #8)
        from fdreadoutlibs_tpu.utils.preflight import device_preflight
        device_preflight()
    C = 2560
    T = 8192 if on_tpu else 512      # interpret mode is a smoke test only
    N_WINDOWS = 16 if on_tpu else 1

    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    # sprinkle realistic signals so the hit path is exercised
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)

    # per-algorithm production-shaped configs; (cfg, tc, k, unroll, rmf)
    def mixed_rmf(cfg):
        # threshold-on-collection: collection channels memoryless
        # (WIBEthFrameProcessor.cpp:441-450); every 5th of 8 channels
        # collection-like is a stand-in plane split at bench scale
        return np.where(np.arange(C) % 8 < 3, 0, cfg.rs_memory_factor_x10)

    from fdreadoutlibs_tpu.ops.pallas_tpg import SHIPPED_KNOBS

    def knobs(cfg):
        k = SHIPPED_KNOBS[cfg.algorithm]
        return k["tc"], 1, k["unroll"]

    prod = TPGConfig.from_raw("AbsRS", threshold=150)
    simple = TPGConfig.from_raw("SimpleThreshold", threshold=150)
    std = TPGConfig.from_raw("StandardRS", threshold=150)
    # reference-shaped FIR records: the WIB/WIB2 consumers derive
    # peaks at TP assembly, so the kernel skips peak tracking
    fir = TPGConfig.from_raw("FIR", threshold=5, track_peaks=False)
    runs = {
        "AbsRS_production": (prod, *knobs(prod), mixed_rmf(prod)),
        "SimpleThreshold": (simple, *knobs(simple), None),
        "StandardRS": (std, *knobs(std), None),
        "FIR": (fir, *knobs(fir), None),
    }
    if not on_tpu:  # smoke-test shapes: tc must divide T
        runs = {k: (cfg, 256, 2, 8, rmf)
                for k, (cfg, _, _, _, rmf) in runs.items()}

    results = {}
    for name, (cfg, tc, k, unroll, rmf) in runs.items():
        if rmf is None:
            rmf = cfg.rs_memory_factor_x10
        # the headline (production) number gets extra trials: the tunnel's
        # phase noise dominates single readings (BENCH_NOTES)
        trials = 7 if name == "AbsRS_production" else 5
        results[name] = round(bench_algorithm(
            cfg, tc, k, unroll, on_tpu, adcs, rmf, N_WINDOWS,
            trials=trials), 2)

    rtf = results["AbsRS_production"]
    print(json.dumps({
        "metric": "apa_realtime_factor_swtpg_production",
        "value": rtf,
        "unit": "x_realtime_2560ch_APA",
        "vs_baseline": rtf,
        "algorithms": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""SWTPG benchmark: sustained APA real-time factor on one chip.

Metric: real-time factor for a full 2560-channel APA at the WIBEth sampling
rate (2560 ch x 62.5 MHz / 32 = 5.0 GS/s aggregate).  value = (data time
span processed) / (wall clock).  Reference parity is 1.0 (the C++/AVX2
reference achieves ~real-time on a multicore CPU at <256 ch/thread,
BASELINE.md); the north-star target is >= 10x.  vs_baseline reports
value / 1.0 (multiples of reference real-time parity).

Timing is slope-based (difference of two chained-iteration counts with one
hard sync each) to cancel the remote-TPU tunnel's per-sync latency.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (
        decode_pallas_hits, pack_adcs, pack_state, process_window_pallas)

    on_tpu = jax.default_backend() == "tpu"
    C = 2560
    T = 8192 if on_tpu else 512      # interpret mode is a smoke test only
    TC, K, UNROLL = (1024 if on_tpu else 512), 2, 8
    SAMPLE_HZ = 62.5e6 / 32                     # 1.953125 MHz per channel
    cfg = TPGConfig(threshold=150)

    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    # sprinkle realistic signals so the hit path is exercised
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    packed = jnp.asarray(pack_adcs(adcs))
    state0 = pack_state(seed_chanstate(init_chanstate(C), adcs[0],
                                       cfg.rs_memory_factor_x10), C)

    def one_window(s):
        return process_window_pallas(packed, s, cfg, tc=TC, k_slots=K,
                                     unroll=UNROLL,
                                     vmem_limit_mb=64 if on_tpu else None,
                                     interpret=not on_tpu)

    # scan N windows inside one jit so the (tunnel-inflated) per-dispatch
    # overhead is amortized device-side, as a streaming deployment would
    N_WINDOWS = 16 if on_tpu else 1

    @jax.jit
    def multi_window(s):
        def body(s, _):
            slots, nclose, s = one_window(s)
            return s, jnp.sum(nclose)
        s, counts = jax.lax.scan(body, s, None, length=N_WINDOWS)
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
    assert len(hits) > min_hits, f"hit path produced only {len(hits)} hits"
    chain(1, state0)

    if on_tpu:
        # slope timing with positive-slope filtering: the tunnel's per-sync
        # latency is large and variable enough to occasionally invert a
        # single (short, long) pair
        per_call = []
        for _ in range(10):
            t_a, _ = chain(1, state0)
            t_b, _ = chain(6, state0)
            slope = (t_b - t_a) / 5 / N_WINDOWS
            if slope > 0:
                per_call.append(slope)
            if len(per_call) >= 5:
                break
        assert per_call, "all timing trials inverted; tunnel too unstable"
        dt = float(np.median(per_call))
    else:  # interpret mode is not a performance path; time one call
        dt, _ = chain(1, state0)
        dt /= N_WINDOWS

    data_seconds = T / SAMPLE_HZ
    rtf = data_seconds / dt
    print(json.dumps({
        "metric": "apa_realtime_factor_swtpg",
        "value": round(rtf, 2),
        "unit": "x_realtime_2560ch_APA",
        "vs_baseline": round(rtf, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

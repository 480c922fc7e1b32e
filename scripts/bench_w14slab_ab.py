#!/usr/bin/env python
"""Interleaved A/B of the words14 in-kernel unpack SCHEDULES (real chip):

* pertick — the shipped per-tick unpack inside the serial tick loop
  (_unpack14_rows: quarter-height extracts + 16-way stack per tick);
* slab — the two-stage schedule (words14_slab=True): whole-chunk unpack
  into a time2-packed VMEM scratch with full-height ops, then the plain
  time2 tick loop (VERDICT r3 #3: amortize the layout churn over tc);
* time2 — the time2 host-feed datapath on equivalently-sized resident
  input (context: the device-work floor the slab schedule chases).

Method = scripts/bench_ab.py (BENCH_NOTES): N-window scan per chained
call, slope between 1 and 6 chains, positive slopes only, rotated visit
order, medians; hit parity asserted in-harness before timing.

Usage: python scripts/bench_w14slab_ab.py [--alg AbsRS] [--trials 5]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alg", default="AbsRS")
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--ticks", type=int, default=4096)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--tc", type=int, default=0, help="0 = shipped knob")
    ap.add_argument("--unroll", type=int, default=0, help="0 = shipped")
    ap.add_argument("--no-time2-arm", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.formats import wibeth
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.ingest import (pack_words14_jnp,
                                              process_time2_feed,
                                              process_words14_feed)
    from fdreadoutlibs_tpu.ops.pallas_tpg import (pack_adcs_time2, pack_state,
                                                  words14_positions)
    from fdreadoutlibs_tpu.utils.tuning import kernel_knobs

    assert jax.default_backend() == "tpu"
    C, T = args.channels, args.ticks
    L, nf = C // 64, T // 64
    cfg = TPGConfig.from_raw(args.alg, threshold=150)
    knobs = kernel_knobs(cfg, C)
    tc = args.tc or knobs["tc"]
    unroll = args.unroll or knobs["unroll"]
    if unroll % 2:
        unroll += 1                       # slab/time2 arms need even
    rng = np.random.default_rng(3)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    frames = wibeth.empty_frames(L * nf)
    a = adcs.reshape(nf, 64, L, 64).transpose(2, 0, 1, 3)
    wibeth.set_adcs(frames, a.reshape(L * nf, 64, 64).astype(np.uint16))
    words = wibeth.frames_bytes_to_u32(frames).reshape(L, T, 28)
    W = jnp.asarray(pack_words14_jnp(jnp.asarray(words)))
    W2 = jnp.asarray(pack_adcs_time2(adcs))
    pos = words14_positions(C)
    st = seed_chanstate(init_chanstate(C), adcs[0], cfg.rs_memory_factor_x10)
    s0 = pack_state(st, C, positions=pos)
    s0c = pack_state(st, C)               # canonical order (time2 arm)

    def make_w14(slab):
        @functools.partial(jax.jit, static_argnames=("n",))
        def multi(s, n=args.windows):
            def body(s, _):
                slots, nclose, s = process_words14_feed(
                    W, s, cfg, C, tc=tc, k_slots=2, unroll=unroll,
                    vmem_limit_mb=64, slab=slab)
                return s, jnp.sum(nclose)
            return jax.lax.scan(body, s, None, length=n)
        return multi

    @functools.partial(jax.jit, static_argnames=("n",))
    def multi_t2(s, n=args.windows):
        def body(s, _):
            slots, nclose, s = process_time2_feed(
                W2, s, cfg, C, tc=tc, k_slots=2, unroll=unroll,
                vmem_limit_mb=64)
            return s, jnp.sum(nclose)
        return jax.lax.scan(body, s, None, length=n)

    names = ["pertick", "slab"]
    fns = {"pertick": make_w14(False), "slab": make_w14(True)}
    states = {"pertick": s0, "slab": s0}
    if not args.no_time2_arm:
        names.append("time2")
        fns["time2"] = multi_t2
        states["time2"] = s0c
    # compile + strict parity between the two words14 schedules (state
    # AND per-window close counts); the time2 arm checks counts only
    # (canonical state order differs by the positions permutation)
    res = {k: tuple(np.asarray(x) for x in fns[k](states[k], n=2))
           for k in names}
    np.testing.assert_array_equal(res["pertick"][0], res["slab"][0])
    np.testing.assert_array_equal(res["pertick"][1], res["slab"][1])
    if "time2" in res:
        np.testing.assert_array_equal(res["pertick"][1], res["time2"][1])

    def chain(fn, n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = fn(s)
        _ = float(jnp.sum(s[:, 0]))
        return time.perf_counter() - t0

    per = {k: [] for k in names}
    for t in range(args.trials):
        order = names if t % 2 == 0 else names[::-1]
        for k in order:
            t_a = chain(fns[k], 1, states[k])
            t_b = chain(fns[k], 6, states[k])
            slope = (t_b - t_a) / 5 / args.windows
            if slope > 0:
                per[k].append(slope)

    out = {"alg": args.alg, "tc": tc, "unroll": unroll}
    window_s = T * 32 / 62.5e6
    for k in names:
        dt = float(np.median(per[k])) if per[k] else None
        out[k] = {"ms": round(dt * 1e3, 4) if dt else None,
                  "gsps": round(T * C / dt / 1e9, 1) if dt else None,
                  "rtf": round(window_s / dt, 2) if dt else None,
                  "n": len(per[k])}
    if out["pertick"]["ms"] and out["slab"]["ms"]:
        out["ratio_pertick_over_slab"] = round(
            out["pertick"]["ms"] / out["slab"]["ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

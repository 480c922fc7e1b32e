#!/usr/bin/env python
"""Interleaved kernel A/B (real chip): compile N configs, interleave the
slope trials round-robin so tunnel drift hits every variant equally.
Ratios between variants within one run are the reliable signal
(BENCH_NOTES measurement method).

Usage:
  python scripts/bench_ab.py --alg FIR \
      --config "tc=512,unroll=16,sub=8" --config "tc=512,unroll=64,sub=8"

Config keys: tc, k, unroll, sub (0 = whole block), packed (0/1 fir SWAR),
twopass (1 = two-pass FIR schedule), mfmix (1 = threshold-on-collection
mixed memory factors), vmem.  Unset keys fall back to --tc/--k/--unroll
defaults.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_config(s, defaults):
    out = dict(defaults)
    for part in s.split(","):
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alg", default="FIR")
    ap.add_argument("--threshold", type=int, default=None)
    ap.add_argument("--config", action="append", required=True)
    ap.add_argument("--tc", type=int, default=512)
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--unroll", type=int, default=32)
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--ticks", type=int, default=8192)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (pack_adcs, pack_state,
                                                  process_window_pallas)

    assert jax.default_backend() == "tpu"
    C, T = args.channels, args.ticks
    kw = {"track_peaks": False} if args.alg == "FIR" else {}
    thr = args.threshold if args.threshold is not None else \
        (5 if args.alg == "FIR" else 150)
    cfg = TPGConfig.from_raw(args.alg, threshold=thr, **kw)
    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    packed = jnp.asarray(pack_adcs(adcs))

    defaults = {"tc": args.tc, "k": args.k, "unroll": args.unroll,
                "sub": 0, "packed": -1, "twopass": 0, "mfmix": 0,
                "vmem": 64}
    configs = [parse_config(s, defaults) for s in args.config]
    fns, states = [], []
    for c_ in configs:
        rmf = np.where(np.arange(C) % 8 < 3, 0, cfg.rs_memory_factor_x10) \
            if c_["mfmix"] else cfg.rs_memory_factor_x10
        state = seed_chanstate(init_chanstate(C), adcs[0], rmf)
        st0 = pack_state(state, C, block_sublanes=c_["sub"] or None)
        fp = None if c_["packed"] < 0 else bool(c_["packed"])

        def mw(s, _c=c_, _fp=fp):
            def body(s, _):
                slots, nclose, s = process_window_pallas(
                    packed, s, cfg, tc=_c["tc"], k_slots=_c["k"],
                    unroll=_c["unroll"], vmem_limit_mb=_c["vmem"],
                    fir_packed=_fp, fir_twopass=_c["twopass"])
                return s, jnp.sum(nclose)
            s, counts = jax.lax.scan(body, s, None, length=args.windows)
            return s, counts
        fn = jax.jit(mw)
        fn(st0)[0].block_until_ready()
        fns.append(fn)
        states.append(st0)

    def chain(fn, n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = fn(s)
        _ = float(jnp.sum(s[:, 0]))
        return time.perf_counter() - t0

    per = [[] for _ in configs]
    n = len(fns)
    for t in range(args.trials):
        # rotate the visit order each cycle so periodic tunnel drift
        # cannot systematically favor one slot in the round-robin
        for i in [(t + j) % n for j in range(n)]:
            t_a = chain(fns[i], 1, states[i])
            t_b = chain(fns[i], 6, states[i])
            slope = (t_b - t_a) / 5 / args.windows
            if slope > 0:
                per[i].append(slope)

    base = float(np.median(per[0])) if per[0] else None
    for i, c_ in enumerate(configs):
        if not per[i]:          # no positive slope survived (wedged link)
            print(json.dumps({"config": args.config[i], "ms": None,
                              "n": 0}))
            continue
        dt = float(np.median(per[i]))
        print(json.dumps({
            "config": args.config[i], "ms": round(dt * 1e3, 4),
            "gsps": round(T * C / dt / 1e9, 1),
            "rtf": round((T / (62.5e6 / 32)) / dt, 2),
            "vs_first": round(base / dt, 3) if base else None,
            "n": len(per[i])}))


if __name__ == "__main__":
    main()

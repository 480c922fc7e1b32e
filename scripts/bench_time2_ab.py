#!/usr/bin/env python
"""Interleaved knob A/B for the time2 feed path (real chip): the
time_packed kernel sees HALF the input rows per tick chunk, so its
optimal (tc, unroll, k) may differ from the plain-path shipped knobs.

Method = scripts/bench_ab.py (BENCH_NOTES): 16-window scan per chained
call, slope between 1 and 6 chains, positive slopes only, rotated visit
order, medians.

Usage:
  python scripts/bench_time2_ab.py \
      --config "tc=256,unroll=32,k=1" --config "tc=512,unroll=16,k=2"
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_config(s):
    out = {"tc": 256, "unroll": 32, "k": 1, "vmem": 64}
    for part in s.split(","):
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alg", default="AbsRS")
    ap.add_argument("--config", action="append", required=True)
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--ticks", type=int, default=4096)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu import native
    from fdreadoutlibs_tpu.formats import wibeth
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (pack_state,
                                                  process_window_pallas)

    assert jax.default_backend() == "tpu"
    C, T = args.channels, args.ticks
    L, nf = C // 64, T // 64
    cfg = TPGConfig.from_raw(args.alg, threshold=150)
    rng = np.random.default_rng(3)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    frames = wibeth.empty_frames(L * nf)
    a = adcs.reshape(nf, 64, L, 64).transpose(2, 0, 1, 3)
    wibeth.set_adcs(frames, a.reshape(L * nf, 64, 64).astype(np.uint16))
    words = wibeth.frames_bytes_to_u32(frames).reshape(L, T, 28)
    W = jnp.asarray(native.relayout_time2(words))
    st = seed_chanstate(init_chanstate(C), adcs[0], cfg.rs_memory_factor_x10)
    s0 = pack_state(st, C)

    configs = [parse_config(s) for s in args.config]
    fns = []
    for c_ in configs:
        u = c_["unroll"] if c_["unroll"] % 2 == 0 else 2

        @functools.partial(jax.jit, static_argnames=("n",))
        def multi(s, n=args.windows, _c=c_, _u=u):
            def body(s, _):
                slots, nclose, s = process_window_pallas(
                    W, s, cfg, tc=_c["tc"], k_slots=_c["k"], unroll=_u,
                    vmem_limit_mb=_c["vmem"], time_packed=True)
                return s, jnp.sum(nclose)
            return jax.lax.scan(body, s, None, length=n)
        multi(s0, n=2)[0].block_until_ready()
        fns.append(multi)

    def chain(fn, n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = fn(s)
        _ = float(jnp.sum(s[:, 0]))
        return time.perf_counter() - t0

    per = [[] for _ in configs]
    nf_ = len(fns)
    for t in range(args.trials):
        for i in [(t + j) % nf_ for j in range(nf_)]:
            t_a = chain(fns[i], 1, s0)
            t_b = chain(fns[i], 6, s0)
            slope = (t_b - t_a) / 5 / args.windows
            if slope > 0:
                per[i].append(slope)

    base = float(np.median(per[0])) if per[0] else None
    for i in range(nf_):
        dt = float(np.median(per[i])) if per[i] else None
        print(json.dumps({
            "config": args.config[i],
            "ms": round(dt * 1e3, 4) if dt else None,
            "gsps": round(T * C / dt / 1e9, 1) if dt else None,
            "rtf": round((T / (62.5e6 / 32)) / dt, 2) if dt else None,
            "vs_first": round(base / dt, 3) if base and dt else None,
            "n": len(per[i])}))


if __name__ == "__main__":
    main()

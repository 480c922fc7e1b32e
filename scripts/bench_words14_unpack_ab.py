#!/usr/bin/env python
"""Interleaved A/B of the two in-kernel words14 unpack formulations
(real chip): per-class extracts + 16-way stack (_unpack14_rows) vs the
full-height gather formulation (_unpack14_rows_gather) — two static
word-row concats + one shift/or/mask chain with iota-derived per-sublane
shift amounts.

Method = scripts/bench_ab.py (BENCH_NOTES): 16-window scan per chained
call, slope between 1 and 6 chains, positive slopes only, rotated visit
order, medians; hit parity asserted in-harness before timing.

Usage: python scripts/bench_words14_unpack_ab.py [--trials 5]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.formats import wibeth
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.ingest import pack_words14_jnp
    from fdreadoutlibs_tpu.ops.pallas_tpg import (pack_state,
                                                  process_window_pallas,
                                                  words14_positions)

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
    W = jnp.asarray(pack_words14_jnp(jnp.asarray(words)))
    pos = words14_positions(C)
    st = seed_chanstate(init_chanstate(C), adcs[0], cfg.rs_memory_factor_x10)
    s0 = pack_state(st, C, positions=pos)

    def make(gather):
        @functools.partial(jax.jit, static_argnames=("n",))
        def multi(s, n=args.windows):
            def body(s, _):
                slots, nclose, s = process_window_pallas(
                    W, s, cfg, tc=512, k_slots=2, unroll=16,
                    vmem_limit_mb=64, words14=True, words14_gather=gather)
                return s, jnp.sum(nclose)
            return jax.lax.scan(body, s, None, length=n)
        return multi

    names = ["class", "gather"]
    fns = {"class": make(False), "gather": make(True)}
    # compile + strict parity (state AND per-window close counts)
    res = {k: tuple(np.asarray(x) for x in f(s0, n=2))
           for k, f in fns.items()}
    np.testing.assert_array_equal(res["class"][0], res["gather"][0])
    np.testing.assert_array_equal(res["class"][1], res["gather"][1])

    def chain(fn, n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = fn(s)
        _ = float(jnp.sum(s[:, 0]))
        return time.perf_counter() - t0

    per = {k: [] for k in names}
    for t in range(args.trials):
        for k in (names if t % 2 == 0 else names[::-1]):
            t_a = chain(fns[k], 1, s0)
            t_b = chain(fns[k], 6, s0)
            slope = (t_b - t_a) / 5 / args.windows
            if slope > 0:
                per[k].append(slope)

    out = {}
    for k in names:
        dt = float(np.median(per[k])) if per[k] else None
        out[k] = {"ms": round(dt * 1e3, 4) if dt else None,
                  "gsps": round(T * C / dt / 1e9, 1) if dt else None,
                  "n": len(per[k])}
    if out["class"]["ms"] and out["gather"]["ms"]:
        out["ratio_class_over_gather"] = round(
            out["class"]["ms"] / out["gather"]["ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

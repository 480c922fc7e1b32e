#!/usr/bin/env python
"""Kernel auto-tuner: sweep (block_sublanes, tc, unroll) per algorithm on
the CURRENT hardware and emit the best configs as JSON.

The library ships per-algorithm defaults tuned for TPU v5e-lite
(pallas_tpg.SHIPPED_KNOBS) — this harness re-derives them on whatever
chip is attached,
using the interleaved-trial slope-timing method that BENCH_NOTES
established as the only trustworthy measurement over the remote tunnel
(round-robin trials so drift hits every candidate equally; medians).

Usage:
  python scripts/autotune.py                       # all four algorithms
  python scripts/autotune.py --alg FIR --out tuned.json
  python scripts/autotune.py --quick               # smaller space

Feed the winners back through the existing knobs:
StreamingIngest(tc=..., unroll=...), pack_state(block_sublanes=...),
process_window_pallas(...).
"""

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ALGS = ["SimpleThreshold", "AbsRS", "StandardRS", "FIR"]


def candidate_space(quick: bool):
    subs = [0, 8]
    # quick mode must still span the shipped winners (SHIPPED_KNOBS uses
    # both tc=256 and tc=512), or its tuned.json could override a better
    # shipped default
    tcs = [256, 512] if quick else [256, 512, 1024]
    unrolls = [32] if quick else [16, 32]
    # k_slots: per-channel hit capacity per time chunk.  The round-2
    # whole-window K-sweep (K=2 beat K=1 at tc=1024) predates the
    # per-chunk slot redesign, so k is re-swept here (VERDICT r2 #4);
    # at equal capacity density prefer halving tc over doubling k
    # (BENCH_NOTES round-2 A/B)
    ks = [1, 2] if quick else [1, 2, 4]
    return [{"sub": s, "tc": tc, "unroll": u, "k": k}
            for s, tc, u, k in itertools.product(subs, tcs, unrolls, ks)]


def fir_space(quick: bool):
    # the FIR family additionally sweeps the kernel schedule: fused tick
    # vs the two-pass split (pallas_tpg fir_twopass)
    # 0 = fused tick, 1 = two-pass, 2 = two-pass + lifted emission
    return [c | {"twopass": tp} for c in candidate_space(quick)
            for tp in (0, 1, 2)]


def measure_candidates(alg, cands, channels, ticks, windows, trials,
                       log=print):
    """Compile every candidate, then interleave slope trials round-robin.
    Returns the candidate list with 'ms' medians filled in (NaN = failed
    to compile or never produced a positive slope)."""
    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (pack_adcs, pack_state,
                                                  process_window_pallas)

    C, T = channels, ticks
    kw = {"track_peaks": False} if alg == "FIR" else {}
    cfg = TPGConfig.from_raw(alg, threshold=5 if alg == "FIR" else 150, **kw)
    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    packed = jnp.asarray(pack_adcs(adcs))
    state = seed_chanstate(init_chanstate(C), adcs[0],
                           cfg.rs_memory_factor_x10)

    runs = []
    for cand in cands:
        if T % cand["tc"] or cand["tc"] % cand["unroll"]:
            continue
        try:
            st0 = pack_state(state, C, block_sublanes=cand["sub"] or None)

            def mw(s, _c=cand):
                def body(s, _):
                    slots, nclose, s = process_window_pallas(
                        packed, s, cfg, tc=_c["tc"],
                        k_slots=_c.get("k", 1),
                        unroll=_c["unroll"], vmem_limit_mb=64,
                        fir_twopass=_c.get("twopass", 0))
                    return s, jnp.sum(nclose)
                s, counts = jax.lax.scan(body, s, None, length=windows)
                return s, counts
            fn = jax.jit(mw)
            fn(st0)[0].block_until_ready()
        except Exception as e:          # invalid layout / OOM: skip
            log(f"#   {cand} failed to compile: {type(e).__name__}")
            continue
        runs.append({**cand, "_fn": fn, "_st": st0, "slopes": []})

    def chain(fn, n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = fn(s)
        _ = float(jnp.sum(s[:, 0]))
        return time.perf_counter() - t0

    for t in range(trials):
        for r in runs:                  # interleaved round-robin
            t_a = chain(r["_fn"], 1, r["_st"])
            t_b = chain(r["_fn"], 6, r["_st"])
            slope = (t_b - t_a) / 5 / windows
            if slope > 0:
                r["slopes"].append(slope)

    out = []
    for r in runs:
        ms = float(np.median(r["slopes"])) * 1e3 if r["slopes"] else \
            float("nan")
        keys = ("sub", "tc", "unroll", "k") + \
            (("twopass",) if "twopass" in r else ())
        out.append({k: r[k] for k in keys} |
                   {"ms": round(ms, 4),
                    "gsps": round(T * C / ms / 1e6, 1) if ms == ms else None})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alg", choices=ALGS, default=None,
                    help="tune one algorithm (default: all four)")
    ap.add_argument("--out", default=None, help="write winners to this JSON")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--ticks", type=int, default=8192)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    assert jax.default_backend() == "tpu", "autotune needs the real chip"
    from fdreadoutlibs_tpu.utils.preflight import device_preflight
    device_preflight()   # fail fast on libtpu client/terminal skew

    winners = {}
    for alg in ([args.alg] if args.alg else ALGS):
        print(f"# tuning {alg}")
        space = fir_space(args.quick) if alg == "FIR" \
            else candidate_space(args.quick)
        results = measure_candidates(alg, space,
                                     args.channels, args.ticks,
                                     args.windows, args.trials)
        for r in sorted(results, key=lambda r: r["ms"]):
            print(json.dumps({"alg": alg, **r}))
        ok = [r for r in results if r["ms"] == r["ms"]]
        if ok:
            best = min(ok, key=lambda r: r["ms"])
            keys = ("sub", "tc", "unroll", "k") + \
                (("twopass",) if "twopass" in best else ())
            winners[alg] = {k: best[k] for k in keys} | \
                {"gsps": best["gsps"]}
    print(json.dumps({"tuned": winners}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(winners, f, indent=2)
        print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

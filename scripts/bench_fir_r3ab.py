#!/usr/bin/env python
"""A/B: round-3 FIR tick (merged active-quantile chain + deferred
threshold wrap) vs the round-2 formulation (two independent IQR chains,
double-wrapped threshold product).

The r2 tick is inlined below and monkeypatched in, so both variants run
in one session with interleaved trials (the only tunnel-robust method).
Both are bit-exact vs the oracle — this measures op-count effects only.

Usage: python scripts/bench_fir_r3ab.py [--trials 4] [--sub 8] [--tc 512]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def r2_tick():
    """The round-2 tpg_tick_fir (pre-restructure), reconstructed."""
    from fdreadoutlibs_tpu.ops import fir as fir_mod
    from fdreadoutlibs_tpu.ops.fixedpoint import I32Fx
    from fdreadoutlibs_tpu.ops.step import frugal_update
    INT16_MAX = fir_mod.INT16_MAX

    def tick(st, s_raw, cfg, xp, taps, fx=None):
        fx = fx or I32Fx.make(xp)
        one, zero = fx.one, fx.zero
        out = dict(st)
        limit = cfg.accumulator_limit

        med0 = st["pedestals"]
        q25, a25 = frugal_update(st["quantile25"], s_raw, st["accum25"],
                                 limit, xp, mask=s_raw < med0, fx=fx)
        q75, a75 = frugal_update(st["quantile75"], s_raw, st["accum75"],
                                 limit, xp, mask=s_raw > med0, fx=fx)
        out["quantile25"], out["accum25"] = q25, a25
        out["quantile75"], out["accum75"] = q75, a75
        sigma = q75 - q25
        med, acc = frugal_update(med0, s_raw, st["accum"], limit, xp, fx=fx)
        out["pedestals"], out["accum"] = med, acc

        s = s_raw - med
        s = fx.minimum(s, fx.dtype(cfg.adc_max))

        buf = st["fir_prev"]
        groups = {}
        for j, t in enumerate(taps):
            if t:
                groups.setdefault(int(t), []).append(j)
        filt_acc = zero
        for t, js in groups.items():
            g = buf[js[0]]
            for j in js[1:]:
                g = g + buf[j]
            if t == 1:
                term = g
            elif t > 0 and t & (t - 1) == 0:
                term = g << (t.bit_length() - 1)
            else:
                term = g * fx.dtype(t)
            filt_acc = filt_acc + term
        filt = fx.wrap(filt_acc)
        out["fir_prev"] = buf[1:] + (s,)

        sigma_c = fx.minimum(sigma,
                             fx.dtype((1 << 15) // (cfg.multiplier * 5)))
        thr = fx.wrap(fx.wrap(sigma_c << cfg.tap_exponent)
                      * fx.dtype(cfg.threshold))
        is_over = filt > thr

        closed = (st["prev_was_over"] != 0) & ~is_over
        to_add = xp.where(is_over, filt >> cfg.tap_exponent, zero)
        charge = fx.add_clamp(st["hit_charge"], to_add, INT16_MAX,
                              floor=-INT16_MAX - 1)
        peak_adc = peak_time = xp.zeros_like(charge)
        tover = fx.add_clamp(st["hit_tover"], xp.where(is_over, one, zero),
                             INT16_MAX)
        record = {"charge": charge, "tover": tover,
                  "peak_adc": peak_adc, "peak_time": peak_time}
        out["hit_charge"] = xp.where(closed, zero, charge)
        out["hit_tover"] = xp.where(closed, zero, tover)
        out["prev_was_over"] = xp.where(is_over, one, zero)
        return out, closed, record

    return tick


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tc", type=int, default=512)
    ap.add_argument("--unroll", type=int, default=32)
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--ticks", type=int, default=8192)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--sub", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops import fir as fir_mod
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (
        decode_pallas_hits, pack_adcs, pack_state, process_window_pallas)
    from fdreadoutlibs_tpu.utils.preflight import device_preflight

    assert jax.default_backend() == "tpu"
    device_preflight()
    C, T = args.channels, args.ticks
    cfg = TPGConfig.from_raw("FIR", threshold=5, track_peaks=False)
    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    packed = jnp.asarray(pack_adcs(adcs))
    state0 = pack_state(seed_chanstate(init_chanstate(C), adcs[0],
                                       cfg.rs_memory_factor_x10), C,
                        block_sublanes=args.sub or None)

    orig = fir_mod.tpg_tick_fir
    fns, first = {}, {}
    for i, (name, tick) in enumerate([("r3", orig), ("r2", r2_tick())]):
        fir_mod.tpg_tick_fir = tick
        # distinct vmem values defeat the jit cache across monkeypatches

        def mw(s, _vmem=64 + i):
            def body(s, _):
                slots, nclose, s = process_window_pallas(
                    packed, s, cfg, tc=args.tc, k_slots=1,
                    unroll=args.unroll, vmem_limit_mb=_vmem)
                return s, jnp.sum(nclose)
            s, counts = jax.lax.scan(body, s, None, length=args.windows)
            return s, counts

        def one(s, _vmem=64 + i):
            return process_window_pallas(packed, s, cfg, tc=args.tc,
                                         k_slots=1, unroll=args.unroll,
                                         vmem_limit_mb=_vmem)
        fns[name] = jax.jit(mw)
        slots, nclose, _ = one(state0)
        first[name] = decode_pallas_hits(slots, nclose, C)
        fns[name](state0)[0].block_until_ready()
    fir_mod.tpg_tick_fir = orig
    # hit-level parity between the two formulations on this stream
    np.testing.assert_array_equal(first["r3"][0], first["r2"][0])

    def chain(fn, n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = fn(s)
        _ = float(jnp.sum(s[:, 0]))
        return time.perf_counter() - t0, s

    per = {"r3": [], "r2": []}
    order = ["r3", "r2"]
    for t in range(args.trials):
        for name in (order if t % 2 == 0 else order[::-1]):  # rotated
            t_a, _ = chain(fns[name], 1, state0)
            t_b, _ = chain(fns[name], 6, state0)
            slope = (t_b - t_a) / 5 / args.windows
            if slope > 0:
                per[name].append(slope)

    res = {}
    for name in order:
        dt = float(np.median(per[name])) if per[name] else float("nan")
        res[name] = {"ms": round(dt * 1e3, 4),
                     "gsps": round(T * C / dt / 1e9, 1)}
    res["r3_speedup"] = round(res["r2"]["ms"] / res["r3"]["ms"], 3) \
        if per["r3"] and per["r2"] else None
    res["hits"] = len(first["r3"][0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()

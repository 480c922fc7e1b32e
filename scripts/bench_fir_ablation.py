#!/usr/bin/env python
"""FIR kernel ablation bench (real chip): upper-bound the payoff of
optimizing each block of the FIR+IQR tick before building it.

Variants (each monkeypatches ops.fir.tpg_tick_fir; NOT bit-exact — this
is a cost probe, not a correctness path):
  base    — the production tick
  noconv  — convolution replaced by filt = buf[0] (ceiling for any FIR
            restructuring, e.g. the binomial cascade)
  noiqr   — quantile25/75 frugal chains frozen (ceiling for any IQR
            restructuring)
  noq75   — only the q75 chain frozen (2 fewer loop-carried arrays:
            distinguishes op-count cost from register-pressure cost)
  nofrugal— ALL three frugal chains frozen (pedestal too)

Trials are interleaved across variants (variant ratios within one session
are the reliable signal; absolute numbers move with the tunnel).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_variant(name):
    """Return a tpg_tick_fir replacement implementing the ablation."""
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
        if name in ("noiqr", "nofrugal"):
            q25, q75 = st["quantile25"], st["quantile75"]
        else:
            q25, a25 = frugal_update(st["quantile25"], s_raw, st["accum25"],
                                     limit, xp, mask=s_raw < med0, fx=fx)
            out["quantile25"], out["accum25"] = q25, a25
            if name == "noq75":
                q75 = st["quantile75"]
            else:
                q75, a75 = frugal_update(st["quantile75"], s_raw,
                                         st["accum75"], limit, xp,
                                         mask=s_raw > med0, fx=fx)
                out["quantile75"], out["accum75"] = q75, a75
        if name == "nofrugal":
            med = med0
        else:
            med, acc = frugal_update(med0, s_raw, st["accum"], limit, xp,
                                     fx=fx)
            out["pedestals"], out["accum"] = med, acc
        sigma = q75 - q25

        s = s_raw - med
        s = fx.minimum(s, fx.dtype(cfg.adc_max))

        buf = st["fir_prev"]
        if name == "noconv":
            filt = fx.wrap(buf[0])
        else:
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

        sigma_c = fx.minimum(sigma, fx.dtype((1 << 15) // (cfg.multiplier * 5)))
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
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sub", type=int, default=0,
                    help="channel-block rows (0 = whole block); use 8 to "
                         "ablate the shipped blocked FIR layout")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops import fir as fir_mod
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (pack_adcs, pack_state,
                                                  process_window_pallas)

    assert jax.default_backend() == "tpu"
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
    variants = ["base", "noconv", "noiqr", "noq75", "nofrugal"]
    fns = {}
    for i, name in enumerate(variants):
        fir_mod.tpg_tick_fir = orig if name == "base" else make_variant(name)
        # distinct vmem values defeat the jit cache across monkeypatches

        def mw(s, _vmem=64 + i):
            def body(s, _):
                slots, nclose, s = process_window_pallas(
                    packed, s, cfg, tc=args.tc, k_slots=1,
                    unroll=args.unroll, vmem_limit_mb=_vmem)
                return s, jnp.sum(nclose)
            s, counts = jax.lax.scan(body, s, None, length=args.windows)
            return s, counts
        fns[name] = jax.jit(mw)
        fns[name](state0)[0].block_until_ready()    # compile now
    fir_mod.tpg_tick_fir = orig

    def chain(fn, n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = fn(s)
        _ = float(jnp.sum(s[:, 0]))
        return time.perf_counter() - t0, s

    per = {name: [] for name in variants}
    for _ in range(args.trials):
        for name in variants:                        # interleaved
            t_a, _ = chain(fns[name], 1, state0)
            t_b, _ = chain(fns[name], 6, state0)
            slope = (t_b - t_a) / 5 / args.windows
            if slope > 0:
                per[name].append(slope)

    res = {}
    base = float(np.median(per["base"])) if per["base"] else float("nan")
    for name in variants:
        dt = float(np.median(per[name])) if per[name] else float("nan")
        res[name] = {"ms": round(dt * 1e3, 4),
                     "gsps": round(T * C / dt / 1e9, 1),
                     "vs_base": round(base / dt, 3)}
    print(json.dumps(res))


if __name__ == "__main__":
    main()

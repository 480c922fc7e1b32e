#!/usr/bin/env python
"""SWAR two-channels-per-int32-word frugal chain vs unpacked — hardware A/B.

VERDICT r2 #1 asks for the pipeline-wide SWAR formulation (two channels
per int32 lane end-to-end) or a measured account of why it loses.  The
frugal-streaming chain is the MOST SWAR-favorable piece of the tick: its
deltas are in {-1,0,1}, so with biased-unsigned halves the packed
accumulate/bump adds are genuine single ops (no carry isolation needed —
the halves provably never borrow).  Everything harder (threshold compares,
K-slot selects, saturating adds) SWARs strictly worse, because per-half
compares cost shift+cmp (2 ops/half = 4 ops per word) against ONE native
op per i32 word unpacked, and selects need mask arithmetic.  So: if the
packed frugal chain does not beat unpacked at equal channel count, the
whole-tick SWAR design is dead on this VPU.

Both variants are bit-exact (packed results unpacked and compared).
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LIMIT = 10
_BA = 1 << 14          # bias for values (ADC range, halves in (0, 2^15+2^14))
_BC = 1 << 7           # bias for accumulators (halves in [B-11, B+11])


def _unpacked_kernel(adc_ref, m_ref, a_ref, mo_ref, ao_ref, *, tc):
    import jax
    import jax.numpy as jnp

    def body(i, carry):
        m, acc = carry
        s = adc_ref[i]
        delta = jnp.clip(s - m, -1, 1)
        acc = acc + delta
        over = acc > LIMIT
        under = acc < -LIMIT
        m = jnp.where(over, m + 1, jnp.where(under, m - 1, m))
        acc = jnp.where(over | under, 0, acc)
        return m, acc
    m, a = jax.lax.fori_loop(0, tc, body, (m_ref[...], a_ref[...]))
    mo_ref[...] = m
    ao_ref[...] = a


def _packed_kernel(adc_ref, m_ref, a_ref, mo_ref, ao_ref, *, tc):
    """Two channels per word: values biased by _BA per half, accumulators
    by _BC per half.  Compares per half via shift-to-top (lo) / arithmetic
    shift (hi) against int32 comparisons; all adds are carry-safe by the
    bias headroom."""
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32

    def body(i, carry):
        m, acc = carry
        s = adc_ref[i]
        # per-half compare masks (4 shifts + 4 compares per word)
        s_lo, m_lo = s << 16, m << 16
        s_hi, m_hi = s >> 16, m >> 16
        gt_lo = (s_lo > m_lo).astype(i32)
        lt_lo = (s_lo < m_lo).astype(i32)
        gt_hi = (s_hi > m_hi).astype(i32)
        lt_hi = (s_hi < m_hi).astype(i32)
        delta = (gt_lo - lt_lo) + ((gt_hi - lt_hi) << 16)
        acc = acc + delta                      # carry-safe (bias headroom)
        a_lo, a_hi = acc << 16, acc >> 16
        ov_lo = (a_lo > ((LIMIT + _BC) << 16)).astype(i32)
        un_lo = (a_lo < ((-LIMIT + _BC) << 16)).astype(i32)
        ov_hi = (a_hi > (LIMIT + _BC)).astype(i32)
        un_hi = (a_hi < (-LIMIT + _BC)).astype(i32)
        m = m + (ov_lo - un_lo) + ((ov_hi - un_hi) << 16)
        bump_lo = (ov_lo | un_lo) != 0
        bump_hi = (ov_hi | un_hi) != 0
        acc = jnp.where(bump_lo, (acc & ~0xFFFF) | _BC, acc)
        acc = jnp.where(bump_hi, (acc & 0xFFFF) | (_BC << 16), acc)
        return m, acc
    m, a = jax.lax.fori_loop(0, tc, body, (m_ref[...], a_ref[...]))
    mo_ref[...] = m
    ao_ref[...] = a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--ticks", type=int, default=8192)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--reps", type=int, default=16,
                    help="scan reps per timed call")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from fdreadoutlibs_tpu.ops.pallas_tpg import LANES, pack_adcs
    from fdreadoutlibs_tpu.utils.preflight import device_preflight

    assert jax.default_backend() == "tpu"
    device_preflight()
    C, T = args.channels, args.ticks
    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)

    # unpacked: (T, S, 128); packed: (T, S//2, 128) two channels per word
    up = pack_adcs(adcs)
    S = up.shape[1]
    assert S % 2 == 0
    pk = (up[:, 0::2] + _BA) | ((up[:, 1::2] + _BA) << 16)
    m0 = np.full((S, LANES), 900, np.int32)
    a0 = np.zeros((S, LANES), np.int32)
    m0p = np.full((S // 2, LANES), (900 + _BA) | ((900 + _BA) << 16),
                  np.int32)
    a0p = np.full((S // 2, LANES), _BC | (_BC << 16), np.int32)

    def build(kern, data, m, a):
        rows = data.shape[1]
        tc = 512                       # VMEM-safe chunk (6 MB ADC block)
        chunks = data.reshape(-1, tc, rows, LANES)
        fn = pl.pallas_call(
            functools.partial(kern, tc=tc),
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.int32)] * 2,
        )

        @jax.jit
        def run(m, a):
            def window(carry, _):
                def chunk(carry, d):
                    m, a = carry
                    m, a = fn(d, m, a)
                    return (m, a), 0
                carry, _ = jax.lax.scan(chunk, carry, chunks)
                return carry, 0
            (m, a), _ = jax.lax.scan(window, (m, a), None,
                                     length=args.reps)
            return m, a
        return run

    d_up = jnp.asarray(up)
    d_pk = jnp.asarray(pk)
    run_u = build(_unpacked_kernel, d_up, m0, a0)
    run_p = build(_packed_kernel, d_pk, m0p, a0p)

    # bit-exactness: one rep of packed == unpacked (biased halves undone)
    mu, au = run_u(jnp.asarray(m0), jnp.asarray(a0))
    mp, apk = run_p(jnp.asarray(m0p), jnp.asarray(a0p))
    mu, au = np.asarray(mu), np.asarray(au)
    mp, apk = np.asarray(mp), np.asarray(apk)
    np.testing.assert_array_equal(mu[0::2], (mp & 0xFFFF) - _BA)
    np.testing.assert_array_equal(mu[1::2], ((mp >> 16) & 0xFFFF) - _BA)
    np.testing.assert_array_equal(au[0::2], (apk & 0xFFFF) - _BC)
    np.testing.assert_array_equal(au[1::2],
                                  ((apk >> 16) & 0xFFFF) - _BC)

    def slope(run, m, a):
        m_, a_ = jnp.asarray(m), jnp.asarray(a)
        t0 = time.perf_counter()
        r = run(m_, a_)
        r[0].block_until_ready()
        t_a = time.perf_counter() - t0
        t0 = time.perf_counter()
        x, y = m_, a_
        for _ in range(6):
            x, y = run(x, y)
        x.block_until_ready()
        t_b = time.perf_counter() - t0
        return (t_b - t_a) / 5 / args.reps

    per = {"unpacked": [], "packed": []}
    for t in range(args.trials):
        order = [("unpacked", run_u, m0, a0), ("packed", run_p, m0p, a0p)]
        if t % 2:
            order = order[::-1]
        for name, run, m, a in order:
            s = slope(run, m, a)
            if s > 0:
                per[name].append(s)

    res = {}
    for name in per:
        dt = float(np.median(per[name])) if per[name] else float("nan")
        res[name] = {"ms": round(dt * 1e3, 4),
                     "gsps": round(T * C / dt / 1e9, 1)}
    res["swar_speedup"] = round(res["unpacked"]["ms"] / res["packed"]["ms"],
                                3)
    print(json.dumps(res))


if __name__ == "__main__":
    sys.exit(main())

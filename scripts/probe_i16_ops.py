#!/usr/bin/env python
"""Op-by-op Mosaic i16 vector support matrix + i16-vs-i32 ALU throughput.

Groundwork for the compare-free native-int16 backend: Mosaic rejects int16
vector *compares* (arith.cmpi; scripts/probe_int16.py), but the SWTPG tick
can be reformulated without any compares — sign masks via arithmetic shift
((a-b)>>15 -> 0/-1), selects via xor/and/xor, clips via mask arithmetic.
That formulation only needs add/sub/shift/logic (+ a widening cast at the
emission boundary).  This probe answers the two questions that decide
whether building it can pay:

  1. which i16 vector ops compile on the current libtpu (support matrix);
  2. whether i16 ALU throughput is actually ~2x i32 (packed (8,128,2)
     lanes) — if it is 1x, the mask formulation's extra ops lose outright
     and only register-pressure-bound kernels (FIR) could benefit.

Run on the real chip: python scripts/probe_i16_ops.py [--trials 3]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _try_op(name, fn, dtype, out_dtype=None):
    """Compile+run a one-op kernel on (16,128) inputs; return (ok, err)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    out_dtype = out_dtype or dtype

    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = fn(a_ref[...], b_ref[...], jnp)

    a = jnp.asarray(np.arange(16 * 128).reshape(16, 128) % 251, dtype)
    b = jnp.asarray((np.arange(16 * 128).reshape(16, 128) * 7) % 113 + 1,
                    dtype)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16, 128), out_dtype),
        )(a, b)
        out.block_until_ready()
        return True, None
    except Exception as e:  # noqa: BLE001 — probe reports any failure mode
        msg = str(e)
        for key in ("Target does not support", "Unsupported", "error:",
                    "NotImplementedError"):
            at = msg.find(key)
            if at >= 0:
                return False, msg[at:at + 120].replace("\n", " ")
        return False, msg[-120:].replace("\n", " ")


OPS = {
    # name: (fn(a, b, jnp), out_dtype_override)
    "add": (lambda a, b, jnp: a + b, None),
    "sub": (lambda a, b, jnp: a - b, None),
    "mul": (lambda a, b, jnp: a * b, None),
    "shl_const": (lambda a, b, jnp: a << 2, None),
    "shrs_const": (lambda a, b, jnp: a >> 3, None),
    "shrs_15": (lambda a, b, jnp: (a - b) >> 15, None),  # the sign-mask op
    "shr_vec": (lambda a, b, jnp: a >> (b & 3), None),
    "and": (lambda a, b, jnp: a & b, None),
    "or": (lambda a, b, jnp: a | b, None),
    "xor": (lambda a, b, jnp: a ^ b, None),
    "not": (lambda a, b, jnp: ~a, None),
    "neg": (lambda a, b, jnp: -a, None),
    "select_mask": (lambda a, b, jnp: b ^ ((a ^ b) & ((a - b) >> 15)), None),
    "cmpi_gt": (lambda a, b, jnp: (a > b).astype(a.dtype), None),
    "minimum": (lambda a, b, jnp: jnp.minimum(a, b), None),
    "widen_i32": (lambda a, b, jnp: a.astype(jnp.int32), "int32"),
    "mul_widen": (lambda a, b, jnp:
                  a.astype(jnp.int32) * b.astype(jnp.int32), "int32"),
    "iota_like": (lambda a, b, jnp: a + jnp.int16(5), None),
}


def support_matrix():
    import jax.numpy as jnp
    rows = {}
    for name, (fn, out_dt) in OPS.items():
        ok, err = _try_op(name, fn, jnp.int16,
                          getattr(jnp, out_dt) if out_dt else None)
        rows[name] = {"ok": ok, **({"err": err} if err else {})}
        print(f"  i16 {name:12s} {'OK' if ok else 'REJECTED: ' + (err or '')}")
    # narrow i32 -> i16 (separate: needs an i32 input)
    ok, err = _try_op("narrow_i16",
                      lambda a, b, jnp: (a + b).astype(jnp.int16),
                      jnp.int32, jnp.int16)
    rows["narrow_i16"] = {"ok": ok, **({"err": err} if err else {})}
    print(f"  i32 narrow_i16   {'OK' if ok else 'REJECTED: ' + (err or '')}")
    return rows


# ---- throughput A/B --------------------------------------------------------------
# Equal ELEMENT count both ways: (24,128) i16 vs (24,128) i32 (the 2560-ch
# APA shape).  The body is a dependent chain of add/xor/shift per carried
# array x 8 independent arrays, approximating the tick's op mix without
# compares, so Mosaic can issue across arrays while each chain stays serial.

def _mix_kernel(a_ref, o_ref, *, iters, dtype_bits):
    import jax
    import jax.numpy as jnp

    arrs = tuple(a_ref[j] for j in range(a_ref.shape[0]))
    c1 = arrs[0].dtype.type(0x1D)
    sh = 15 if dtype_bits == 16 else 31

    def body(i, carry):
        out = []
        prev = carry[-1]
        for x in carry:
            # 5 ops per array per iter: sub, sign-shift, xor, and, add —
            # the mask-formulation op mix (no compares, no selects)
            m = (x - prev) >> sh
            x = ((x ^ m) & prev) + c1
            out.append(x)
            prev = x
        return tuple(out)

    res = jax.lax.fori_loop(0, iters, body, arrs)
    for j in range(a_ref.shape[0]):
        o_ref[j] = res[j]


def throughput_ab(trials: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    S, L, NARR, ITERS = 24, 128, 8, 4096
    rng = np.random.default_rng(0)

    def make(dtype, bits):
        a = jnp.asarray(
            rng.integers(-1000, 1000, size=(NARR, S, L)), dtype)
        fn = pl.pallas_call(
            functools.partial(_mix_kernel, iters=ITERS, dtype_bits=bits),
            out_shape=jax.ShapeDtypeStruct((NARR, S, L), dtype),
        )

        def chain(n):
            @jax.jit
            def run(x):
                def body(x, _):
                    return fn(x), 0
                x, _ = jax.lax.scan(body, x, None, length=n)
                return x
            return run
        return a, (chain(2), chain(12))

    a16, run16 = make(jnp.int16, 16)
    a32, run32 = make(jnp.int32, 32)

    def slope(runs, a):
        run_a, run_b = runs
        run_a(a).block_until_ready()       # warm both call shapes
        run_b(a).block_until_ready()
        t0 = time.perf_counter()
        run_a(a).block_until_ready()
        t_a = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_b(a).block_until_ready()
        t_b = time.perf_counter() - t0
        return (t_b - t_a) / 10

    r16, r32 = [], []
    for _ in range(trials):
        r32.append(slope(run32, a32))      # interleaved
        r16.append(slope(run16, a16))
    m16, m32 = float(np.median(r16)), float(np.median(r32))
    ratio = m32 / m16 if m16 > 0 else float("nan")
    elems = NARR * S * L * ITERS * 5
    print(f"  i32: {m32*1e3:.3f} ms/call ({elems/m32/1e9:.0f} Gop/s)  "
          f"i16: {m16*1e3:.3f} ms/call ({elems/m16/1e9:.0f} Gop/s)  "
          f"i16 speedup = {ratio:.2f}x")
    return {"ms_i32": m32 * 1e3, "ms_i16": m16 * 1e3, "i16_speedup": ratio}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--skip-throughput", action="store_true")
    args = ap.parse_args()

    import jax
    assert jax.default_backend() == "tpu", "probe needs the real chip"
    print("== i16 vector op support matrix ==")
    rows = support_matrix()
    result = {"matrix": {k: v["ok"] for k, v in rows.items()}}
    if not args.skip_throughput:
        print("== i16 vs i32 ALU throughput (compare-free op mix) ==")
        try:
            result["throughput"] = throughput_ab(args.trials)
        except Exception as e:  # noqa: BLE001
            print("  throughput probe failed:", str(e)[-200:])
            result["throughput"] = {"error": str(e)[-200:]}
    print(json.dumps(result))


if __name__ == "__main__":
    main()

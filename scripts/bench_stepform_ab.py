#!/usr/bin/env python
"""A/B/C: select-heavy vs arithmetic formulations of the tick's flag ops.

The roofline op histograms (scripts/roofline.py, BENCH_NOTES "Roofline")
show select_n is the largest issue class in every family (15-20 of
44-78 tile-issues/tick).  Two bit-exact reformulations shave it:

* **B — arithmetic frugal median bump**: ``m + (over - under)`` replaces
  ``where(over, m+1, where(under, m-1, m))`` — 2 converts + add + sub
  instead of 2 adds + 2 selects, exact because over/under are mutually
  exclusive.  Applies to every frugal chain (Simple x1, RS x2, FIR x2).
* **C — B plus flag-increment astype**: ``tover += is_over.astype``
  and ``prev_was_over = is_over.astype`` replace their where(is_over,
  one, zero) forms — exact by definition of the mask.

Issue-count deltas (roofline counter): Simple 44->40, AbsRS 69->65,
StandardRS 66->62, FIR 78->74 for C.  The selects are SHORTER dependency
chains (1 op vs cvt->sub->add), so whether fewer-issues or
shorter-chains wins is empirical — exactly the question this script
answers, interleaved in one session (the only tunnel-robust method).

Variants are generated from the CURRENT shipped source via
inspect.getsource + asserted string replacement, so this script cannot
drift from ops/step.py / ops/fir.py.  Hit + final-state parity across
arms is asserted before timing.

Usage: python scripts/bench_stepform_ab.py [--alg FIR] [--trials 4]
Ship rule: a challenger must beat A in BOTH of two independent runs by
>2% (CLAUDE.md twice-confirmed rule) before the formulation is edited
into ops/step.py / ops/fir.py.
"""

import argparse
import inspect
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _patched(fn, replacements, namespace):
    """Recompile ``fn`` with asserted source replacements applied.

    ``namespace`` becomes the new function's globals SNAPSHOT — inject
    already-patched callees explicitly (module-level setattr patching
    does not reach it)."""
    src = inspect.getsource(fn)
    for old, new in replacements:
        assert old in src, f"pattern drifted out of {fn.__name__}: {old!r}"
        src = src.replace(old, new)
    # strip decorators/indent not present here; exec at module top level
    g = dict(namespace)
    exec(compile(src, f"<{fn.__name__}_patched>", "exec"), g)
    return g[fn.__name__]


def make_variants():
    """Returns {arm_name: {module_attr: replacement_fn}} patch sets."""
    from fdreadoutlibs_tpu.ops import fir as fir_mod
    from fdreadoutlibs_tpu.ops import step as step_mod

    # --- B: arithmetic frugal median bump -------------------------------
    frugal_b = _patched(
        step_mod.frugal_update,
        [("m = xp.where(over, m + 1, xp.where(under, m - 1, m))",
          "m = m + over.astype(acc.dtype) - under.astype(acc.dtype)")],
        vars(step_mod))

    # --- C extras: flag increments as astype; tick_c must also see the
    # patched frugal (its exec globals are a snapshot) ---------------------
    tick_c = _patched(
        step_mod.tpg_tick,
        [("tover = fx.add_clamp(st[\"hit_tover\"], xp.where(is_over, one, "
          "zero),\n                         INT16_MAX)",
          "tover = fx.add_clamp(st[\"hit_tover\"], "
          "is_over.astype(charge.dtype),\n                         "
          "INT16_MAX)"),
         ("out[\"prev_was_over\"] = xp.where(is_over, one, zero)",
          "out[\"prev_was_over\"] = is_over.astype(ped.dtype)")],
        {**vars(step_mod), "frugal_update": frugal_b})
    fir_hit_c = _patched(
        fir_mod.fir_hit_update,
        [("tover = fx.add_clamp(tover0, xp.where(is_over, one, zero), "
          "INT16_MAX)",
          "tover = fx.add_clamp(tover0, is_over.astype(charge.dtype), "
          "INT16_MAX)"),
         ("out[\"prev_was_over\"] = xp.where(is_over, one, zero)",
          "out[\"prev_was_over\"] = is_over.astype(charge.dtype)")],
        vars(fir_mod))

    return {
        "A_shipped": {},
        # identical second build of A: the NULL arm — its spread vs
        # A_shipped is the session's noise floor; only deltas well
        # outside it mean anything
        "A2_null": {},
        "B_arith_frugal": {("step", "frugal_update"): frugal_b,
                           ("fir", "frugal_update"): frugal_b},
        "C_B_plus_astype": {("step", "frugal_update"): frugal_b,
                            ("fir", "frugal_update"): frugal_b,
                            ("step", "tpg_tick"): tick_c,
                            ("fir", "fir_hit_update"): fir_hit_c},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alg", default="all",
                    help="SimpleThreshold|AbsRS|StandardRS|FIR|all")
    ap.add_argument("--mode", default="stepform",
                    choices=["stepform", "slots"],
                    help="stepform: frugal/flag formulation arms; slots: "
                         "stacked vs word-carry emission layout "
                         "(pallas_tpg.SLOT_WORD_CARRY)")
    ap.add_argument("--channels", type=int, default=2560)
    ap.add_argument("--ticks", type=int, default=8192)
    ap.add_argument("--windows", type=int, default=32)
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--spread", type=int, default=11,
                    help="long-chain call count; the slope is timed over "
                         "(spread-1)*windows windows so the difference "
                         "dwarfs the tunnel's per-sync jitter")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops import fir as fir_mod
    from fdreadoutlibs_tpu.ops import step as step_mod
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (decode_pallas_hits,
                                                  pack_adcs, pack_state,
                                                  process_window_pallas)
    from fdreadoutlibs_tpu.utils.preflight import device_preflight
    from fdreadoutlibs_tpu.utils.tuning import kernel_knobs

    import fdreadoutlibs_tpu.ops.pallas_tpg as pallas_mod

    assert jax.default_backend() == "tpu", "A/B needs the real chip"
    device_preflight()
    mods = {"step": step_mod, "fir": fir_mod, "pl": pallas_mod}
    orig = {("step", "frugal_update"): step_mod.frugal_update,
            ("fir", "frugal_update"): fir_mod.frugal_update,
            ("step", "tpg_tick"): step_mod.tpg_tick,
            ("fir", "fir_hit_update"): fir_mod.fir_hit_update,
            ("pl", "SLOT_WORD_CARRY"): pallas_mod.SLOT_WORD_CARRY}
    if args.mode == "slots":
        variants = {"A_stacked": {},
                    "A2_null": {},
                    "B_word_carry": {("pl", "SLOT_WORD_CARRY"): True}}
    else:
        variants = make_variants()

    fams = (["SimpleThreshold", "AbsRS", "StandardRS", "FIR"]
            if args.alg == "all" else [args.alg])
    C, T = args.channels, args.ticks
    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    packed = jnp.asarray(pack_adcs(adcs))

    out = {}
    for fam in fams:
        kw = {"track_peaks": False} if fam == "FIR" else {}
        cfg = TPGConfig.from_raw(fam, threshold=5 if fam == "FIR" else 150,
                                 **kw)
        knobs = kernel_knobs(cfg, C)
        state0 = pack_state(
            seed_chanstate(init_chanstate(C), adcs[0],
                           cfg.rs_memory_factor_x10),
            C, block_sublanes=knobs["block_sublanes"])

        fns, first = {}, {}
        for i, (arm, patches) in enumerate(variants.items()):
            for key, fn in patches.items():
                setattr(mods[key[0]], key[1], fn)
            try:
                def mw(s, _vmem=64 + i):
                    def body(s, _):
                        slots, nclose, s = process_window_pallas(
                            packed, s, cfg, tc=knobs["tc"], k_slots=1,
                            unroll=knobs["unroll"], vmem_limit_mb=_vmem,
                            fir_twopass=knobs["fir_twopass"])
                        return s, jnp.sum(nclose)
                    return jax.lax.scan(body, s, None, length=args.windows)

                if arm != "A2_null":    # A2 is byte-identical to A
                    slots, nclose, s1 = process_window_pallas(
                        packed, state0, cfg, tc=knobs["tc"], k_slots=1,
                        unroll=knobs["unroll"], vmem_limit_mb=64 + i,
                        fir_twopass=knobs["fir_twopass"])
                    first[arm] = (decode_pallas_hits(slots, nclose, C)[0],
                                  np.asarray(s1))
                fns[arm] = jax.jit(mw)
                fns[arm](state0)[0].block_until_ready()
            finally:
                for key in patches:
                    setattr(mods[key[0]], key[1], orig[key])
        # bit-exactness across arms: hits AND carried state identical
        base_arm = list(variants)[0]
        for arm in first:
            np.testing.assert_array_equal(first[base_arm][0], first[arm][0],
                                          err_msg=f"{fam} {arm} hits")
            np.testing.assert_array_equal(first[base_arm][1], first[arm][1],
                                          err_msg=f"{fam} {arm} state")

        def chain(fn, n, s):
            t0 = time.perf_counter()
            for _ in range(n):
                s, counts = fn(s)
            _ = float(jnp.sum(s[:, 0]))
            return time.perf_counter() - t0

        per = {arm: [] for arm in variants}
        order = list(variants)
        for t in range(args.trials):
            for arm in (order if t % 2 == 0 else order[::-1]):
                t_a = chain(fns[arm], 1, state0)
                t_b = chain(fns[arm], args.spread, state0)
                slope = (t_b - t_a) / (args.spread - 1) / args.windows
                if slope > 0:
                    per[arm].append(slope)

        res = {}
        for arm in order:
            arr = np.asarray(sorted(per[arm])) * 1e3
            dt = float(np.median(arr)) if len(arr) else float("nan")
            res[arm] = {"ms": round(dt, 4),
                        "iqr_ms": [round(float(np.percentile(arr, 25)), 4),
                                   round(float(np.percentile(arr, 75)), 4)]
                        if len(arr) else None,
                        "gsps": round(T * C / (dt * 1e-3) / 1e9, 1)}
        base = res[base_arm]["ms"]
        for arm in order[1:]:
            res[arm]["vs_A"] = round(base / res[arm]["ms"], 3)
        res["hits"] = len(first[base_arm][0])
        out[fam] = res
        print(json.dumps({fam: res}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

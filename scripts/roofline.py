#!/usr/bin/env python
"""Speed-of-light (issue-roofline) analysis for the SWTPG Pallas kernels.

The TPG kernels are VPU-ISSUE-bound (BENCH_NOTES round-2 scaling point):
per tick they run a short serial chain of elementwise int32 vector ops
over (S, 128) channel tiles, and throughput scales with how many vector
issue slots each tick consumes, not with HBM or MXU.  This tool turns
that into a measurable %-of-ceiling:

1. **Op count** (any backend): trace ONE kernel-body tick per algorithm
   family — the same ``dispatch_tick`` + ``_emit_records`` composition
   ``pallas_tpg._tpg_kernel`` unrolls — and count the vector-ALU
   primitives in its jaxpr, weighted by (8, 128)-tile multiples of the
   output shape.  This is the issue-slot cost the Mosaic backend must
   schedule (modulo its own fusions; treat it as an estimate, and see
   the per-primitive histogram in the JSON for what dominates).
2. **Empirical ceiling** (real chip): a Pallas microkernel issuing a
   known number of dependent int32 vector ops per ``fori_loop``
   iteration, slope-timed between two iteration counts (launch/tunnel
   overhead cancels in the difference).  Probes:
     - ``serial8``:  one dependency chain on an (8, 128) tile — the
       pure latency bound a fully serial tick would hit;
     - ``ilp4``:     4 independent chains on (8, 128) tiles — the
       issue-throughput bound when the scheduler can overlap chains
       (the tick has parallel subchains: pedestal / IQR / charge / peaks);
     - ``serial24``: one chain on a (24, 128) tile — the whole-block
       shape the RS/Simple families ship (3 tiles of row-ILP per op).
3. **Kernel measurements** (real chip): slope-timed GS/s per family at
   the shipped knobs (same recipe as scripts/bench_kernel.py), converted
   to tile-issues/s via the op count and compared to the probes.

Run on hardware:  python scripts/roofline.py
CPU (counts only): JAX_PLATFORMS=cpu python scripts/roofline.py --counts-only

The reference has no analogous analysis; its kernels are AVX2
latency-bound at <256 ch/thread (SURVEY.md §6).  Interpretation of
results lives in BENCH_NOTES.md ("Roofline").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128
TILE = 8 * 128          # one (8, 128) int32 vreg tile

# jaxpr primitive -> issue-slot weight per output tile.  Elementwise ALU,
# compare and select primitives cost one VPU issue per tile; layout-only
# primitives cost zero (broadcast of a scalar constant is a splat the
# compiler hoists; convert int32<->bool rides the producing op).  ``abs``
# has no single Mosaic op (max(x, -x) / sign-mask sequence): weight 2.
_WEIGHTS = {
    "add": 1, "sub": 1, "mul": 1, "and": 1, "or": 1, "xor": 1, "not": 1,
    "neg": 1, "min": 1, "max": 1, "shift_left": 1,
    "shift_right_arithmetic": 1, "shift_right_logical": 1,
    "eq": 1, "ne": 1, "lt": 1, "gt": 1, "ge": 1, "le": 1,
    "select_n": 1, "abs": 2,
    # data movement that does hit the VPU as register copies
    "concatenate": 1,
    # free / hoisted
    "broadcast_in_dim": 0, "convert_element_type": 0, "reshape": 0,
    "squeeze": 0, "stop_gradient": 0, "reduce_sum": 0,
}


def count_tick_ops(cfg, k_slots: int = 1):
    """Issue-slot count for one kernel-body tick, per (8, 128) tile.

    Builds the exact composition the Pallas kernel unrolls per tick
    (pallas_tpg._tpg_kernel body: dispatch_tick + _emit_records) over
    (8, 128) int32 blocks and counts its jaxpr (weights above).
    Returns (total_tile_issues, per-primitive histogram).
    """
    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops.config import Algorithm
    from fdreadoutlibs_tpu.ops.fir import NTAPS, default_taps  # noqa: F401
    from fdreadoutlibs_tpu.ops.pallas_tpg import (_emit_records, live_fields,
                                                  record_words)
    from fdreadoutlibs_tpu.ops.step import dispatch_tick

    keys = live_fields(cfg)
    is_fir = cfg.algorithm == Algorithm.FIR
    n_fir = NTAPS if is_fir else 0
    rw = record_words(cfg)

    def one_tick(*args):
        st = dict(zip(keys, args[:len(keys)]))
        if is_fir:
            st["fir_prev"] = tuple(args[len(keys):len(keys) + n_fir])
        if cfg.algorithm == Algorithm.SIMPLE_THRESHOLD:
            st["rs_memory_factor"] = None
        s_raw = args[len(keys) + n_fir]
        slot_words = [args[len(keys) + n_fir + 1 + k] for k in range(k_slots)]
        nclose = args[len(keys) + n_fir + 1 + k_slots]
        st, closed, rec = dispatch_tick(st, s_raw, cfg, jnp)
        nclose = _emit_records(rec, closed, 7, cfg, slot_words, nclose,
                               k_slots)
        out = tuple(st[k] for k in keys)
        if is_fir:
            out += tuple(st["fir_prev"])
        return out + tuple(slot_words) + (nclose,)

    blk = jnp.zeros((8, LANES), jnp.int32)
    args = [blk] * (len(keys) + n_fir + 1) + \
        [jnp.zeros((rw, 8, LANES), jnp.int32)] * k_slots + [blk]
    jaxpr = jax.make_jaxpr(one_tick)(*args)

    hist: dict[str, float] = {}
    unknown: dict[str, int] = {}
    # call/control primitives: count their bodies (recursed), not the call
    _CALLS = {"pjit", "jit", "closed_call", "core_call", "custom_jvp_call",
              "custom_vjp_call", "remat", "checkpoint", "cond", "while",
              "scan"}

    def walk(jx):
        for eqn in jx.eqns:
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr if hasattr(sub.jaxpr, "eqns") else sub)
            name = eqn.primitive.name
            if name in _CALLS:
                continue
            tiles = sum(max(1.0, np.prod(v.aval.shape) / TILE)
                        for v in eqn.outvars if v.aval.shape)
            if name in _WEIGHTS:
                if _WEIGHTS[name]:
                    hist[name] = hist.get(name, 0) + _WEIGHTS[name] * tiles
            elif eqn.outvars and eqn.outvars[0].aval.shape:
                unknown[name] = unknown.get(name, 0) + 1
                hist[name] = hist.get(name, 0) + tiles
    walk(jaxpr.jaxpr)
    return round(sum(hist.values()), 1), \
        {k: round(v, 1) for k, v in sorted(hist.items(),
                                           key=lambda i: -i[1])}, unknown


# ---- empirical issue-rate probes --------------------------------------------------

def probe_issue_rate(rows: int, ilp: int, units: int = 32,
                     iters=(20_000, 120_000), trials: int = 5):
    """Sustained int32 VPU issue rate through the same Pallas/Mosaic path
    the kernels use.  Each fori_loop iteration runs ``ilp`` independent
    chains of ``3 * units // ilp`` DEPENDENT ops (add, shift, xor — no
    constant-foldable structure) on (rows, 128) tiles.  Slope between two
    iteration counts cancels launch + tunnel overhead.  Returns
    tile-issues/s (ops normalized to (8,128) tiles)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    per_chain = max(1, units // ilp)
    ops_per_iter = 3 * per_chain * ilp * (rows // 8)

    def make(n_iters):
        def kernel(x_ref, o_ref):
            c = jnp.int32(np.int32(np.uint32(0x9E3779B9)))

            def body(_, ch):
                ch = list(ch)
                for j in range(ilp):
                    x = ch[j]
                    for _ in range(per_chain):
                        x = x + c
                        x = x ^ (x >> 7)
                    ch[j] = x
                return tuple(ch)
            ch = jax.lax.fori_loop(
                0, n_iters, body,
                tuple(x_ref[j] for j in range(ilp)))
            for j in range(ilp):
                o_ref[j] = ch[j]

        return jax.jit(lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ilp, rows, LANES), jnp.int32),
        )(x))

    x = jnp.arange(ilp * rows * LANES, dtype=jnp.int32).reshape(
        ilp, rows, LANES)
    f_lo, f_hi = make(iters[0]), make(iters[1])
    f_lo(x).block_until_ready()
    f_hi(x).block_until_ready()
    slopes = []
    for _ in range(2 * trials):
        t0 = time.perf_counter()
        f_lo(x).block_until_ready()
        t_a = time.perf_counter() - t0
        t0 = time.perf_counter()
        f_hi(x).block_until_ready()
        t_b = time.perf_counter() - t0
        if t_b > t_a:
            slopes.append((t_b - t_a) / (iters[1] - iters[0]))
        if len(slopes) >= trials:
            break
    assert slopes, "all probe trials inverted; tunnel too unstable"
    s_per_iter = float(np.median(slopes))
    return ops_per_iter / s_per_iter


# ---- per-family kernel measurement (bench_kernel.py recipe, lighter) ---------------

def measure_family(cfg, C: int = 2560, T: int = 8192, n_windows: int = 16,
                   trials: int = 5):
    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (default_block_sublanes,
                                                  pack_adcs, pack_state,
                                                  process_window_pallas)
    from fdreadoutlibs_tpu.utils.tuning import kernel_knobs

    knobs = kernel_knobs(cfg, C)
    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(100):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    packed = jnp.asarray(pack_adcs(adcs))
    state0 = pack_state(
        seed_chanstate(init_chanstate(C), adcs[0], cfg.rs_memory_factor_x10),
        C, block_sublanes=default_block_sublanes(cfg, C))

    @jax.jit
    def multi(s):
        def body(s, _):
            _, nclose, s = process_window_pallas(
                packed, s, cfg, tc=knobs["tc"], k_slots=knobs["k_slots"],
                unroll=knobs["unroll"], vmem_limit_mb=64,
                fir_twopass=knobs["fir_twopass"])
            return s, jnp.sum(nclose)
        return jax.lax.scan(body, s, None, length=n_windows)

    multi(state0)[0].block_until_ready()
    slopes = []
    for _ in range(2 * trials):
        t0 = time.perf_counter()
        multi(state0)[0].block_until_ready()
        t_a = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = state0
        for _ in range(6):
            s, _ = multi(s)
        s.block_until_ready()
        t_b = time.perf_counter() - t0
        if t_b > t_a:
            slopes.append((t_b - t_a) / 5 / n_windows)
        if len(slopes) >= trials:
            break
    assert slopes, "all timing trials inverted"
    dt = float(np.median(slopes))
    return T * C / dt / 1e9, knobs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts-only", action="store_true",
                    help="skip the hardware probes/measurements")
    ap.add_argument("--channels", type=int, default=2560)
    args = ap.parse_args()

    import jax
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.pallas_tpg import pad_sublanes

    families = {
        "SimpleThreshold": TPGConfig.from_raw("SimpleThreshold",
                                              threshold=150),
        "AbsRS": TPGConfig.from_raw("AbsRS", threshold=150),
        "StandardRS": TPGConfig.from_raw("StandardRS", threshold=150),
        "FIR": TPGConfig.from_raw("FIR", threshold=5, track_peaks=False),
    }
    out = {"channels": args.channels,
           "tile_rows": pad_sublanes(args.channels)}
    blocks = out["tile_rows"] // 8     # (8,128)-tile rows covering the APA

    counts = {}
    for name, cfg in families.items():
        total, hist, unknown = count_tick_ops(cfg)
        counts[name] = {"tile_issues_per_tick": total, "ops": hist}
        if unknown:
            counts[name]["unclassified"] = unknown
    out["counts"] = counts

    on_tpu = not args.counts_only and jax.default_backend() == "tpu"
    if on_tpu:
        from fdreadoutlibs_tpu.utils.preflight import device_preflight
        device_preflight()
        # ILP sweep: dependent chains are latency-bound until enough
        # independent chains are in flight to saturate the VPU issue
        # slots; the CEILING is the max across arms (the kernels
        # themselves have cross-field + cross-tile + unroll ILP)
        probes = {}
        for pname, rows, ilp in [("serial8", 8, 1), ("ilp2", 8, 2),
                                 ("ilp4", 8, 4), ("ilp8", 8, 8),
                                 ("ilp16", 8, 16), ("serial24", 24, 1),
                                 ("ilp4x24", 24, 4)]:
            probes[pname] = round(probe_issue_rate(rows, ilp) / 1e9, 2)
        out["probe_tile_issues_gops"] = probes
        ceiling = max(probes.values())
        out["ceiling_tile_issues_gops"] = ceiling
        meas = {}
        for name, cfg in families.items():
            gsps, knobs = measure_family(cfg, C=args.channels)
            n = counts[name]["tile_issues_per_tick"]
            ticks_per_s = gsps * 1e9 / args.channels
            tileops = ticks_per_s * n * blocks
            meas[name] = {
                "gsps": round(gsps, 1),
                "knobs": {k: v for k, v in knobs.items() if v is not None},
                "tile_issues_gops": round(tileops / 1e9, 2),
                "pct_of_ceiling": round(
                    100 * tileops / (ceiling * 1e9), 1),
            }
        out["measured"] = meas
    print(json.dumps(out))


if __name__ == "__main__":
    main()

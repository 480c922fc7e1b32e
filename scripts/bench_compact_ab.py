#!/usr/bin/env python
"""A/B the app device step's compaction cost on the chip (round 5).

Round-4's app-RTF projection measured the app's exact per-batch device
computation (process_time2_feed + compact_on_device, k_slots=4) at
~4.6 ms/batch while the identical feed WITHOUT compaction at the shipped
k_slots=1 benches at ~0.33 ms (ingest_time2_feed 12.7x) — a 14x gap that
made the whole-app projection read compute-bound at 0.91x.  Two suspects:

* k_slots=4 (hardcoded in the apps since round 2; the shipped tuned knob
  is 1) quadruples the slot buffers and the compaction input;
* compact_slot_words' full argsort over every (chunk x K x channel) slot
  — 327,680 int32 keys at APA shapes — plus a 6-field record gather
  materialized for ALL slots before taking max_hits rows.

This script slope-times the decomposition at the app's exact shapes
(40 links x 128 frames, AbsRS production knobs): kernel-only, then
kernel+compact for {topk, sort} x {k=1, k=4}, interleaved visit order.

Run:  python scripts/bench_compact_ab.py [--trials 5]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def sort_compact_slot_words(w0, w1, w2, max_hits, tick_offset=0):
    """The pre-round-5 argsort+full-gather compaction, kept here verbatim
    as the A/B baseline (ops/hits.compact_slot_words is now top_k)."""
    import jax.numpy as jnp
    K, C = w2.shape
    valid = (w2 != 0).reshape(-1)
    chan = jnp.tile(jnp.arange(C, dtype=jnp.int32), (K, 1)).reshape(-1)
    end = (w2 - 1).reshape(-1)
    if w1 is None:
        w1 = jnp.zeros_like(w0)
    fields = jnp.stack([
        chan, end + jnp.int32(tick_offset),
        w0.reshape(-1) >> 16, w0.reshape(-1) & 0xFFFF,
        w1.reshape(-1) >> 16, w1.reshape(-1) & 0xFFFF], axis=-1)
    key = jnp.where(valid, end * jnp.int32(C) + chan,
                    jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key)
    fields = fields[order]
    valid_sorted = valid[order]
    n = jnp.sum(valid_sorted.astype(jnp.int32))
    out = jnp.zeros((max_hits, 6), jnp.int32)
    take = min(max_hits, K * C)
    out = out.at[:take].set(jnp.where(valid_sorted[:take, None],
                                      fields[:take], 0))
    return out, jnp.minimum(n, max_hits)


def sort_compact(slots, nclose, n_channels, max_hits):
    import jax.numpy as jnp
    nb, nch, K, nw, sub, lanes = slots.shape
    C = nb * sub * lanes
    flat = slots.transpose(1, 2, 3, 0, 4, 5).reshape(nch * K, nw, C)
    flat = flat[:, :, :n_channels]
    w1 = flat[:, 1] if nw == 3 else None
    out, n = sort_compact_slot_words(flat[:, 0], w1, flat[:, -1], max_hits)
    trailer = jnp.zeros((1, 6), jnp.int32)
    trailer = trailer.at[0, 0].set(n.astype(jnp.int32))
    return jnp.concatenate([out, trailer], axis=0)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", type=int, default=40)
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--algorithm", default="AbsRS")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke (tiny shapes advised; timings are "
                         "meaningless off-TPU)")
    args = ap.parse_args(argv)

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.formats import wibeth
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, \
        seed_chanstate
    from fdreadoutlibs_tpu.ops.ingest import (compact_on_device,
                                              process_time2_feed)
    from fdreadoutlibs_tpu.ops.pallas_tpg import (auto_tc, pack_adcs,
                                                  pack_state, pack_time2_jnp)
    from fdreadoutlibs_tpu.utils.tuning import kernel_knobs

    L, N = args.links, args.frames
    T, C = N * wibeth.N_TIME_SAMPLES, L * wibeth.N_CHANNELS
    cfg = TPGConfig.from_raw(args.algorithm, threshold=150)
    rng = np.random.default_rng(3)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    for _ in range(100):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
    rmf = np.where(np.arange(C) % 8 < 3, 0, cfg.rs_memory_factor_x10)
    knobs = kernel_knobs(cfg, C)
    stack0 = pack_state(seed_chanstate(init_chanstate(C), adcs[0], rmf), C,
                        block_sublanes=knobs["block_sublanes"])
    feeds = [pack_time2_jnp(jnp.asarray(pack_adcs(adcs))),
             pack_time2_jnp(jnp.asarray(pack_adcs(
                 np.roll(adcs, T // 2, axis=0))))]
    tc = auto_tc(T, cap=knobs["tc"])
    u = knobs["unroll"] if tc % knobs["unroll"] == 0 else 8
    u = u if u % 2 == 0 else 2
    if args.interpret:
        u = 2                       # unrolled interpret compiles are slow
    max_hits = max(2048, 2 * C)
    span_ms = T / (62.5e6 / 32) * 1e3

    def make_step(k_slots, compact):
        @jax.jit
        def step(feed, stack):
            slots, nclose, stack = process_time2_feed(
                feed, stack, cfg, C, tc=tc, k_slots=k_slots, unroll=u,
                fir_twopass=knobs["fir_twopass"],
                interpret=args.interpret)
            if compact == "none":
                return nclose, stack
            if compact == "topk":
                return compact_on_device(slots, nclose, 0, C,
                                         max_hits), stack
            return sort_compact(slots, nclose, C, max_hits), stack
        return step

    arms = {
        "kernel_k1": make_step(1, "none"),
        "topk_k1": make_step(1, "topk"),
        "sort_k1": make_step(1, "sort"),
        "topk_k4": make_step(4, "topk"),
        "sort_k4": make_step(4, "sort"),
    }

    # compile everything first, then interleave trials (tunnel drift)
    results = {k: [] for k in arms}
    for name, step in arms.items():
        step(feeds[0], stack0)[0].block_until_ready()
    # the rewritten top_k compaction must be bit-identical to the sort
    # baseline (same deterministic overflow rule) on this very data
    for f in feeds:
        a = np.asarray(arms["topk_k1"](f, stack0)[0])
        b = np.asarray(arms["sort_k1"](f, stack0)[0])
        assert a[-1, 0] > 0, "no hits reached compaction"
        assert np.array_equal(a[:-1], b[:-1]) and a[-1, 0] == b[-1, 0], \
            "topk/sort compaction outputs diverge"
    for _ in range(args.trials):
        for name, step in arms.items():
            results[name].append(slope_once(step, stack0, feeds))
    out = {"metric": "compact_ab", "links": L, "frames": N,
           "tc": tc, "unroll": u, "max_hits": max_hits,
           "span_ms": round(span_ms, 3)}
    for name in arms:
        med = float(np.median(results[name]))
        out[name + "_ms"] = round(med, 4)
        out[name + "_rtf"] = round(span_ms / med, 2)
    print(json.dumps(out))
    return 0


def slope_once(step, stack0, feeds):
    """One (1, 7)-chain slope sample in ms (positive-slope filtered by
    retrying once; the tunnel occasionally inverts a pair)."""
    import time as _t

    def chain(n):
        stack = stack0
        t0 = _t.perf_counter()
        out = None
        for i in range(n):
            out, stack = step(feeds[i % 2], stack)
        out.block_until_ready()
        return _t.perf_counter() - t0

    for _ in range(3):
        ta, tb = chain(1), chain(7)
        if tb > ta:
            return (tb - ta) / 6 * 1e3
    return (tb - ta) / 6 * 1e3


if __name__ == "__main__":
    sys.exit(main())

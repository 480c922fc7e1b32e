#!/usr/bin/env python
"""SWTPG benchmark: sustained APA real-time factors on one chip, all four
algorithm families.

Headline metric: real-time factor for a full 2560-channel APA running the
PRODUCTION configuration — AbsRS with threshold-on-collection (per-channel
memory factor 0 on collection channels, the deployed DUNE config;
reference src/wibeth/WIBEthFrameProcessor.cpp:441-450).  value = (data
time span processed) / (wall clock) at the WIBEth sampling rate
(2560 ch x 62.5 MHz / 32 = 5.0 GS/s aggregate).  Reference parity is 1.0
(the C++/AVX2 reference achieves ~real-time on a multicore CPU at
<256 ch/thread, BASELINE.md); the north-star target is >= 10x.  The JSON
line additionally reports every algorithm family so the headline cannot
over-represent the cheapest kernel.

Timing is slope-based (difference of two chained-iteration counts with one
hard sync each) to cancel the remote-TPU tunnel's per-sync latency; see
BENCH_NOTES.md.
"""

import json
import sys
import time

import numpy as np


def bench_algorithm(cfg, tc, k_slots, unroll, on_tpu, adcs, rmf,
                    n_windows, trials=5, fir_twopass=False,
                    return_trials=False):
    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (
        decode_pallas_hits, default_block_sublanes, pack_adcs, pack_state,
        process_window_pallas)

    T, C = adcs.shape
    packed = jnp.asarray(pack_adcs(adcs))
    # FIR runs in 8-row channel blocks (register pressure; the other
    # families stay whole-block — default_block_sublanes docs)
    state0 = pack_state(seed_chanstate(init_chanstate(C), adcs[0], rmf), C,
                        block_sublanes=default_block_sublanes(cfg, C))

    def one_window(s):
        return process_window_pallas(packed, s, cfg, tc=tc, k_slots=k_slots,
                                     unroll=unroll,
                                     vmem_limit_mb=64 if on_tpu else None,
                                     interpret=not on_tpu,
                                     fir_twopass=fir_twopass)

    # scan N windows inside one jit so the (tunnel-inflated) per-dispatch
    # overhead is amortized device-side, as a streaming deployment would
    @jax.jit
    def multi_window(s):
        def body(s, _):
            slots, nclose, s = one_window(s)
            return s, jnp.sum(nclose)
        s, counts = jax.lax.scan(body, s, None, length=n_windows)
        return s, counts

    def chain(n, s):
        t0 = time.perf_counter()
        for _ in range(n):
            s, counts = multi_window(s)
        _ = float(jnp.sum(s[:, 0]))             # hard sync
        return time.perf_counter() - t0, s

    # warm up / compile, and sanity-check the hit path
    slots, nclose, _ = one_window(state0)
    hits, _ = decode_pallas_hits(slots, nclose, C)
    min_hits = 50 if on_tpu else 3
    assert len(hits) > min_hits, \
        f"{cfg.algorithm}: hit path produced only {len(hits)} hits"
    chain(1, state0)

    if on_tpu:
        # slope timing with positive-slope filtering (_slope_dt): the
        # tunnel's per-sync latency is large and variable enough to
        # occasionally invert a single (short, long) pair
        def sync(s):
            _ = float(jnp.sum(s[:, 0]))
        dt, per_call = _slope_dt(multi_window, state0, n_windows, trials,
                                 sync, return_trials=True)
    else:
        # interpret mode is not a performance path; time one call
        dt, _ = chain(1, state0)
        dt /= n_windows
        per_call = [dt]
    span = T / WIBETH_SAMPLE_HZ
    if return_trials:
        # per-trial RTFs, most conservative first — lets the JSON carry
        # the tunnel-phase spread alongside the median (VERDICT r3 #7)
        return span / dt, sorted(span / s for s in per_call)
    return span / dt


# 62.5 MHz clock / 32 clocks per WIBEth sample = 1.953125 MHz per channel.
# The RTF conversion lives at the CALLERS (this is a WIBEth-stream rate;
# a bench variant timing e.g. a DAPHNE stream must convert with its own
# tick rate) — _slope_dt itself returns plain seconds per window.
WIBETH_SAMPLE_HZ = 62.5e6 / 32


def _slope_dt(multi_window, state0, n_windows, trials, sync,
              return_trials=False):
    import time as _t
    per_call = []
    for _ in range(2 * trials):
        t0 = _t.perf_counter()
        s, _ = multi_window(state0)
        sync(s)
        t_a = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        s = state0
        for _ in range(6):
            s, _ = multi_window(s)
        sync(s)
        t_b = _t.perf_counter() - t0
        slope = (t_b - t_a) / 5 / n_windows
        if slope > 0:
            per_call.append(slope)
        if len(per_call) >= trials:
            break
    assert per_call, "all timing trials inverted; tunnel too unstable"
    med = float(np.median(per_call))            # seconds per window
    return (med, per_call) if return_trials else med


def bench_fresh_and_ingest(cfg, tc, k_slots, unroll, adcs, rmf,
                           n_windows, trials=5, n_distinct=4):
    """Two production-config variants the headline never pays (VERDICT r2
    #3): (a) fresh-data — every scanned window reads a DISTINCT resident
    ADC window (rotating buffer inside the jit); (b) ingest-inclusive —
    the fused byte-ingest path (packed 14-bit frame words -> on-device
    unpack -> kernel) on distinct resident byte windows, so the on-device
    unpack/reshape cost at APA scale becomes a number.
    """
    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.formats import wibeth
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.ingest import (
        pack_words14_jnp, process_packed_frames, process_packed_frames_fused,
        process_words14_feed)
    from fdreadoutlibs_tpu.ops.pallas_tpg import (
        default_block_sublanes, pack_adcs, pack_state, words14_positions)
    from fdreadoutlibs_tpu.ops.pallas_tpg import process_window_pallas

    T, C = adcs.shape
    L = C // wibeth.N_CHANNELS
    n_frames = T // wibeth.N_TIME_SAMPLES
    rng = np.random.default_rng(42)

    # n_distinct variants of the stream (shifted noise + moved pulses)
    variants = [adcs]
    for _ in range(n_distinct - 1):
        v = np.roll(adcs, rng.integers(1, T), axis=0)
        variants.append(v)
    windows = [jnp.asarray(pack_adcs(v)) for v in variants]

    # byte-ingest inputs: encode each variant into WIBEth frame words
    def to_words(v):
        frames = wibeth.empty_frames(L * n_frames)
        a = v.reshape(n_frames, wibeth.N_TIME_SAMPLES, L,
                      wibeth.N_CHANNELS).transpose(2, 0, 1, 3)
        wibeth.set_adcs(frames, a.reshape(L * n_frames,
                                          wibeth.N_TIME_SAMPLES,
                                          wibeth.N_CHANNELS)
                        .astype(np.uint16))
        w = wibeth.frames_bytes_to_u32(frames)
        return w.reshape(L, T, wibeth.ADC_WORDS_PER_TS * 2)
    words = [jnp.asarray(to_words(v)) for v in variants]

    seeded = seed_chanstate(init_chanstate(C), adcs[0], rmf)
    state0 = pack_state(seeded, C,
                        block_sublanes=default_block_sublanes(cfg, C))
    # the fused in-kernel-unpack path (words14 layout) packs state by
    # channel POSITION, not channel index (BENCH_NOTES r3 in-kernel unpack)
    state0_fused = pack_state(seeded, C, positions=words14_positions(C))

    # Harness rules learned the hard way: the rotating buffers are jit
    # ARGUMENTS, not closure constants (a closed-over 400 MB array is
    # embedded in the remote compile request -> HTTP 413), and window
    # selection is a lax.switch over per-window branches, NOT a
    # dynamic_index_in_dim (the dynamic slice materializes a full window
    # copy per iteration — 2x HBM traffic — which is harness cost, not
    # the ingest cost being measured).
    def rotate_multi(step):
        @jax.jit
        def fn(s, *bufs):
            def body(carry, _):
                s, i = carry
                branches = [
                    (lambda s, w=w: step(w, s)) for w in bufs]
                slots, nclose, s = jax.lax.switch(i % n_distinct,
                                                  branches, s)
                return (s, i + 1), jnp.sum(nclose)
            (s, _), counts = jax.lax.scan(body, (s, 0), None,
                                          length=n_windows)
            return s, counts
        return fn

    fresh_multi = rotate_multi(
        lambda w, s: process_window_pallas(
            w, s, cfg, tc=tc, k_slots=k_slots, unroll=unroll,
            vmem_limit_mb=64))
    ingest_multi = rotate_multi(
        lambda w, s: process_packed_frames(
            w, s, cfg, C, tc=tc, k_slots=k_slots, unroll=unroll,
            vmem_limit_mb=64))
    # the shipped fast ingest mode: in-KERNEL 14-bit unpack, no
    # materialized unpacked array (StreamingIngest(fused=True))
    fused_multi = rotate_multi(
        lambda w, s: process_packed_frames_fused(
            w, s, cfg, C, tc=tc, k_slots=k_slots, unroll=unroll,
            vmem_limit_mb=64))
    # words14-ordered feed (StreamingIngest.submit_words14): the host/NIC
    # delivers rows in kernel order, the device pays ZERO relayout — the
    # ingest ceiling when the feed stage owns the byte order
    feeds = [pack_words14_jnp(w) for w in words]
    feed_multi = rotate_multi(
        lambda w, s: process_words14_feed(
            w, s, cfg, C, tc=tc, k_slots=k_slots, unroll=unroll,
            vmem_limit_mb=64))
    # two-stage slab schedule of the same feed: whole-chunk unpack into a
    # time2-packed VMEM scratch, plain time2 tick loop (VERDICT r3 #3)
    u_even = unroll if unroll % 2 == 0 else 2
    slab_multi = rotate_multi(
        lambda w, s: process_words14_feed(
            w, s, cfg, C, tc=tc, k_slots=k_slots, unroll=u_even,
            vmem_limit_mb=64, slab=True))
    # time-paired host feed (StreamingIngest.submit_time2): the host
    # unpacks AND pairs two ticks per int32 word (native.relayout_time2),
    # so the device runs the plain kernel datapath at ~half the ADC HBM
    # traffic — the ingest ceiling when the feed stage owns the unpack
    from fdreadoutlibs_tpu.ops.ingest import process_time2_feed
    from fdreadoutlibs_tpu.ops.pallas_tpg import pack_time2_jnp
    u2 = unroll if unroll % 2 == 0 else 2
    t2feeds = [pack_time2_jnp(w) for w in windows]
    time2_multi = rotate_multi(
        lambda w, s: process_time2_feed(
            w, s, cfg, C, tc=tc, k_slots=k_slots, unroll=u2,
            vmem_limit_mb=64))

    def sync(s):
        _ = float(jnp.sum(s[:, 0]))

    out = {}
    for name, fn, data, s0 in [
            ("fresh_data", fresh_multi, windows, state0),
            ("ingest_inclusive", ingest_multi, words, state0),
            ("ingest_fused", fused_multi, words, state0_fused),
            ("ingest_words14_feed", feed_multi, feeds, state0_fused),
            ("ingest_words14_slab", slab_multi, feeds, state0_fused),
            ("ingest_time2_feed", time2_multi, t2feeds, state0)]:
        def bound(s, _fn=fn, _d=data):
            return _fn(s, *_d)
        # per-variant isolation: a failure in one (e.g. a tuned-file knob
        # the fused path rejects) must not discard the minutes of
        # tunnel-bound measurement already recorded for the others
        try:
            bound(s0)[0].block_until_ready()        # compile
            dt = _slope_dt(bound, s0, n_windows, trials, sync)
            out[name] = round((T / WIBETH_SAMPLE_HZ) / dt, 2)
        except Exception as e:  # noqa: BLE001
            out[name + "_error"] = str(e)[-200:]
    return out


def _parse_probe_output(stdout: str):
    """Find the probe's JSON line in subprocess stdout (the jax/libtpu
    runtime may print its own messages around it); None if absent."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            parsed = json.loads(line)
        except ValueError:
            continue
        if isinstance(parsed, dict) and "sync_ms" in parsed:
            return parsed
    return None


def _tunnel_gate():
    """Probe the remote-TPU tunnel in a SUBPROCESS before this process
    touches jax, and wait (bounded) for a healthy phase.

    The axon tunnel occasionally wedges for ~30 min (CLAUDE.md): an
    in-process ``jax.devices()`` then hangs indefinitely, and a bench run
    started in a degraded phase records tunnel noise, not kernel speed.
    The subprocess probe (a) cannot hang this process — a wedge is a
    subprocess timeout — and (b) measures the per-sync latency so the
    JSON line can carry it.  Policy:

    * wedged (probe times out / crashes): retry up to
      ``FDREADOUT_BENCH_TUNNEL_WAIT_S`` (default 1800 s, the observed
      outage scale), then proceed anyway — no worse than ungated.
    * alive but slow (median sync > 1500 ms): wait up to 600 s total for
      a better phase, then proceed with what we have (slow-but-alive is
      measurable; the slope method cancels most of it).
    * healthy or a CPU backend: proceed immediately.
    """
    import os
    import subprocess

    budget = float(os.environ.get("FDREADOUT_BENCH_TUNNEL_WAIT_S", "1800"))
    if budget <= 0 or os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return {}                       # explicit CPU run / gate disabled
    slow_budget = min(600.0, budget)
    probe_src = (
        "import json, time\n"
        "import jax, jax.numpy as jnp\n"
        "b = jax.default_backend()\n"
        "x = jax.device_put(jnp.arange(128, dtype=jnp.int32))\n"
        "f = jax.jit(jnp.sum)\n"
        "_ = int(f(x))\n"
        "ts = []\n"
        "for _ in range(5):\n"
        "    t0 = time.perf_counter(); _ = int(f(x))\n"
        "    ts.append(1e3 * (time.perf_counter() - t0))\n"
        "ts.sort()\n"
        "print(json.dumps({'backend': b, 'sync_ms': round(ts[2], 1)}))\n")
    t_start = time.time()
    last = {}
    while True:
        state = "wedged"
        try:
            r = subprocess.run([sys.executable, "-c", probe_src],
                               capture_output=True, text=True, timeout=240)
            if r.returncode == 0:
                parsed = _parse_probe_output(r.stdout)
                if parsed is not None:
                    last = parsed
                    if last.get("backend") != "tpu":
                        return last       # CPU smoke run: nothing to gate
                    state = ("slow" if last["sync_ms"] > 1500
                             else "healthy")
        except (subprocess.TimeoutExpired, OSError):
            pass
        waited = time.time() - t_start
        if state == "healthy" or waited >= (
                slow_budget if state == "slow" else budget):
            last["tunnel_wait_s"] = round(waited, 1)
            if state != "healthy":
                last["tunnel_gate"] = f"proceeding_{state}"
            return last
        print(f"[bench] tunnel {state} ({last or 'no probe output'}); "
              f"waited {waited:.0f}s, retrying", file=sys.stderr)
        time.sleep(60)


def bench_host_codecs(seconds: float = 2.0):
    """Steady-state host feed codec throughput (pure CPU — meaningful
    even when the TPU tunnel is degraded).  Reused aligned output
    buffers, one core: the production calling convention
    (scripts/bench_host_codec.py is the full harness)."""
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    import bench_host_codec as codec_bench

    from fdreadoutlibs_tpu import native
    if native.load() is None:
        return {}
    L, T = 40, 4096
    rng = np.random.default_rng(1)
    words = rng.integers(0, 2 ** 32, size=(L, T, 28), dtype=np.uint32)
    gb = words.nbytes / 1e9
    out = {}
    # WIB2 words: 10 links x 256 ch (nw=112) through the same generic
    # codec — the stream/wib2.py tpg_time2_feed host cost
    w2_words = rng.integers(0, 2 ** 32, size=(10, T, 112), dtype=np.uint32)
    w2_gb = w2_words.nbytes / 1e9
    for name, nbytes, fn in [
            ("time2", gb, lambda b: native.relayout_time2(
                words, out=b.get(native.time2_feed_shape(L, T)))),
            ("words14", gb, lambda b: native.relayout_words14(
                words, out=b.get(native.words14_feed_shape(L, T)))),
            ("time2_wib2", w2_gb, lambda b: native.relayout_time2(
                w2_words, ch_per_link=256,
                out=b.get(native.time2_feed_shape(10, T,
                                                  ch_per_link=256))))]:
        buf = native.FeedBuffer()
        dt = codec_bench.bench_one(lambda: fn(buf), seconds)
        out[f"host_{name}_GBps_per_core"] = round(nbytes / dt, 2)
    return out


def bench_host_tp_path(trials: int = 3):
    """Compact host TP-path (L3/L4) summary (pure numpy, no device work;
    scripts/bench_tp_path.py is the full harness): batched whole-APA TP
    assembly core share at production cadence, TPSet-windowing loop rate
    on the production (native when built) latency buffer, and the legacy
    WIB handler rate."""
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    import bench_tp_path as tp

    rng = np.random.default_rng(7)
    asm = tp.bench_tp_assembly(trials, rng)
    rh = tp.bench_request_handler(trials, rng)
    wh = tp.bench_wib_tp_handler(trials, rng)
    loop = tp.bench_apa_host_loop(trials, rng)
    prod = rh.get("native") or rh["python"]
    return {
        "apa_assembly_pct_core": asm["apa_batched"][
            "apa_call_budget_used_pct"],
        # RAW shared-core reading — drifts 270-500% between sessions on
        # this box (BENCH_NOTES round-4 close).  Cross-session readers
        # must use the _normalized field (divided out against the
        # same-session 32 MB-memcpy yardstick, expressed at the nominal
        # 6.7 GB/s core all BENCH_NOTES figures were taken at).
        "apa_host_loop_pct_core_sharedbox_raw": loop["pct_core_per_apa"],
        "apa_host_loop_pct_core_normalized":
            loop["pct_core_per_apa_at_6p7GBps_core"],
        "apa_host_loop_memcpy_baseline_GBps":
            loop["memcpy_baseline_GBps"],
        "request_handler_tps_per_s": prod["insert_window_tps_per_s"],
        "request_handler_headroom_vs_256k": prod["headroom_vs_256k"],
        "request_handler_buffer": "native" if "native" in rh else "python",
        "wib_handler_tps_per_s": wh["tps_per_s"],
    }


def main():
    tunnel = _tunnel_gate()

    import os

    if (tunnel.get("tunnel_gate") == "proceeding_wedged"
            and tunnel.get("backend") != "cpu"
            and os.environ.get("FDREADOUT_BENCH_ON_WEDGE", "fail")
            != "proceed"):
        # The gate never saw one live probe across its whole budget
        # (default 30 min): the tunnel is in an extended outage, and an
        # in-process jax backend init would likely hang this process —
        # and whatever driver invoked it — INDEFINITELY.  An honest
        # failure line beats a hang; FDREADOUT_BENCH_ON_WEDGE=proceed
        # restores the old try-anyway behavior.
        print(json.dumps({
            "metric": "apa_realtime_factor_swtpg_production",
            "value": 0.0, "unit": "x_realtime_2560ch_APA",
            "vs_baseline": 0.0, "error": "tpu_tunnel_wedged",
            "tunnel_wait_s": tunnel.get("tunnel_wait_s")}))
        return 1

    import jax
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # make the env knob effective even where a sitecustomize points
        # the default backend at a (possibly wedged) TPU tunnel at
        # interpreter start (CLAUDE.md gotcha): an explicit CPU smoke run
        # must never touch the tunnel
        jax.config.update("jax_platforms", "cpu")
    from fdreadoutlibs_tpu.ops import TPGConfig

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # fail fast (with both build strings) on libtpu client/terminal
        # skew instead of deep inside the first device_put (VERDICT r2 #8)
        from fdreadoutlibs_tpu.utils.preflight import device_preflight
        device_preflight()
    C = 2560
    T = 8192 if on_tpu else 512      # interpret mode is a smoke test only
    N_WINDOWS = 16 if on_tpu else 1

    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    # sprinkle realistic signals so the hit path is exercised
    for _ in range(200):
        c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
        adcs[t0:t0 + 8, c] += rng.integers(300, 3000)

    # per-algorithm production-shaped configs; (cfg, tc, k, unroll, rmf)
    def mixed_rmf(cfg):
        # threshold-on-collection: collection channels memoryless
        # (WIBEthFrameProcessor.cpp:441-450); every 5th of 8 channels
        # collection-like is a stand-in plane split at bench scale
        return np.where(np.arange(C) % 8 < 3, 0, cfg.rs_memory_factor_x10)

    from fdreadoutlibs_tpu.utils.tuning import kernel_knobs

    def knobs(cfg):
        # shipped per-algorithm table, overridable by an autotuned file
        # (FDREADOUT_TUNED) — including the swept k_slots and the FIR
        # schedule choice (fused vs two-pass)
        k = kernel_knobs(cfg, C)
        return k["tc"], k["k_slots"], k["unroll"], k["fir_twopass"]

    prod = TPGConfig.from_raw("AbsRS", threshold=150)
    simple = TPGConfig.from_raw("SimpleThreshold", threshold=150)
    std = TPGConfig.from_raw("StandardRS", threshold=150)
    # reference-shaped FIR records: the WIB/WIB2 consumers derive
    # peaks at TP assembly, so the kernel skips peak tracking
    fir = TPGConfig.from_raw("FIR", threshold=5, track_peaks=False)
    runs = {
        "AbsRS_production": (prod, *knobs(prod), mixed_rmf(prod)),
        "SimpleThreshold": (simple, *knobs(simple), None),
        "StandardRS": (std, *knobs(std), None),
        "FIR": (fir, *knobs(fir), None),
    }
    if not on_tpu:  # smoke-test shapes: tc must divide T
        runs = {k: (cfg, 256, 2, 8, tp, rmf)
                for k, (cfg, _, _, _, tp, rmf) in runs.items()}

    results = {}
    spreads = {}
    headline_trials = []
    for name, (cfg, tc, k, unroll, twopass, rmf) in runs.items():
        if rmf is None:
            rmf = cfg.rs_memory_factor_x10
        # the headline (production) number gets extra trials: the tunnel's
        # phase noise dominates single readings (BENCH_NOTES)
        trials = 7 if name == "AbsRS_production" else 5
        rtf, per_trial = bench_algorithm(
            cfg, tc, k, unroll, on_tpu, adcs, rmf, N_WINDOWS,
            trials=trials, fir_twopass=twopass, return_trials=True)
        results[name] = round(rtf, 2)
        # every family gets the min/trials spread treatment, not just the
        # headline — one bad tunnel phase must be readable as such for
        # any family (VERDICT r4 weak #2)
        srt = sorted(round(v, 2) for v in per_trial)
        spreads[name] = {"min": srt[0] if srt else results[name],
                         "trials": srt}
        if name == "AbsRS_production":
            headline_trials = srt

    # production config again, but paying what the headline never pays:
    # distinct data per window, and the fused byte-ingest path (on-device
    # 14-bit unpack at APA scale) — VERDICT r2 #3
    extra = {}
    if on_tpu:
        cfg, tc, k, unroll, _tp, rmf = runs["AbsRS_production"]
        try:
            extra = bench_fresh_and_ingest(cfg, tc, k, unroll, adcs, rmf,
                                           N_WINDOWS)
        except Exception as e:  # noqa: BLE001 — keep the headline robust
            extra = {"ingest_bench_error": str(e)[-200:]}

    rtf = results["AbsRS_production"]
    out = {
        "metric": "apa_realtime_factor_swtpg_production",
        "value": rtf,
        "unit": "x_realtime_2560ch_APA",
        "vs_baseline": rtf,
        # tunnel-phase spread of the headline: min = most conservative
        # trial, value = median; rounds are comparable via value_min even
        # when the driver catches a bad phase (VERDICT r3 #7)
        "value_min": headline_trials[0] if headline_trials else rtf,
        "value_trials": headline_trials,
        "algorithms": results,
        "algorithms_spread": spreads,
    }
    if on_tpu:
        # interpret the reading: per-sync tunnel latency at bench start
        # (healthy band 40-600 ms; the slope method cancels it, but phase
        # drift across a long run does not fully cancel — BENCH_NOTES).
        # tunnel_gate="proceeding_wedged" with no sync_ms means NO probe
        # ever succeeded — treat the numbers below with suspicion.
        for key in ("sync_ms", "tunnel_wait_s", "tunnel_gate"):
            if key in tunnel:
                out["tunnel_" + key if key == "sync_ms" else key] = \
                    tunnel[key]
    try:
        codec = bench_host_codecs()
        if codec:
            out["host_codecs"] = codec
    except Exception as e:  # noqa: BLE001 — never cost the headline
        out["host_codec_error"] = str(e)[-200:]
    try:
        out["host_tp_path"] = bench_host_tp_path()
    except Exception as e:  # noqa: BLE001 — never cost the headline
        out["host_tp_path_error"] = str(e)[-200:]
    if on_tpu:
        # end-to-end TP-emission latency (data-arrival -> TP-available)
        # on the production app config — VERDICT r3 #2.  Compact arm:
        # the time2 feed at an 8-frame batch; the full per-arm/per-size
        # study is scripts/bench_latency.py.  Rig numbers include the
        # tunnel; the *_corrected fields subtract one null-sync RTT per
        # batch and remain an upper bound on production latency.
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "scripts"))
            import bench_latency as bl
            lat = bl.run_arm("time2", 40, 8, 10, 2, "AbsRS", 120,
                             True, 2, 0.02)
            out["latency"] = {k: lat[k] for k in (
                "proc_ms_p50", "proc_ms_p95", "rtt_null_ms_p50",
                "proc_ms_p50_corrected", "proc_ms_p95_corrected",
                "batch_span_ms", "latency_ms_p95",
                "latency_ms_p95_corrected", "min_latency_ticks",
                "min_latency_ticks_corrected") if k in lat}
        except Exception as e:  # noqa: BLE001 — never cost the headline
            out["latency_error"] = str(e)[-200:]
    if on_tpu:
        # own path insert: the latency block's insert above is inside a
        # try and may be skipped/refactored — these imports must not
        # depend on it
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts"))
        # per-frontend hardware RTF: every frontend with a device path
        # gets a slope-timed number at a production aggregation, not an
        # extrapolation from the WIBEth flagship — VERDICT r4 #2.  Full
        # harness: scripts/bench_frontends.py (arm docs + budgets there).
        try:
            import bench_frontends as bf
            out["frontends"] = bf.run_all(trials=3)
        except Exception as e:  # noqa: BLE001 — never cost the headline
            out["frontends_error"] = str(e)[-200:]
        # whole-application RTF: the assembled APAReadoutApp, packed
        # bytes -> TPSets, production config (time2 feed + pipelined +
        # zero-copy retention), with the stage-overlap projection — the
        # "pieces measured = whole measured" closure (VERDICT r4 #1).
        # Full harness: scripts/bench_app_rtf.py.
        try:
            import bench_app_rtf as ba
            app = ba.run_bench(links=40, frames=128, warm=2, timed=8)
            out["app_rtf"] = {k: app[k] for k in (
                "rtf_pipelined", "rtf_unpipelined", "batch_span_ms",
                "device_transfer_mb_per_batch", "projection", "config")
                if k in app}
            piped = app.get("pipelined", {})
            out["app_rtf"]["tpsets_emitted"] = piped.get("tpsets_drained", 0)
            out["app_rtf"]["tps_sent"] = piped.get("total_tps_sent", 0)
            out["app_rtf"]["ts_errors"] = piped.get("ts_errors")
        except Exception as e:  # noqa: BLE001 — never cost the headline
            out["app_rtf_error"] = str(e)[-200:]
    if extra:
        out["production_variants"] = extra
        # overhead of paying ingest at all, against the best shipped
        # ingest path — the time2 host feed when present (the device then
        # runs the plain time_packed datapath), else the fused in-kernel
        # unpack, else raw upload+device unpack.  Note this includes the
        # tunnel's host->device transfer cost, which production hardware
        # (local PCIe) would not pay — see BENCH_NOTES.
        f = extra.get("fresh_data")
        g = extra.get("ingest_time2_feed") or extra.get("ingest_fused") \
            or extra.get("ingest_inclusive")
        if f and g:
            out["unpack_overhead_pct"] = round(100 * (f / g - 1), 1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

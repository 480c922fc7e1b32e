"""Fused Pallas TPU kernel for the SWTPG streaming pipeline.

The production analogue of process_window_avx2 / process_window_rs_avx2 /
process_window_standard_rs_avx2 (wibeth/tpg/Process*AVX2.hpp) — one kernel,
parameterized by :class:`TPGConfig`, calling the same
:func:`ops.step.tpg_tick` as the oracle backends, so it is bit-exact by
construction (and tested).

Design (TPU-first; SURVEY.md §7.3):

* channels live on VPU lanes: the C channel axis is laid out as
  (S, 128) = (sublane rows, lanes); one grid block covers up to
  ``block_sublanes`` rows (default: all of them — the per-tick chain is
  latency-bound, so wider tiles are nearly free and multiply throughput);
* time is the sequential axis: an inner ``fori_loop`` scans TC ticks with
  the full ChanState resident in vector registers/VMEM (the recurrent
  frugal-streaming state makes the time loop inherently sequential — the
  reference kernels have the same structure per 16-lane AVX register);
* the grid is (channel_blocks, time_chunks); Pallas double-buffers the ADC
  chunks (HBM→VMEM) while the previous chunk computes; the state block is
  revisited (stays in VMEM) across a block's time chunks, carried through
  the aliased output block, and written back once;
* hit emission replaces the reference's MAGIC-sentinel register dumps
  (ProcessAVX2.hpp:157-196) with **per-channel K-slot buffers**: when a
  channel's hit closes, its packed record is written into slot
  ``n_closed[c]`` via K one-hot vector selects.  This keeps the hot loop
  free of scalar synchronization (no cursors, no data-dependent branches)
  — the slot writes do not feed the recurrent dependency chain, so they
  pipeline behind it.  Records pack into 3 int32 words:
  [charge<<16 | tover, peak_adc<<16 | peak_time, end_tick+1].
  The slot buffers are **per time chunk**: each of the grid's T/tc chunks
  drains into its own output block, so per-channel capacity scales with
  the window length (K hits per tc ticks; K=2 @ tc=1024 sustains a
  ~3.8 kHz per-channel TP rate — far above physical rates, and the
  reference's shared 100k buffer per 64-tick window,
  WIBEthFrameProcessor.cpp:78).  Closes beyond K per chunk are dropped
  per channel and visible in the returned per-chunk close counts, which
  also feed the hot-channel monitoring the reference keeps in
  m_tp_channel_rate_map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


from .chanstate import FIELDS, NSTATE
from .config import Algorithm, TPGConfig
from .fixedpoint import I16Fx, I32Fx
from .step import dispatch_tick

LANES = 128
SUBLANES = 8                               # minimum sublane granule (int32 tile)

# Emission record layout inside the tick loop (trace-time constant).
# False: each K slot is carried as one stacked (nw, sub, 128) array and
# _emit_records re-stacks the record words every tick.  True: the words
# ride as k*nw separate (sub, 128) registers and stack only at chunk
# writeback — nw fewer copies per tick IF Mosaic materializes the stack.
# Hardware A/B via scripts/bench_stepform_ab.py --slots; shipped value
# per BENCH_NOTES ("emission word carry").
SLOT_WORD_CARRY = False
N_FIR_TAPS = 8
KSTATE = NSTATE + 1 + N_FIR_TAPS           # + rs_memory_factor + FIR ring rows
_STATE_KEYS = FIELDS + ("rs_memory_factor",)
_FIR_ROW0 = NSTATE + 1                     # first FIR ring row in the stack

# state fields actually carried through the tick loop, per algorithm family
_LIVE_SIMPLE = ("pedestals", "accum", "prev_was_over", "hit_charge",
                "hit_tover", "hit_peak_adc", "hit_peak_time")
# RS derives prev_was_over from the carried rs value (step.py) — the flag
# register drops out of the loop entirely
_LIVE_RS = tuple(k for k in _LIVE_SIMPLE if k != "prev_was_over") + \
    ("rs", "pedestals_rs", "accum_rs", "rs_memory_factor")
_LIVE_FIR = _LIVE_SIMPLE + ("quantile25", "quantile75", "accum25", "accum75")


def record_words(cfg: TPGConfig) -> int:
    """int32 words per hit record: [charge<<16|tover, peak<<16|ptime,
    end_tick+1], with the peak word dropped for kernels that do not track
    peaks (reference-shaped FIR records)."""
    return 2 if (cfg.algorithm == Algorithm.FIR
                 and not cfg.track_peaks) else 3


def live_fields(cfg: TPGConfig):
    if cfg.algorithm == Algorithm.SIMPLE_THRESHOLD:
        return _LIVE_SIMPLE
    if cfg.algorithm == Algorithm.FIR:
        if not cfg.track_peaks:   # no peak registers (reference FIR shape)
            return tuple(k for k in _LIVE_FIR
                         if k not in ("hit_peak_adc", "hit_peak_time"))
        return _LIVE_FIR
    return _LIVE_RS


# ---- layout helpers ------------------------------------------------------------

def pad_sublanes(C: int, granule: int = SUBLANES) -> int:
    """Channel count -> padded sublane-row count (multiple of the tile
    granule: 8 rows for int32, 16 for int16)."""
    S = -(-C // LANES)
    return -(-S // granule) * granule


def _granule(dtype) -> int:
    return 16 if np.dtype(dtype).itemsize == 2 else SUBLANES


# Shipped kernel-launch knobs per algorithm family (TPU v5e-lite;
# re-derive on other chips with scripts/autotune.py, consumed through
# utils/tuning.kernel_knobs).  sub=0 means one whole-channel block.
# History (BENCH_NOTES round-2c): the RS/Simple families are latency-bound
# and always prefer whole blocks (splitting is ~2.5x slower); AbsRS
# tc=256 beat tc=512 in two independent interleaved A/Bs (+18%, +49%)
# and lifted the production bench 13.7x -> 16.3x, while StandardRS and
# SimpleThreshold confirmed tc=512.  FIR is BIMODAL between
# (whole-block, tc=256) and (8-row blocks, tc=512): interleaved A/Bs
# split (+11%/+60% for whole-256 vs +9% for blocked-512 with rotated
# order), and bench.py recorded 9.9x for whole-256 vs 15.8x for
# blocked-512 — the blocked config ships because its bench floor never
# fell below the 10x north star.  Round 4: (8-row blocks, tc=256)
# displaced blocked-512 on FOUR independent confirmations in one
# session (autotune --confirm rotated passes +15%/+2.5%, plus two
# interleaved bench_ab runs at +11% and +100%) — the blocked-vs-whole
# split stands; only FIR's tc moved.  Re-examine per libtpu release
# (scripts/autotune.py).
SHIPPED_KNOBS = {
    Algorithm.SIMPLE_THRESHOLD: {"sub": 0, "tc": 512, "unroll": 32, "k": 1},
    Algorithm.ABS_RS: {"sub": 0, "tc": 256, "unroll": 32, "k": 1},
    Algorithm.STANDARD_RS: {"sub": 0, "tc": 512, "unroll": 32, "k": 1},
    Algorithm.FIR: {"sub": 8, "tc": 256, "unroll": 32, "k": 1,
                    "twopass": 0},
}


def default_block_sublanes(cfg: TPGConfig, n_channels: int,
                           dtype=np.int32) -> int | None:
    """Channel-block row count for pack_state, by algorithm family —
    reads SHIPPED_KNOBS (see the table's history note).  Returns None for
    one whole block, or a row count that tiles the padded channel
    axis."""
    g = _granule(dtype)
    S = pad_sublanes(n_channels, g)
    sub = SHIPPED_KNOBS[cfg.algorithm]["sub"]
    # the block must also respect the dtype's sublane tile granule (the
    # shipped sub=8 is int32-tuned; int16 tiles are 16 rows)
    if sub and S > sub and S % sub == 0 and sub % g == 0:
        return sub
    return None


def pack_state(state: dict, n_channels: int, block_sublanes: int | None = None,
               dtype=np.int32, positions: np.ndarray | None = None):
    """ChanState dict of (C,) arrays -> (NB, KSTATE, SUB, 128) blocked stack.

    dtype=np.int16 selects the native-int16 compute mode (the kernel infers
    the mode from the stack dtype; pack the ADCs with the same dtype).
    ``positions`` places channel c at flat position positions[c] instead
    of c (the words14 fused-unpack layout); rows then cover max(position).
    """
    if positions is not None:
        S = -(-(int(positions.max()) + 1) // LANES)
        S = -(-S // _granule(dtype)) * _granule(dtype)
    else:
        S = pad_sublanes(n_channels, _granule(dtype))
    sub = block_sublanes or S
    nb = -(-S // sub)
    out = np.zeros((nb, KSTATE, sub, LANES), dtype=dtype)

    def put(i, values):
        v = np.zeros(nb * sub * LANES, dtype=dtype)
        vals = np.asarray(values).astype(dtype)
        if positions is not None:
            v[positions] = np.broadcast_to(vals, (n_channels,))
        else:
            v[:n_channels] = vals
        out[:, i] = v.reshape(nb, sub, LANES)

    for i, k in enumerate(_STATE_KEYS):
        put(i, state[k])
    fir = state.get("fir_prev")
    if fir is not None:
        for j in range(N_FIR_TAPS):
            put(_FIR_ROW0 + j, np.asarray(fir)[j])
    return jnp.asarray(out)


def unpack_state(stack, n_channels: int,
                 positions: np.ndarray | None = None) -> dict:
    arr = np.asarray(stack).astype(np.int32)
    nb, _, sub, _ = arr.shape
    flat = arr.transpose(1, 0, 2, 3).reshape(KSTATE, nb * sub * LANES)
    sel = positions if positions is not None else slice(None, n_channels)
    st = {k: flat[i][sel].copy() for i, k in enumerate(_STATE_KEYS)}
    st["fir_prev"] = flat[_FIR_ROW0:_FIR_ROW0 + N_FIR_TAPS][:, sel].copy()
    return st


def auto_tc(T: int, cap: int = 512) -> int:
    """Largest divisor of T not exceeding the VMEM-safe chunk cap."""
    for tc in range(min(T, cap), 0, -1):
        if T % tc == 0:
            return tc
    return T


def pack_adcs(adcs: np.ndarray, dtype=np.int32) -> np.ndarray:
    """(T, C) -> (T, S, 128) with zero-padding of the channel axis."""
    T, C = adcs.shape
    S = pad_sublanes(C, _granule(dtype))
    out = np.zeros((T, S, LANES), dtype=dtype)
    out.reshape(T, S * LANES)[:, :C] = adcs
    return out


def pack_adcs_time2(adcs: np.ndarray) -> np.ndarray:
    """(T, C) -> (T//2, S, 128) int32 with two consecutive time samples per
    word (t0 | t1<<16) — halves the ADC HBM traffic into the kernel.

    Values must be < 32768 (true for all 14-bit streams); the kernel
    recovers t1 with an arithmetic >>16 and t0 with a sign-extending
    (<<16)>>16, so the samples round-trip exactly.
    """
    packed = pack_adcs(adcs, np.int32)              # (T, S, 128)
    return packed[0::2] | (packed[1::2] << 16)


def pack_time2_jnp(adcs):
    """Device variant: (T, S, 128) int32 -> (T//2, S, 128) time-paired."""
    return adcs[0::2] | (adcs[1::2] << 16)


# ---- the kernel ----------------------------------------------------------------

def _unpack14_rows(w):
    """In-kernel WIBEth 14-bit unpack of one tick's word rows.

    ``w``: (WRb, 7, 128) int32 word bit patterns in the words14 layout
    (channel c = 16g + r lives at row (g//128)*16 + r, lane g%128 — see
    words14_positions).  The 16-channel/7-word alignment period makes
    every class r a pure per-lane extract with CLASS-CONSTANT word index
    and shift — no cross-lane movement, ~4 vector ops per class.
    Arithmetic shifts are corrected with explicit masks (sign-extension
    bits would pollute the 14-bit window for shifts > 18).
    Returns (16*WRb, 128) int32 ADCs.
    """
    vs = []
    for r in range(16):
        bit = 14 * r
        j, sh = bit // 32, bit % 32
        lo = w[:, j]
        if sh:
            lo = (lo >> sh) & ((1 << (32 - sh)) - 1)
        v = lo
        if sh + 14 > 32:
            v = v | (w[:, j + 1] << (32 - sh))
        vs.append(v & 0x3FFF)                       # (WRb, 128)
    # row order wr*16 + r: stack classes on a middle axis then flatten
    return jnp.stack(vs, axis=1).reshape(-1, LANES)


def _unpack14_rows_gather(w):
    """Full-height formulation of the words14 in-kernel unpack.

    The per-class formulation (_unpack14_rows) runs ~58 ops on
    quarter-height (WRb, 128) values plus a 16-way stack/interleave; this
    one instead gathers the needed word rows into output-row order with
    two static takes on the (zero-padded) word axis and runs ONE
    full-height shift/or/mask chain with per-sublane shift vectors:

      v[wr*16+r] = ((w[wr, j_r] >>l sh_r) | (w[wr, j_r + 1] << (32-sh_r)))
                   & 0x3FFF

    where the high word is the zero pad row for classes that fit in one
    word.  Logical right shift via a uint32 bitcast (no sign-extension
    masks).  Bit-exact with _unpack14_rows; whether it is faster is a
    Mosaic-lowering question (gather-as-shuffle + vector shift amounts)
    — A/B'd on hardware before shipping as default.
    """
    WRb = w.shape[0]
    zero = jnp.zeros_like(w[:, :1])
    lo_parts, hi_parts = [], []
    for r in range(16):
        bit = 14 * r
        j, s = bit // 32, bit % 32
        lo_parts.append(w[:, j:j + 1])
        hi_parts.append(w[:, j + 1:j + 2] if s + 14 > 32 else zero)
    lo = jnp.concatenate(lo_parts, axis=1)               # (WRb, 16, 128)
    hi = jnp.concatenate(hi_parts, axis=1)
    # shift amounts derived from the class index (no constant-array
    # capture, which pallas kernels disallow): sh_r = 14r mod 32;
    # lsh = (32-sh) & 31 — harmless for non-straddle rows (hi is zero)
    r_idx = jax.lax.broadcasted_iota(jnp.uint32, (WRb, 16, LANES), 1)
    sh = (14 * r_idx) & 31
    lsh = (32 - sh) & 31
    lo_u = jax.lax.bitcast_convert_type(lo, jnp.uint32)
    hi_u = jax.lax.bitcast_convert_type(hi, jnp.uint32)
    v = ((lo_u >> sh) | (hi_u << lsh)) & jnp.uint32(0x3FFF)
    return jax.lax.bitcast_convert_type(v, jnp.int32).reshape(-1, LANES)


def _unpack14_slab(w):
    """Slab (multi-tick) form of _unpack14_rows: ``w`` is (GT, WRb, 7, 128)
    int32 word rows for GT consecutive ticks; returns (GT, 16*WRb, 128)
    unpacked ADCs in the same words14 row order.

    Same extract arithmetic, but each op runs on (GT*WRb, 128)-height
    values instead of the per-tick (WRb, 128) quarter-height — on an
    issue-bound VPU the per-op register height is the whole game
    (BENCH_NOTES round-3: the in-kernel unpack costs ~2x kernel time and
    the cost is layout churn + small-op issue, not extract arithmetic)."""
    vs = []
    for r in range(16):
        bit = 14 * r
        j, sh = bit // 32, bit % 32
        lo = w[:, :, j]
        if sh:
            lo = (lo >> sh) & ((1 << (32 - sh)) - 1)
        v = lo
        if sh + 14 > 32:
            v = v | (w[:, :, j + 1] << (32 - sh))
        vs.append(v & 0x3FFF)                       # (GT, WRb, 128)
    return jnp.stack(vs, axis=2).reshape(w.shape[0], -1, LANES)


def words14_positions(n_channels: int) -> np.ndarray:
    """Per-channel flat position in the words14 fused-unpack layout.

    Channel c = 16g + r (g = word group of 7, r = class) sits at
    row (g // 128) * 16 + r, lane g % 128.  Positions pad the group axis
    to whole lane rows, so the row count is ceil(G/128)*16 — for a
    2560-channel APA that is 32 rows (4096 positions, 62.5% occupancy)
    vs 20 rows canonical: the fused kernel trades ~33% more rows for
    removing the XLA-level unpack entirely (BENCH_NOTES r3).
    """
    assert n_channels % 16 == 0
    c = np.arange(n_channels)
    g, r = c // 16, c % 16
    return ((g // LANES) * 16 + r) * LANES + (g % LANES)


def words14_block_sublanes(sub: int | None, n_channels: int) -> int | None:
    """Adapt a canonical channel-block row count to the words14 layout.

    words14 blocks must be 16-row multiples (one row per unpack class),
    and must tile the words14 row count S = 16*ceil(G/128) — a tuned
    `sub` that satisfies the canonical-layout checks can violate the
    latter (e.g. sub=24 with 6144 channels: canonical S=48 tiles, but
    words14 S=48 does not divide by the rounded 32).  Falling back to
    whole-block keeps the "a tuned file is always safe to deploy"
    contract (utils/tuning.py) in fused mode.  The ONE place all fused
    call sites (StreamingIngest, apa_readout, parallel/apa) resolve the
    constraint."""
    if not sub:
        return None
    sub = max(16, -(-sub // 16) * 16)
    S = 16 * (-(-(n_channels // 16) // LANES))
    if S <= sub or S % sub:
        return None
    return sub


def words14_channel_of_position(n_channels: int) -> np.ndarray:
    """Inverse of words14_positions: flat position -> channel (-1 = dead
    padding lane)."""
    pos = words14_positions(n_channels)
    n_rows = 16 * (-(-(n_channels // 16) // LANES))
    out = np.full(n_rows * LANES, -1, dtype=np.int64)
    out[pos] = np.arange(n_channels)
    return out


def _decode_ticks(adc_ref, base: int, unroll: int, time2: bool,
                  words14: bool, words14_gather: bool):
    """Yield the unroll consecutive ticks' s_raw rows starting at trace-time
    tick index ``base`` (base may be traced; base+u offsets are trace-time).
    Single source for the three ADC input encodings: plain (T, S, 128)
    rows, time-paired words (tick 2j low half / 2j+1 high half,
    pack_adcs_time2 — time2 requires even unroll so pairs never straddle
    an unroll boundary), and packed words14 rows unpacked in-register."""
    word0 = None
    for u in range(unroll):
        tick_i = base + u
        if time2:
            if u % 2 == 0:
                word0 = adc_ref[tick_i // 2]
                yield (word0 << 16) >> 16
            else:
                yield word0 >> 16
        elif words14:
            yield (_unpack14_rows_gather if words14_gather
                   else _unpack14_rows)(adc_ref[tick_i])
        else:
            yield adc_ref[tick_i]


def _emit_records(rec: dict, closed, tick, cfg: TPGConfig, slot_words: list,
                  nclose, k_slots: int):
    """Pack a tick's hit record into record_words(cfg) int32 words and
    write it into slot ``n_closed[c]`` via K one-hot vector selects
    (module docstring).  Mutates slot_words; returns the new nclose.

    Each slot_words[k] entry is either a stacked (nw, sub, 128) array or
    a list of nw (sub, 128) words (the SLOT_WORD_CARRY layout — the
    per-tick jnp.stack drops out and the words stack once at kernel
    writeback)."""
    if "w0" in rec:          # packed layout already carries w0
        w0 = rec["w0"]
    else:
        charge32 = rec["charge"].astype(jnp.int32)
        tover32 = rec["tover"].astype(jnp.int32)
        w0 = (charge32 << 16) | tover32
    w2 = jnp.full(closed.shape, tick + 1, jnp.int32)
    if record_words(cfg) == 3:
        peak32 = rec["peak_adc"].astype(jnp.int32)
        ptime32 = rec["peak_time"].astype(jnp.int32)
        words = [w0, (peak32 << 16) | ptime32, w2]
    else:
        words = [w0, w2]
    if slot_words and isinstance(slot_words[0], list):
        for k in range(k_slots):
            sel = closed & (nclose == k)
            slot_words[k] = [jnp.where(sel, w, cur)
                             for w, cur in zip(words, slot_words[k])]
    else:
        packed = jnp.stack(words)         # (nw, sub, 128)
        for k in range(k_slots):
            sel = closed & (nclose == k)
            slot_words[k] = jnp.where(sel[None], packed, slot_words[k])
    return nclose + closed.astype(jnp.int32)


def _tpg_kernel(adc_ref, state_ref, state_out_ref, slots_ref, nclose_ref,
                *scratch, cfg: TPGConfig, tc: int, k_slots: int, sub: int,
                unroll: int = 1, time2: bool = False,
                fir_packed: bool = False, words14: bool = False,
                words14_gather: bool = False, words14_slab: bool = False):
    t_chunk = pl.program_id(1)
    if words14_slab:
        # two-stage schedule: slab-unpack the chunk's words14 rows into a
        # time2-packed VMEM scratch with full-height ops (amortized over
        # tc), then run the serial tick loop on the PLAIN time2 datapath
        # — the per-tick quarter-height unpack churn leaves the
        # recurrence entirely (VERDICT r3 #3; _unpack14_slab docs)
        slab_ref = scratch[0]
        GT = 16

        def slab_body(g, _):
            w = adc_ref[pl.ds(g * GT, GT)]          # (GT, WRb, 7, 128)
            v = _unpack14_slab(w)                   # (GT, sub, 128)
            vp = v.reshape(GT // 2, 2, sub, LANES)
            slab_ref[pl.ds(g * (GT // 2), GT // 2)] = \
                (vp[:, 0] & 0xFFFF) | (vp[:, 1] << 16)
            return 0

        jax.lax.fori_loop(0, tc // GT, slab_body, 0)
        adc_ref, time2, words14 = slab_ref, True, False
    is_fir = cfg.algorithm == Algorithm.FIR
    keys = live_fields(cfg)
    if fir_packed:
        # the packed SWAR layout (fir.tpg_tick_fir packed-IQR docs): the
        # four IQR arrays and charge/tover/prev ride as 3 int32 words —
        # 17 -> 13 loop-carried arrays, under the whole-block vreg budget
        keys = tuple(k for k in keys
                     if k not in ("quantile25", "quantile75", "accum25",
                                  "accum75", "hit_charge", "hit_tover",
                                  "prev_was_over"))
    kidx = {k: _STATE_KEYS.index(k) for k in keys}
    i16_mode = state_ref.dtype == jnp.int16
    fx = (I16Fx if i16_mode else I32Fx).make(jnp)

    @pl.when(t_chunk == 0)
    def _():
        # Seed the output state block from the input once per channel block;
        # later time chunks carry state through the (VMEM-resident, revisited)
        # output block — the input block is never refreshed between chunks.
        state_out_ref[...] = state_ref[...]

    carry0 = tuple(state_out_ref[0, kidx[k]] for k in keys)
    if is_fir:
        # FIR ring rows ride the carry as N separate registers: the
        # per-tick shift is then a trace-time tuple rotation (no moves)
        carry0 += tuple(state_out_ref[0, _FIR_ROW0 + j]
                        for j in range(N_FIR_TAPS))
    _B = 1 << 15
    if fir_packed:
        def _row(name):
            return state_out_ref[0, _STATE_KEYS.index(name)]
        qpair = ((_row("quantile25") + _B) & 0xFFFF) | \
            ((_row("quantile75") + _B) << 16)
        apair = ((_row("accum25") + _B) & 0xFFFF) | \
            ((_row("accum75") + _B) << 16)
        ct = (_row("hit_charge") << 16) | (_row("hit_tover") & 0x7FFF) | \
            jnp.where(_row("prev_was_over") != 0, 0x8000, 0)
        carry0 += (qpair, apair, ct)
    # slots/nclose drain per time chunk (each chunk owns an output block),
    # so they start empty here rather than being read back
    nw = slots_ref.shape[3]
    zero_word = jnp.zeros(slots_ref.shape[4:], slots_ref.dtype)
    if SLOT_WORD_CARRY:
        # records ride as k*nw separate (sub, 128) registers — no
        # per-tick stack in _emit_records; stacked once at writeback
        carry0 += (zero_word,) * (k_slots * nw)
    else:
        zero_slot = jnp.zeros(slots_ref.shape[3:], slots_ref.dtype)
        carry0 += (zero_slot,) * k_slots
    carry0 += (jnp.zeros(nclose_ref.shape[2:], nclose_ref.dtype),)
    nst = len(keys) + (N_FIR_TAPS if is_fir else 0) + \
        (3 if fir_packed else 0)
    n_slotc = k_slots * nw if SLOT_WORD_CARRY else k_slots

    def body(i, carry):
        st = dict(zip(keys, carry[:len(keys)]))
        if is_fir:
            st["fir_prev"] = tuple(carry[len(keys):len(keys) + N_FIR_TAPS])
        if fir_packed:
            pbase = len(keys) + N_FIR_TAPS
            st["iqr_qpair"], st["iqr_apair"], st["hit_ct"] = \
                carry[pbase:pbase + 3]
        if cfg.algorithm == Algorithm.SIMPLE_THRESHOLD:
            st["rs_memory_factor"] = None
        flat = carry[nst:nst + n_slotc]
        slot_words = [list(flat[k * nw:(k + 1) * nw])
                      for k in range(k_slots)] if SLOT_WORD_CARRY \
            else list(flat)
        nclose = carry[nst + n_slotc]

        for u, s_raw in enumerate(_decode_ticks(
                adc_ref, i * unroll, unroll, time2, words14,
                words14_gather)):
            tick_i = i * unroll + u
            st, closed, rec = dispatch_tick(st, s_raw, cfg, jnp, fx=fx)
            # unclosed lanes are ignored (the peak word is dropped for
            # no-peak FIR)
            nclose = _emit_records(rec, closed, t_chunk * tc + tick_i,
                                   cfg, slot_words, nclose, k_slots)

        out = tuple(st[k] for k in keys)
        if is_fir:
            out += tuple(st["fir_prev"])
        if fir_packed:
            out += (st["iqr_qpair"], st["iqr_apair"], st["hit_ct"])
        if SLOT_WORD_CARRY:
            out += tuple(w for sw in slot_words for w in sw)
        else:
            out += tuple(slot_words)
        return out + (nclose,)

    carry = jax.lax.fori_loop(0, tc // unroll, body, carry0)
    for k in keys:
        state_out_ref[0, kidx[k]] = carry[keys.index(k)]
    if is_fir:
        for j in range(N_FIR_TAPS):
            state_out_ref[0, _FIR_ROW0 + j] = carry[len(keys) + j]
    if fir_packed:
        # unpack the SWAR words back into the canonical state rows (the
        # stack layout is unchanged — packing is kernel-internal)
        qpair, apair, ct = carry[nst - 3:nst]

        def _wrow(name, v):
            state_out_ref[0, _STATE_KEYS.index(name)] = v
        _wrow("quantile25", (qpair & 0xFFFF) - _B)
        _wrow("quantile75", ((qpair >> 16) & 0xFFFF) - _B)
        _wrow("accum25", (apair & 0xFFFF) - _B)
        _wrow("accum75", ((apair >> 16) & 0xFFFF) - _B)
        _wrow("hit_charge", ct >> 16)
        _wrow("hit_tover", ct & 0x7FFF)
        _wrow("prev_was_over", (ct >> 15) & 1)
    if SLOT_WORD_CARRY:
        for k in range(k_slots):
            for j in range(nw):
                slots_ref[0, 0, k, j] = carry[nst + k * nw + j]
    else:
        for k in range(k_slots):
            slots_ref[0, 0, k] = carry[nst + k]
    nclose_ref[0, 0] = carry[nst + n_slotc]


def _fir2_kernel(adc_ref, state_ref, state_out_ref, slots_ref, nclose_ref,
                 s_ref, sig_ref, over_ref, toadd_ref, *scratch,
                 cfg: TPGConfig, tc: int, k_slots: int, sub: int,
                 unroll: int = 1, time2: bool = False, words14: bool = False,
                 words14_gather: bool = False, lift: bool = False):
    """Two-pass FIR schedule: the FIR convolution and threshold compare do
    not feed the recurrent state (given pass A's outputs), so they are
    lifted out of the serial per-tick chain into whole-(tc, sub, 128) slab
    vector ops:

    * pass A (recurrent, per tick): pedestal frugal + merged-IQR chains;
      emits the clamped sample and sigma per tick into VMEM slabs;
    * pass B (no loop): 8-tap FIR as shifted slab views of one contiguous
      sample buffer + dynamic-threshold compare — data-independent across
      ticks, so the VPU pipelines it with no serial stalls;
    * pass C (recurrent, per tick): hit close/charge/tover chain + K-slot
      emission, reading the precomputed is_over/to_add rows.

    ``lift=True`` (fir_twopass=2) additionally lifts everything around
    the chain that does NOT feed it out of pass C:

    * pass B also computes closed = prev_over & ~is_over as a slab
      (prev_over is the is_over slab shifted one tick, carry-in from
      state) and the carried-out prev_was_over row (= is_over[tc-1]);
    * pass C keeps ONLY the recurrent charge/tover (and peak) chains —
      it writes each tick's packed record words to a slab instead of
      doing the K-way slot selects;
    * pass D (no loop) derives the per-channel close ordinal as an
      exclusive cumulative sum of the closed slab (a log2(tc)-step
      shift-add ladder of whole-slab adds), builds each slot's one-hot
      time selector closed & (ordinal == k), and reduces the record
      slabs over time — emission becomes k_slots masked slab reductions
      instead of tc*k_slots serial selects.  nclose is the inclusive
      sum's last row.  Identical outputs: the selector is one-hot along
      time per (channel, k), so the masked sum IS the selected record,
      and channels without a k-th close reduce to the same zero word the
      serial form leaves behind.

    Calls the SAME fir.py pieces as the fused tick (fir_iqr_update,
    fir_pedestal_sub, fir_filter, fir_threshold, fir_to_add,
    fir_hit_update), so it is bit-exact by construction and pinned by the
    backend-parity tests.  int32 state only; ring rows carried as in the
    fused kernel (state rows _FIR_ROW0+j = s_{t-8+j}, oldest-first).
    """
    from .fir import (default_taps, fir_filter, fir_hit_update,
                      fir_iqr_update, fir_pedestal_sub, fir_threshold,
                      fir_to_add)
    t_chunk = pl.program_id(1)
    keys = live_fields(cfg)
    kidx = {k: _STATE_KEYS.index(k) for k in keys}
    fx = I32Fx.make(jnp)
    scratch = list(scratch)
    filt_ref = scratch.pop(0) if cfg.track_peaks else None
    if lift:
        closed_ref = scratch.pop(0)
        # per-tick record-word slabs: w0 = charge|tover (+ w1 = peaks);
        # the tick word w2 comes from an iota in pass D
        w_refs = [scratch.pop(0) for _ in range(record_words(cfg) - 1)]
    taps = cfg.taps or default_taps(cfg)

    @pl.when(t_chunk == 0)
    def _():
        state_out_ref[...] = state_ref[...]

    # ---- pass A: recurrent pedestal/IQR state -> s and sigma slabs
    a_keys = ("pedestals", "accum", "quantile25", "accum25",
              "quantile75", "accum75")
    for j in range(N_FIR_TAPS):     # seed the NTAPS history rows
        s_ref[j] = state_out_ref[0, _FIR_ROW0 + j]
    carry_a = tuple(state_out_ref[0, kidx[k]] for k in a_keys)

    def body_a(i, carry):
        st = dict(zip(a_keys, carry))
        for u, s_raw in enumerate(_decode_ticks(
                adc_ref, i * unroll, unroll, time2, words14,
                words14_gather)):
            tick_i = i * unroll + u
            upd, sigma = fir_iqr_update(st, s_raw, cfg, jnp, fx)
            updp, s = fir_pedestal_sub(st, s_raw, cfg, jnp, fx)
            st.update(upd)
            st.update(updp)
            s_ref[N_FIR_TAPS + tick_i] = s
            sig_ref[tick_i] = sigma
        return tuple(st[k] for k in a_keys)

    carry_a = jax.lax.fori_loop(0, tc // unroll, body_a, carry_a)
    for n, k in enumerate(a_keys):
        state_out_ref[0, kidx[k]] = carry_a[n]
    for j in range(N_FIR_TAPS):     # carry the ring: last NTAPS samples
        state_out_ref[0, _FIR_ROW0 + j] = s_ref[tc + j]

    # ---- pass B: filter + threshold on whole time slabs
    bufs = tuple(s_ref[j:j + tc] for j in range(N_FIR_TAPS))
    filt = fir_filter(bufs, taps, fx)
    is_over = fir_threshold(filt, sig_ref[...], cfg, fx)
    over_i32 = is_over.astype(jnp.int32)
    over_ref[...] = over_i32
    toadd_ref[...] = fir_to_add(filt, is_over, cfg, jnp, fx)
    if filt_ref is not None:        # peak tracking reads filt in pass C
        filt_ref[...] = filt
    if lift:
        # closed as a slab: prev_over is the is_over slab shifted one
        # tick (carry-in from the state row); the carried-out
        # prev_was_over is just the last tick's is_over
        prev0 = state_out_ref[0, kidx["prev_was_over"]]
        prev = jnp.concatenate([prev0[None], over_i32[:-1]], axis=0)
        closed_slab = (prev != 0) & ~is_over
        closed_ref[...] = closed_slab.astype(jnp.int32)
        state_out_ref[0, kidx["prev_was_over"]] = over_i32[tc - 1]

    # ---- pass C: recurrent hit chain (+ K-slot emission unless lifted)
    c_keys = tuple(k for k in keys if k.startswith("hit_")
                   or (k == "prev_was_over" and not lift))
    carry_c = tuple(state_out_ref[0, kidx[k]] for k in c_keys)
    ncst = len(c_keys)
    if not lift:
        zero_slot = jnp.zeros(slots_ref.shape[2:], slots_ref.dtype)
        carry_c += tuple(zero_slot[k] for k in range(k_slots))
        carry_c += (jnp.zeros(nclose_ref.shape[2:], nclose_ref.dtype),)

    def body_c(i, carry):
        st = dict(zip(c_keys, carry[:ncst]))
        slot_words = list(carry[ncst:ncst + k_slots])
        nclose = carry[ncst + k_slots] if not lift else None
        for u in range(unroll):
            tick_i = i * unroll + u
            over_t = over_ref[tick_i] != 0
            filt_t = filt_ref[tick_i] if filt_ref is not None else None
            if lift:
                updh, _, rec = fir_hit_update(
                    st, over_t, toadd_ref[tick_i], filt_t, cfg, jnp, fx,
                    closed=closed_ref[tick_i] != 0)
                st.update(updh)
                w_refs[0][tick_i] = (rec["charge"] << 16) | rec["tover"]
                if len(w_refs) == 2:
                    w_refs[1][tick_i] = (rec["peak_adc"] << 16) | \
                        rec["peak_time"]
            else:
                updh, closed, rec = fir_hit_update(
                    st, over_t, toadd_ref[tick_i], filt_t, cfg, jnp, fx)
                st.update(updh)
                nclose = _emit_records(rec, closed, t_chunk * tc + tick_i,
                                       cfg, slot_words, nclose, k_slots)
        out = tuple(st[k] for k in c_keys)
        if not lift:
            out += tuple(slot_words) + (nclose,)
        return out

    carry_c = jax.lax.fori_loop(0, tc // unroll, body_c, carry_c)
    for n, k in enumerate(c_keys):
        state_out_ref[0, kidx[k]] = carry_c[n]
    if not lift:
        for k in range(k_slots):
            slots_ref[0, 0, k] = carry_c[ncst + k]
        nclose_ref[0, 0] = carry_c[ncst + k_slots]
        return

    # ---- pass D (lift): one-hot slot selection as slab reductions
    # inclusive cumulative close count along time: log2(tc) shift-add
    # ladder of whole-slab adds (Hillis-Steele; Mosaic has no native
    # scan, and the ladder is 9 slab ops at tc=512)
    x = closed_ref[...]
    d = 1
    while d < tc:
        x = x + jnp.concatenate(
            [jnp.zeros((d, sub, LANES), jnp.int32), x[:-d]], axis=0)
        d *= 2
    ordinal = x - closed_ref[...]             # exclusive: closes BEFORE t
    nclose_ref[0, 0] = x[tc - 1]
    w2 = jax.lax.broadcasted_iota(jnp.int32, (tc, sub, LANES), 0) + \
        (t_chunk * tc + 1)
    closed_b = closed_ref[...] != 0
    zero = jnp.zeros((tc, sub, LANES), jnp.int32)
    for k in range(k_slots):
        sel = closed_b & (ordinal == k)
        words = [jnp.sum(jnp.where(sel, w_refs[0][...], zero), axis=0)]
        if len(w_refs) == 2:
            words.append(jnp.sum(jnp.where(sel, w_refs[1][...], zero),
                                 axis=0))
        words.append(jnp.sum(jnp.where(sel, w2, zero), axis=0))
        slots_ref[0, 0, k] = jnp.stack(words)


def effective_vmem_limit_mb(vmem_limit_mb: int | None,
                            fir_twopass: bool | int) -> int | None:
    """Scoped-VMEM limit actually handed to Mosaic.

    The two-pass FIR schedules allocate 10-20 MB of hand-off scratch
    slabs on top of the double-buffered blocks, which exceeds Mosaic's
    16 MB default scoped-VMEM budget at the shipped tc=512 knobs.  Every
    validation surface (bench, autotune, hardware parity checks) passes
    vmem_limit_mb=64 explicitly, but the streaming deployment surfaces
    (StreamingIngest, frame processors, APAPipeline) leave it None — so
    a tuned twopass schedule would compile in validation and fail in
    production.  Raise the floor here, at the single kernel entry, so a
    twopass schedule is deployable from any call site.  Callers that
    pass an explicit (>=64) limit keep it.
    """
    if fir_twopass and (vmem_limit_mb is None or vmem_limit_mb < 64):
        return 64
    return vmem_limit_mb


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tc", "k_slots", "interpret",
                                    "unroll", "vmem_limit_mb", "time_packed",
                                    "fir_packed", "words14",
                                    "words14_gather", "words14_slab",
                                    "fir_twopass"))
def process_window_pallas(adcs, state_stack, cfg: TPGConfig, tc: int = 256,
                          k_slots: int = 4, interpret: bool = False,
                          unroll: int = 1, vmem_limit_mb: int | None = None,
                          time_packed: bool = False,
                          fir_packed: bool | None = None,
                          words14: bool = False,
                          words14_gather: bool = False,
                          words14_slab: bool = False,
                          fir_twopass: bool | int = False):
    """Run the fused kernel over a (T, S, 128) int32 window.

    Args:
      adcs: (T, S, 128) int32, T divisible by tc — or, with
        time_packed=True, (T//2, S, 128) time-paired words from
        pack_adcs_time2/pack_time2_jnp (halved ADC HBM traffic; requires
        int32 state, even unroll, samples < 32768) — or, with
        words14=True, (T, WR, 7, 128) int32 PACKED 14-bit word rows in
        the words14 layout (ingest.pack_words14): the kernel unpacks
        in-register per tick and channels live at words14_positions;
        the state stack must be packed with the same positions and rows
        S = 16*WR.
      state_stack: (NB, KSTATE, SUB, 128) int32; SUB (from pack_state)
        selects the channel-block width, NB * SUB == S.
      tc: ticks per pipelined grid chunk.
      k_slots: per-channel hit capacity PER TIME CHUNK (closes beyond this
        are dropped per channel within that chunk; whole-window capacity is
        k_slots * T/tc per channel — see the per-chunk counts output).

    Returns (slots (NB, T/tc, K, 3, SUB, 128) int32,
    nclose (NB, T/tc, SUB, 128) int32, new_state).  nclose is the
    per-channel number of hits that closed in each time chunk (may exceed
    k_slots, indicating drops).
    """
    nb, kst, sub, _ = state_stack.shape
    dtype = state_stack.dtype
    if words14:
        assert not time_packed and dtype == jnp.int32
        T, WR, seven, _ = adcs.shape
        assert seven == 7 and adcs.dtype == jnp.int32
        S = 16 * WR
        assert sub % 16 == 0, "words14 blocks must be 16-row multiples"
        if words14_slab:
            assert tc % 16 == 0 and unroll % 2 == 0, \
                "words14_slab needs tc % 16 == 0 and even unroll " \
                "(the tick loop runs the time2 datapath)"
    else:
        assert not words14_slab, "words14_slab requires words14 input"
        rows, S, _ = adcs.shape
        T = rows * 2 if time_packed else rows
    n_chunks = T // tc
    assert T % tc == 0 and kst == KSTATE and nb * sub == S
    assert sub % _granule(dtype) == 0 and tc % unroll == 0
    if time_packed:
        assert dtype == jnp.int32 and unroll % 2 == 0 and tc % 2 == 0, \
            "time_packed needs int32 state and even unroll/tc"
        assert adcs.dtype == jnp.int32
    elif not words14:
        assert adcs.dtype == dtype, "ADC and state dtypes must match " \
            "(pack_adcs/pack_state with the same dtype)"

    if fir_packed is None:
        # measured OFF everywhere (BENCH_NOTES round-2c): the SWAR carry
        # did not clear the whole-block spill cliff (the unrolled body's
        # working set dominates, not the loop-carried arrays) and the
        # per-tick extract/repack costs ~2x at the production 8-row
        # blocks.  Kept as an explicit opt-in layout for future
        # libtpu/track_peaks configurations.
        fir_packed = False
    fir_packed = bool(fir_packed) and cfg.algorithm == Algorithm.FIR \
        and dtype == jnp.int32

    nw = record_words(cfg)
    scratch_shapes = []
    if fir_twopass:
        if cfg.algorithm != Algorithm.FIR or dtype != jnp.int32:
            raise ValueError("fir_twopass requires the FIR family with "
                             "int32 state")
        if fir_packed:
            raise ValueError("fir_twopass and fir_packed are exclusive "
                             "(the packed SWAR carry is fused-tick-only)")
        if words14_slab:
            raise ValueError("fir_twopass and words14_slab are exclusive "
                             "(the slab unpack is fused-tick-only)")
        from jax.experimental.pallas import tpu as pltpu
        lift = int(fir_twopass) >= 2
        # pass A -> B -> C hand-off slabs: contiguous samples (with the
        # NTAPS-row ring history prefix), sigma, is_over, to_add, filt
        # only when peak tracking reads it in pass C, and — lifted
        # emission only — the closed slab plus the per-tick record words
        scratch_shapes = [
            pltpu.VMEM((tc + N_FIR_TAPS, sub, LANES), jnp.int32),
            pltpu.VMEM((tc, sub, LANES), jnp.int32),
            pltpu.VMEM((tc, sub, LANES), jnp.int32),
            pltpu.VMEM((tc, sub, LANES), jnp.int32),
        ]
        # lift adds the closed slab + (nw - 1) record-word slabs = nw
        n_extra = (1 if cfg.track_peaks else 0) + (nw if lift else 0)
        scratch_shapes += [pltpu.VMEM((tc, sub, LANES), jnp.int32)
                           for _ in range(n_extra)]
        kernel = functools.partial(_fir2_kernel, cfg=cfg, tc=tc,
                                   k_slots=k_slots, sub=sub, unroll=unroll,
                                   time2=time_packed, words14=words14,
                                   words14_gather=words14_gather,
                                   lift=lift)
    else:
        if words14_slab:
            from jax.experimental.pallas import tpu as pltpu
            # time2-packed unpacked-ADC slab for one chunk (2 B/sample
            # equivalent: tc/2 rows of (sub, 128) int32)
            scratch_shapes = [pltpu.VMEM((tc // 2, sub, LANES), jnp.int32)]
        kernel = functools.partial(_tpg_kernel, cfg=cfg, tc=tc,
                                   k_slots=k_slots, sub=sub, unroll=unroll,
                                   time2=time_packed, fir_packed=fir_packed,
                                   words14=words14,
                                   words14_gather=words14_gather,
                                   words14_slab=words14_slab)
    # slab schedules (twopass FIR, words14_slab) add multi-MB VMEM scratch
    # on top of the double-buffered blocks — raise the Mosaic budget here
    # at the single kernel entry so they deploy from any call site
    vmem_limit_mb = effective_vmem_limit_mb(
        vmem_limit_mb, fir_twopass or words14_slab)
    compiler_params = None
    if vmem_limit_mb is not None and not interpret:
        from jax.experimental.pallas import tpu as pltpu
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
    if words14:
        # each channel block covers sub rows = sub//16 word-group rows;
        # the 7-word axis sits second-to-last so the block's trailing
        # dims equal the array dims (Pallas tiling constraint)
        adc_spec = pl.BlockSpec((tc, sub // 16, 7, LANES),
                                lambda b, t: (t, b, 0, 0))
    else:
        adc_spec = pl.BlockSpec((tc // 2 if time_packed else tc, sub,
                                 LANES), lambda b, t: (t, b, 0))
    state_out, slots, nclose = pl.pallas_call(
        kernel,
        compiler_params=compiler_params,
        grid=(nb, T // tc),
        in_specs=[
            adc_spec,
            pl.BlockSpec((1, KSTATE, sub, LANES), lambda b, t: (b, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, KSTATE, sub, LANES), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, k_slots, nw, sub, LANES),
                         lambda b, t: (b, t, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, sub, LANES), lambda b, t: (b, t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, KSTATE, sub, LANES), dtype),
            jax.ShapeDtypeStruct((nb, n_chunks, k_slots, nw, sub, LANES),
                                 jnp.int32),
            jax.ShapeDtypeStruct((nb, n_chunks, sub, LANES), jnp.int32),
        ],
        input_output_aliases={1: 0},
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(adcs, state_stack)
    return slots, nclose, state_out


def decode_pallas_hits(slots, nclose, n_channels: int, tick_offset: int = 0,
                       positions: np.ndarray | None = None):
    """Decode per-chunk K-slot outputs into the canonical hit array (host).

    slots: (NB, NCH, K, 3, SUB, 128); nclose: (NB, NCH, SUB, 128) — the
    per-chunk layout of process_window_pallas.  Returns (hits, n_dropped)
    where n_dropped counts closes beyond the per-channel per-chunk slot
    capacity.  ``positions`` selects the words14 fused layout (channel c
    lives at flat position positions[c]; dead padding lanes never hit).
    """
    from .hits import HIT_DTYPE, sort_hits
    slots = np.asarray(slots)
    nclose = np.asarray(nclose)
    nb, nch, K, nw, sub, lanes = slots.shape
    C = nb * sub * lanes
    # chunk-major slot axis: (NCH*K, nw, C) — record words already carry
    # the absolute tick, so chunks just widen the slot dimension; nw=2 is
    # the no-peak FIR record layout [w0, end+1]
    flat = slots.transpose(1, 2, 3, 0, 4, 5).reshape(nch * K, nw, C)
    counts = nclose.transpose(1, 0, 2, 3).reshape(nch, C)
    if positions is not None:
        flat = flat[:, :, positions]
        counts = counts[:, positions]
    else:
        flat = flat[:, :, :n_channels]
        counts = counts[:, :n_channels]
    k_idx, c_idx = np.nonzero(flat[:, -1] != 0)
    hits = np.zeros(len(k_idx), dtype=HIT_DTYPE)
    w0 = flat[k_idx, 0, c_idx]
    w2 = flat[k_idx, -1, c_idx]
    hits["channel"] = c_idx
    hits["end_tick"] = w2 - 1 + tick_offset
    hits["charge"] = w0 >> 16
    hits["tover"] = w0 & 0xFFFF
    if nw == 3:
        w1 = flat[k_idx, 1, c_idx]
        hits["peak_adc"] = w1 >> 16
        hits["peak_time"] = w1 & 0xFFFF
    n_dropped = int(np.maximum(counts - K, 0).sum())
    return sort_hits(hits), n_dropped

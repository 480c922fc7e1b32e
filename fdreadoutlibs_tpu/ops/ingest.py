"""Fused device ingest: packed frame words -> unpack -> SWTPG, one jit.

Production streaming ships the *raw packed ADC region* to the device
(1.75 bytes/sample for 14-bit WIBEth — the minimum possible host->HBM
traffic; SURVEY.md §7 hard part (d)) and runs the 14-bit unpack, the
lane-layout reshape and the fused Pallas TPG kernel inside a single jitted
call.  The host never touches ADC values: its only per-batch work is a
uint32 view of the frame bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import wibeth
from .config import TPGConfig
from .pallas_tpg import LANES, pad_sublanes, process_window_pallas


def host_words(frames: np.ndarray) -> np.ndarray:
    """(N, 7200) uint8 frames -> (N, 64, 28) uint32 ADC words (a view-level
    reshape; no decoding on host)."""
    return wibeth.frames_bytes_to_u32(frames)


@functools.partial(jax.jit, static_argnames=("cfg", "tc", "k_slots",
                                             "unroll", "n_channels",
                                             "interpret", "vmem_limit_mb",
                                             "unpack_impl",
                                             "fir_twopass"))
def process_packed_frames(words, state_stack, cfg: TPGConfig,
                          n_channels: int, tc: int = 512, k_slots: int = 2,
                          unroll: int = 16, interpret: bool = False,
                          vmem_limit_mb: int | None = None,
                          unpack_impl: str = "shifts",
                          fir_twopass: bool = False):
    """words: (L, T, 28) uint32 packed rows for L links of 64 channels.

    Returns (slots, nclose, new_state) like process_window_pallas, with
    channels stacked link-major on the lane axis (channel = link*64 + c).
    """
    L, T, _ = words.shape
    # transpose the PACKED words (1.75 B/sample) to time-major before
    # unpacking, so the layout copy moves 37 MB/window instead of the
    # 100 MB unpacked array, and the unpack fuses with the zero-pad into
    # one output pass (measured on the ingest-inclusive bench, r3)
    wt = jnp.swapaxes(words, 0, 1)                       # (T, L, 28)
    adcs = wibeth.unpack_frames_jnp(wt, impl=unpack_impl)  # (T, L, 64)
    flat = adcs.reshape(T, L * wibeth.N_CHANNELS)
    S = pad_sublanes(n_channels)
    packed = jnp.pad(
        flat, ((0, 0), (0, S * LANES - L * wibeth.N_CHANNELS)))
    packed = packed.reshape(T, S, LANES)
    return process_window_pallas(packed, state_stack, cfg, tc=tc,
                                 k_slots=k_slots, unroll=unroll,
                                 interpret=interpret,
                                 vmem_limit_mb=vmem_limit_mb,
                                 fir_twopass=fir_twopass)


def pack_words14_jnp(words):
    """Device prep for the fused in-kernel unpack: (L, T, 28) uint32
    packed rows -> (T, WR, 7, 128) int32 word rows in the words14 layout
    (pallas_tpg.words14_positions).  One 1.75 B/sample relayout — the
    only pass over the data outside the kernel."""
    from .pallas_tpg import LANES
    L, T, _ = words.shape
    G = L * 4                                   # 16-channel word groups
    WR = -(-G // LANES)
    wt = jnp.swapaxes(words, 0, 1).reshape(T, G, 7)
    wt = jnp.pad(wt, ((0, 0), (0, WR * LANES - G), (0, 0)))
    return wt.reshape(T, WR, LANES, 7).transpose(0, 1, 3, 2) \
        .astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "tc", "k_slots",
                                             "unroll", "n_channels",
                                             "interpret", "vmem_limit_mb",
                                             "fir_twopass"))
def process_packed_frames_fused(words, state_stack, cfg: TPGConfig,
                                n_channels: int, tc: int = 512,
                                k_slots: int = 2, unroll: int = 16,
                                interpret: bool = False,
                                vmem_limit_mb: int | None = None,
                                fir_twopass: bool = False):
    """Fully fused byte-ingest: packed (L, T, 28) uint32 words -> in-KERNEL
    14-bit unpack -> TPG, with no materialized unpacked array (the XLA
    unpack pass costs ~0.7 ms/window at APA scale, BENCH_NOTES r3).

    The state stack must be packed with
    pack_state(..., positions=words14_positions(n_channels)) and hits
    decoded with decode_pallas_hits(..., positions=...).
    """
    from .pallas_tpg import process_window_pallas
    W = pack_words14_jnp(words)
    return process_window_pallas(W, state_stack, cfg, tc=tc,
                                 k_slots=k_slots, unroll=unroll,
                                 interpret=interpret,
                                 vmem_limit_mb=vmem_limit_mb,
                                 words14=True, fir_twopass=fir_twopass)


@functools.partial(jax.jit, static_argnames=("cfg", "tc", "k_slots",
                                             "unroll", "n_channels",
                                             "interpret", "vmem_limit_mb",
                                             "fir_twopass", "slab"))
def process_words14_feed(W, state_stack, cfg: TPGConfig,
                         n_channels: int, tc: int = 512,
                         k_slots: int = 2, unroll: int = 16,
                         interpret: bool = False,
                         vmem_limit_mb: int | None = None,
                         fir_twopass: bool = False,
                         slab: bool = False):
    """Direct words14 feed: the input is ALREADY in the words14 row order
    — (T, WR, 7, 128) int32, as produced by native.relayout_words14 on
    the host (or by a words14-ordered NIC/DMA source) — so the device
    runs the in-kernel unpack with zero relayout cost.  The on-device
    (L, T, 28) -> words14 relayout costs ~0.35 ms/window at APA scale in
    EVERY XLA formulation (BENCH_NOTES r3); a words14-ordered feed runs
    at the kernel's pre-transposed figure (~6.5x vs 4.1-4.9x ingest RTF).
    State/decoding contract is identical to process_packed_frames_fused.

    slab=True selects the two-stage in-kernel schedule: the whole tc
    chunk is slab-unpacked into a time2-packed VMEM scratch with
    full-height ops, and the serial tick loop runs the plain time2
    datapath (pallas_tpg words14_slab; needs even unroll).
    """
    from .pallas_tpg import process_window_pallas
    if slab and unroll % 2:
        # slab requires even unroll (two ticks per packed word); tc is
        # already forced to a multiple of 16 downstream, so 2 always
        # divides it — no odd fallback exists
        unroll = 2
    return process_window_pallas(W, state_stack, cfg, tc=tc,
                                 k_slots=k_slots, unroll=unroll,
                                 interpret=interpret,
                                 vmem_limit_mb=vmem_limit_mb,
                                 words14=True, words14_slab=slab,
                                 fir_twopass=fir_twopass)


@functools.partial(jax.jit, static_argnames=("cfg", "tc", "k_slots",
                                             "unroll", "n_channels",
                                             "interpret", "vmem_limit_mb",
                                             "fir_twopass"))
def process_time2_feed(W2, state_stack, cfg: TPGConfig,
                       n_channels: int, tc: int = 512,
                       k_slots: int = 2, unroll: int = 16,
                       interpret: bool = False,
                       vmem_limit_mb: int | None = None,
                       fir_twopass: bool = False):
    """Time-paired host feed: the input is UNPACKED on the host into the
    kernel's time_packed canonical layout — (T//2, S, 128) int32 holding
    adc(2t) | adc(2t+1) << 16 at flat lane c (native.relayout_time2) —
    so the device runs the plain int32 kernel datapath at ~half the ADC
    HBM traffic with only a per-tick shift to split the pair (~15% over
    kernel-only vs ~2x for the in-kernel words14 unpack; BENCH_NOTES).
    Canonical state/decoding (no positions permutation, denser rows than
    words14: 24 vs 32 at APA scale).  The host pays the unpack ALU
    (~6.3 GB/s/core C++: AVX-512 quartet unpack + non-temporal stores,
    reused output buffers) — prefer words14 when the feed stage must be
    a pure byte permutation (NIC/DPU reordering).

    W2 may arrive UNPADDED on the sublane axis (ceil(C/128) rows,
    relayout_time2(pad8=False)): the kernel's 8-sublane pad then happens
    here on device — one cheap zero-pad pass instead of shipping ~17%
    dead rows over PCIe/tunnel at APA shapes.  Bit-exact either way
    (the host codec zero-fills the same rows).
    """
    from .pallas_tpg import pad_sublanes, process_window_pallas
    S = pad_sublanes(n_channels)
    if W2.shape[1] < S:
        W2 = jnp.pad(W2, ((0, 0), (0, S - W2.shape[1]), (0, 0)))
    return process_window_pallas(W2, state_stack, cfg, tc=tc,
                                 k_slots=k_slots, unroll=unroll,
                                 interpret=interpret,
                                 vmem_limit_mb=vmem_limit_mb,
                                 time_packed=True,
                                 fir_twopass=fir_twopass)


@functools.partial(jax.jit, static_argnames=("cfg", "tc", "k_slots",
                                             "unroll", "n_channels",
                                             "interpret", "vmem_limit_mb",
                                             "fir_twopass"))
def process_packed_wib2(words, state_stack, cfg: TPGConfig,
                        n_channels: int, tc: int = 512, k_slots: int = 4,
                        unroll: int = 16, interpret: bool = False,
                        vmem_limit_mb: int | None = None,
                        fir_twopass: bool = False):
    """WIB2 fused ingest: words (L, T, 112) uint32 packed rows (each WIB2
    frame is ONE tick of 256 channels); channel = link*256 + c."""
    from ..formats import wib2
    L, T, _ = words.shape
    adcs = wib2.unpack_frames_jnp(words)                 # (L, T, 256)
    flat = adcs.transpose(1, 0, 2).reshape(T, L * wib2.N_CHANNELS)
    S = pad_sublanes(n_channels)
    padded = jnp.zeros((T, S * LANES), jnp.int32)
    padded = padded.at[:, : L * wib2.N_CHANNELS].set(flat)
    packed = padded.reshape(T, S, LANES)
    return process_window_pallas(packed, state_stack, cfg, tc=tc,
                                 k_slots=k_slots, unroll=unroll,
                                 interpret=interpret,
                                 vmem_limit_mb=vmem_limit_mb,
                                 fir_twopass=fir_twopass)


@functools.partial(jax.jit, static_argnames=("cfg", "tc", "k_slots",
                                             "unroll", "n_channels",
                                             "interpret", "vmem_limit_mb",
                                             "fir_twopass"))
def process_packed_daphne(words, state_stack, cfg: TPGConfig,
                          n_channels: int, tc: int = 512, k_slots: int = 4,
                          unroll: int = 16, interpret: bool = False,
                          vmem_limit_mb: int | None = None,
                          fir_twopass: bool = False):
    """DAPHNE-stream fused ingest: words (L, N, 112) uint32 packed rows —
    each stream frame is 64 ticks of 4 channels; channel = link*4 + c."""
    from ..formats import daphne
    L, N, _ = words.shape
    adcs = daphne.stream_unpack_frames_jnp(words)      # (L, N, 64, 4)
    T = N * daphne.STREAM_N_SAMPLES
    flat = adcs.reshape(L, T, daphne.STREAM_N_CHANNELS) \
        .transpose(1, 0, 2).reshape(T, L * daphne.STREAM_N_CHANNELS)
    S = pad_sublanes(n_channels)
    padded = jnp.zeros((T, S * LANES), jnp.int32)
    padded = padded.at[:, : L * daphne.STREAM_N_CHANNELS].set(flat)
    packed = padded.reshape(T, S, LANES)
    return process_window_pallas(packed, state_stack, cfg, tc=tc,
                                 k_slots=k_slots, unroll=unroll,
                                 interpret=interpret,
                                 vmem_limit_mb=vmem_limit_mb,
                                 fir_twopass=fir_twopass)


@functools.partial(jax.jit, static_argnames=("coll_cfg", "ind_cfg", "tc",
                                             "k_slots", "unroll",
                                             "interpret", "vmem_limit_mb",
                                             "fir_twopass"))
def process_packed_protowib(words, coll_stack, ind_stack,
                            coll_cfg: TPGConfig, ind_cfg: TPGConfig,
                            tc: int = 12, k_slots: int = 4,
                            unroll: int = 1, interpret: bool = False,
                            vmem_limit_mb: int | None = None,
                            fir_twopass: bool = False):
    """ProtoWIB fused ingest: words (T, 116) uint32 whole frames (one tick
    of 256 channels each).  Runs the legacy dual-plane pipeline as two
    fused kernels over static lane subsets of one device batch — the TPU
    replacement for the reference's caller-thread collection + spin-waiting
    induction thread (WIBFrameProcessor.hpp:455-459; SURVEY.md §2.7).

    Returns ((slots, nclose, new_coll_stack), (slots, nclose, new_ind_stack))
    with plane-local channel indices (COLLECTION/INDUCTION_INDEX_TO_CHAN
    order, matching the plane-split host path).
    """
    from ..formats import protowib as pw
    T = words.shape[0]
    adcs = pw.unpack_frames_jnp(words)                 # (T, 256)

    def run(plane_idx, stack, cfg):
        C = len(plane_idx)
        x = adcs[:, np.asarray(plane_idx)]             # static gather
        S = pad_sublanes(C)
        padded = jnp.zeros((T, S * LANES), jnp.int32).at[:, :C].set(x)
        return process_window_pallas(padded.reshape(T, S, LANES), stack,
                                     cfg, tc=tc, k_slots=k_slots,
                                     unroll=unroll, interpret=interpret,
                                     vmem_limit_mb=vmem_limit_mb,
                                     fir_twopass=fir_twopass)

    return (run(pw.COLLECTION_INDEX_TO_CHAN, coll_stack, coll_cfg),
            run(pw.INDUCTION_INDEX_TO_CHAN, ind_stack, ind_cfg))


@functools.partial(jax.jit, static_argnames=("n_channels", "max_hits"))
def compact_on_device(slots, nclose, tick_offset, n_channels: int,
                      max_hits: int, positions=None):
    """-> ONE (max_hits + 1, 6) int32 array: the compact hit rows plus a
    trailer row [n_valid, dropped, 0...].  Packing the scalars into the
    row buffer makes the host decode a SINGLE device->host fetch — three
    separate fetches cost three dispatch round trips per batch, which
    dominates TP-emission latency on remote/tunnel-attached devices
    (scripts/bench_latency.py)."""
    import jax.numpy as jnp
    from .hits import compact_pallas_slots
    out, n, dropped = compact_pallas_slots(slots, nclose, n_channels,
                                           max_hits, tick_offset=tick_offset,
                                           positions=positions)
    trailer = jnp.zeros((1, 6), jnp.int32)
    trailer = trailer.at[0, 0].set(n.astype(jnp.int32))
    trailer = trailer.at[0, 1].set(dropped.astype(jnp.int32))
    return jnp.concatenate([out, trailer], axis=0)


def unpack_compact(packed: np.ndarray):
    """compact_on_device output -> (canonical hit array, dropped count);
    the one host-side fetch + decode."""
    from .hits import hits_from_compact
    packed = np.asarray(packed)
    n, dropped = int(packed[-1, 0]), int(packed[-1, 1])
    return hits_from_compact(packed[:-1], n), dropped


def collect_hits(slots, nclose, n_channels: int, max_hits: int | None = None,
                 tick_offset: int = 0, device: bool = True, positions=None):
    """Kernel slot outputs -> (canonical hit array, dropped count).

    device=True (default) compacts on device and ships only the hit list
    to the host; device=False pulls the raw slot buffers and decodes with
    numpy (useful when the device is saturated and host cycles are free,
    and is always lossless).  Identical results (tested).

    max_hits bounds the device-compact output (None -> max(2048, 2x the
    channel count): ~30x above physical APA TP rates per window); overflow
    beyond it is counted in the returned dropped count.

    positions: channel->flat-position map when the slots came from a
    words14 fused-unpack kernel (pallas_tpg.words14_positions)."""
    if max_hits is None:
        max_hits = max(2048, 2 * n_channels)
    if device:
        return unpack_compact(compact_on_device(slots, nclose, tick_offset,
                                                n_channels, max_hits,
                                                positions=positions))
    from .pallas_tpg import decode_pallas_hits
    return decode_pallas_hits(slots, nclose, n_channels,
                              tick_offset=tick_offset, positions=positions)


class StreamingIngest:
    """Double-buffered streaming driver: enqueue the next batch while the
    device processes the current one (jax dispatch is asynchronous, so the
    host-side framing of batch k+1 overlaps device compute of batch k).

    format="wibeth" (64 ch x 64 ticks per frame), "wib2" (256 ch x 1 tick
    per frame; feed superchunk frames flattened per link) or
    "daphne_stream" (4 ch x 64 ticks per frame).

    device_compact=True compacts the K-slot buffers into a
    (max_hits, 6) hit list ON DEVICE, shrinking device->host transfer
    from the full slot buffers (~1 MB/window at APA scale) to the hit
    list itself (~25 KB) — the right mode for bandwidth-constrained or
    remote-device deployments.
    """

    def __init__(self, cfg: TPGConfig, n_links: int, tc: int | None = None,
                 k_slots: int = 4, unroll: int | None = None,
                 interpret: bool = False,
                 format: str = "wibeth", device_compact: bool = False,
                 max_hits: int = 1024, rs_memory_factor=None,
                 fused: bool = False, time2: bool = False,
                 fir_twopass: bool | None = None):
        from ..formats import daphne, wib2
        self.cfg = cfg
        self.n_links = n_links
        self.format = format
        self._ticks_per_row = 1            # ticks per packed word row
        if fused and format != "wibeth":
            raise ValueError("fused in-kernel unpack supports "
                             "format='wibeth' only")
        if fused and time2:
            raise ValueError("fused and time2 are exclusive ingest modes")
        # time2=True: submit()/submit_words() relayout on the HOST into
        # the time-paired canonical feed (host_relayout_time2) — the
        # fastest ingest when host cores can pay the unpack ALU
        # (BENCH_NOTES "time2 feed")
        self.time2 = time2
        from .. import native
        self._t2_bufs = native.FeedBuffer()   # host relayout output reuse
        self._positions = None
        if format == "wibeth":
            self._ch_per_link = wibeth.N_CHANNELS
            self._fn = process_packed_frames_fused if fused \
                else process_packed_frames
            self._unpack = wibeth.unpack_frames_jnp
            if fused:
                from .pallas_tpg import words14_positions
                self._positions = words14_positions(
                    n_links * wibeth.N_CHANNELS)
        elif format == "wib2":
            self._ch_per_link = wib2.N_CHANNELS
            self._fn = process_packed_wib2
            self._unpack = wib2.unpack_frames_jnp
        elif format == "daphne_stream":
            self._ch_per_link = daphne.STREAM_N_CHANNELS
            self._fn = process_packed_daphne
            self._ticks_per_row = daphne.STREAM_N_SAMPLES
            # tick-major flat view so row 0 of the result is tick 0
            self._unpack = lambda w: daphne.stream_unpack_frames_jnp(w) \
                .reshape(w.shape[0], -1, daphne.STREAM_N_CHANNELS)
        else:
            raise ValueError(f"unknown format {format!r}")
        self.n_channels = n_links * self._ch_per_link
        # knob resolution: explicit args win; else a tuned-config file
        # (FDREADOUT_TUNED, scripts/autotune.py); else the shipped
        # v5e-lite defaults (CLAUDE.md knobs)
        from ..utils.tuning import kernel_knobs
        knobs = kernel_knobs(cfg, self.n_channels)
        self.tc = tc if tc is not None else knobs["tc"]
        self.k_slots = k_slots
        self.unroll = unroll if unroll is not None else knobs["unroll"]
        self.fir_twopass = fir_twopass if fir_twopass is not None \
            else knobs["fir_twopass"]
        self._block_sublanes = knobs["block_sublanes"]
        if self._positions is not None:
            from .pallas_tpg import words14_block_sublanes
            self._block_sublanes = words14_block_sublanes(
                self._block_sublanes, self.n_channels)
        self.interpret = interpret
        self.device_compact = device_compact
        self.max_hits = max_hits
        # per-channel RS memory factors (threshold-on-collection mixes
        # memoryless collection channels with RS induction channels,
        # WIBEthFrameProcessor.cpp:441-450); scalar default = cfg value
        if rs_memory_factor is None:
            rs_memory_factor = cfg.rs_memory_factor_x10
        else:
            rs_memory_factor = np.asarray(rs_memory_factor)
            if rs_memory_factor.shape not in ((), (self.n_channels,)):
                raise ValueError(
                    f"rs_memory_factor must be scalar or "
                    f"({self.n_channels},), got {rs_memory_factor.shape}")
            cfg.check_memory_factors(np.atleast_1d(rs_memory_factor))
        self.rs_memory_factor = rs_memory_factor
        self.stack = None
        self._pending = None          # (slots, nclose, tick_offset) or
                                      # (rows, n, dropped) when compacting
        self.tick_offset = 0

    def _ensure_state(self, words0: np.ndarray) -> None:
        from .chanstate import init_chanstate, seed_chanstate
        from .pallas_tpg import pack_state
        first = np.asarray(self._unpack(
            jnp.asarray(words0[:, :1])))[:, 0].reshape(-1)
        state = seed_chanstate(init_chanstate(self.n_channels), first,
                               self.rs_memory_factor)
        self.stack = pack_state(state, self.n_channels,
                                block_sublanes=self._block_sublanes,
                                positions=self._positions)

    def submit_words(self, words: np.ndarray):
        """words: (L, rows, W) uint32 packed rows (W=28 wibeth,
        112 wib2/daphne_stream)."""
        if self.time2:
            return self.submit_time2(self.host_relayout_time2(words))
        L, rows, _ = words.shape
        T = rows * self._ticks_per_row
        if self.stack is None:
            self._ensure_state(words)
        out = None
        if self._pending is not None:
            out = self._collect()
        from .pallas_tpg import auto_tc
        tc = auto_tc(T, cap=self.tc)
        # interpret mode is a correctness path: unrolled interpret compiles
        # are minutes-slow on CPU and measure nothing
        unroll = 1 if self.interpret else \
            (self.unroll if tc % self.unroll == 0 else 1)
        slots, nclose, self.stack = self._fn(
            jnp.asarray(words), self.stack, self.cfg, self.n_channels,
            tc=tc, k_slots=self.k_slots, unroll=unroll,
            interpret=self.interpret,
            fir_twopass=self.fir_twopass)
        if self.device_compact:
            self._pending = compact_on_device(
                slots, nclose, self.tick_offset, self.n_channels,
                self.max_hits, positions=self._positions)
        else:
            self._pending = (slots, nclose, self.tick_offset)
        self.tick_offset += T
        return out

    def submit_words14(self, W: np.ndarray):
        """Direct words14-ordered feed (fused mode only): W is
        (T, WR, 7, 128) int32 rows from native.relayout_words14 (host) or
        a words14-ordered NIC/DMA source — the device pays ZERO relayout.
        Pipelining/collection semantics match submit_words."""
        if self._positions is None:
            raise ValueError(
                "submit_words14 requires StreamingIngest(fused=True)")
        T = int(W.shape[0])
        if self.stack is None:
            self._ensure_state(self._words14_tick0(np.asarray(W[:1])))
        out = self._collect() if self._pending is not None else None
        from .pallas_tpg import auto_tc
        tc = auto_tc(T, cap=self.tc)
        unroll = 1 if self.interpret else \
            (self.unroll if tc % self.unroll == 0 else 1)
        slots, nclose, self.stack = process_words14_feed(
            jnp.asarray(W), self.stack, self.cfg, self.n_channels,
            tc=tc, k_slots=self.k_slots, unroll=unroll,
            interpret=self.interpret,
            fir_twopass=self.fir_twopass)
        if self.device_compact:
            self._pending = compact_on_device(
                slots, nclose, self.tick_offset, self.n_channels,
                self.max_hits, positions=self._positions)
        else:
            self._pending = (slots, nclose, self.tick_offset)
        self.tick_offset += T
        return out

    def host_relayout_time2(self, words: np.ndarray) -> np.ndarray:
        """Format-appropriate host relayout into the time2 feed:
        (L, rows, W) packed words (submit_words layout) -> (T//2, S, 128)
        int32 (native C++, numpy fallback).

        Outputs go through a native.FeedBuffer (double-buffered aligned
        reuse; a fresh ~50 MB allocation per call costs ~3x —
        BENCH_NOTES round-3 host codec)."""
        from .. import native

        if self.format == "daphne_stream":
            L, N, _ = words.shape
            shape = (N * 32, native._pad_sublanes8(4 * L), 128)
            return native.relayout_time2_daphne(
                words, out=self._t2_bufs.get(shape))
        L, T, _ = words.shape
        shape = native.time2_feed_shape(L, T,
                                        ch_per_link=self._ch_per_link)
        return native.relayout_time2(words, ch_per_link=self._ch_per_link,
                                     out=self._t2_bufs.get(shape))

    def submit_time2(self, W2: np.ndarray):
        """Time-paired host feed (canonical state, i.e. fused=False): W2
        is (T//2, S, 128) int32 from host_relayout_time2 /
        native.relayout_time2 — the host already unpacked and
        time-paired, the device runs the plain kernel datapath at ~half
        the ADC HBM traffic (any format: the feed itself is canonical
        channel order, only the host relayout is format-specific).
        Pipelining/collection semantics match submit_words."""
        if self._positions is not None:
            raise ValueError("submit_time2 requires "
                             "StreamingIngest(fused=False)")
        T = 2 * int(W2.shape[0])
        if self.stack is None:
            # seed from tick 0 = the low 16-bit halves of the first row
            from .chanstate import init_chanstate, seed_chanstate
            from .pallas_tpg import pack_state
            first = (np.asarray(W2[0]).reshape(-1)[: self.n_channels]
                     & 0xFFFF).astype(np.int32)
            state = seed_chanstate(init_chanstate(self.n_channels), first,
                                   self.rs_memory_factor)
            self.stack = pack_state(state, self.n_channels,
                                    block_sublanes=self._block_sublanes)
        out = self._collect() if self._pending is not None else None
        from .pallas_tpg import auto_tc
        tc = auto_tc(T, cap=self.tc)
        # the time_packed datapath consumes two ticks per step: tc and
        # unroll must be even.  auto_tc can return an odd divisor (e.g.
        # T = 64*509 frames with cap 512 -> tc=509); fall back to the
        # largest even divisor (T = 2*rows is always even).
        if tc % 2:
            tc = next((d for d in range(tc, 1, -1)
                       if T % d == 0 and d % 2 == 0), T)
        unroll = 2 if self.interpret else \
            (self.unroll if tc % self.unroll == 0
             and self.unroll % 2 == 0 else 2)
        slots, nclose, self.stack = process_time2_feed(
            jnp.asarray(W2), self.stack, self.cfg, self.n_channels,
            tc=tc, k_slots=self.k_slots, unroll=unroll,
            interpret=self.interpret,
            fir_twopass=self.fir_twopass)
        if self.device_compact:
            self._pending = compact_on_device(
                slots, nclose, self.tick_offset, self.n_channels,
                self.max_hits, positions=None)
        else:
            self._pending = (slots, nclose, self.tick_offset)
        self.tick_offset += T
        return out

    def _words14_tick0(self, W0: np.ndarray) -> np.ndarray:
        """Reverse the words14 relayout for ONE tick -> (L, 1, 28) packed
        words, so _ensure_state can seed from the first sample without a
        separate canonical-order copy of the feed."""
        L = self.n_links
        wt = W0[0].transpose(0, 2, 1).reshape(-1, 7)[: 4 * L]  # (G, 7)
        return wt.reshape(L, 1, 28).astype(np.uint32)

    def submit(self, frames_links: np.ndarray):
        """frames_links: (L, N, frame_size) uint8.  Returns the decoded
        hits of the PREVIOUS batch (pipelined), or None on the first call."""
        from ..formats import daphne, wib2
        L, N, _ = frames_links.shape
        if self.format == "wibeth":
            T = N * wibeth.N_TIME_SAMPLES
            words = host_words(frames_links.reshape(-1, wibeth.FRAME_SIZE)) \
                .reshape(L, T, 28)
        elif self.format == "wib2":
            words = np.ascontiguousarray(wib2.adc_region_u32(
                frames_links.reshape(-1, wib2.FRAME_SIZE))) \
                .reshape(L, N, wib2.ADC_WORDS)
        else:
            words = daphne.stream_frames_bytes_to_u32(
                frames_links.reshape(-1, daphne.STREAM_FRAME_SIZE)) \
                .reshape(L, N, daphne.STREAM_ADC_WORDS)
        return self.submit_words(words)

    def _collect(self):
        if self.device_compact:
            packed, self._pending = self._pending, None
            return unpack_compact(packed)
        from .pallas_tpg import decode_pallas_hits
        slots, nclose, tick_offset = self._pending
        hits, dropped = decode_pallas_hits(slots, nclose, self.n_channels,
                                           tick_offset=tick_offset,
                                           positions=self._positions)
        self._pending = None
        return hits, dropped

    def flush(self):
        """Collect the final in-flight batch."""
        return self._collect() if self._pending is not None else None

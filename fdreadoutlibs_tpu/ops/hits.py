"""Hit records: decode, compaction, canonical ordering.

The reference streams hits as MAGIC-terminated 7-register dumps
(ProcessAVX2.hpp:174-196 decoded in WIBEthFrameProcessor.cpp:479-521).  Here
every backend produces the same canonical structured array; the Pallas
backend's sparse row-dumps and the scan backend's dense (T, C) masks both
decode into it.
"""

from __future__ import annotations

import numpy as np

HIT_DTYPE = np.dtype([
    ("channel", np.int32),     # channel index within the processed array
    ("end_tick", np.int32),    # tick at which the hit *closed* (first not-over)
    ("charge", np.int32),
    ("tover", np.int32),
    ("peak_adc", np.int32),
    ("peak_time", np.int32),   # tover value at the peak sample
])


def empty_hits() -> np.ndarray:
    return np.zeros(0, dtype=HIT_DTYPE)


def sort_hits(hits: np.ndarray) -> np.ndarray:
    """Canonical order: (end_tick, channel)."""
    return hits[np.lexsort((hits["channel"], hits["end_tick"]))]


def decode_dense(closed: np.ndarray, records: dict, tick_offset: int = 0) -> np.ndarray:
    """Decode dense per-tick outputs: closed (T, C) bool, records dict of
    (T, C) arrays -> canonical hit array."""
    t_idx, c_idx = np.nonzero(np.asarray(closed))
    hits = np.zeros(len(t_idx), dtype=HIT_DTYPE)
    hits["channel"] = c_idx
    hits["end_tick"] = t_idx + tick_offset
    for f in ("charge", "tover", "peak_adc", "peak_time"):
        hits[f] = np.asarray(records[f])[t_idx, c_idx]
    return sort_hits(hits)


def decode_rows(rows: np.ndarray, count: int, channel_base: int = 0,
                tick_offset: int = 0) -> np.ndarray:
    """Decode Pallas row-dumps.

    rows: (MAX_ROWS, 6, CB) int32 where field axis is
    [tick, charge, tover, peak_adc, peak_time, closed_mask] — the TPU
    analogue of the reference's 7-register dump (channels are implicit:
    ``channel_base + lane``).
    """
    rows = np.asarray(rows)[:count]
    if rows.size == 0:
        return empty_hits()
    tick, charge, tover, peak_adc, peak_time, mask = (rows[:, i] for i in range(6))
    r_idx, c_idx = np.nonzero(mask)
    hits = np.zeros(len(r_idx), dtype=HIT_DTYPE)
    hits["channel"] = c_idx + channel_base
    hits["end_tick"] = tick[r_idx, c_idx] + tick_offset
    hits["charge"] = charge[r_idx, c_idx]
    hits["tover"] = tover[r_idx, c_idx]
    hits["peak_adc"] = peak_adc[r_idx, c_idx]
    hits["peak_time"] = peak_time[r_idx, c_idx]
    return sort_hits(hits)


def concat_hits(parts) -> np.ndarray:
    parts = [p for p in parts if len(p)]
    if not parts:
        return empty_hits()
    return sort_hits(np.concatenate(parts))

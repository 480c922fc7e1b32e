"""Raw-payload readout buffering + windowed data requests.

The reference's request handlers serve *raw payload* windows from latency
buffers for trigger readout (DefaultRequestHandlerModel /
DefaultSkipListRequestHandler; exercised via DAPHNEListRequestHandler and
TPCTPRequestHandler's shared get_fragment_pieces path).  Here raw payloads
(frames/superchunks as byte rows) are stored in the same ordered-buffer
machinery, keyed by the adapter's first timestamp, and served as fragments.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..formats.adapters import TypeAdapter
from ..utils.metrics import MetricsCollector
from .latency_buffer import make_latency_buffer


def payload_record_dtype(payload_size: int) -> np.dtype:
    """Records of (key timestamp, raw payload bytes) — native-buffer ready
    (the uint64 key leads)."""
    return np.dtype([("time_start", np.uint64),
                     ("payload", np.uint8, (payload_size,))])


class ReadoutRequestHandler:
    """Per-link raw-data buffering and request service
    (≈ DefaultRequestHandlerModel over a SkipListLatencyBuffer)."""

    def __init__(self, adapter: TypeAdapter, capacity: int | None = None,
                 prefer_native: bool = True):
        self.adapter = adapter
        self.record_dtype = payload_record_dtype(adapter.fixed_payload_size)
        self.buffer = make_latency_buffer(self.record_dtype, capacity,
                                          prefer_native=prefer_native)
        self.metrics = MetricsCollector()

    def insert_payloads(self, payloads: np.ndarray) -> int:
        """Store a batch of raw payloads ((N, size) uint8)."""
        n = payloads.shape[0]
        recs = np.zeros(n, dtype=self.record_dtype)
        recs["time_start"] = np.asarray(
            self.adapter.get_first_timestamp(payloads), dtype=np.uint64) \
            .reshape(n)
        recs["payload"] = payloads
        accepted = self.buffer.insert(recs)
        self.metrics.inc("num_payloads_buffered", accepted)
        if accepted < n:
            self.metrics.inc("num_payloads_dropped", n - accepted)
        return accepted

    def request(self, start_ts: int, end_ts: int) -> np.ndarray:
        """Serve a DataRequest window: all payloads whose first timestamp is
        in [start - payload_span, end) — a payload *covering* the window
        start is included, like get_fragment_pieces' window logic."""
        self.metrics.inc("num_requests")
        span = self.adapter.payload_tick_difference
        recs = self.buffer.extract_window(max(0, start_ts - span + 1), end_ts)
        return recs["payload"]

    def request_fragment(self, start_ts: int, end_ts: int, *,
                         run_number: int = 0, trigger_number: int = 0,
                         source_id: int = 0, sequence_number: int = 0):
        """Serve a DataRequest as a daqdataformats-style Fragment (payloads
        + FragmentHeader with the requested window)."""
        from ..formats.fragment import build_fragment
        payloads = self.request(start_ts, end_ts)
        return build_fragment(
            payloads, run_number=run_number, trigger_number=trigger_number,
            window_begin=start_ts, window_end=end_ts, source_id=source_id,
            fragment_type=self.adapter.fragment_type,
            sequence_number=sequence_number)

    def cleanup(self, max_ts_diff: Optional[int] = None,
                max_occupancy: Optional[int] = None) -> int:
        dropped = 0
        if max_ts_diff is not None:
            dropped += self.buffer.cleanup_max_ts_diff(max_ts_diff)
        if max_occupancy is not None:
            excess = self.buffer.occupancy() - max_occupancy
            if excess > 0:
                # exact-count trim: no whole-buffer snapshot, safe for
                # max_occupancy=0 and duplicate timestamps
                dropped += self.buffer.pop_n(excess)
        if dropped:
            self.metrics.inc("num_payloads_cleaned", dropped)
        return dropped

    def occupancy(self) -> int:
        return self.buffer.occupancy()

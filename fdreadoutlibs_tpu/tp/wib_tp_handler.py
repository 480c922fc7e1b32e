"""Legacy per-link TP handler (ProtoWIB path).

Port of WIBTPHandler (include/fdreadoutlibs/wib/WIBTPHandler.hpp): a
time-ordered TP buffer that drops TPs older than ``tp_timeout`` on insert
(:meth:`add_tp`, hpp:49-57) and drains fixed, ``tpset_window_size``-aligned
TPSets once the oldest TP is safely in the past
(:meth:`try_sending_tpsets`, hpp:59-92).  The reference uses a
priority queue; here a heap of numpy records.
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np

from ..formats.trigprim import TP_DTYPE, TPSet, TPSetType


class WIBTPHandler:

    def __init__(self, tp_sink=None, tpset_sink=None, tp_timeout: int = 10000,
                 tpset_window_size: int = 6400, source_id: int = 0):
        self.tp_sink = tp_sink
        self.tpset_sink = tpset_sink
        self.tp_timeout = tp_timeout
        self.tpset_window_size = tpset_window_size
        self.source_id = source_id
        self.run_number = 0
        self._buffer: list = []          # heap of (time_start, seq, record)
        self._seq = 0
        self.next_tpset_seqno = 0
        self.sent_tps = 0
        self.sent_tpsets = 0

    def set_run_number(self, run_number: int) -> None:
        self.run_number = run_number

    def add_tp(self, tp: np.ndarray, current_time: int) -> bool:
        """Accept unless the TP is older than tp_timeout (hpp:49-57)."""
        if int(tp["time_start"]) + self.tp_timeout > current_time:
            heapq.heappush(self._buffer, (int(tp["time_start"]), self._seq, tp))
            self._seq += 1
            return True
        return False

    def add_tps(self, tps: np.ndarray, current_time: int) -> int:
        """Batch insert; returns the number accepted."""
        n = 0
        for tp in tps:
            n += self.add_tp(tp.copy(), current_time)
        return n

    def try_sending_tpsets(self, current_time: int) -> Optional[TPSet]:
        """Drain one aligned window when safely closed (hpp:59-92)."""
        if not self._buffer:
            return None
        top_ts = self._buffer[0][0]
        if top_ts + self.tpset_window_size + self.tp_timeout >= current_time:
            return None
        start = (top_ts // self.tpset_window_size) * self.tpset_window_size
        end = start + self.tpset_window_size
        objs = []
        while self._buffer and self._buffer[0][0] < end:
            _, _, tp = heapq.heappop(self._buffer)
            objs.append(tp)
            if self.tp_sink is not None:
                self.tp_sink.try_send(tp)
            self.sent_tps += 1
        tpset = TPSet(run_number=self.run_number, type=TPSetType.kPayload,
                      origin=self.source_id, start_time=start, end_time=end,
                      seqno=self.next_tpset_seqno,
                      objects=(np.array(objs) if objs
                               else np.zeros(0, dtype=TP_DTYPE)))
        self.next_tpset_seqno += 1
        if self.tpset_sink is not None:
            self.tpset_sink.try_send(tpset)
        self.sent_tpsets += 1
        return tpset

    def reset(self) -> None:
        self._buffer.clear()
        self.next_tpset_seqno = 0
        self.sent_tps = 0
        self.sent_tpsets = 0

    def __len__(self) -> int:
        return len(self._buffer)

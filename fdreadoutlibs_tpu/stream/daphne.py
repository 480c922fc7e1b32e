"""DAPHNE photon-detector frame processors.

Equivalents of DAPHNEFrameProcessor / DAPHNEStreamFrameProcessor
(src/daphne/*.cpp): preprocess timestamp bookkeeping only — the
self-triggered stream has no fixed arrival rate so the continuity check is
informational (cpp:54-59, emulator fakes +192 per superchunk with +16 per
frame, cpp:39-47); the streaming variant checks a fixed +64-per-frame
cadence.  No TPG in the reference; :class:`DAPHNEStreamFrameProcessor`
optionally runs the SWTPG pipeline over the 4 streaming channels (a strict
superset of reference behavior, off by default).
"""

from __future__ import annotations

import numpy as np

from ..formats import daphne
from .errors import ErrorInterval
from .processor import TaskRawDataProcessor


class DAPHNEFrameProcessor(TaskRawDataProcessor):
    """Self-triggered PDS superchunks (12 x 1816 B)."""

    def conf(self, config: dict) -> None:
        super().conf(config)
        self.add_preprocess_task(self.timestamp_check)

    def start(self, args=None) -> None:
        super().start(args)
        self.previous_ts = 0
        self._first_ts_fake = True

    def timestamp_check(self, superchunks: np.ndarray) -> None:
        """cpp:36-71: emulator fakes +192/superchunk (offset 16/frame);
        the rate check itself is disabled (self-triggered)."""
        n = superchunks.shape[0]
        if self.emulator_mode:
            for i in range(n):
                if self._first_ts_fake:
                    first = self.previous_ts
                    self._first_ts_fake = False
                else:
                    first = self.previous_ts + 192
                daphne.fake_timestamps(superchunks[i:i + 1], first, offset=16)
                self.previous_ts = first
        ts = daphne.get_first_timestamp(superchunks)
        self.previous_ts = int(np.asarray(ts).reshape(-1)[-1])
        self.last_processed_daq_ts = self.previous_ts
        self.metrics.inc("num_payloads", n)

    def frame_error_check(self, superchunks: np.ndarray) -> None:
        """cpp:76-81: header error-flag check (no flags defined yet)."""


class DAPHNEStreamFrameProcessor(TaskRawDataProcessor):
    """Streaming PDS superchunks (12 x 472 B, 4 ch x 64 samples each)."""

    def conf(self, config: dict) -> None:
        super().conf(config)
        self.add_preprocess_task(self.timestamp_check)

    def start(self, args=None) -> None:
        super().start(args)
        self.previous_ts = 0
        self._first_ts_check = True

    def timestamp_check(self, superchunks: np.ndarray) -> None:
        """DAPHNEStreamFrameProcessor.cpp:39-49: fixed +64/frame cadence."""
        tick = daphne.STREAM_EXPECTED_TICK_DIFFERENCE
        per_chunk = tick * daphne.STREAM_FRAMES_PER_SUPERCHUNK
        if self.emulator_mode:
            first = (self.previous_ts + per_chunk) if not self._first_ts_check \
                else int(np.asarray(
                    daphne.get_first_timestamp(superchunks, stream=True)
                ).reshape(-1)[0])
            for i in range(superchunks.shape[0]):
                daphne.fake_timestamps(superchunks[i:i + 1],
                                       first + i * per_chunk,
                                       offset=tick, stream=True)
        ts = np.asarray(daphne.get_first_timestamp(superchunks, stream=True),
                        dtype=np.uint64).reshape(-1)
        prev = np.concatenate([[np.uint64(self.previous_ts)], ts[:-1]])
        ok = (ts - prev) == per_chunk
        if self._first_ts_check:
            ok[0] = True
            self._first_ts_check = False
        bad = np.nonzero(~ok)[0]
        if len(bad):
            self.metrics.inc("num_ts_errors", len(bad))
            for i in bad[:16]:
                self.error_registry.add_error(
                    "MISSING_FRAMES",
                    ErrorInterval(int(prev[i] + per_chunk), int(ts[i])))
        self.previous_ts = int(ts[-1])
        self.last_processed_daq_ts = int(ts[-1])

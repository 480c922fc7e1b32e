"""TDE (vertical-drift top-electronics) frame processor.

Equivalent of TDEFrameProcessor (src/tde/TDEFrameProcessor.cpp): a TDE link
interleaves 64 per-channel frames, so timestamp continuity is tracked with
a *per-channel* previous-timestamp array (hpp:62, cpp:34-77); the first
frame of each channel establishes its baseline.
"""

from __future__ import annotations

import numpy as np

from ..formats import tde
from .errors import ErrorInterval
from .processor import TaskRawDataProcessor


class TDEFrameProcessor(TaskRawDataProcessor):

    def conf(self, config: dict) -> None:
        super().conf(config)
        self.add_preprocess_task(self.timestamp_check)
        self.add_preprocess_task(self.frame_error_check)

    def start(self, args=None) -> None:
        super().start(args)
        self.previous_ts = np.zeros(tde.N_CHANNELS_PER_LINK, dtype=np.uint64)

    def timestamp_check(self, frames: np.ndarray) -> None:
        tick = tde.EXPECTED_TICK_DIFFERENCE
        channels = tde.get_channel(frames)
        if self.emulator_mode:
            # cpp:40-46: each channel's ts = its previous + tick
            for i, ch in enumerate(channels):
                prev = self.previous_ts[ch]
                if prev == 0:
                    prev = tde.get_timestamp(frames[i:i + 1])[0]
                    self.previous_ts[ch] = prev
                else:
                    tde.set_timestamp(frames[i:i + 1], prev + tick)
        ts = tde.get_timestamp(frames)
        for i, ch in enumerate(channels):
            prev = self.previous_ts[ch]
            if prev != 0 and ts[i] - prev != tick:
                self.metrics.inc("num_ts_errors")
                self.error_registry.add_error(
                    "MISSING_FRAMES", ErrorInterval(int(prev + tick), int(ts[i])))
            self.previous_ts[ch] = ts[i]
        if len(ts):
            self.last_processed_daq_ts = int(ts[-1])

    def frame_error_check(self, frames: np.ndarray) -> None:
        """cpp: header error-flag check (placeholder in the reference too)."""

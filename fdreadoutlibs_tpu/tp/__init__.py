"""L4 — TP buffering, TPSet windowing, and data-request handling.

Equivalent of TPCTPRequestHandler / DAPHNEListRequestHandler / WIBTPHandler
(SURVEY.md §2.4) over a timestamp-ordered latency buffer (the reference uses
a folly ConcurrentSkipList via SkipListLatencyBufferModel; here a sorted
numpy store with lazy consolidation — an optional C++ backend can slot in
behind the same interface).
"""

from .latency_buffer import LatencyBuffer  # noqa: F401
from .request_handler import TPRequestHandler  # noqa: F401
from .wib_tp_handler import WIBTPHandler  # noqa: F401
from .recorder import FragmentRecorder  # noqa: F401

"""Shared services: channel maps, configuration, metrics."""

from .channel_map import ChannelMap, make_map  # noqa: F401
from .metrics import MetricsCollector  # noqa: F401
from .config import (RawDataProcessorConf, ReadoutModelConf,  # noqa: F401
                     load_config)
from .checkpoint import save_state, load_state  # noqa: F401
from .logging import tlog, timed  # noqa: F401

"""Shared services: channel maps, configuration, metrics."""

from .channel_map import ChannelMap, make_map  # noqa: F401
from .metrics import MetricsCollector  # noqa: F401

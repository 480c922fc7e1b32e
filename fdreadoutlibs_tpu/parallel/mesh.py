"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_link_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the 'link' axis (links = DUNE readout streams)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("link",))

"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_link_mesh(n_devices: int | None = None,
                   backend: str | None = None) -> Mesh:
    """1-D mesh over the 'link' axis (links = DUNE readout streams).

    Falls back to the virtual CPU device pool when the default backend has
    fewer devices than requested (e.g. a single-chip tunnel with
    --xla_force_host_platform_device_count set for sharding dry-runs).
    """
    try:
        devices = jax.devices(backend) if backend else jax.devices()
    except Exception:
        # default backend unavailable (e.g. remote-TPU tunnel down) — the
        # virtual CPU pool always exists
        devices = jax.devices("cpu")
    if n_devices is not None and len(devices) < n_devices:
        devices = jax.devices("cpu")
    if n_devices is not None:
        assert len(devices) >= n_devices, \
            f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("link",))

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


def make_apa_link_mesh(n_apas: int, n_link_shards: int | None = None,
                       backend: str | None = None) -> Mesh:
    """2-D ('apa', 'link') mesh: one contiguous device group per APA
    (detector scale-out; make_detector_step/DetectorPipeline).

    Contiguity matters on hardware: consecutive jax.devices() are ICI
    neighbors, and the only collective in the step (the per-APA
    monitoring psum) runs over the 'link' axis, so each APA's traffic
    stays inside its own ICI block — the 'apa' axis carries nothing.

    ``n_link_shards`` defaults to (available devices) // n_apas.
    """
    try:
        devices = jax.devices(backend) if backend else jax.devices()
    except Exception:
        devices = jax.devices("cpu")
    if n_link_shards is None:
        n_link_shards = max(1, len(devices) // n_apas)
    need = n_apas * n_link_shards
    if len(devices) < need:
        devices = jax.devices("cpu")
    assert len(devices) >= need, \
        f"need {need} devices ({n_apas} APAs x {n_link_shards}), " \
        f"have {len(devices)}"
    grid = np.array(devices[:need]).reshape(n_apas, n_link_shards)
    return Mesh(grid, ("apa", "link"))

"""Tuned kernel-knob discovery (the consumer side of scripts/autotune.py).

``scripts/autotune.py --out tuned.json`` measures the best
(block_sublanes, tc, unroll) per algorithm family on the attached chip;
pointing ``FDREADOUT_TUNED`` at that file (or passing ``path``) makes the
streaming defaults pick the measured winners instead of the shipped
v5e-lite knobs.  Absent or partial files fall back field-by-field to the
built-in defaults, so a tuned file is always safe to deploy.
"""

from __future__ import annotations

import json
import os
from typing import Optional

_ENV = "FDREADOUT_TUNED"
_cache: dict[tuple, dict] = {}


def load_tuned(path: Optional[str] = None) -> dict:
    """Return {algorithm_name: {sub, tc, unroll, ...}} from ``path`` or
    the FDREADOUT_TUNED env var; {} when neither is set or readable.

    Cached per (path, mtime): rewriting the file (e.g. after re-running
    autotune) is picked up by long-running processes on the next call.
    """
    path = path or os.environ.get(_ENV)
    if not path:
        return {}
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None
    key = (path, mtime)
    if key not in _cache:
        try:
            with open(path) as f:
                data = json.load(f)
            _cache[key] = data if isinstance(data, dict) else {}
        except (OSError, ValueError):
            from .logging import log
            log.warning("ignoring unreadable tuned-config file %s", path)
            _cache[key] = {}
    return _cache[key]


def _tuned_int(tuned: dict, key: str, minimum: int):
    """A tuned field, or None when absent/malformed (bad fields fall back
    per-field — a tuned file must always be safe to deploy)."""
    v = tuned.get(key)
    if isinstance(v, bool) or not isinstance(v, int) or v < minimum:
        if v is not None:
            from .logging import log
            log.warning("ignoring tuned %s=%r (not an int >= %d)",
                        key, v, minimum)
        return None
    return v


def kernel_knobs(cfg, n_channels: int, tc: Optional[int] = None,
                 unroll: Optional[int] = None,
                 path: Optional[str] = None, dtype=None) -> dict:
    """Resolve the kernel launch knobs for ``cfg``, in precedence order:
    explicit ``tc``/``unroll`` arguments -> tuned-file values (when one
    names this algorithm and the field is well-formed) -> the shipped
    per-algorithm table (pallas_tpg.SHIPPED_KNOBS).

    Returns {"tc", "unroll", "k_slots", "block_sublanes"} ready for
    process_window_pallas / pack_state.

    ``k_slots`` is the PERFORMANCE default (bench/kernel consumers; the
    autotuner sweeps it).  Streaming processors deliberately do NOT take
    it from here: their ``tpg_k_slots`` config is a per-batch hit
    CAPACITY choice (short batches need headroom for pathological
    channels), so a speed-tuned k must never silently cut it.
    """
    import numpy as np

    from ..ops.pallas_tpg import (SHIPPED_KNOBS, _granule,
                                  default_block_sublanes, pad_sublanes)
    dtype = dtype or np.int32
    shipped = SHIPPED_KNOBS[cfg.algorithm]
    tuned = load_tuned(path).get(getattr(cfg.algorithm, "value",
                                         str(cfg.algorithm)), {})
    if not isinstance(tuned, dict):
        tuned = {}
    sub = _tuned_int(tuned, "sub", 0)
    block = (sub or None) if sub is not None \
        else default_block_sublanes(cfg, n_channels, dtype)
    if block and (pad_sublanes(n_channels, _granule(dtype)) % block
                  or block % _granule(dtype)):
        # tuned block width doesn't tile this channel count, or violates
        # the dtype's sublane tile granule (Mosaic 8-row int32 / 16-row
        # int16 tiling) — fall back so a tuned file is always deployable
        block = default_block_sublanes(cfg, n_channels, dtype)
    t_tc = _tuned_int(tuned, "tc", 1)
    t_un = _tuned_int(tuned, "unroll", 1)
    t_k = _tuned_int(tuned, "k", 1)
    t_tp = _tuned_int(tuned, "twopass", 0)
    if shipped.get("twopass") is None:
        t_tp = None          # schedule knob only exists for FIR
    return {"tc": tc if tc is not None else
            (t_tc if t_tc is not None else shipped["tc"]),
            "unroll": unroll if unroll is not None else
            (t_un if t_un is not None else shipped["unroll"]),
            "k_slots": t_k if t_k is not None else shipped.get("k", 1),
            "block_sublanes": block,
            # 0 = fused tick, 1 = two-pass, 2 = two-pass + lifted emission
            "fir_twopass": int(t_tp if t_tp is not None
                               else shipped.get("twopass", 0))}

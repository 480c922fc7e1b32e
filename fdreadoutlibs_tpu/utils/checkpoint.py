"""Checkpoint / resume for streaming state.

The reference has NO checkpointing — ChanState is re-seeded at every run
start (SURVEY.md §5).  Because this framework carries all streaming state
as explicit arrays (ChanState pytree + processor bookkeeping), a checkpoint
is a single npz; a processor can resume mid-stream bit-exactly.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..ops.chanstate import ChanState

_META_KEYS = ("previous_ts", "previous_seq_id", "last_processed_daq_ts")


def save_state(path, state: dict, **meta) -> Path:
    """Save a ChanState-like dict of arrays (+ scalar metadata) to npz."""
    arrays = {f"state/{k}": np.asarray(v) for k, v in state.items()}
    arrays.update({f"meta/{k}": np.asarray(v) for k, v in meta.items()})
    np.savez_compressed(str(path), **arrays)
    return Path(path)


def load_state(path):
    """Returns (state dict, meta dict)."""
    blob = np.load(str(path))
    state, meta = {}, {}
    for k in blob.files:
        kind, name = k.split("/", 1)
        if kind == "state":
            state[name] = blob[k]
        else:
            v = blob[k]
            meta[name] = v.item() if v.shape == () else v
    return ChanState(state), meta


def checkpoint_processor(proc, path) -> Path:
    """Checkpoint a frame processor's full streaming context."""
    meta = {k: getattr(proc, k, 0) for k in _META_KEYS}
    meta["first_hit"] = getattr(proc, "_first_hit", True)
    if hasattr(proc, "current_state"):   # lazily-materialized device state
        state = proc.current_state() or {}
    else:
        state = getattr(proc, "_state", None) or {}
    if getattr(proc, "register_channels", None) is not None:
        meta["register_channels"] = np.asarray(proc.register_channels)
        meta["register_memory_factor"] = np.asarray(proc.register_memory_factor)
    return save_state(path, state, **meta)


def save_sharded_state(path, state: dict) -> None:
    """Checkpoint a *sharded* state pytree (e.g. APAPipeline.state) with
    orbax — each device writes its shard; restore re-shards onto the
    current mesh.  Completes the checkpoint story for multi-chip runs
    (the reference has no checkpointing at all, let alone distributed)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(Path(path).absolute()), state)
    ckptr.wait_until_finished()


def load_sharded_state(path, like: dict) -> dict:
    """Restore a sharded state pytree; ``like`` provides shapes/shardings
    (e.g. a freshly initialized APAPipeline.state)."""
    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    targets = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        like)
    return ckptr.restore(str(Path(path).absolute()), targets)


def restore_processor(proc, path) -> None:
    """Restore a checkpoint into a conf()'d + start()'d processor."""
    state, meta = load_state(path)
    if len(state):
        proc._state = state
        proc._pallas_stack = None
        proc._state_stale = False
    for k in _META_KEYS:
        if k in meta:
            setattr(proc, k, int(meta[k]))
    if "register_channels" in meta:
        proc.register_channels = np.asarray(meta["register_channels"])
        proc.register_memory_factor = np.asarray(meta["register_memory_factor"])
        proc._first_hit = bool(meta.get("first_hit", False))
    proc._first_ts_check = False
    proc._first_seq_check = False

"""Channel map service (≈ detchannelmaps::TPCChannelMap).

The reference resolves (crate, slot, stream, in-frame channel) -> offline
channel and offline channel -> plane through an external package
(RegisterToChannelNumber.cpp:49-50, WIBEthFrameProcessor.cpp:443).  Here the
service is a pluggable registry; the built-in maps cover the shapes the
SWTPG path needs:

* ``IdentityChannelMap`` — offline = stream-linear offset + channel;
  plane split configurable per link (first ``n_collection`` channels are
  collection, matching the WIBEth half-FEMB layout where a 64-channel
  stream carries one plane's worth of wires split 40/24 or similar);
* ``PermutedChannelMap`` — same but with an arbitrary per-link permutation
  (exercises the register-order bookkeeping in tests).

detchannelmaps' production maps (VDColdbox etc.) are lookup tables; any
table can be loaded via ``TableChannelMap``.
"""

from __future__ import annotations

import numpy as np

_REGISTRY = {}


class ChannelMap:
    """Interface mirroring the used subset of TPCChannelMap."""

    def get_offline_channel_from_crate_slot_stream_chan(
            self, crate: int, slot: int, stream: int, chan: int) -> int:
        raise NotImplementedError

    def get_plane_from_offline_channel(self, offline: int) -> int:
        """0 = collection (the reference's convention,
        WIBEthFrameProcessor.cpp:443), nonzero = induction."""
        raise NotImplementedError

    # vectorized conveniences
    def offline_channels(self, crate: int, slot: int, stream: int,
                         n_channels: int) -> np.ndarray:
        return np.array([
            self.get_offline_channel_from_crate_slot_stream_chan(
                crate, slot, stream, c) for c in range(n_channels)],
            dtype=np.int64)

    def planes(self, offline: np.ndarray) -> np.ndarray:
        return np.array([self.get_plane_from_offline_channel(int(c))
                         for c in np.asarray(offline)], dtype=np.int64)


class IdentityChannelMap(ChannelMap):
    """offline = (((crate * n_slots) + slot) * n_streams + stream) * 64 + chan."""

    def __init__(self, channels_per_stream: int = 64, n_slots: int = 8,
                 n_streams: int = 64, n_collection: int = 0):
        self.channels_per_stream = channels_per_stream
        self.n_slots = n_slots
        self.n_streams = n_streams
        self.n_collection = n_collection  # per-stream leading collection chans

    def get_offline_channel_from_crate_slot_stream_chan(self, crate, slot,
                                                        stream, chan):
        link = (crate * self.n_slots + slot) * self.n_streams + stream
        return link * self.channels_per_stream + chan

    def get_plane_from_offline_channel(self, offline):
        in_stream = offline % self.channels_per_stream
        return 0 if in_stream < self.n_collection else 2


class PermutedChannelMap(IdentityChannelMap):
    """Identity map composed with a fixed per-stream channel permutation."""

    def __init__(self, permutation, **kw):
        super().__init__(**kw)
        self.permutation = np.asarray(permutation)
        assert len(self.permutation) == self.channels_per_stream

    def get_offline_channel_from_crate_slot_stream_chan(self, crate, slot,
                                                        stream, chan):
        link = (crate * self.n_slots + slot) * self.n_streams + stream
        return link * self.channels_per_stream + int(self.permutation[chan])


class TableChannelMap(ChannelMap):
    """Arbitrary lookup-table map: {(crate, slot, stream): offline[64]} plus
    an offline->plane table."""

    def __init__(self, table: dict, plane_table: dict):
        self.table = {k: np.asarray(v) for k, v in table.items()}
        self.plane_table = plane_table

    def get_offline_channel_from_crate_slot_stream_chan(self, crate, slot,
                                                        stream, chan):
        return int(self.table[(crate, slot, stream)][chan])

    def get_plane_from_offline_channel(self, offline):
        return self.plane_table[int(offline)]


def register_map(name: str, factory) -> None:
    _REGISTRY[name] = factory


def make_map(name: str, **kw) -> ChannelMap:
    """detchannelmaps::make_map equivalent."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown channel map '{name}' "
                       f"(available: {sorted(_REGISTRY)})")
    return _REGISTRY[name](**kw)


def register_map_via_expansion(ch_map: ChannelMap, crate: int, slot: int,
                               stream: int, n_channels: int = 64,
                               unpack=None, pack=None) -> np.ndarray:
    """The reference's RegisterToChannelNumber trick as a pure computation
    (src/wibeth/tpg/RegisterToChannelNumber.cpp:35-122): write each frame
    channel's offline number (minus the minimum) as its ADC value, push the
    frame through the *real* unpack, and read back where each channel
    landed.  With this framework's natural-order unpack the result is the
    direct offline map; pass pack/unpack callables to audit any other
    layout (e.g. the register-order views).
    Returns offline channel per unpacked position.
    """
    offline = ch_map.offline_channels(crate, slot, stream, n_channels)
    min_ch = int(offline.min())
    values = (offline - min_ch).astype(np.uint16)
    if pack is None or unpack is None:
        from ..formats import wibeth as _w
        frames = _w.empty_frames(1)
        _w.set_adcs(frames, np.broadcast_to(values, (1, 64, 64)).copy())
        landed = _w.get_adcs(frames)[0, 0]
    else:
        landed = unpack(pack(values))
    return np.asarray(landed, dtype=np.int64) + min_ch


register_map("IdentityChannelMap", IdentityChannelMap)
register_map("PermutedChannelMap", PermutedChannelMap)
# Name-compatible aliases for configs written against detchannelmaps; the
# geometry is identity-linear unless a table is loaded.
register_map("PD2HDChannelMap", IdentityChannelMap)
register_map("VDColdboxChannelMap", IdentityChannelMap)
register_map("ProtoDUNESP1ChannelMap", IdentityChannelMap)

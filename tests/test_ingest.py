"""Fused device-ingest pipeline tests (packed bytes -> unpack -> TPG)."""

import numpy as np

from fdreadoutlibs_tpu.formats import wibeth
from fdreadoutlibs_tpu.ops import TPGConfig
from fdreadoutlibs_tpu.ops.hits import concat_hits
from fdreadoutlibs_tpu.ops.ingest import StreamingIngest, host_words
from fdreadoutlibs_tpu.ops.reference import run_reference


def make_frames(L, N, seed=0, pulse=None):
    rng = np.random.default_rng(seed)
    frames = np.zeros((L, N, wibeth.FRAME_SIZE), np.uint8)
    adcs = (900 + rng.normal(0, 30, size=(L, N, 64, 64))).astype(np.uint16)
    if pulse:
        l, f, t, c, amp = pulse
        adcs[l, f, t:t + 10, c] += amp
    for l in range(L):
        wibeth.set_adcs(frames[l], adcs[l])
    return frames, adcs


def link_major_stream(adcs):
    """(L, N, 64, 64) -> (N*64, L*64) the ingest channel layout."""
    L, N = adcs.shape[:2]
    return adcs.reshape(L, N * 64, 64).transpose(1, 0, 2) \
        .reshape(N * 64, L * 64).astype(np.int32)


class TestStreamingIngest:
    def test_matches_oracle_across_batches(self):
        L, N = 4, 2
        frames, adcs = make_frames(L, N, pulse=(1, 1, 10, 5, 2000))
        cfg = TPGConfig(threshold=150)      # 5 sigma: no K-slot overflow
        ing = StreamingIngest(cfg, n_links=L, tc=128, k_slots=8,
                              interpret=True)
        parts = []
        dropped = 0
        for _ in range(3):
            out = ing.submit(frames)
            if out:
                parts.append(out[0])
                dropped += out[1]
        out = ing.flush()
        parts.append(out[0])
        dropped += out[1]
        got = concat_hits(parts)
        stream = np.tile(link_major_stream(adcs), (3, 1))
        ref, _ = run_reference(stream, cfg, window=N * 64)
        assert len(ref) > 0
        assert dropped == 0
        np.testing.assert_array_equal(got, ref)

    def test_host_never_decodes(self):
        """host_words is a pure byte view: byte-identical to the ADC region."""
        frames, _ = make_frames(1, 2, seed=3)
        w = host_words(frames.reshape(-1, wibeth.FRAME_SIZE))
        assert w.dtype == np.uint32 and w.shape == (2, 64, 28)
        np.testing.assert_array_equal(
            w.view(np.uint8).reshape(2, -1),
            frames[0][:, 32:])

    def test_pipelining_returns_previous_batch(self):
        L, N = 2, 1
        frames, _ = make_frames(L, N, seed=5)
        ing = StreamingIngest(TPGConfig(threshold=120), n_links=L,
                              interpret=True)
        assert ing.submit(frames) is None          # first: nothing pending
        out = ing.submit(frames)
        assert out is not None                      # second: batch 0's hits
        assert ing.flush() is not None              # batch 1's hits
        assert ing.flush() is None


class TestWIB2Ingest:
    def test_fused_wib2_matches_oracle(self):
        import jax.numpy as jnp
        from fdreadoutlibs_tpu.formats import wib2
        from fdreadoutlibs_tpu.ops.chanstate import (init_chanstate,
                                                     seed_chanstate)
        from fdreadoutlibs_tpu.ops.ingest import process_packed_wib2
        from fdreadoutlibs_tpu.ops.pallas_tpg import (decode_pallas_hits,
                                                      pack_state)
        rng = np.random.default_rng(1)
        L, T = 2, 48
        adcs = (800 + rng.normal(0, 20, size=(L, T, 256))).astype(np.uint16)
        adcs[1, 20:28, 100] += 900
        frames = wib2.empty_frames(L * T).reshape(L, T, wib2.FRAME_SIZE)
        for l in range(L):
            wib2.set_adcs(frames[l], adcs[l])
        words = np.ascontiguousarray(wib2.adc_region_u32(frames))
        C = L * 256
        cfg = TPGConfig(threshold=120)
        stream = adcs.transpose(1, 0, 2).reshape(T, C).astype(np.int32)
        stack = pack_state(seed_chanstate(init_chanstate(C), stream[0], 8), C)
        slots, nclose, _ = process_packed_wib2(
            jnp.asarray(words), stack, cfg, C, tc=48, unroll=1,
            interpret=True)
        got, dropped = decode_pallas_hits(slots, nclose, C)
        ref, _ = run_reference(stream, cfg, window=T)
        assert dropped == 0 and len(ref) > 0
        np.testing.assert_array_equal(got, ref)


def test_streaming_ingest_wib2_format():
    """StreamingIngest with format='wib2': 256-channel frames, 1 tick each."""
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.formats import wib2
    rng = np.random.default_rng(9)
    L, N = 2, 48          # 48 one-tick frames per link
    adcs = (800 + rng.normal(0, 20, size=(L, N, 256))).astype(np.uint16)
    adcs[0, 20:28, 77] += 900
    frames = wib2.empty_frames(L * N).reshape(L, N, wib2.FRAME_SIZE)
    for l in range(L):
        wib2.set_adcs(frames[l], adcs[l])
    cfg = TPGConfig(threshold=120)
    ing = StreamingIngest(cfg, n_links=L, tc=48, k_slots=8,
                          interpret=True, format="wib2")
    assert ing.submit(frames) is None
    hits, dropped = ing.flush()
    assert dropped == 0
    stream = adcs.transpose(1, 0, 2).reshape(N, L * 256).astype(np.int32)
    ref, _ = run_reference(stream, cfg, window=N)
    np.testing.assert_array_equal(hits, ref)

"""Native-int16 compute mode: bit-exact vs the int32 oracle."""

import numpy as np
import pytest

from fdreadoutlibs_tpu.ops import TPGConfig, Algorithm
from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
from fdreadoutlibs_tpu.ops.fixedpoint import I16Fx, I32Fx
from fdreadoutlibs_tpu.ops.pallas_tpg import (decode_pallas_hits, pack_adcs,
                                              pack_state,
                                              process_window_pallas,
                                              unpack_state)
from fdreadoutlibs_tpu.ops.reference import run_reference
from fdreadoutlibs_tpu.ops.step import tpg_tick
from tests.test_tpg_scan import random_stream

CONFIGS = [
    TPGConfig(algorithm=Algorithm.SIMPLE_THRESHOLD, threshold=120),
    TPGConfig(algorithm=Algorithm.ABS_RS, threshold=150),
    TPGConfig(algorithm=Algorithm.STANDARD_RS, threshold=150),
    TPGConfig(algorithm=Algorithm.FIR, threshold=5),
]


def run_pallas_i16(adcs, cfg, tc=32, k_slots=8):
    import jax.numpy as jnp
    adcs = np.asarray(adcs, dtype=np.int32)
    T, C = adcs.shape
    state = seed_chanstate(init_chanstate(C), adcs[0],
                           cfg.rs_memory_factor_x10)
    stack = pack_state(state, C, dtype=np.int16)
    slots, nclose, stack = process_window_pallas(
        jnp.asarray(pack_adcs(adcs, dtype=np.int16)), stack, cfg, tc=tc,
        k_slots=k_slots, interpret=True)
    hits, dropped = decode_pallas_hits(slots, nclose, C)
    return hits, unpack_state(stack, C), dropped


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c.algorithm.value)
def test_i16_kernel_matches_reference(cfg):
    adcs = random_stream(128, 48, seed=41)
    h_ref, st_ref = run_reference(adcs, cfg, window=128)
    h_16, st_16, dropped = run_pallas_i16(adcs, cfg)
    assert dropped == 0
    assert len(h_ref) > 0
    np.testing.assert_array_equal(h_16, h_ref)
    for k in ("pedestals", "accum", "rs", "hit_charge", "prev_was_over",
              "quantile75"):
        np.testing.assert_array_equal(st_16[k][:48], np.asarray(st_ref[k]),
                                      err_msg=k)


def test_i16_tick_direct_equivalence():
    """Drive the tick function directly in both modes over realistic
    streams (noise + pulses around a pedestal).

    The modes are equivalent wherever the C++ int16 semantics themselves
    are well-defined; pathological inputs (e.g. white noise spanning the
    full 14-bit range) can drive hit_charge below -32768, where the int32
    emulation keeps accumulating but int16 storage — like the reference's
    own uint16 hit_charge — wraps.  Real detector streams never get there.
    """
    C = 64
    cfg = TPGConfig(algorithm=Algorithm.ABS_RS, threshold=130)
    adcs = random_stream(200, C, seed=0, noise=40, base=2000, n_signals=80)
    st32 = {k: v for k, v in seed_chanstate(
        init_chanstate(C), adcs[0], 8).items()}
    st16 = {k: np.asarray(v).astype(np.int16) for k, v in st32.items()}
    fx32, fx16 = I32Fx.make(np), I16Fx.make(np)
    for t in range(adcs.shape[0]):
        s = adcs[t].astype(np.int32)
        st32, c32, r32 = tpg_tick(st32, s, cfg, np, fx=fx32)
        st16, c16, r16 = tpg_tick(st16, s.astype(np.int16), cfg, np, fx=fx16)
        np.testing.assert_array_equal(c16, c32, err_msg=f"tick {t}")
        for f in r32:
            np.testing.assert_array_equal(r16[f], r32[f].astype(np.int16),
                                          err_msg=f"{f} tick {t}")

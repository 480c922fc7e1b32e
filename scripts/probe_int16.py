#!/usr/bin/env python
"""Probe whether the current libtpu Mosaic accepts the native-int16 kernel.

The I16Fx compute mode (native int16 arrays, (16,128) tiles, ~1.5-2x over
the int32 emulation) is fully implemented and parity-tested in interpret
mode, but as of 2026-08-16 the Mosaic target rejects int16 vector compares
("Target does not support this comparison" on arith.cmpi i16).  Run this
after libtpu updates; if it prints I16FX OK, flip the production paths to
dtype=np.int16 and re-tune (see BENCH_NOTES "int16 retry").
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (
        decode_pallas_hits, pack_adcs, pack_state, process_window_pallas)
    from fdreadoutlibs_tpu.ops.reference import run_reference

    assert jax.default_backend() == "tpu", "probe needs the real chip"
    C, T = 256, 256
    rng = np.random.default_rng(0)
    adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
    adcs[40:48, 17] += 2000
    cfg = TPGConfig(threshold=150)
    st = seed_chanstate(init_chanstate(C), adcs[0], cfg.rs_memory_factor_x10)
    try:
        slots, nclose, _ = process_window_pallas(
            pack_adcs(adcs, np.int16), pack_state(st, C, dtype=np.int16),
            cfg, tc=128, k_slots=2)
        hits, _ = decode_pallas_hits(slots, nclose, C)
        ref, _ = run_reference(adcs, cfg, window=T)
        np.testing.assert_array_equal(hits, ref)
        print(f"I16FX OK: compiled, ran, {len(hits)} hits bit-exact — "
              "light up native int16!")
        return 0
    except Exception as e:
        msg = str(e)
        cut = msg.find("The MLIR operation involved")
        print("I16FX still rejected:",
              msg[max(0, cut - 200):cut + 200] if cut >= 0 else msg[-400:])
        return 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Compiled-Mosaic check for the two-pass FIR schedules (real chip).

The interpret-mode tests pin bit-exactness of fir_twopass=1/2 vs the
fused tick; this script closes the compile-path gap: it compiles both
schedules on the attached TPU (small shapes, both record layouts and a
blocked grid) and compares slots/counts/state against the fused kernel
on-device.  Exits non-zero on any mismatch or compile failure, so the
hardware A/B only ever measures schedules that are known-correct
compiled.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from fdreadoutlibs_tpu.ops import TPGConfig
    from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
    from fdreadoutlibs_tpu.ops.pallas_tpg import (pack_adcs, pack_state,
                                                  process_window_pallas)
    from fdreadoutlibs_tpu.utils.preflight import device_preflight

    assert jax.default_backend() == "tpu", "needs the real chip"
    device_preflight()
    rng = np.random.default_rng(11)
    T = 1024
    out = {"ok": True, "cases": {}}
    cases = [
        # (name, channels, track_peaks, kwargs)
        ("nopeak_whole", 256, False, {}),
        ("peaks_whole", 256, True, {}),
        ("nopeak_blocked", 2560, False, {"block_sublanes": 8}),
    ]
    for name, C, peaks, kw in cases:
        cfg = TPGConfig.from_raw("FIR", threshold=5, track_peaks=peaks)
        adcs = (900 + rng.normal(0, 4, size=(T, C))).astype(np.int32)
        for _ in range(C // 4):
            c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
            adcs[t0:t0 + 8, c] += rng.integers(200, 1200)
        st = seed_chanstate(init_chanstate(C), adcs[0],
                            cfg.rs_memory_factor_x10)
        stack = pack_state(st, C, block_sublanes=kw.get("block_sublanes"))
        pa = jnp.asarray(pack_adcs(adcs))
        results = {}
        for tp in (0, 1, 2):
            try:
                r = process_window_pallas(pa, stack, cfg, tc=256, k_slots=2,
                                          unroll=8, vmem_limit_mb=64,
                                          fir_twopass=tp)
                results[tp] = tuple(np.asarray(x) for x in r)
            except Exception as e:  # noqa: BLE001 - report, don't abort
                out["ok"] = False
                out["cases"][f"{name}_tp{tp}"] = \
                    f"COMPILE/RUN FAIL: {type(e).__name__}: {str(e)[-200:]}"
        for tp in (1, 2):
            if tp not in results or 0 not in results:
                continue
            eq = all(np.array_equal(a, b)
                     for a, b in zip(results[0], results[tp]))
            out["cases"][f"{name}_tp{tp}"] = "match" if eq else "MISMATCH"
            if not eq:
                out["ok"] = False
        if 0 in results:
            n_hits = int(results[0][1].sum())
            out["cases"][name + "_hits"] = n_hits
            if n_hits == 0:
                out["ok"] = False       # vacuous comparison
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

"""Hardware parity: compiled Mosaic kernels vs numpy oracle, all 4 algorithms,
incl. the deep-negative charge-floor regime."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from fdreadoutlibs_tpu.ops import TPGConfig
from fdreadoutlibs_tpu.ops.chanstate import init_chanstate, seed_chanstate
from fdreadoutlibs_tpu.ops.pallas_tpg import (decode_pallas_hits, pack_adcs,
                                              pack_state, unpack_state,
                                              process_window_pallas)
from fdreadoutlibs_tpu.ops.reference import run_reference

assert jax.default_backend() == "tpu"
C, T = 384, 1024
rng = np.random.default_rng(42)
adcs = (900 + rng.normal(0, 30, size=(T, C))).astype(np.int32)
for _ in range(60):
    c, t0 = rng.integers(0, C), rng.integers(0, T - 16)
    adcs[t0:t0 + 8, c] += rng.integers(300, 3000)
# charge-floor channels: pedestal seeded on a 14-bit-max sample, then low
adcs[0, :4] = 16383
adcs[30:, :4] = 16383

for alg, thr, kw in [("AbsRS", 150, {}), ("SimpleThreshold", 150, {}),
                     ("StandardRS", 150, {}),
                     ("FIR", 5, dict(track_peaks=False))]:
    cfg = TPGConfig.from_raw(alg, threshold=thr, **kw)
    rmf = np.where(np.arange(C) % 2 == 0, 0, cfg.rs_memory_factor_x10)
    ref, ref_st = run_reference(adcs, cfg, rs_memory_factor=rmf)
    st = seed_chanstate(init_chanstate(C), adcs[0], rmf)
    slots, nclose, stack = process_window_pallas(
        jnp.asarray(pack_adcs(adcs)), pack_state(st, C), cfg,
        tc=256, k_slots=32, unroll=8, vmem_limit_mb=64)
    got, dropped = decode_pallas_hits(slots, nclose, C)
    assert dropped == 0, (alg, dropped)
    np.testing.assert_array_equal(got, ref)
    got_st = unpack_state(stack, C)
    for k in ref_st:
        if k not in got_st:
            continue
        np.testing.assert_array_equal(np.asarray(got_st[k]).ravel(),
                                      np.asarray(ref_st[k]).ravel(), err_msg=f"{alg}:{k}")
    floor_hits = int((got["charge"] == -32768).sum())
    print(f"{alg}: {len(got)} hits bit-exact, state bit-exact, "
          f"charge-floor hits: {floor_hits}")

# FIR production layout on hardware: 8-row channel blocks (nb > 1,
# default_block_sublanes) and the packed-SWAR opt-in carry
from fdreadoutlibs_tpu.ops.pallas_tpg import default_block_sublanes
C2, T2 = 1280, 512
adcs2 = (900 + rng.normal(0, 30, size=(T2, C2))).astype(np.int32)
for _ in range(150):
    c, t0 = rng.integers(0, C2), rng.integers(0, T2 - 16)
    adcs2[t0:t0 + 8, c] += rng.integers(300, 3000)
fir = TPGConfig.from_raw("FIR", threshold=5, track_peaks=False)
ref2, ref_st2 = run_reference(adcs2, fir)
st2 = seed_chanstate(init_chanstate(C2), adcs2[0], fir.rs_memory_factor_x10)
for label, sub, fp in [("blocked", default_block_sublanes(fir, C2), None),
                       ("packed", None, True)]:
    slots, nclose, stack = process_window_pallas(
        jnp.asarray(pack_adcs(adcs2)),
        pack_state(st2, C2, block_sublanes=sub), fir,
        tc=256, k_slots=16, unroll=8, vmem_limit_mb=64, fir_packed=fp)
    got2, dropped2 = decode_pallas_hits(slots, nclose, C2)
    assert dropped2 == 0, (label, dropped2)
    np.testing.assert_array_equal(got2, ref2)
    got_st2 = unpack_state(stack, C2)
    for k in ref_st2:
        if k in got_st2:
            np.testing.assert_array_equal(
                np.asarray(got_st2[k]).ravel(),
                np.asarray(ref_st2[k]).ravel(), err_msg=f"FIR-{label}:{k}")
    print(f"FIR {label} ({'sub=' + str(sub) if sub else 'whole'}): "
          f"{len(got2)} hits bit-exact, state bit-exact")
print("HW PARITY OK")

"""FIR+IQR family tests: filter design, oracle behavior, backend parity."""

import numpy as np

from fdreadoutlibs_tpu.ops import TPGConfig, Algorithm
from fdreadoutlibs_tpu.ops.fir import default_taps, firwin, firwin_int
from fdreadoutlibs_tpu.ops.reference import run_reference
from tests.test_tpg_scan import random_stream, run_scan
from tests.test_tpg_pallas import run_pallas

FIR_CFG = TPGConfig(algorithm=Algorithm.FIR, threshold=5, tap_exponent=6)


class TestFilterDesign:
    def test_firwin_normalized(self):
        taps = firwin(7, 0.1)
        assert abs(sum(taps) - 1.0) < 1e-12
        np.testing.assert_allclose(taps, taps[::-1])   # symmetric lowpass

    def test_firwin_int_production_taps(self):
        """firwin_int(7, 0.1, 64) — the taps WIB2 installs
        (WIB2FrameProcessor.cpp:93-94)."""
        taps = firwin_int(7, 0.1, 64)
        assert taps == [1, 6, 15, 20, 15, 6, 1]
        assert sum(taps) == 64

    def test_default_taps_appends_zero(self):
        taps = default_taps(FIR_CFG)
        assert len(taps) == 8 and taps[-1] == 0


class TestFIROracle:
    def test_quiet_stream_no_hits(self):
        adcs = np.full((256, 16), 900, dtype=np.int32)
        hits, st = run_reference(adcs, FIR_CFG)
        assert len(hits) == 0

    def test_pulse_found_with_dynamic_threshold(self):
        """A pulse well above the noise IQR fires; threshold is in sigma
        units so the same pulse on a noisier channel must not fire."""
        rng = np.random.default_rng(0)
        T, C = 512, 16
        quiet = (900 + rng.normal(0, 2, size=(T, C)))
        noisy = (900 + rng.normal(0, 60, size=(T, C)))
        adcs = quiet.astype(np.int32)
        adcs[:, 8:] = noisy[:, 8:].astype(np.int32)
        adcs[300:306, 2] += 150    # pulse on quiet channel
        adcs[300:306, 10] += 150   # same pulse on noisy channel
        hits, _ = run_reference(adcs, FIR_CFG)
        assert (hits["channel"] == 2).any()
        assert not (hits["channel"] == 10).any()

    def test_charge_uses_tap_exponent(self):
        """charge adds filt >> tap_exponent: a clean rectangular pulse of
        height A gives charge ~ sum(filtered)/64 ~ n_over * A."""
        adcs = np.full((512, 4), 1000, dtype=np.int32)
        adcs[200:220, 1] += 400
        hits, _ = run_reference(adcs, FIR_CFG)
        h = hits[hits["channel"] == 1]
        assert len(h) == 1
        # filtered plateau = 400 * 64 >> 6 = 400 per sample; edges ramp
        assert 0.5 * 20 * 400 < h[0]["charge"] <= 20 * 400

    def test_avx_vs_naive_threshold_semantics(self):
        """fir_avx_semantics clamps sigma and wraps the int16 product; with
        threshold=5 and small sigma both agree."""
        adcs = random_stream(256, 8, seed=3, noise=3, base=800, n_signals=6)
        avx = TPGConfig(algorithm=Algorithm.FIR, threshold=5,
                        fir_avx_semantics=True)
        naive = TPGConfig(algorithm=Algorithm.FIR, threshold=5,
                          fir_avx_semantics=False)
        ha, _ = run_reference(adcs, avx)
        hn, _ = run_reference(adcs, naive)
        np.testing.assert_array_equal(ha, hn)


class TestFIRBackendParity:
    def test_scan_matches_reference(self):
        adcs = random_stream(256, 32, seed=31, noise=4, base=900,
                             n_signals=60, )
        h_ref, st_ref = run_reference(adcs, FIR_CFG)
        h_scan, st_scan = run_scan(adcs, FIR_CFG)
        assert len(h_ref) > 0
        np.testing.assert_array_equal(h_scan, h_ref)
        np.testing.assert_array_equal(np.asarray(st_scan["fir_prev"]),
                                      st_ref["fir_prev"])
        np.testing.assert_array_equal(np.asarray(st_scan["quantile75"]),
                                      st_ref["quantile75"])

    def test_pallas_matches_reference(self):
        adcs = random_stream(128, 48, seed=33, noise=4, base=900, n_signals=60)
        h_ref, st_ref = run_reference(adcs, FIR_CFG, window=128)
        h_pal, st_pal, dropped = run_pallas(adcs, FIR_CFG, tc=32)
        assert dropped == 0
        assert len(h_ref) > 0
        np.testing.assert_array_equal(h_pal, h_ref)
        np.testing.assert_array_equal(st_pal["fir_prev"][:, :48],
                                      st_ref["fir_prev"])

    def test_window_invariance_with_fir_state(self):
        """The FIR ring buffer must carry across window boundaries."""
        adcs = random_stream(384, 8, seed=35, noise=4, base=900, n_signals=30)
        h64, _ = run_scan(adcs, FIR_CFG, window=64)
        h384, _ = run_scan(adcs, FIR_CFG, window=384)
        np.testing.assert_array_equal(h64, h384)

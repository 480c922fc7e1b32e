"""TPG algorithm configuration.

Mirrors the knobs of ``readoutlibs::readoutconfig::RawDataProcessorConf``
consumed in WIBEthFrameProcessor::conf (src/wibeth/WIBEthFrameProcessor.cpp:
173-235), pre-scaled the same way:

* ``rs_memory_factor_x10``  = 10 * tpg_rs_memory_factor   (cpp:202)
* ``rs_scale_factor_x10``   = 10 / tpg_rs_scale_factor    (cpp:206)

Semantics flags document known divergences between the reference's naive and
AVX2 kernels; the production default reproduces the *deployed* (AVX2)
behavior:

* ``peak_gated`` — naive updates hit_peak_adc only while over threshold
  (ProcessNaive.hpp:100-103); AVX2 updates it unconditionally
  (ProcessAVX2.hpp:134-136).  Default False (AVX2).
* ``rs_float`` — ProcessNaiveRS uses float R=0.8/scale=2 with round()
  (ProcessNaiveRS.hpp:26-27, 97-103); the AVX2 RS kernels use x10 integer
  fixed point with mulhrs division.  Default False (AVX2 fixed point).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum


class Algorithm(str, Enum):
    SIMPLE_THRESHOLD = "SimpleThreshold"
    ABS_RS = "AbsRS"
    STANDARD_RS = "StandardRS"
    FIR = "FIR"                     # WIB/WIB2 legacy FIR+IQR family


@dataclass(frozen=True)
class TPGConfig:
    algorithm: Algorithm = Algorithm.SIMPLE_THRESHOLD
    threshold: int = 2000                       # swtpg_wibeth::THRESHOLD default
    accumulator_limit: int = 10                 # frugal_streaming_accumulator_limit
    rs_memory_factor_x10: int = 8               # 10 * 0.8
    rs_scale_factor_x10: int = 5                # 10 / 2
    # FIR family (wib/wib2): firwin_int(7, 0.1, 2**tap_exponent) + trailing 0
    tap_exponent: int = 6
    n_taps: int = 8
    taps: tuple | None = None           # None -> firwin_int(7,0.1,mult)+(0,)
    # semantics flags (see module docstring and ops/fir.py)
    peak_gated: bool = False
    rs_float: bool = False
    fir_avx_semantics: bool = True

    @property
    def multiplier(self) -> int:
        return 1 << self.tap_exponent

    @property
    def adc_max(self) -> int:
        return 32767 // self.multiplier

    @staticmethod
    def from_raw(algorithm: str = "SimpleThreshold", threshold: int = 2000,
                 rs_memory_factor: float = 0.8, rs_scale_factor: float = 2.0,
                 frugal_streaming_accumulator_limit: int = 10, **kw) -> "TPGConfig":
        """Build from reference-style raw config values (conf() scaling)."""
        try:
            alg = Algorithm(algorithm)
        except ValueError:
            # the reference throws TPGAlgorithmInexistent
            # (WIBEthFrameProcessor.cpp:195-197)
            from ..stream.errors import TPGAlgorithmInexistent
            raise TPGAlgorithmInexistent(
                f"unknown TPG algorithm {algorithm!r} "
                f"(available: {[a.value for a in Algorithm]})") from None
        return TPGConfig(
            algorithm=alg,
            threshold=int(threshold),
            accumulator_limit=int(frugal_streaming_accumulator_limit),
            rs_memory_factor_x10=int(10 * rs_memory_factor),
            rs_scale_factor_x10=int(10 / rs_scale_factor),
            **kw,
        )

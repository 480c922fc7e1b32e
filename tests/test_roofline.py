"""Issue-budget regression tests (scripts/roofline.py op counter).

The TPG kernels are VPU-issue-bound (BENCH_NOTES "Round-2 scaling
point"), so the number of vector-ALU primitives per tick IS the
performance model: any edit that grows a family's per-tick op count
slows that family proportionally on hardware.  These tests pin the
counted issue budget the way the golden-pattern tests pin the physics —
if a change trips one, either the hot loop got cheaper (update the pin,
celebrate, re-run scripts/roofline.py on hardware) or it silently got
more expensive (reconsider, or justify in BENCH_NOTES).

The counts are jaxpr-level estimates normalized to (8, 128) int32 tiles
(see roofline.py _WEIGHTS for the cost model); they are stable across
runs but may move with a JAX upgrade that changes tracing — the
unclassified-primitive check below catches that case explicitly.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from fdreadoutlibs_tpu.ops import TPGConfig  # noqa: E402
from roofline import count_tick_ops  # noqa: E402

# family -> (config, pinned tile-issues per tick per (8,128) block)
BUDGETS = {
    "SimpleThreshold": (TPGConfig.from_raw("SimpleThreshold", threshold=150),
                        44.0),
    "AbsRS": (TPGConfig.from_raw("AbsRS", threshold=150), 69.0),
    "StandardRS": (TPGConfig.from_raw("StandardRS", threshold=150), 66.0),
    "FIR": (TPGConfig.from_raw("FIR", threshold=5, track_peaks=False), 78.0),
}


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_issue_budget_pinned(name):
    cfg, budget = BUDGETS[name]
    total, hist, unknown = count_tick_ops(cfg)
    assert not unknown, (
        f"{name}: unclassified primitives {unknown} — a JAX upgrade or "
        "tick edit introduced ops roofline.py's cost model does not know; "
        "extend _WEIGHTS deliberately")
    assert total == budget, (
        f"{name}: per-tick issue budget moved {budget} -> {total} "
        f"(histogram: {hist}).  Cheaper: update the pin and re-run "
        "scripts/roofline.py on hardware.  More expensive: this is a "
        "direct throughput regression on the issue-bound kernels.")


def test_relative_family_costs():
    """The measured GS/s ordering (Simple > StdRS >= AbsRS > FIR, every
    recorded session) must match the counted budgets' ordering — a sanity
    check that the cost model tracks reality."""
    totals = {n: count_tick_ops(cfg)[0] for n, (cfg, _) in BUDGETS.items()}
    assert totals["SimpleThreshold"] < totals["StandardRS"] <= \
        totals["AbsRS"] < totals["FIR"]

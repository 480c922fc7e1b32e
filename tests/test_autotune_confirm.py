"""The autotuner's twice-confirmed rule (scripts/autotune.py --confirm).

BENCH_NOTES discipline: one-shot sweep rankings over the remote tunnel
have flipped on re-measurement twice (round-3's FIR "winner" failed its
interleaved re-A/B), so a knob switch is only recommended when the
challenger beats the SHIPPED default in BOTH independent rotated passes.
These tests pin the decision logic with stubbed measurements (the
measurement path itself needs the real chip)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import autotune  # noqa: E402


class _Args:
    confirm = 2
    confirm_trials = 2
    channels = 2560
    ticks = 8192
    windows = 4


def _stub(ms_by_tc):
    """measure_candidates stub: per-candidate (ms, ms_passes) keyed on tc."""
    def fake(alg, cands, *a, passes=1, **kw):
        rows = []
        for c in cands:
            ms, ms_passes = ms_by_tc[c["tc"]]
            rows.append(dict(c) | {"ms": ms, "gsps": 1.0,
                                   "ms_passes": list(ms_passes)})
        return rows
    return fake


def _run(monkeypatch, ms_by_tc, ok):
    monkeypatch.setattr(autotune, "measure_candidates", _stub(ms_by_tc))
    return autotune._confirm_stage("AbsRS", ok, dict(ok[0]), _Args())


# shipped AbsRS knobs are sub=0 tc=256 unroll=32 k=1 (SHIPPED_KNOBS);
# the challenger arms below use tc=512 so they differ from shipped
_OK = [{"sub": 0, "tc": 512, "unroll": 32, "k": 1, "ms": 0.9, "gsps": 1.0}]


def test_challenger_confirmed_when_faster_in_both_passes(monkeypatch):
    w = _run(monkeypatch, {512: (0.8, [0.8, 0.8]), 256: (1.0, [1.0, 1.0])},
             _OK)
    assert w["confirmed"] is True
    assert w["tc"] == 512


def test_single_pass_win_is_not_confirmed(monkeypatch):
    # faster overall median but slower in pass 2: stay on shipped knobs
    w = _run(monkeypatch, {512: (0.85, [0.7, 1.0]), 256: (1.0, [1.0, 1.0])},
             _OK)
    assert w["confirmed"] is False
    assert (w["tc"], w["sub"]) == (256, 0)


def test_within_margin_win_is_not_confirmed(monkeypatch):
    # <2% faster in both passes: not a real win over tunnel noise
    w = _run(monkeypatch, {512: (0.99, [0.99, 0.99]),
                           256: (1.0, [1.0, 1.0])}, _OK)
    assert w["confirmed"] is False
    assert (w["tc"], w["sub"]) == (256, 0)


def test_sweep_winner_equal_to_shipped_stays_unconfirmed(monkeypatch):
    # the sweep's best IS the shipped config: nothing to switch
    ok = [{"sub": 0, "tc": 256, "unroll": 32, "k": 1, "ms": 0.9,
           "gsps": 1.0}]
    w = _run(monkeypatch, {256: (1.0, [1.0, 1.0])}, ok)
    assert w["confirmed"] is False
    assert (w["tc"], w["sub"]) == (256, 0)


def test_unmeasurable_shipped_arm_ships_shipped_knobs(monkeypatch):
    # With no shipped baseline nothing can clear the twice-confirmed bar:
    # the deployable entry must stay the shipped knobs (kernel_knobs
    # ignores the 'confirmed' marker, so returning the sweep winner here
    # would silently deploy a never-A/B'd config).  The sweep winner is
    # still attached as evidence.
    nan = float("nan")
    w = _run(monkeypatch, {512: (0.8, [0.8, 0.8]), 256: (nan, [nan, nan])},
             _OK)
    assert w["confirmed"] is False
    assert (w["tc"], w["sub"]) == (256, 0)
    assert w["sweep_winner"]["tc"] == 512

"""The driver-sweep rotation contract (round-10 hardening).

The driver verifies at most ~50 keys per round, in ``load_registry()``
order. Round 9 grew the inventory by 94 keys and every new key ranked
ahead of the stale-verdict cohort, so the 76 keys sitting on r04/r05
driver evidence lost their entire re-certification window for a round.
The fix interleaves the never-verified/touched cohort 1:1 with the
aged-verdict cohort, capping never-verified keys at ⌈n/2⌉ of any
n-key sweep prefix. These tests pin that property both synthetically
(monkeypatched verdict map) and against the real repo state.
"""

from __future__ import annotations

import pytest

from correlationapi_spark import registry
from correlationapi_spark.registry import (
    _TOUCHED,
    _latest_driver_verdict,
    load_registry,
)

SWEEP_CAP = 50  # the driver's per-round key budget


def _never_key(key: str, latest: dict[str, int]) -> bool:
    return key in _TOUCHED or key not in latest


def test_interleave_caps_never_cohort_in_every_sweep_prefix():
    latest = _latest_driver_verdict()
    order = list(load_registry())
    for n in (10, 25, SWEEP_CAP, 100):
        prefix = order[:n]
        n_never = sum(_never_key(k, latest) for k in prefix)
        # ⌈n/2⌉ cap holds for every prefix the driver could sweep —
        # unless one cohort is exhausted, in which case the other fills.
        total_never = sum(_never_key(k, latest) for k in order)
        total_aged = len(order) - total_never
        expected_cap = max((n + 1) // 2, n - total_aged)
        assert n_never <= expected_cap, (
            f"{n_never} never-verified keys in the first {n} sweep slots"
        )


def test_aged_cohort_recertifies_oldest_first():
    latest = _latest_driver_verdict()
    order = list(load_registry())
    aged_rounds = [latest[k] for k in order if not _never_key(k, latest)]
    assert aged_rounds == sorted(aged_rounds)


def test_sweep_window_drains_the_stalest_backlog():
    """The r9 verdict's done-criterion: the 50-key window must reach
    ≥20 keys of the stalest-verdict cohort (or all of it, once the
    backlog shrinks below 20)."""
    latest = _latest_driver_verdict()
    if not latest:
        pytest.skip("no CORRECTNESS_r*.json in this checkout")
    order = list(load_registry())
    aged = sorted(
        (latest[k] for k in order if not _never_key(k, latest)),
    )
    window_aged = [latest[k] for k in order[:SWEEP_CAP] if not _never_key(k, latest)]
    want = min(20, len(aged))
    stalest = set(aged[:want])
    got = sum(1 for r in window_aged if r in stalest)
    assert got >= want or len(window_aged) >= want, (
        f"only {len(window_aged)} aged keys in the 50-slot window"
    )
    # and those aged slots are filled by the stalest rounds available
    assert window_aged == aged[: len(window_aged)]


def test_interleave_synthetic(monkeypatch):
    """Synthetic verdict map: 60 never + aged keys across rounds —
    prefix cap and age order hold regardless of repo state."""
    reg = load_registry()  # ensure modules imported
    keys = list(reg)
    fake: dict[str, int] = {}
    for i, k in enumerate(keys):
        if k in _TOUCHED or i % 3 == 0:
            continue  # never-verified
        fake[k] = 4 + (i % 5)
    monkeypatch.setattr(registry, "_latest_driver_verdict", lambda: fake)
    order = list(load_registry())
    assert sorted(order) == sorted(keys)
    for n in range(1, len(order) + 1):
        n_never = sum(_never_key(k, fake) for k in order[:n])
        total_aged = sum(k in fake and k not in _TOUCHED for k in order)
        assert n_never <= max((n + 1) // 2, n - total_aged)
    aged_rounds = [fake[k] for k in order if not _never_key(k, fake)]
    assert aged_rounds == sorted(aged_rounds)

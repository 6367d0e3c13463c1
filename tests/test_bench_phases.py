"""Smoke pins for bench.py's phase-split helpers (round 13).

The phase helpers deliberately replicate the declared keys' engine
calls so the headline bench number covers only the RECURRING path
(r12 verdict item 4). That replication can drift if the engines'
signatures change — these smokes run both helpers end-to-end at the
smallest fixture so a drift breaks the suite, not the driver's
per-round bench run.
"""

from __future__ import annotations

import importlib.util
import os

from .conftest import SF_SMOKE

_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)


def _bench_module():
    spec = importlib.util.spec_from_file_location("bench", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_index_append_phases_run(spark):
    ph = _bench_module()._bench_index_append_phases(spark, SF_SMOKE)
    assert set(ph) == {"build", "append", "probe"}
    assert all(v > 0 for v in ph.values()), ph


def test_pq_stored_phases_run(spark):
    ph = _bench_module()._bench_pq_stored_phases(spark, SF_SMOKE)
    assert set(ph) == {"attach", "probe_stored", "probe_ivfpq"}
    assert all(v > 0 for v in ph.values()), ph


def test_scd2_merge_phases_run(spark):
    ph = _bench_module()._bench_scd2_merge_phases(spark, SF_SMOKE)
    assert set(ph) == {
        "build", "merge", "merge_sparse",
        "sparse_touched", "touched", "total",
    }
    assert ph["build"] > 0 and ph["merge"] > 0 and ph["merge_sparse"] > 0
    # the pruning exhibit (r13 verdict item 4): the 3-user sparse batch
    # touches at most 3 buckets, strictly fewer than the store holds
    assert 1 <= ph["sparse_touched"] <= 3
    assert ph["sparse_touched"] < ph["total"], ph

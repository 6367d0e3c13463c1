"""The declared query inventory: key -> QuerySpec.

Every operator the engine claims (SURVEY.md §2) registers itself here via
the ``@query`` decorator. ``__spark_entry__.py`` exposes this registry to
the correctness driver:

  * ``spec.fn(spark, sf_dir)``  -> DataFrame  (the Spark implementation)
  * ``spec.oracle``             -> equivalent DuckDB SQL, or None for
                                   rows-only keys (approximate / streaming /
                                   ML ops where no exact SQL oracle exists —
                                   each records *why* in ``spec.rows_only_reason``)

Determinism rules enforced by convention across all specs (SURVEY.md §4.2):
pure function of the data, every computed column aliased, multi-step float
expressions rounded on BOTH sides, ties broken by a unique key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = ""
    rows_only_reason: str | None = None
    bench: bool = False  # include in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}

_MODULES = (
    "correlationapi_spark.operators.scans",
    "correlationapi_spark.operators.filters",
    "correlationapi_spark.operators.joins",
    "correlationapi_spark.operators.aggregates",
    "correlationapi_spark.operators.windows",
    "correlationapi_spark.operators.setops",
    "correlationapi_spark.operators.functions",
    "correlationapi_spark.operators.stats",
    "correlationapi_spark.operators.rollup",
    "correlationapi_spark.operators.analytics",
    "correlationapi_spark.operators.composed",
    "correlationapi_spark.llm.dedup",
    "correlationapi_spark.llm.similarity",
    "correlationapi_spark.llm.text",
    "correlationapi_spark.llm.sampling",
    "correlationapi_spark.llm.multimodal",
    "correlationapi_spark.streaming.queries",
    "correlationapi_spark.udfs",
)

# The hand-maintained _DRIVER_GREEN set was replaced in round 5 by reading
# the driver's own CORRECTNESS_r*.json files — the per-key LATEST round
# with a usable verdict (hash-match, or the recorded rows>0 check for
# rows-only keys). Ordering keys by verdict AGE rotates the driver's
# capped 50-key sweep window across the whole inventory round-over-round
# instead of pinning ~100 keys on r01/r02-era testdata evidence forever
# (the events.ts unit regenerated between r3 and r4 — stale driver
# verdicts predate it, so freshness is real signal, not bookkeeping).
#
# _TOUCHED is RESET every round: it lists only the keys whose
# code/oracle/fixture changed THIS round after their latest verdict, so
# they jump back to the front of the sweep regardless of verdict age.
_TOUCHED: frozenset[str] = frozenset({
    # round 16 (optimization round 2): result-identical plan/protocol
    # changes — each re-verified against the oracle this round, listed
    # here so the driver's sweep re-covers them.
    "q_scd2_merge",         # one-pass re-collapse merge; bucket-
                            # clustered stage write; fused null probes
    "q_text_keyword",       # token table pinned (tokenize-once)
    "q_text_boilerplate",   # segment table pinned (segment-once)
    "q_vocab_coverage",     # frequency table pinned (tokenize-once)
    "q_sim_topk_pq",        # bounded refine runs driver-side
    "q_sim_topk_ivfpq",     # same refine path (n_probe shape)
    "q_sim_index_append",   # dup check fused into the Bloom screen
    "q_corr_matrix_gram",   # pool workers re-stamp job description
    "q_cpu_fold",           # NEW: the CPU-parallelism bench exhibit
    "q_graph_assortativity",  # edge/degree tables pinned (7×→1 eval)
    "q_basket_lift",        # basket membership + marginals pinned
    "q_embed_knn_graph",    # O(n²/2) half-pair table pinned (2×→1)
    "q_corr_bicor",         # deviation table pinned (two-pass shared)
    "q_graph_triangles",    # edge/degree/oriented tables pinned
    "q_graph_jaccard",      # edge/degree tables pinned
})


def _latest_driver_verdict() -> dict[str, int]:
    """Per-key latest driver round with a usable verdict, from the
    CORRECTNESS_r*.json files the driver writes to the repo root.

    Usable = hash_match true (oracled keys) or the driver's weaker
    rows-only record (err == 'no_oracle' with spark_rows > 0). A real
    error or a hash mismatch is NOT a verdict — the key stays unranked
    and re-enters the front of the sweep. Missing files (fresh clone,
    driver's first round) simply yield an empty map: every key then
    ranks as never-verified, which is the correct cold-start order."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for key, res in data.items():
            if not isinstance(res, dict):
                continue
            ok = res.get("hash_match") is True or (
                res.get("err") == "no_oracle"
                and (res.get("spark_rows") or 0) > 0
            )
            if ok:
                latest[key] = max(latest.get(key, 0), rnd)
    return latest




def query(
    key: str,
    oracle: str | None = None,
    doc: str = "",
    rows_only_reason: str | None = None,
    bench: bool = False,
):
    """Decorator registering a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if key in REGISTRY:
            raise ValueError(f"duplicate query key: {key}")
        if oracle is None and rows_only_reason is None:
            raise ValueError(f"{key}: rows-only keys must record a reason")
        doc_lines = (fn.__doc__ or "").strip().splitlines()
        REGISTRY[key] = QuerySpec(
            key=key,
            fn=fn,
            oracle=oracle,
            doc=doc or (doc_lines[0] if doc_lines else ""),
            rows_only_reason=rows_only_reason,
            bench=bench,
        )
        return fn

    return deco


# Verification priority of modules for keys still awaiting a driver verdict.
# The round-1 driver capped its sweep at 50 keys, so order decides which
# families convert to hard evidence first: the repaired q_agg_collect
# surface (round 1's only red row), then the correlation family (the
# product's namesake), the LLM-pipeline/streaming/UDF/composed families
# (never checked in round 1), and the relational leftovers last — they are
# the lowest-risk siblings of already-green keys.
_MODULE_PRIORITY: dict[str, int] = {
    "correlationapi_spark.operators.aggregates": 0,
    "correlationapi_spark.operators.stats": 1,
    "correlationapi_spark.llm.dedup": 2,
    "correlationapi_spark.llm.similarity": 3,
    "correlationapi_spark.llm.text": 4,
    "correlationapi_spark.llm.multimodal": 5,
    "correlationapi_spark.streaming.queries": 6,
    # udfs BEFORE sampling: the UDF family is the highest-residual-risk
    # surface (worker pickling, Arrow batches) and must not be displaced
    # from the driver's capped sweep by later low-risk additions;
    # sampling keys are pure hash/filter logic
    "correlationapi_spark.udfs": 7,
    "correlationapi_spark.llm.sampling": 8,
    # analytics is a brand-new fixture surface (funnel/retention/CDC) —
    # higher verification value than composed's standard TPC-H shapes,
    # which are low-risk siblings of green relational keys
    "correlationapi_spark.operators.analytics": 9,
    "correlationapi_spark.operators.composed": 10,
}
_PRIORITY_FLOOR = len(_MODULE_PRIORITY)


def load_registry() -> dict[str, QuerySpec]:
    """Import all operator modules (side effect: they register) and return
    the full inventory, ordered so the driver's capped 50-key sweep lands
    on the keys whose evidence is weakest/stalest. Two cohorts, each
    internally ordered, INTERLEAVED 1:1 (round-10 fix — the r9 verdict's
    rotation hardening):

    * **never/touched cohort** — keys with no usable driver verdict, or
      touched this round (oracled before rows-only — a hash-matched
      verdict is the stronger evidence — then by _MODULE_PRIORITY);
    * **aged cohort** — everything else by ASCENDING latest-verdict
      round (oldest driver evidence re-verifies first — it predates the
      most testdata regenerations), same tie-breaks within a round.

    The 1:1 interleave caps the never cohort at ⌈n/2⌉ of ANY n-key
    sweep prefix (≤25 of the driver's 50), so a burst of new keys can
    no longer displace the stalest-verdict cohort from re-certification
    for a whole round — in round 9 the inventory grew by 94 keys and
    the r04/r05 cohort (76 keys) lost its entire sweep window to them.
    Pinned by tests/test_registry_rotation.py.
    """
    for mod in _MODULES:
        importlib.import_module(mod)

    reg_index = {key: i for i, key in enumerate(REGISTRY)}
    latest = _latest_driver_verdict()

    def rank(item: tuple[str, QuerySpec]) -> tuple[int, int, int, int]:
        key, spec = item
        rnd = 0 if key in _TOUCHED else latest.get(key, 0)
        oracled = 0 if spec.oracle is not None else 1
        mod_prio = _MODULE_PRIORITY.get(spec.fn.__module__, _PRIORITY_FLOOR)
        return (rnd, oracled, mod_prio, reg_index[key])

    ranked = sorted(REGISTRY.items(), key=rank)
    never = [kv for kv in ranked if kv[0] in _TOUCHED or kv[0] not in latest]
    never_keys = {k for k, _ in never}
    aged = [kv for kv in ranked if kv[0] not in never_keys]
    out: list[tuple[str, QuerySpec]] = []
    i = j = 0
    while i < len(never) or j < len(aged):
        if i < len(never):
            out.append(never[i])
            i += 1
        if j < len(aged):
            out.append(aged[j])
            j += 1
    return dict(out)

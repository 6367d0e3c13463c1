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

# Keys with a green verdict in a prior round's driver CORRECTNESS file
# (r01: 47 hash-matches + 2 by-design rows-only; r02: 50 more; r03: the
# remaining 51 — all green, see CORRECTNESS_r0{1,2,3}.json). The driver
# consumes the registry in order and caps each sweep at 50 keys, so
# load_registry() pushes these to the END: keys still awaiting any driver
# verdict come first. Extend this set each round as the driver turns more
# keys green, and REMOVE keys whose code/oracle changed since their last
# verdict so the next sweep re-verifies them first (_ROUND4_TOUCHED below).
_DRIVER_GREEN: frozenset[str] = frozenset({
    # --- round 1 (CORRECTNESS_r01.json) ---
    "q_scan_parquet", "q_scan_pruned",
    "q_project_arith", "q_filter_cmp", "q_filter_bool", "q_filter_in",
    "q_filter_between", "q_filter_like", "q_filter_null", "q_case_when",
    "q_cast",
    "q_join_inner", "q_join_multi", "q_join_left", "q_join_full",
    "q_join_semi", "q_join_anti", "q_join_cross", "q_join_theta",
    "q_join_range", "q_join_asof", "q_join_broadcast",
    "q_agg_global", "q_agg_group", "q_agg_having", "q_agg_distinct",
    "q_agg_approx_distinct", "q_agg_rollup", "q_agg_cube", "q_agg_gsets",
    "q_agg_stats", "q_agg_percentile", "q_agg_approx_percentile",
    "q_agg_first_last",
    "q_win_rownum", "q_win_rank", "q_win_lag", "q_win_frame_rows",
    "q_win_frame_range", "q_win_firstlast", "q_topk_group",
    "q_sort_multi", "q_limit_topk",
    "q_set_union", "q_set_intersect", "q_set_except", "q_distinct",
    "q_fn_string", "q_fn_date",
    # --- round 2 (CORRECTNESS_r02.json, 50/50 green) ---
    "q_agg_collect", "q_agg_histogram", "q_agg_salted", "q_agg_weighted",
    "q_flagship", "q_agg_corr", "q_agg_covar",
    "q_corr_matrix", "q_corr_spearman", "q_corr_spearman_grouped",
    "q_corr_matrix_spearman", "q_corr_lagged", "q_corr_rolling",
    "q_corr_xcorr", "q_corr_partial", "q_ts_resample",
    "q_dedup_exact", "q_dedup_ngram", "q_contamination", "q_dedup_cluster",
    "q_dedup_embed",
    "q_sim_topk", "q_sim_pairs", "q_sim_topk_pandas",
    "q_embed_norm", "q_embed_centroid",
    "q_text_stats", "q_text_tfidf", "q_text_ngram", "q_text_sentiment",
    "q_text_langid", "q_text_quality", "q_text_fingerprint",
    "q_text_tokens_bpeish", "q_text_repetition", "q_text_perplexity",
    "q_quality_pipeline",
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_dedup", "q_stream_static_join", "q_stream_stream_join",
    "q_stream_stateful", "q_stream_corr",
    "q_udf_python", "q_udf_pandas", "q_udaf_grouped", "q_udaf_agg",
    "q_udtf_tokens",
    # --- round 3 (CORRECTNESS_r03.json, 51/51 green) ---
    "q_sample_stratified", "q_sample_fraction", "q_domain_mix",
    "q_funnel", "q_retention", "q_agg_mode", "q_anomaly", "q_profile",
    "q_session_stats", "q_cdc_merge",
    "q_tpch_q1", "q_tpch_q3", "q_tpch_q5", "q_tpch_q6", "q_tpch_q10",
    "q_pivot", "q_unpivot",
    "q_scan_csv", "q_scan_json", "q_sink_parquet_roundtrip",
    "q_subquery_scalar", "q_subquery_correlated",
    "q_join_asof_nearest", "q_join_interval",
    "q_win_time_range", "q_win_distribution", "q_win_median", "q_win_share",
    "q_fn_math", "q_fn_array", "q_fn_array_explode", "q_fn_array_hof",
    "q_fn_map", "q_fn_json", "q_fn_cond", "q_fn_hash", "q_fn_try",
    "q_fn_bitwise", "q_fn_hash_spark",
    "q_ts_rollup", "q_agg_hll_merge",
    "q_dedup_near", "q_dedup_simhash", "q_dedup_embed_lsh",
    "q_sim_topk_lsh", "q_sim_pairs_lsh", "q_split_stable",
    "q_multimodal_frames", "q_multimodal_meta",
}) - frozenset({
    # --- round 4: touched since their last green verdict — re-verify
    # first (code, oracle, output schema, or plan changed; plus one
    # representative per events-based family for the io.py µs/ns fix)
    "q_sim_topk_pandas",      # rounding moved in-plan (F.round HALF_UP)
    "q_udaf_grouped",         # same rounding fix, grouped z-scores
    "q_sort_multi",           # localCheckpoint pin in global_row_number
    "q_corr_spearman", "q_corr_spearman_grouped", "q_corr_matrix_spearman",
    "q_domain_mix",           # target share now derived in-plan (+oracle)
    "q_multimodal_meta", "q_multimodal_frames",  # width/height/decoder cols
    "q_corr_lagged", "q_stream_tumbling", "q_funnel",  # events ts-unit fix
})


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
    the full inventory, ordered so keys without a prior driver verdict come
    first (see _DRIVER_GREEN) — oracled ones before rows-only ones (a
    hash-matched verdict is the stronger evidence if the sweep is capped),
    highest-value families first (_MODULE_PRIORITY)."""
    for mod in _MODULES:
        importlib.import_module(mod)

    reg_index = {key: i for i, key in enumerate(REGISTRY)}

    def rank(item: tuple[str, QuerySpec]) -> tuple[int, int, int]:
        key, spec = item
        if key in _DRIVER_GREEN:
            tier = 2
        elif spec.oracle is not None:
            tier = 0
        else:
            tier = 1
        mod_prio = _MODULE_PRIORITY.get(spec.fn.__module__, _PRIORITY_FLOOR)
        return (tier, mod_prio, reg_index[key])

    return dict(sorted(REGISTRY.items(), key=rank))

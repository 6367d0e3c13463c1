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
    "correlationapi_spark.operators.composed",
    "correlationapi_spark.llm.dedup",
    "correlationapi_spark.llm.similarity",
    "correlationapi_spark.llm.text",
    "correlationapi_spark.llm.multimodal",
    "correlationapi_spark.streaming.queries",
    "correlationapi_spark.udfs",
)


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


def load_registry() -> dict[str, QuerySpec]:
    """Import all operator modules (side effect: they register) and return
    the full inventory."""
    for mod in _MODULES:
        importlib.import_module(mod)
    return REGISTRY

"""correlationapi_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query surface of
BigDataGrapes-EU/CorrelationAPI (correlation analysis over tabular and
time-series datasets), extended with large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Provenance note: the reference tree at /root/reference/ was verified empty
at survey time (SURVEY.md §0), so reference citations are capability-level
(SURVEY.md §2) rather than file:line. Every operator here is built directly
on the public Apache Spark 4.x DataFrame/SQL API.

Layout:
    session.py    — configured SparkSession factory
    io.py         — pinned schemas + table loading / temp-view registration
    registry.py   — the declared query inventory (key -> QuerySpec)
    operators/    — relational surface (scans, filters, joins, aggs, windows,
                    set ops, scalar functions, correlation/stats)
    llm/          — dedup, similarity, text analysis, multimodal columns
    streaming/    — structured-streaming operators + batch-equivalent forms
    udfs.py       — Python/pandas UDF + applyInPandas surface
"""

__version__ = "0.1.0"

"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

UDFs are the slow path (SURVEY.md §3 boundary cost) — nothing else in the
engine uses them; this module exists to *cover* the extension surface the
reference's users would need, with the scalable variants:

* Arrow-optimized Python UDF (row logic, Arrow batch transfer)
* pandas scalar UDF (vectorized, the 10-100× faster default)
* applyInPandas grouped-map (per-group pandas frame)
* pandas aggregate UDF (custom reduction)
* Python UDTF (table function)

Every worker-side function is defined as a closure (pickled by value) so
drivers launched from a foreign working directory can still unpickle the
task — a module-level function would be pickled by reference and require
this package importable on the worker path.

Determinism: each declared key's Python logic is reproducible in SQL, so
all five carry exact oracles except where noted.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .io import load_tables
from .registry import query


@query(
    "q_udf_python",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_parsed,
               CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket
        FROM events WHERE event_id <= 3000
    """,
    doc="Arrow-optimized scalar Python UDF (JSON props parser fallback).",
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    @F.udf(returnType=T.IntegerType(), useArrow=True)
    def parse_k(props: str) -> int | None:
        try:
            return int(json.loads(props)["k"])
        except (ValueError, KeyError, TypeError):
            return None

    k = parse_k(F.col("props"))
    return t["events"].filter(F.col("event_id") <= 3000).select(
        "event_id", k.alias("k_parsed"), (k % 10).alias("k_bucket")
    )


@query(
    "q_udf_pandas",
    oracle="""
        WITH stats AS (
            SELECT event_id, value,
                   avg(value)         OVER (PARTITION BY event_type) AS mu,
                   stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
            FROM events
        )
        SELECT event_id, round((value - mu) / NULLIF(sigma, 0), 4) AS zscore
        FROM stats
    """,
    doc="Vectorized pandas scalar UDF: z-score of value within event_type.",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # group moments come from window functions (JVM-side); the pandas UDF
    # does only the vectorized arithmetic — the right split at scale.
    # Zero-variance guard: a constant-valued group has sigma=0; the when()
    # yields NULL there (mirrored by NULLIF in the oracle) instead of the
    # pandas inf/NaN, matching the _safe_corr convention (api.py).
    t = load_tables(spark, sf_dir)

    @F.pandas_udf(T.DoubleType())
    def z(v: pd.Series, mu: pd.Series, sigma: pd.Series) -> pd.Series:
        return (v - mu) / sigma

    w = Window.partitionBy("event_type")
    ev = t["events"].withColumn("mu", F.avg("value").over(w)).withColumn(
        "sigma", F.stddev_samp("value").over(w)
    )
    return ev.select(
        "event_id",
        F.when(
            F.col("sigma") > 0, F.round(z("value", "mu", "sigma"), 4)
        ).alias("zscore"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
        WITH stats AS (
            SELECT event_id, event_type, value,
                   avg(value)         OVER (PARTITION BY event_type) AS mu,
                   stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
            FROM events
        )
        SELECT event_type, event_id,
               round((value - mu) / NULLIF(sigma, 0), 4) AS normalized
        FROM stats
    """,
    doc="Grouped-map applyInPandas: per-group normalize (pandas ddof=1 "
    "matches stddev_samp; zero-variance groups yield NULL).",
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("normalized", T.DoubleType()),
        ]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=1)
        # same zero-variance guard as q_udf_pandas / _safe_corr: emit
        # None (Arrow null), not inf/NaN, for constant groups — the
        # object-dtype Series is what makes Arrow write real nulls.
        # RAW z-scores here; rounding happens IN-PLAN below (F.round is
        # HALF_UP like the oracle; pandas .round is half-to-even — the
        # q_sim_topk_pandas rule, applied repo-wide in round 4)
        if pd.notna(sigma) and sigma > 0:
            norm = (pdf["value"] - mu) / sigma
        else:
            norm = pd.Series([None] * len(pdf), index=pdf.index, dtype=object)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "event_id": pdf["event_id"],
                "normalized": norm,
            }
        )

    return (
        t["events"]
        .groupBy("event_type")
        .applyInPandas(normalize, schema)
        .withColumn("normalized", F.round("normalized", 4))
    )


@query(
    "q_udaf_agg",
    oracle="""
        WITH q AS (
            SELECT event_type,
                   quantile_cont(value, 0.1) AS lo,
                   quantile_cont(value, 0.9) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               round(avg(e.value) FILTER (e.value >= q.lo AND e.value <= q.hi), 6)
                 AS trimmed_mean,
               count(*) AS n
        FROM events e JOIN q ON e.event_type = q.event_type
        GROUP BY e.event_type
    """,
    doc="pandas aggregate UDF: 10–90% trimmed mean (np.quantile linear "
    "interpolation == quantile_cont).",
)
def q_udaf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    @F.pandas_udf(T.DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        lo, hi = v.quantile(0.1), v.quantile(0.9)
        return round(float(v[(v >= lo) & (v <= hi)].mean()), 6)

    @F.pandas_udf(T.LongType())
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing pandas-UDAF with built-in aggregates in
        # one agg (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas
        # aggregate too.
        return len(v)

    return t["events"].groupBy("event_type").agg(
        trimmed_mean("value").alias("trimmed_mean"), n_rows("value").alias("n")
    )


@query(
    "q_sim_topk_pandas",
    oracle="""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
    scored AS (
        SELECT p.probe_id, c.vec_id AS neighbor_id,
               round(list_dot_product(p.pv, c.v)
                     / sqrt(list_dot_product(p.pv, p.pv)
                            * list_dot_product(c.v, c.v)), 6) AS cosine
        FROM probes p JOIN e c ON c.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, cosine, rn FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
    doc="Vectorized-UDF ANN scoring: numpy matmul per Arrow batch against "
    "a closure-captured probe matrix — same oracle as q_sim_topk.",
)
def q_sim_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch-scoring shape for WIDE probe sets (similarity.py note):
    instead of one zip_with/aggregate expression per (probe, row) pair,
    each Arrow batch of corpus vectors is scored against ALL probes in ONE
    BLAS matmul inside mapInPandas. The probe matrix is collected once at
    the driver (bounded: it IS the broadcast side by construction) and
    ships inside the closure. Result contract, ranking and oracle are
    identical to q_sim_topk — the exhibit proves the vectorized path gives
    the same answer the declarative path does.
    """
    import numpy as np

    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    probe_rows = e.filter(F.col("vec_id") < 5).collect()  # tiny by contract
    probe_ids = np.array([r.vec_id for r in probe_rows], dtype=np.int64)
    pm = np.array([r.v for r in probe_rows], dtype=np.float64)  # (k, dim)
    pm_unit = pm / np.linalg.norm(pm, axis=1, keepdims=True)

    out_schema = T.StructType(
        [
            T.StructField("probe_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score_batches(batches):  # closure: pickled by value with pm_unit
        for pdf in batches:
            cm = np.stack(pdf["v"].to_numpy())  # (b, dim)
            cm_unit = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            cos = cm_unit @ pm_unit.T  # (b, k) — one BLAS call per batch
            b = len(pdf)
            yield pd.DataFrame(
                {
                    "probe_id": np.tile(probe_ids, b),
                    "neighbor_id": np.repeat(pdf["vec_id"].to_numpy(), len(probe_ids)),
                    # raw cosine — rounding happens IN-PLAN below so the
                    # half-way rule matches the repo convention (F.round is
                    # HALF_UP like the DuckDB oracle; np.round is
                    # half-to-even and would diverge on exact .5e-6 ties)
                    "cosine": cos.ravel(),
                }
            )

    scored = (
        e.mapInPandas(score_batches, out_schema)
        .withColumn("cosine", F.round("cosine", 6))
        .filter(F.col("probe_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "neighbor_id", "cosine", "rn")
    )


@query(
    "q_udtf_tokens",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                      FROM documents WHERE doc_id <= 100)
        SELECT doc_id,
               unnest(range(1, len(ts) + 1)) - 1 AS pos,
               unnest(ts)                        AS token
        FROM toks
    """,
    doc="Python UDTF: text → (pos, token) rows (DuckDB aligns parallel "
    "unnests positionally, making the table function oracle-able).",
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    @F.udtf(returnType="pos: int, token: string")
    class Tokenize:
        def eval(self, text: str):  # noqa: ANN001
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    docs = t["documents"].filter(F.col("doc_id") <= 100)
    return docs.lateralJoin(Tokenize(F.col("text").outer())).select(
        "doc_id", "pos", "token"
    )


@query(
    "q_udf_arrow",
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_arrow,
               CAST(length(text) - length(replace(text, ' ', ''))
                    AS BIGINT) AS n_spaces_arrow
        FROM documents
    """,
    doc="mapInArrow UDF: per-batch pyarrow.compute kernels "
    "(utf8_length / count_substring) over raw RecordBatches — the "
    "zero-copy sibling of mapInPandas, oracled against the equivalent "
    "SQL string functions.",
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11's newest surface: mapInArrow hands the Python worker raw
    Arrow RecordBatches — no pandas materialization at all — so
    pyarrow.compute kernels (C++, SIMD) run directly on the wire
    format. The right tool when the per-batch logic is itself
    expressible as Arrow kernels (here: utf8_length + count_substring,
    chosen precisely because SQL mirrors them exactly, making this the
    registry's ORACLED arrow-UDF exhibit; real uses are codecs and
    tokenizers that have Arrow-native kernels but no SQL form).

    Scale shape: one stateless Arrow stage, no shuffle; batch size
    rides spark.sql.execution.arrow.maxRecordsPerBatch."""
    t = load_tables(spark, sf_dir)

    def make_arrow_stats():
        # closure by REQUIREMENT: cloudpickle ships it by value, workers
        # never import this package (io.py read_parquet_any note)
        import pyarrow as pa
        import pyarrow.compute as pc

        def stats(batches):
            for batch in batches:
                text = batch.column("text")
                yield pa.RecordBatch.from_arrays(
                    [
                        batch.column("doc_id"),
                        pc.cast(pc.utf8_length(text), pa.int64()),
                        pc.cast(
                            pc.count_substring(text, " "), pa.int64()
                        ),
                    ],
                    ["doc_id", "n_chars_arrow", "n_spaces_arrow"],
                )

        return stats

    return t["documents"].select("doc_id", "text").mapInArrow(
        make_arrow_stats(),
        "doc_id bigint, n_chars_arrow bigint, n_spaces_arrow bigint",
    )

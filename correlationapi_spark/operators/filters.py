"""Projections, filters, predicates, conditionals, casts (SURVEY.md §2.2).

All predicates here are expressed declaratively so Catalyst pushes them
into the parquet scan (PushedFilters) and prunes columns (ReadSchema) —
verified by the plan tests. Nothing in this module shuffles: at 100 TB
these are embarrassingly parallel scan fragments inside one
WholeStageCodegen span.

Fixture note: the tables contain no NULLs (FIXTURES.md), so null-semantics
keys manufacture them in-query with nullif — identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_tables
from ..numerics import cents
from ..registry import query


@query(
    "q_project_arith",
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT)) / 10000.0
                                                                  AS net_price,
               CAST(round(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(round(l_discount*100) AS BIGINT))
                 * (100 + CAST(round(l_tax*100) AS BIGINT)) / 1000000.0
                                                                  AS charge,
               l_quantity * 2                                     AS double_qty
        FROM lineitem
        WHERE l_orderkey <= 1000
    """,
    doc="Projection with arithmetic + aliasing.",
)
def q_project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Money products go through exact integer cents (numerics.py rule 2):
    # even per-row, round(x, 4) of a 6 dp-grid product sits exactly on
    # half-boundaries where the engines' round() semantics diverge. The
    # integer form divides once and never rounds — identical bits.
    t = load_tables(spark, sf_dir)
    ep_c = cents("l_extendedprice")
    disc_c = cents("l_discount")
    tax_c = cents("l_tax")
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            (ep_c * (100 - disc_c) / 10000.0).alias("net_price"),
            (ep_c * (100 - disc_c) * (100 + tax_c) / 1000000.0).alias("charge"),
            (F.col("l_quantity") * 2).alias("double_qty"),
        )
    )


@query(
    "q_filter_cmp",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity < 24 AND l_discount >= 0.05
          AND l_linenumber <> 1 AND l_tax <= 0.04
    """,
    doc="Comparison predicates <, >=, <>, <=.",
)
def q_filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_quantity") < 24)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_linenumber") != 1)
            & (F.col("l_tax") <= 0.04)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )


@query(
    "q_filter_bool",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'F' OR o_totalprice > 150000)
          AND NOT (o_orderpriority = '5-LOW' AND o_totalprice < 50000)
    """,
    doc="AND / OR / NOT composition.",
)
def q_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(
            ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 150000))
            & ~((F.col("o_orderpriority") == "5-LOW") & (F.col("o_totalprice") < 50000))
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    )


@query(
    "q_filter_in",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R') AND l_linenumber IN (1, 3, 5)
    """,
    doc="IN-list predicates on string and int columns.",
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            F.col("l_returnflag").isin("A", "R") & F.col("l_linenumber").isin(1, 3, 5)
        )
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    )


@query(
    "q_filter_between",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                             AND TIMESTAMP '1997-06-30 00:00:00'
          AND l_quantity BETWEEN 10 AND 20
    """,
    doc="BETWEEN on timestamp and numeric columns.",
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            F.col("l_shipdate").between(
                F.to_timestamp(F.lit("1997-01-01 00:00:00")),
                F.to_timestamp(F.lit("1997-06-30 00:00:00")),
            )
            & F.col("l_quantity").between(10, 20)
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    )


@query(
    "q_filter_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_type
        FROM part
        WHERE p_name LIKE '%bolt%' OR (p_brand LIKE 'Brand#1%' AND p_type LIKE 'PRO%')
    """,
    doc="LIKE prefix/infix patterns.",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(
            F.col("p_name").like("%bolt%")
            | (F.col("p_brand").like("Brand#1%") & F.col("p_type").like("PRO%"))
        )
        .select("p_partkey", "p_name", "p_brand", "p_type")
    )


@query(
    "q_filter_null",
    oracle="""
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P')                      AS status_or_null,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
               (nullif(o_orderstatus, 'P') IS NULL)            AS is_pending
        FROM orders
        WHERE nullif(o_orderstatus, 'O') IS NOT NULL
    """,
    doc="IS NULL / nullif / coalesce (fixtures have no NULLs — manufactured).",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        t["orders"]
        .filter(F.nullif(F.col("o_orderstatus"), F.lit("O")).isNotNull())
        .select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
            status_or_null.isNull().alias("is_pending"),
        )
    )


@query(
    "q_case_when",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity < 10 THEN 'small'
                    WHEN l_quantity < 30 THEN 'medium'
                    ELSE 'large' END AS qty_band,
               CASE l_returnflag WHEN 'A' THEN 'accepted'
                                 WHEN 'R' THEN 'returned'
                                 ELSE 'none' END AS flag_desc
        FROM lineitem
        WHERE l_orderkey <= 2000
    """,
    doc="Searched + simple CASE WHEN projection.",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("l_quantity") < 10, "small")
            .when(F.col("l_quantity") < 30, "medium")
            .otherwise("large")
            .alias("qty_band"),
            F.when(F.col("l_returnflag") == "A", "accepted")
            .when(F.col("l_returnflag") == "R", "returned")
            .otherwise("none")
            .alias("flag_desc"),
        )
    )


@query(
    "q_cast",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR)      AS key_str,
               CAST(floor(o_totalprice) AS BIGINT) AS price_int,
               CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) AS key_double,
               CAST(o_orderdate AS VARCHAR)     AS date_str,
               CAST(o_orderstatus = 'F' AS INT) AS is_final
        FROM orders
        WHERE o_orderkey <= 3000
    """,
    doc="Casts across string/int/double/timestamp/bool.",
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double→int goes through floor(): Spark CAST truncates but DuckDB
    # CAST rounds-to-nearest, so a bare cast diverges (found empirically);
    # timestamp→string renders 'YYYY-MM-DD HH:MM:SS' identically given the
    # UTC session pin.
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") <= 3000)
        .select(
            "o_orderkey",
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.floor(F.col("o_totalprice")).alias("price_int"),
            F.col("o_orderkey").cast("string").cast("double").alias("key_double"),
            F.col("o_orderdate").cast("string").alias("date_str"),
            (F.col("o_orderstatus") == "F").cast("int").alias("is_final"),
        )
    )


@query(
    "q_subquery_scalar",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice >= (SELECT max(o_totalprice) FROM orders) * 0.9
    """,
    doc="Uncorrelated scalar subquery in a predicate (threshold from a "
    "1-row aggregate, composed in-plan).",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame spelling of a scalar subquery: the 1-row aggregate
    cross-joined back (Catalyst broadcasts the 1-row side — a
    BroadcastNestedLoopJoin costing nothing), NEVER a driver-side
    .collect() of the threshold — the whole query stays one lazy plan, so
    it composes into views/streams and the optimizer sees through it.
    max() is exact (no accumulation), so the 0.9× threshold is the
    identical double on both engines."""
    t = load_tables(spark, sf_dir)
    thr = t["orders"].agg((F.max("o_totalprice") * 0.9).alias("_thr"))
    return (
        t["orders"]
        .crossJoin(thr)
        .filter(F.col("o_totalprice") >= F.col("_thr"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_subquery_correlated",
    oracle="""
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer c
        WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """,
    doc="Correlated scalar subquery (per-group max membership), "
    "decorrelated to a partitioned window.",
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A correlated subquery re-executed per row is O(n·groups) — the
    scale-correct decorrelation is a window max over the correlation key:
    one shuffle, no rescan per row (the same rewrite Catalyst's
    RewriteCorrelatedScalarSubquery performs on the SQL form). Equality
    on doubles is safe here: both sides compare the SAME parquet-read
    values, and max() picks one of them bit-unchanged. Ties (two
    customers sharing the nation max) are kept by both engines."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey")
    return (
        t["customer"]
        .withColumn("_mx", F.max("c_acctbal").over(w))
        .filter(F.col("c_acctbal") == F.col("_mx"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )

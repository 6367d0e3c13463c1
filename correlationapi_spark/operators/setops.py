"""Sorts, limits, set operations (SURVEY.md §2.6–2.7).

Sort correctness is made value-visible with row_number (the driver's
comparison is order-insensitive, so a bare ORDER BY proves nothing);
every ordering carries a unique tie-break. Global top-k compiles to
TakeOrderedAndProject — per-partition heaps + driver merge, no global
sort, which is the only top-k that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_tables
from ..ordering import global_row_number
from ..registry import query


@query(
    "q_sort_multi",
    oracle="""
        SELECT s_suppkey, s_name, nullif(s_acctbal, 0) AS bal_or_null,
               row_number() OVER (ORDER BY nullif(s_acctbal, 0) DESC NULLS LAST,
                                  s_nationkey ASC, s_suppkey ASC) AS sort_pos
        FROM supplier
    """,
    doc="Multi-key sort with NULLS LAST placement, materialized via row_number.",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global position via ordering.global_row_number — range-partitioned
    # two-pass numbering, NOT a single-partition rank window, so the same
    # shape works when the sorted relation is a 100 TB fact table.
    # Tie-break by unique s_suppkey makes the order total.
    t = load_tables(spark, sf_dir)
    bal = F.nullif(F.col("s_acctbal"), F.lit(0.0))
    base = t["supplier"].select(
        "s_suppkey", "s_name", "s_nationkey", bal.alias("bal_or_null")
    )
    order = [
        F.col("bal_or_null").desc_nulls_last(),
        F.col("s_nationkey").asc(),
        F.col("s_suppkey").asc(),
    ]
    return global_row_number(base, order, "sort_pos").select(
        "s_suppkey", "s_name", "bal_or_null", "sort_pos"
    )


@query(
    "q_limit_topk",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 5
    """,
    doc="Global top-k with offset (TakeOrderedAndProject).",
)
def q_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_limit_offset",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        ORDER BY o_orderkey
        LIMIT 20 OFFSET 40
    """,
    doc="Keyset pagination page 3: ORDER BY unique key, OFFSET 40 LIMIT 20.",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination (SURVEY §2.6's optional OFFSET fold-in, declared as its
    own key in round 5): page 3 of a 20-row listing ordered by the UNIQUE
    primary key — the unique order is what makes OFFSET deterministic
    across engines (an OFFSET over a non-unique order is allowed to
    return either of two tied rows, and would flap the oracle hash).

    Scale: Spark plans offset+limit as a single GlobalLimit(offset+k)
    over per-partition LocalLimits — executors ship at most offset+k rows
    each, the driver drops the first `offset`. Deep pagination (offset in
    the millions) would funnel offset+k rows to one point; that shape
    should use keyset (WHERE key > last_seen LIMIT k) pagination instead,
    which this key's unique-key order enables verbatim."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy("o_orderkey")
        .offset(40)
        .limit(20)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "q_set_union",
    oracle="""
        SELECT k, src FROM (
            SELECT o_custkey AS k, 'big_order' AS src
            FROM orders WHERE o_totalprice > 280000
            UNION ALL
            SELECT c_custkey AS k, 'rich' AS src
            FROM customer WHERE c_acctbal > 9000
        )
        UNION
        SELECT c_custkey AS k, 'rich' AS src
        FROM customer WHERE c_acctbal > 9500
    """,
    doc="UNION ALL + distinct UNION composition.",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = (
        t["orders"].filter(F.col("o_totalprice") > 280000)
        .select(F.col("o_custkey").alias("k"), F.lit("big_order").alias("src"))
    )
    b = (
        t["customer"].filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("k"), F.lit("rich").alias("src"))
    )
    c = (
        t["customer"].filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_custkey").alias("k"), F.lit("rich").alias("src"))
    )
    return a.unionByName(b).unionByName(c).distinct()


@query(
    "q_set_intersect",
    oracle="""
        SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
    """,
    doc="INTERSECT (distinct) of two key sets.",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    big = t["orders"].filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("k")
    )
    return urgent.intersect(big)


@query(
    "q_set_except",
    oracle="""
        SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A'
        EXCEPT ALL
        SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="EXCEPT ALL (bag difference keeps multiplicity).",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t["lineitem"].filter(F.col("l_returnflag") == "A").select(
        F.col("l_partkey").alias("k")
    )
    r = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("k")
    )
    return a.exceptAll(r)


@query(
    "q_distinct",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="DISTINCT on a projected subset (dropDuplicates over other columns "
    "is tie-nondeterministic, so only the subset is projected — SURVEY §2.7).",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["events"].select("user_id", "event_type").distinct()


@query(
    "q_unpivot",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
        FROM lineitem WHERE l_orderkey <= 500
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount', l_discount
        FROM lineitem WHERE l_orderkey <= 500
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax
        FROM lineitem WHERE l_orderkey <= 500
    """,
    doc="Unpivot/melt: wide measure columns to (key, measure, value) rows.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (the inverse of q_pivot) via the native
    unpivot operator — a Generate (Expand) node, purely map-side: each
    input row emits one row per measure with NO shuffle, so melting a
    100 TB fact table costs exactly one scan. The oracle spells it as the
    portable UNION ALL (3 scans for DuckDB; Spark's plan has one)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 500)
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_discount", "l_tax"],
            variableColumnName="measure",
            valueColumnName="value",
        )
        .withColumn("measure", F.expr("substring(measure, 3)"))  # l_quantity→quantity
    )


@query(
    "q_set_intersect_all",
    oracle="""
        SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A'
        INTERSECT ALL
        SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="INTERSECT ALL (bag intersection keeps min multiplicity) — the "
    "bag-semantics twin of q_set_intersect, completing the ANSI set-op "
    "family beside q_set_except's EXCEPT ALL.",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag semantics matter when the operand relations carry
    multiplicity that MEANS something (here: how often a part was
    returned vs accepted — min(count_A, count_R) occurrences survive).
    Spark's intersectAll plans the same partial-count + min reduction
    a hand-written groupBy/least/sequence-explode would, in one
    operator; both engines implement the identical ANSI definition so
    the bag cardinalities hash-match row-for-row."""
    t = load_tables(spark, sf_dir)
    a = t["lineitem"].filter(F.col("l_returnflag") == "A").select(
        F.col("l_partkey").alias("k")
    )
    r = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("k")
    )
    return a.intersectAll(r)

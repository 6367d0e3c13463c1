"""Composed user-level queries: TPC-H-shaped analytics + pivot.

These are the multi-operator queries a user of the reference would
actually run end-to-end (scan→join→filter→agg→sort→limit), adapted to the
fixture schema (FIXTURES.md — it carries no o_shippriority/l_commitdate,
so the classic shapes are expressed over the columns that exist). They
double as integration exhibits: each one exercises several §2 families in
one oracle-checked plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_tables
from ..numerics import cents, exact_money_sum, oracle_revenue_sum, revenue_cents
from ..ordering import materialize
from ..registry import query


@query(
    "q_tpch_q3",
    oracle=f"""
        SELECT l.l_orderkey,
               {oracle_revenue_sum("l.l_extendedprice", "l.l_discount")} AS revenue,
               o.o_orderdate,
               o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: unshipped-order revenue for one segment, top 10.",
    bench=True,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-k on the exact-cents revenue: the sort key is bit-identical
    # across engines, so the LIMIT frontier can't disagree; l_orderkey
    # tie-breaks equal revenues.
    t = load_tables(spark, sf_dir)
    cutoff = F.to_timestamp(F.lit("1998-03-15 00:00:00"))
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_money_sum(revenue_cents(), 10000.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle=f"""
        SELECT n.n_name AS nation_name,
               {oracle_revenue_sum("l.l_extendedprice", "l.l_discount")} AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
    """,
    doc="TPC-H Q5 shape: local-supplier revenue per nation in one region.",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(exact_money_sum(revenue_cents(), 10000.0).alias("revenue"))
    )


@query(
    "q_tpch_q10",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
               {oracle_revenue_sum("l.l_extendedprice", "l.l_discount")} AS revenue,
               round(c.c_acctbal, 2) AS acctbal
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY 1, 2, 3, 5
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20.",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01 00:00:00")))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation_name"),
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .agg(exact_money_sum(revenue_cents(), 10000.0).alias("revenue"))
        .select("c_custkey", "c_name", "nation_name", "revenue", "acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q_pivot",
    oracle="""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
               count(*) FILTER (l_linestatus = 'F') AS n_f,
               count(*) FILTER (l_linestatus = 'O') AS n_o
        FROM lineitem GROUP BY 1
    """,
    doc="Pivot: linestatus columns per returnflag (explicit value list).",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot with an EXPLICIT value list — at scale an unlisted pivot forces
    # an extra distinct-values job and an unbounded column count.
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),  # count(*) is rejected inside pivot
        )
        .select(
            "l_returnflag",
            F.col("F_qty").alias("qty_f"),
            F.col("O_qty").alias("qty_o"),
            # absent combos: Spark pivot yields NULL counts, the oracle's
            # count FILTER yields 0 — coalesce aligns them (sum stays
            # NULL/NULL on both sides)
            F.coalesce("F_n", F.lit(0)).alias("n_f"),
            F.coalesce("O_n", F.lit(0)).alias("n_o"),
        )
    )


@query(
    "q_tpch_q1",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT)))
                    AS DOUBLE) / 10000.0      AS sum_disc_price,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT))
                        * (100 + CAST(round(l_tax*100) AS BIGINT)))
                    AS DOUBLE) / 1000000.0    AS sum_charge,
               round(avg(l_quantity), 6)      AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6)      AS avg_disc,
               count(*)                       AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2
    """,
    doc="TPC-H Q1 shape: pricing summary report per returnflag/linestatus.",
    bench=True,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical scan-heavy aggregate: one pass over the fact table,
    eight aggregates, a handful of groups. The plan is a 6-column pruned
    scan with the shipdate filter pushed to parquet, partial aggregation
    inside the scan stage (map-side combine collapses 6M rows to
    4 groups × 32 tasks), one exchange of ~128 rows. At 100 TB this query
    is scan-bandwidth-bound — exactly what it should be.

    sum_charge multiplies THREE 2 dp columns: the 1e-6 product grid sits
    on round()'s half-boundaries, so the sum runs in exact integer
    1e-6-dollar units through decimal(38,0) (numerics.py rule 2 extended
    one factor) and divides once at the end — bit-identical without any
    rounding call.
    """
    t = load_tables(spark, sf_dir)
    disc_units = revenue_cents()  # cents(price) * (100 - cents(discount))
    charge_units = disc_units * (100 + cents("l_tax"))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            exact_money_sum(disc_units, 10000.0).alias("sum_disc_price"),
            exact_money_sum(charge_units, 1000000.0).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_tpch_q6",
    oracle="""
        SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * CAST(round(l_discount*100) AS BIGINT))
                    AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: forecast revenue change — pure scan/filter/agg.",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero joins, zero groups, three pushable predicates, one global sum
    — the purest scan-throughput probe in the suite. All three filters
    reach the parquet reader (min/max row-group skipping does the work at
    scale); the aggregate is a partial/final pair over one double. The
    BETWEEN bounds compare against the raw 2 dp doubles (0.05/0.07 are
    exactly representable at the comparison precision both engines read
    from parquet — same bits, same rows); revenue itself uses exact cents
    units (numerics.py rule 2: price×discount products sit on rounding
    half-boundaries)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact_money_sum(cents("l_extendedprice") * cents("l_discount"), 10000.0)
            .alias("revenue")
        )
    )


@query(
    "q_tpch_q4",
    oracle="""
        SELECT o.o_orderpriority,
               count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: order-priority checking — EXISTS semi-join of a "
    "quarter's orders against late-shipped lineitems, counted per "
    "priority (adapted: the fixture carries no l_commitdate, so 'late' "
    "is l_shipdate > o_orderdate).",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelates to a LEFT SEMI join on the order key with the
    non-equi lateness predicate folded into the join condition — one
    shuffle pair on l_orderkey/o_orderkey, then a near-free aggregate
    over five priority groups (partial agg collapses each partition to
    ≤5 rows before the exchange). At 100 TB the semi join is the plan:
    it carries NO lineitem payload columns (the probe side is pruned to
    l_orderkey + l_shipdate at the scan), never materializes matches
    beyond the first, and the quarter filter on orders prunes the build
    side before the shuffle. count(*) stays bigint on both engines."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-07-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-10-01 00:00:00")))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q14",
    oracle="""
        SELECT round(
                 100.0
                 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST(round(l.l_extendedprice*100) AS BIGINT)
                                      * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                                 ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                        AS DOUBLE),
                 6) AS promo_revenue_pct
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promotion revenue share for one month — "
    "conditional-aggregate ratio over a part join (adapted: fixture "
    "p_type is a plain category, PROMO literal match).",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic conditional-sum ratio. Both sums run in exact integer
    1e-4-dollar units through decimal(38,0) (numerics.py rule 2 — the
    price×discount grid sits on round()'s half-boundaries), are cast to
    double from the SAME exact integer on both engines, and divide once;
    6 dp rounding covers the one IEEE division. The part join broadcasts
    at fixture scale and hash-joins on p_partkey at 100 TB, with the
    one-month shipdate filter pushed to the lineitem scan — the pruned
    probe side carries only partkey + the two money columns."""
    t = load_tables(spark, sf_dir)
    units = revenue_cents()
    promo_units = F.when(F.col("p_type") == "PROMO", units).otherwise(F.lit(0))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01 00:00:00")))
        )
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo_units.cast("decimal(38,0)")).cast("double")
                / F.sum(units.cast("decimal(38,0)")).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
        SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty
        FROM customer c
        JOIN orders o   ON o.o_custkey  = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
        )
        GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    doc="TPC-H Q18 shape: large-volume customers — orders whose total "
    "quantity exceeds 300, with customer detail, top 20 by price.",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IN-subquery is a pre-aggregated qualifying-key set: lineitem
    aggregates ONCE per order key (the same shuffle the outer sum needs),
    the >300 filter shrinks it to a handful of keys, and that tiny set
    broadcasts into a semi join — no second full lineitem pass, no
    re-aggregation of unqualified orders at 100 TB (46 keys at sf0.01;
    selectivity ~1e-3 of orders holds at any SF, so the broadcast is
    safe by construction). Quantities are integer-valued (1..50): both
    engines sum them as exact integers, and the oracle CASTs the sum
    back to BIGINT so DuckDB's HUGEINT widening never reaches the
    projection (numerics.py rule 4). o_totalprice is a raw stored
    double — identical bits on both engines — so the top-20 frontier
    can't disagree; o_orderkey tie-breaks."""
    t = load_tables(spark, sf_dir)
    # round-to-nearest THEN cast, on BOTH engines (ADVICE r07): the
    # oracle says CAST(round(l_quantity) AS BIGINT) so DuckDB rounds
    # half-away-from-zero exactly like F.round — semantics pinned even
    # on exact .5 quantities, not just integer-valued fixtures
    qty = F.round(F.col("l_quantity"), 0).cast("bigint")
    qualifying = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_q"))
        .filter(F.col("_q") > 300)
        .select(F.col("l_orderkey").alias("_qual_key"))
    )
    return (
        t["orders"]
        .join(
            F.broadcast(qualifying),
            F.col("o_orderkey") == F.col("_qual_key"),
            "left_semi",
        )
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q_tpch_q7",
    oracle=f"""
        SELECT ns.n_name AS supp_nation,
               nc.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               {oracle_revenue_sum("l.l_extendedprice", "l.l_discount")} AS revenue
        FROM lineitem l
        JOIN orders o    ON o.o_orderkey = l.l_orderkey
        JOIN customer c  ON c.c_custkey  = o.o_custkey
        JOIN supplier s  ON s.s_suppkey  = l.l_suppkey
        JOIN nation ns   ON ns.n_nationkey = s.s_nationkey
        JOIN nation nc   ON nc.n_nationkey = c.c_nationkey
        WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
            OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: volume shipping between two nations per year — "
    "the nation dimension plays BOTH roles (supplier side and customer "
    "side) in one plan.",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-playing dimensions: nation joins twice under different
    aliases — the aliasing must keep the two broadcast joins distinct
    (a naive reuse would collapse them). The symmetric nation-pair OR
    filter is applied AFTER both nation joins, where it prunes to the
    two ordered pairs; all four dimension joins broadcast (nation 25
    rows, supplier/customer fixture-small; at 100 TB supplier/customer
    become shuffle joins via AQE while the two nation broadcasts stay).
    Revenue uses exact cents (numerics.py rule 2); year() agrees across
    engines on the parquet-stored timestamp."""
    t = load_tables(spark, sf_dir)
    ns = t["nation"].select(
        F.col("n_nationkey").alias("_ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = t["nation"].select(
        F.col("n_nationkey").alias("_nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("_ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("_nc_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(exact_money_sum(revenue_cents(), 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q15",
    oracle=f"""
        WITH rev AS (
            SELECT l.l_suppkey AS suppkey,
                   {oracle_revenue_sum("l.l_extendedprice", "l.l_discount")} AS total_revenue
            FROM lineitem l
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l.l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN rev r ON r.suppkey = s.s_suppkey
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: top supplier(s) by a quarter's revenue — "
    "a reused aggregate (the classic CREATE VIEW) consumed twice: once "
    "for the max, once for the equality probe.",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue aggregate is one logical subtree consumed twice (the
    max side and the row probe). Left alone, Spark RECOMPUTES it — two
    full lineitem scans, no ReusedExchange even under AQE, because the
    two consumers aggregate differently above the exchange — which is
    exactly what the original Q15's CREATE VIEW exists to avoid. Round
    8: ``rev`` is pinned with ordering.materialize() (lazy
    localCheckpoint), so both consumers read the same ~#suppliers-row
    RDD and lineitem is scanned ONCE (plan canary:
    tests/test_plans.py::test_q15_materialized_scans_lineitem_once;
    measured bytes-read evidence in SCALING.md "Materialized reuse").
    The equality probe on revenue is
    safe ONLY because revenue is exact-cents arithmetic (numerics.py
    rule 2): bit-identical on both engines, so 'equals the max' selects
    the same supplier set — with a float sum this query would be
    nondeterministic at the boundary. s_suppkey orders the (rare)
    ties."""
    t = load_tables(spark, sf_dir)
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(exact_money_sum(revenue_cents(), 10000.0).alias("total_revenue"))
    )
    rev = materialize(rev)
    best = rev.agg(F.max("total_revenue").alias("_best"))
    return (
        rev.join(F.broadcast(best), F.col("total_revenue") == F.col("_best"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q19",
    oracle="""
        SELECT CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                    AS DOUBLE) / 10000.0 AS revenue,
               count(*) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
               AND l.l_quantity BETWEEN 10 AND 35)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
               AND l.l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 shape: disjunctive brand/size/quantity predicates "
    "across the part join — the OR-of-ANDs pushdown exhibit.",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across two tables: Catalyst cannot push the whole
    disjunction to either scan, but it DOES derive and push the
    single-table residuals (the brand/size envelope to part, the
    quantity envelope to lineitem) before the join — the optimization
    this key exists to pin. Revenue in exact cents; count stays bigint
    on both engines."""
    t = load_tables(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            exact_money_sum(revenue_cents(), 10000.0).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_tpch_q8",
    oracle="""
        WITH vol AS (
            SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(round(l.l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount*100) AS BIGINT)) AS units,
                   ns.n_name AS supp_nation
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey  = o.o_custkey
            JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
            JOIN region r   ON r.r_regionkey  = nc.n_regionkey
            JOIN supplier s ON s.s_suppkey  = l.l_suppkey
            JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
            JOIN part p     ON p.p_partkey  = l.l_partkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        )
        SELECT o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                                   THEN units ELSE 0 END) AS DOUBLE)
                     / CAST(sum(units) AS DOUBLE), 6) AS mkt_share
        FROM vol
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's market share of a region's "
    "part-type volume per year — the deepest star join in the suite "
    "(7 tables, nation role-played twice) feeding a conditional ratio.",
    bench=True,
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven-table star with nation joined twice (customer side routes
    through region for the market filter, supplier side labels the
    share numerator). All five dimension joins broadcast at fixture
    scale; at 100 TB customer/supplier flip to shuffle joins under AQE
    while region/nation stay broadcast, and the part-type filter prunes
    the probe before the first shuffle. The share is a conditional
    ratio of exact integer 1e-4-dollar units summed through
    decimal(38,0) on the Spark side and HUGEINT in DuckDB — both exact,
    both cast to double from the same integers, one division, 6 dp
    (numerics.py rules 2+3)."""
    t = load_tables(spark, sf_dir)
    nc = t["nation"].select(
        F.col("n_nationkey").alias("_nc_key"),
        F.col("n_regionkey").alias("_nc_region"),
    )
    ns = t["nation"].select(
        F.col("n_nationkey").alias("_ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    units = revenue_cents()
    vol = (
        t["lineitem"]
        # the ~6x-selective part-type broadcast prunes the probe BEFORE
        # any shuffle (review r07: Catalyst does not reorder joins
        # without CBO stats, so source order IS the plan order — joining
        # part last pushed the full lineitem through every shuffle)
        .join(
            F.broadcast(t["part"].filter(F.col("p_type") == "STANDARD")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("_nc_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("_nc_region"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("_ns_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            units.alias("units"),
            "supp_nation",
        )
    )
    nation_units = F.when(F.col("supp_nation") == "NATION_5", F.col("units")).otherwise(
        F.lit(0)
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(nation_units.cast("decimal(38,0)")).cast("double")
                / F.sum(F.col("units").cast("decimal(38,0)")).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q13",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey,
                   CAST(count(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey
        )
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: customer distribution by order count — the "
    "double-aggregate (count per entity, then histogram of the counts), "
    "zero-order customers included via the outer join.",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical double-aggregate: the first groupBy shuffles on the
    entity key (orders' o_custkey — customers with no orders survive the
    LEFT join with count 0, the point of the shape), the second shuffles
    the ~|distinct counts| intermediate, which is tiny at any scale. At
    100 TB the first aggregate is the whole cost and it is one
    partial/final pass; count(o_orderkey) counts only matched rows, so
    no-order customers land in the c_count=0 bucket identically on both
    engines."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q_tpch_q22",
    oracle="""
        WITH cents AS (
            SELECT c_custkey, c_nationkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer
        ), pos AS (
            SELECT CAST(sum(bal_cents) AS DOUBLE) AS total,
                   CAST(count(*) AS DOUBLE) AS n
            FROM cents WHERE bal_cents > 0
        )
        SELECT c.c_nationkey,
               CAST(count(*) AS BIGINT) AS numcust,
               round(sum(CAST(c.bal_cents AS DOUBLE)) / 100.0, 2) AS totacctbal
        FROM cents c, pos
        WHERE c.bal_cents * pos.n > pos.total
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >=
                                TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: RECENTLY-INACTIVE customers (no order since "
    "1999) with above-average balance, per nation (adapted: nation key "
    "stands in for the phone country code; every fixture customer has "
    "ordered at least once, so strict never-ordered is vacuous) — "
    "scalar-average threshold + anti join, with the average comparison "
    "done in EXACT integer cents.",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic 'above the average' filter is a float trap: avg() is
    a sum whose accumulation order differs across engines, so a balance
    equal to the average within 1 ulp could flip membership. The
    comparison here is restated in exact integers —
    bal_cents * n_positive > total_positive_cents — algebraically
    identical to bal > avg and bit-identical on both engines AT ANY
    SCALE WHERE THE PRODUCT STAYS BELOW 2^53 (bal_cents ≤ ~1e7 cents
    leaves room for ~1e9 customers; review r07: beyond that the double
    product itself rounds, and the comparison would need decimal
    arithmetic on both sides — recorded here rather than overclaimed).
    _total sums through decimal(38,0) per numerics.py's scale-safe-sum
    rule before the one exact-below-2^53 cast to double. The
    1-row (total, n) aggregate broadcasts into the scan filter, the
    anti join on date-filtered orders removes recently-active
    customers (the date predicate pushes to the orders scan), and the
    per-nation aggregate is partial/final. At 100 TB: one orders
    shuffle (anti join), one customer scan, nothing else."""
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(
        "c_custkey", "c_nationkey", cents("c_acctbal").alias("bal_cents")
    )
    pos = cust.filter(F.col("bal_cents") > 0).agg(
        F.sum(F.col("bal_cents").cast("decimal(38,0)"))
        .cast("double")
        .alias("_total"),
        F.count("*").cast("double").alias("_n"),
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("_n") > F.col("_total"))
        .join(
            t["orders"]
            .filter(
                F.col("o_orderdate")
                >= F.to_timestamp(F.lit("1999-01-01 00:00:00"))
            )
            .select("o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(
                F.sum(F.col("bal_cents").cast("double")) / 100.0, 2
            ).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_tpch_q17",
    oracle="""
        WITH pq AS (
            SELECT l_partkey,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            GROUP BY l_partkey
        )
        SELECT round(CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))
                          AS DOUBLE) / 100.0 / 7.0, 6) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_small
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pq    ON pq.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND CAST(round(l.l_quantity) AS BIGINT) * 5 * pq.n < pq.s
    """,
    doc="TPC-H Q17 shape: small-quantity-order revenue for one brand — "
    "the correlated per-part average threshold restated in exact "
    "integers (qty * 5 * n < sum_qty, i.e. qty < 0.2 * avg) so "
    "membership never flips on float division.",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated scalar subquery (avg quantity PER PART) decorrelates
    to a per-part aggregate joined back on the part key — one extra
    aggregate over the same shuffle key the main join already uses, the
    standard Spark decorrelation. The 0.2*avg threshold is the same
    float trap as Q22's: quantities are integer-valued, so
    qty < 0.2 * (s/n)  ⟺  qty * 5 * n < s  in EXACT int64 arithmetic —
    identical membership on both engines, no division anywhere near the
    filter. Revenue sums exact cents (order-independent integer sums);
    the one /100/7 division and the 6 dp round happen once, on both
    engines, from the same exact integer.

    Scale note (round 8): the decorrelated per-part aggregate is PRUNED
    by a broadcast left-semi join against the Brand#3 partkey set BEFORE
    the groupBy. The per-part average depends only on that part's own
    rows, and only Brand#3 parts are ever probed downstream, so grouping
    the other ~2/3 of lineitem is pure waste — at 100 TB it is a
    full-table aggregate feeding a filter that discards most of it. With
    the semi-join below the aggregate, both lineitem branches are
    brand-pruned before their first shuffle (plan canary:
    tests/test_plans.py::test_q17_semi_join_below_aggregate)."""
    t = load_tables(spark, sf_dir)
    qty = F.round(F.col("l_quantity"), 0).cast("bigint")  # see q18 note
    brand_keys = t["part"].filter(F.col("p_brand") == "Brand#3").select(
        "p_partkey"
    )
    pq = (
        t["lineitem"]
        .join(
            F.broadcast(brand_keys),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("_pk"))
        .agg(F.sum(qty).alias("_s"), F.count("*").alias("_n"))
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_brand") == "Brand#3")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(pq, F.col("_pk") == F.col("l_partkey"))
        .filter(qty * 5 * F.col("_n") < F.col("_s"))
        .agg(
            F.round(
                F.sum(cents("l_extendedprice").cast("decimal(38,0)"))
                .cast("double")
                / 100.0
                / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# Round 8: the seven classic TPC-H shapes previously blocked on missing
# fixture columns (partsupp / l_commitdate / l_shipmode / p_container /
# s_comment), adapted per the Q4/Q7 recipe — role-play the missing column
# with one that exists, keep the SHAPE (the joins, the correlation
# structure, the decorrelation strategy) intact. Role-plays used:
#   partsupp           -> derived from lineitem: the distinct
#                         (l_partkey, l_suppkey) pairs, with
#                         ps_supplycost := min observed price (exact cents)
#                         and ps_availqty := shipped-quantity aggregates
#   l_commitdate lag   -> l_shipdate vs o_orderdate + INTERVAL (shipping
#                         delay role-plays the commit/receipt wait)
#   l_shipmode         -> l_returnflag (small categorical domain)
#   supplier complaints-> s_acctbal < 0
#   ps_supplycost (Q9) -> p_retailprice (a real per-part cost column)
# Every quantity/price aggregate follows numerics.py rules (exact integer
# cents / round-then-cast quantities); every fractional threshold is
# restated as an exact integer cross-multiplication so membership can't
# flip on float division (the Q17/Q22 trick).
# ---------------------------------------------------------------------------


@query(
    "q_tpch_q2",
    oracle="""
        WITH eur_supp AS (
            SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
        ),
        ps AS (
            SELECT l.l_partkey, l.l_suppkey,
                   min(CAST(round(l.l_extendedprice*100) AS BIGINT))
                       AS cost_cents
            FROM lineitem l
            GROUP BY l.l_partkey, l.l_suppkey
        )
        SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
               CAST(ps.cost_cents AS DOUBLE) / 100.0 AS supplycost
        FROM part p
        JOIN ps ON ps.l_partkey = p.p_partkey
        JOIN eur_supp s ON s.s_suppkey = ps.l_suppkey
        WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
          AND ps.cost_cents = (
              SELECT min(ps2.cost_cents)
              FROM ps ps2
              JOIN eur_supp s2 ON s2.s_suppkey = ps2.l_suppkey
              WHERE ps2.l_partkey = p.p_partkey
          )
        ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
        LIMIT 100
    """,
    doc="TPC-H Q2 shape: minimum-cost supplier per qualifying part in "
    "one region — the correlated-min subquery over a derived "
    "part-supplier cost relation.",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic Q2: for small STANDARD parts, the EUROPE supplier(s)
    whose (derived) supply cost equals the per-part minimum. partsupp is
    role-played by lineitem's distinct (partkey, suppkey) pairs with
    cost := min observed extendedprice in EXACT cents (int64 min — no
    float compare anywhere, so the equality probe is engine-stable).

    Scale shape: the correlated min decorrelates to a per-part min over
    the SAME derived ps relation — which is computed ONCE
    (ordering.materialize, the Q15 primitive) and consumed by both the
    probe and the min side. ps itself is pruned before its one shuffle:
    a broadcast semi-join keeps only EUROPE suppliers' rows (~20% —
    both consumers restrict to the region, so the prune is lossless,
    same argument as Q17's brand prune) and only qualifying partkeys
    reach the min via the broadcast part dimension. region/nation/
    supplier/part are all broadcast dims; lineitem shuffles once on
    (partkey, suppkey)."""
    t = load_tables(spark, sf_dir)
    eur_supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(
                        t["region"].filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = materialize(
        t["lineitem"]
        .join(
            F.broadcast(eur_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(cents("l_extendedprice")).alias("cost_cents"))
    )
    min_cost = ps.groupBy(F.col("l_partkey").alias("_mk")).agg(
        F.min("cost_cents").alias("_min_cost")
    )
    qual_part = t["part"].filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD")
    )
    return (
        ps.join(
            F.broadcast(min_cost),
            (F.col("_mk") == F.col("l_partkey"))
            & (F.col("cost_cents") == F.col("_min_cost")),
        )
        .join(
            F.broadcast(qual_part.select("p_partkey", "p_name")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(eur_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            (F.col("cost_cents").cast("double") / 100.0).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_tpch_q9",
    oracle="""
        SELECT n.n_name AS nation_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                        - CAST(round(p.p_retailprice*100) AS BIGINT)
                          * CAST(round(l.l_quantity) AS BIGINT) * 100)
                    AS DOUBLE) / 10000.0 AS sum_profit
        FROM lineitem l
        JOIN part p     ON p.p_partkey  = l.l_partkey
        JOIN supplier s ON s.s_suppkey  = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY 1, 2 DESC
    """,
    doc="TPC-H Q9 shape: product-line profit by supplier nation and "
    "order year — p_retailprice role-plays ps_supplycost.",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Q9 with the fixture's own per-part cost column
    (p_retailprice) standing in for ps_supplycost: profit =
    revenue − unit_cost × qty, all in EXACT 1e-4 dollar units
    (revenue_cents is already 1e-4; retail cents × qty × 100 matches
    the scale), summed through decimal(38,0) and divided once — the
    order-independent integer-sum discipline that makes a grouped
    profit sum bit-identical across engines.

    Scale shape: the ~12%-selective p_name filter broadcasts and prunes
    lineitem FIRST (the Q8 lesson — the selective dim join sits below
    every shuffle); supplier and nation broadcast; the one real shuffle
    is the orderkey join against orders, carrying only pruned rows.
    Aggregation is by (nation, year) — 25 × ~7 groups, map-side
    partials collapse everything."""
    t = load_tables(spark, sf_dir)
    qty = F.round(F.col("l_quantity"), 0).cast("bigint")
    profit_units = revenue_cents() - (
        cents("p_retailprice") * qty * F.lit(100)
    )
    return (
        t["lineitem"]
        .join(
            F.broadcast(
                t["part"]
                .filter(F.col("p_name").like("%red%"))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (
                F.sum(profit_units.cast("decimal(38,0)")).cast("double")
                / 10000.0
            ).alias("sum_profit")
        )
        .orderBy("nation_name", F.desc("o_year"))
    )


@query(
    "q_tpch_q11",
    oracle="""
        WITH pv AS (
            SELECT l.l_partkey,
                   sum(CAST(round(l.l_extendedprice*100) AS BIGINT))
                       AS value_cents
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            JOIN region r   ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'ASIA'
            GROUP BY l.l_partkey
        ),
        tot AS (
            SELECT CAST(sum(value_cents) AS DECIMAL(38,0)) AS total_cents,
                   CAST(count(*) AS BIGINT) AS n_parts
            FROM pv
        )
        SELECT pv.l_partkey AS partkey,
               CAST(CAST(pv.value_cents AS DOUBLE) / 100.0 AS DOUBLE)
                   AS part_value
        FROM pv, tot
        WHERE CAST(pv.value_cents AS DECIMAL(38,0)) * tot.n_parts
              > 2 * tot.total_cents
        ORDER BY pv.value_cents DESC, pv.l_partkey
    """,
    doc="TPC-H Q11 shape: important-stock parts — per-part value above "
    "2x the mean, threshold as exact integer cross-multiplication.",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Q11's group-vs-global-fraction HAVING, with the fraction
    restated scale-free: a part qualifies when value × n_parts >
    2 × total — i.e. above twice the MEAN part value — so the predicate
    is one exact integer cross-multiplication (no float division, no
    SF-dependent magic fraction: TPC-H's 0.0001/SF exists precisely
    because an absolute fraction breaks under scale-up; the mean-relative
    form survives any SF).

    Scale shape: ASIA suppliers broadcast-semi-prune lineitem before its
    single partkey shuffle; the per-part value table (~#parts rows) is
    materialized ONCE (the Q15 primitive) and consumed by both the
    global total and the probe — no second lineitem pass. The 1-row
    total broadcasts via crossJoin (the Q22 pattern)."""
    t = load_tables(spark, sf_dir)
    asia_supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    pv = materialize(
        t["lineitem"]
        .join(
            F.broadcast(asia_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("value_cents"))
    )
    tot = pv.agg(
        F.sum(F.col("value_cents").cast("decimal(38,0)")).alias("_total"),
        F.count("*").alias("_n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_cents").cast("decimal(38,0)") * F.col("_n_parts")
            > F.lit(2) * F.col("_total")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("value_cents").cast("double") / 100.0).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


@query(
    "q_tpch_q12",
    oracle="""
        SELECT l.l_returnflag,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag IN ('A', 'R')
          AND l.l_shipdate >  o.o_orderdate + INTERVAL 90 DAY
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
        ORDER BY 1
    """,
    doc="TPC-H Q12 shape: late-shipment priority split by category — "
    "l_returnflag role-plays l_shipmode, ship lag role-plays the "
    "commit/receipt wait.",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Q12's CASE-count split (critical vs non-critical order
    priority) per shipping category, over 'late' lines — lateness
    role-played as shipdate more than 90 days after the order date
    (exact timestamp arithmetic, identical on both engines).

    Scale shape: the returnflag + shipdate-year predicates are pushed
    to the parquet scan (row-group skipping on a date-sorted layout);
    the lag predicate needs o_orderdate, so it applies at the one
    orderkey shuffle join. Two-value group-by: map-side partials
    collapse to 2 rows."""
    t = load_tables(spark, sf_dir)
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .filter(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
        )
        .join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~crit, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_tpch_q16",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#5'
          AND p.p_type  <> 'PROMO'
          AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 25)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: supplier count per part attribute triple, "
    "excluding flagged suppliers — s_acctbal < 0 role-plays the "
    "complaints predicate, lineitem pairs role-play partsupp.",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Q16: how many distinct suppliers can deliver each
    qualifying (brand, type, size) combination, excluding suppliers
    with complaints (role-played by a negative account balance — the
    fixture carries no s_comment). The part-supplier relation is
    lineitem's distinct pairs, deduped inside count(DISTINCT).

    Scale shape: qualifying parts (~13% after the three attribute
    predicates) broadcast and prune lineitem FIRST; the flagged-supplier
    NOT IN is a broadcast anti-join (the set is tiny and NULL-free —
    s_suppkey is a key). One shuffle: the (brand,type,size) aggregate
    with distinct-supplier expansion — bounded by #parts × #suppliers
    pairs, far below line count."""
    t = load_tables(spark, sf_dir)
    qual_part = t["part"].filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 25)
    )
    flagged = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(flagged),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(qual_part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q20",
    oracle="""
        WITH avail AS (
            SELECT l_partkey, l_suppkey,
                   sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                             AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                            THEN CAST(round(l_quantity) AS BIGINT)
                            ELSE 0 END) AS qty_win,
                   sum(CASE WHEN l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                             OR  l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                            THEN CAST(round(l_quantity) AS BIGINT)
                            ELSE 0 END) AS qty_out
            FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
            )
            GROUP BY 1, 2
        )
        SELECT s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'AMERICA'
          AND s.s_suppkey IN (
              SELECT l_suppkey FROM avail
              WHERE qty_win > 0 AND 2 * qty_out > qty_win
          )
        ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape: suppliers holding excess stock of one part "
    "family — off-window shipments role-play ps_availqty against the "
    "window's demand, threshold as exact integer cross-multiplication.",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Q20's nested semi-join chain: AMERICA suppliers having at
    least one 'small' part whose available stock exceeds half the
    window-year demand. ps_availqty is role-played by the quantity the
    pair shipped OUTSIDE the window (stock on hand), compared against
    the 1997 window demand — `avail > 0.5 × demand` restated exactly as
    `2 × qty_out > qty_win` in int64 (no float division).

    Scale shape: the ~12%-selective part-name set broadcasts and
    semi-prunes lineitem BEFORE its one (partkey, suppkey) shuffle;
    both window sums come out of that single conditional aggregate
    (one pass, not two). The qualifying supplier-key set is ≤#suppliers
    rows → broadcast semi into the supplier dim; nation/region
    broadcast."""
    t = load_tables(spark, sf_dir)
    win_lo = F.to_timestamp(F.lit("1997-01-01 00:00:00"))
    win_hi = F.to_timestamp(F.lit("1998-01-01 00:00:00"))
    in_win = (F.col("l_shipdate") >= win_lo) & (F.col("l_shipdate") < win_hi)
    qty = F.round(F.col("l_quantity"), 0).cast("bigint")
    small_parts = t["part"].filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    qual_supp = (
        t["lineitem"]
        .join(
            F.broadcast(small_parts),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in_win, qty).otherwise(F.lit(0))).alias("_qty_win"),
            F.sum(F.when(~in_win, qty).otherwise(F.lit(0))).alias("_qty_out"),
        )
        .filter(
            (F.col("_qty_win") > 0)
            & (F.lit(2) * F.col("_qty_out") > F.col("_qty_win"))
        )
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(qual_supp),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(
                        t["region"].filter(F.col("r_name") == "AMERICA")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q_tpch_q21",
    oracle="""
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM lineitem l1
        JOIN orders o   ON o.o_orderkey = l1.l_orderkey
                       AND o.o_orderstatus = 'F'
        JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
    doc="TPC-H Q21 shape: suppliers who alone held up multi-supplier "
    "orders — ship lag past the order date role-plays the "
    "commit-date wait.",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Q21's EXISTS / NOT EXISTS pair, decorrelated into ONE
    pass: both 'another supplier exists' and 'no other supplier was
    late' are per-order facts, so instead of two correlated lineitem
    re-scans the engine computes, over a single orderkey-partitioned
    window, the distinct-supplier set and the distinct-LATE-supplier
    set (collect_set — bounded by suppliers-per-order, ~4), and keeps
    late lines where nsupp ≥ 2 and nlate == 1 (the line's own supplier
    is late, so 'exactly one late supplier' ⟺ 'no OTHER late
    supplier'). Lateness = shipped >365 days after the order date,
    exact timestamp arithmetic on both engines.

    Scale shape: one shuffle of F-status lines on orderkey (the window
    partition), state bounded per order; the region/supplier dims
    broadcast AFTER the per-order math so the EXISTS semantics see ALL
    suppliers, as the spec requires. Top-100 rides
    TakeOrderedAndProject."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 365 DAYS"
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t["orders"]
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .withColumn("_late", late)
        .withColumn("_nsupp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "_nlate",
            F.size(
                F.collect_set(
                    F.when(F.col("_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    asia_supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        flagged.filter(
            F.col("_late") & (F.col("_nsupp") >= 2) & (F.col("_nlate") == 1)
        )
        .join(F.broadcast(asia_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )

"""Aggregations (SURVEY.md §2.4, minus the correlation family → stats.py).

Scale posture: every query here is a single partial/final hash aggregate
(one shuffle on the group keys). Distinct-aggregates expand to Spark's
two-stage distinct plan; approximate variants (HLL / KLL) are the declared
100 TB path for cardinality/quantiles and are rows-only keys (no exact
oracle by construction).

Float rules per numerics.py: plain 2 dp sums round(…,2); money products
sum exact integer cents; avgs round 4–6; higher moments use one explicit
raw-moment formula on BOTH engines (Spark's and DuckDB's built-in
skewness/kurtosis use different bias corrections, so neither is oracled
against the other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_tables
from ..numerics import (
    cents,
    exact_money_sum,
    money_sum,
    oracle_revenue_sum,
    revenue_cents,
)
from ..registry import query


@query(
    "q_agg_global",
    oracle="""
        SELECT count(*)                    AS n_rows,
               round(sum(l_quantity), 2)   AS sum_qty,
               round(avg(l_quantity), 4)   AS avg_qty,
               min(l_quantity)             AS min_qty,
               max(l_quantity)             AS max_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               min(l_shipdate)             AS first_ship,
               max(l_shipdate)             AS last_ship
        FROM lineitem
    """,
    doc="Global aggregate without grouping (sum/avg/min/max/count).",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(
        F.count("*").alias("n_rows"),
        money_sum("l_quantity").alias("sum_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        money_sum("l_extendedprice").alias("sum_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "q_agg_group",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)        AS sum_qty,
               round(sum(l_extendedprice), 2)   AS sum_base_price,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
                   / 10000.0                    AS sum_disc_price,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT))
                        * (100 + CAST(round(l_tax*100) AS BIGINT))) AS DOUBLE)
                   / 1000000.0                  AS sum_charge,
               round(avg(l_quantity), 4)        AS avg_qty,
               round(avg(l_extendedprice), 4)   AS avg_price,
               round(avg(l_discount), 6)        AS avg_disc,
               count(*)                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    doc="Hash group-by in TPC-H Q1 shape (the pricing summary report).",
    bench=True,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    charge_units = revenue_cents() * (100 + F.round(F.col("l_tax") * 100, 0).cast("long"))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            exact_money_sum(revenue_cents(), 10000.0).alias("sum_disc_price"),
            exact_money_sum(charge_units, 1000000.0).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_having",
    oracle="""
        SELECT o_custkey, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spend
        FROM orders
        GROUP BY o_custkey
        HAVING count(*) >= 12
           AND sum(CAST(round(o_totalprice*100) AS BIGINT)) > 50000000
    """,
    doc="Post-aggregation filter (HAVING).",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the HAVING threshold compares an exact integer-cents sum, not a raw
    # double sum — a group landing exactly on the boundary would otherwise
    # pass on one engine and fail on the other (accumulation order).
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            money_sum("o_totalprice").alias("total_spend"),
            F.sum(cents("o_totalprice")).alias("_cents"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("_cents") > 50_000_000))
        .drop("_cents")
    )


@query(
    "q_agg_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact count-distinct (two-stage distinct aggregate plan).",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_approx_distinct",
    rows_only_reason="approx_count_distinct is HLL-based; the estimate is "
    "engine-specific so no exact cross-engine oracle exists. Unit tests "
    "bound its relative error against the exact count.",
    doc="Approximate count-distinct (HyperLogLog++) — the 100 TB cardinality path.",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_rollup",
    oracle="""
        SELECT r_name, n_name,
               count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="ROLLUP hierarchy totals (region → nation → grand total).",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            money_sum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "q_agg_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two categorical dimensions.",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice").alias("total_price"),
    )


@query(
    "q_agg_gsets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (SQL entry point over temp views).",
)
def q_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_agg_stats",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_quantity), 6)    AS var_qty,
               round(stddev_pop(l_quantity), 6)  AS sdp_qty,
               round(var_pop(l_quantity), 6)     AS varp_qty,
               round(
                 (avg(l_quantity*l_quantity*l_quantity)
                    - 3*avg(l_quantity)*avg(l_quantity*l_quantity)
                    + 2*avg(l_quantity)*avg(l_quantity)*avg(l_quantity))
                 / pow(var_pop(l_quantity), 1.5), 6)        AS skew_qty,
               round(
                 (avg(l_quantity*l_quantity*l_quantity*l_quantity)
                    - 4*avg(l_quantity)*avg(l_quantity*l_quantity*l_quantity)
                    + 6*avg(l_quantity)*avg(l_quantity)*avg(l_quantity*l_quantity)
                    - 3*pow(avg(l_quantity), 4))
                 / pow(var_pop(l_quantity), 2) - 3, 6)      AS kurt_qty,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="stddev/variance (pop+samp) and raw-moment skewness/excess kurtosis.",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's F.skewness/F.kurtosis and DuckDB's built-ins apply different
    bias corrections, so the declared skew/kurtosis use ONE explicit
    raw-moment formula evaluated identically on both engines (population
    g1 / excess g2). F.skewness/F.kurtosis are cross-checked in unit
    tests against this formula's definition instead.

    l_quantity is small-magnitude (1–50) so the raw-moment cancellation is
    benign; avg-based moments keep each engine's accumulation error ~1e-13,
    far inside the 6 dp rounding cell.
    """
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity")
    m1 = F.avg("l_quantity")
    m2 = F.avg(q * q)
    m3 = F.avg(q * q * q)
    m4 = F.avg(q * q * q * q)
    varp = F.var_pop("l_quantity")
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
        F.round(F.var_pop("l_quantity"), 6).alias("varp_qty"),
        F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(varp, 1.5), 6).alias(
            "skew_qty"
        ),
        F.round(
            (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * F.pow(m1, 4)) / F.pow(varp, 2)
            - 3,
            6,
        ).alias("kurt_qty"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_percentile",
    oracle="""
        SELECT l_returnflag,
               round(median(l_extendedprice), 4)              AS med_price,
               round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
               round(quantile_cont(l_extendedprice, 0.90), 4) AS p90_price,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact median / continuous percentiles.",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark percentile() and DuckDB quantile_cont share the same
    # linear-interpolation definition (h = (n-1)p).
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
        F.round(F.percentile("l_extendedprice", 0.25), 4).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", 0.90), 4).alias("p90_price"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_approx_percentile",
    rows_only_reason="percentile_approx uses Spark's KLL-style sketch; the "
    "estimate is engine-specific so no exact oracle exists. Unit tests "
    "bound it between neighboring exact percentiles.",
    doc="Approximate percentile sketch — the 100 TB quantile path.",
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q_agg_collect",
    oracle="""
        SELECT l_orderkey,
               array_to_string(list_sort(list(l_linenumber)), ',')
                 AS line_numbers,
               array_to_string(list_sort(list(DISTINCT l_returnflag)), ',')
                 AS flags
        FROM lineitem
        WHERE l_orderkey <= 500
        GROUP BY l_orderkey
    """,
    doc="List/set aggregation, sorted for determinism, projected as "
    "csv strings (scalar columns — any harness can sort/hash them).",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_list order is nondeterministic under parallel merge —
    # sort_array makes the value a pure function of the data (SURVEY §7.4).
    # The sorted lists are projected as comma-joined STRINGS: raw array
    # columns crash generic result canonicalizers (round-1 driver harness:
    # pandas sort_values → "unhashable type: numpy.ndarray"), and a scalar
    # projection loses nothing the hash compare needs.
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") <= 500)
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))).alias(
                "line_numbers"
            ),
            F.concat_ws(",", F.sort_array(F.collect_set("l_returnflag"))).alias(
                "flags"
            ),
        )
    )


@query(
    "q_agg_histogram",
    oracle="""
        WITH binned AS (
            SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 1000000
                     AS bucket
            FROM orders
        )
        SELECT bucket,
               bucket * 10000.0       AS bin_lo,
               (bucket + 1) * 10000.0 AS bin_hi,
               count(*)               AS n
        FROM binned GROUP BY bucket
    """,
    doc="Equi-width histogram ($10k bins) via exact integer-cents binning.",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram = one partial/final count per bin — the 100 TB profile
    primitive (a full-table scan, zero joins, tiny shuffle by bin key).

    Binning goes through integer cents (numerics.py rule: never trust a
    double division at a bin boundary across engines): a 2 dp price times
    100 rounds to an exact int64, and integer division by 1_000_000 cents
    assigns the bucket identically on Spark and DuckDB.
    """
    t = load_tables(spark, sf_dir)
    bucket = F.expr(
        "CAST(round(o_totalprice * 100) AS BIGINT) div 1000000"
    ).alias("bucket")
    return (
        t["orders"]
        .select(bucket)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 10000.0).alias("bin_lo"),
            ((F.col("bucket") + 1) * 10000.0).alias("bin_hi"),
            "n",
        )
    )


@query(
    "q_agg_first_last",
    oracle="""
        SELECT o_custkey,
               arg_min(o_orderdate, o_orderkey)  AS first_key_date,
               arg_max(o_totalprice, o_orderkey) AS last_key_price,
               count(*) AS n_orders
        FROM orders GROUP BY o_custkey
    """,
    doc="first/last by explicit unique ordering (min_by/max_by — plain "
    "first()/last() are nondeterministic and never declared).",
)
def q_agg_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_custkey").agg(
        F.min_by("o_orderdate", "o_orderkey").alias("first_key_date"),
        F.max_by("o_totalprice", "o_orderkey").alias("last_key_price"),
        F.count("*").alias("n_orders"),
    )


@query(
    "q_agg_salted",
    oracle=f"""
        SELECT l_returnflag,
               {oracle_revenue_sum()} AS revenue,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY 1
    """,
    doc="Skew-safe two-phase (salted) grouped aggregation — identical "
    "result to the plain GROUP BY oracle.",
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped revenue computed through skew.salted_agg: phase 1 groups
    by (key, salt) — a hot key's rows spread over 16 reducers instead of
    melting one — phase 2 merges the per-salt partials by key.

    Oracle-safe despite the nondeterministic salt: the RESULT is
    salt-independent (sum-of-sums over any partition of the rows; counts
    likewise; the cents sums are exact integers so no accumulation-order
    float drift either — numerics.py rule 2). This is the one sanctioned
    exception to the 'no nondeterminism in declared queries' convention:
    the nondeterminism is confined to an intermediate grouping column
    that algebra cancels (and tests/test_skew_bucketing.py proves the
    equivalence property-style)."""
    t = load_tables(spark, sf_dir)
    from ..skew import salted_agg

    return salted_agg(
        t["lineitem"],
        ["l_returnflag"],
        aggs=[
            (
                F.sum("_ps").cast("double") / F.lit(10000.0)
            ).alias("revenue"),
            F.sum("_pc").alias("n_rows"),
        ],
        partial_aggs=[
            F.sum(revenue_cents().cast("decimal(38,0)")).alias("_ps"),
            F.count("*").alias("_pc"),
        ],
    )


@query(
    "q_agg_weighted",
    oracle="""
        SELECT l_returnflag,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                 / CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
                 / 100.0
                 AS wavg_price,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                 AS total_qty
        FROM lineitem
        GROUP BY 1
    """,
    doc="Quantity-weighted average price per returnflag via exact "
    "integer accumulation.",
)
def q_agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean Σwx/Σw — the unit-economics aggregate (price per
    unit actually shipped, not per line). Both sums run in exact integer
    units (price in cents × integer quantity; quantities in the fixture
    are whole numbers, asserted by round()), so any accumulation order
    yields the same bits and ONE double division at the end is
    deterministic on both engines — no round() call needed on the ratio.
    Same partial/final one-exchange shape as every grouped sum here."""
    t = load_tables(spark, sf_dir)
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    units = cents("l_extendedprice") * qty
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            (
                F.sum(units.cast("decimal(38,0)")).cast("double")
                / F.sum(qty.cast("decimal(38,0)")).cast("double")
                / F.lit(100.0)
            ).alias("wavg_price"),
            F.sum(qty).alias("total_qty"),
        )
    )


@query(
    "q_agg_hll_merge",
    rows_only_reason="HLL sketch bytes and estimates are Spark-specific "
    "(Datasketches HllSketch); no DuckDB twin. Error vs the exact "
    "distinct count is bounded in tests/test_rowsonly.py.",
    doc="Two-level HLL: per-nation sketches merged to per-region "
    "estimates — the reusable pre-aggregated sketch-table pattern.",
)
def q_agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-MERGE pattern that makes 100 TB cardinality cheap:
    build per-fine-grain sketches ONCE (here: distinct customers per
    nation), store them, and answer any coarser rollup (per region, per
    anything) by unioning sketch bytes — no rescan of the fact table.
    approx_count_distinct gives one number; a sketch COLUMN is a
    re-aggregable asset (the difference between a metric and a data
    product). Both levels are partial/final aggregates; sketch bytes
    never exceed ~1.5 KB per group at this precision."""
    t = load_tables(spark, sf_dir)
    per_nation = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    )
    return (
        per_nation.groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers"),
            F.count("*").alias("n_nations"),
        )
    )


@query(
    "q_agg_entropy",
    oracle="""
        WITH c AS (
            SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
            FROM documents GROUP BY 1, 2
        ),
        tot AS (
            SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_langs
            FROM c GROUP BY 1
        )
        SELECT c.source, tot.n_docs, tot.n_langs,
               round(-sum((CAST(c.cnt AS DOUBLE) / tot.n_docs)
                          * ln(CAST(c.cnt AS DOUBLE) / tot.n_docs)), 6)
                   AS h_lang,
               round(CASE WHEN tot.n_langs > 1
                          THEN -sum((CAST(c.cnt AS DOUBLE) / tot.n_docs)
                               * ln(CAST(c.cnt AS DOUBLE) / tot.n_docs))
                               / ln(tot.n_langs)
                          ELSE 0 END, 6) AS h_norm
        FROM c JOIN tot USING (source)
        GROUP BY c.source, tot.n_docs, tot.n_langs
    """,
    doc="Shannon entropy (nats) of the language mix per source, plus "
    "the ln(k)-normalized form in [0,1] — the diversity gauge a corpus "
    "curator reads before balancing a multilingual mixture.",
)
def q_agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H(source) = −Σ_lang p·ln p over exact int64 counts — the same
    contingency-skeleton discipline as q_mutual_info: counts reduce
    exactly, each term is one float division + one ln, and the ≤5-term
    per-source sum differs between engines only in order (absorbed at
    6 dp). h_norm divides by ln(n_langs) so a uniform mix reads 1.0
    regardless of how many languages a source carries (single-language
    sources pin 0 explicitly — no 0/0).

    Scale shape: one map-side-combined shuffle to (source, lang) cells
    — categories × sources rows, NOT corpus rows — then a per-source
    reduction over ≤|langs| cells; the 100 TB plan is scan + two tiny
    hash aggregates, no window, no driver state."""
    t = load_tables(spark, sf_dir)
    c = t["documents"].groupBy("source", "lang").agg(
        F.count("*").alias("cnt")
    )
    tot = c.groupBy("source").agg(
        F.sum("cnt").alias("n_docs"), F.count("*").alias("n_langs")
    )
    p = F.col("cnt").cast("double") / F.col("n_docs")
    return (
        c.join(F.broadcast(tot), "source")
        .groupBy("source", "n_docs", "n_langs")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("h_lang"),
            F.round(
                F.when(
                    F.col("n_langs") > 1,
                    -F.sum(p * F.log(p))
                    / F.log(F.col("n_langs").cast("double")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("h_norm"),
        )
    )


@query(
    "q_agg_quantile_merge",
    rows_only_reason="KLL sketch bytes and quantile estimates are "
    "Spark-specific (Datasketches KllLongsSketch); no DuckDB twin. "
    "Rank error of the merged sketch vs exact percentiles is bounded "
    "in tests/test_rowsonly.py (fixture) and tests/test_properties.py "
    "(1M rows).",
    doc="Two-level KLL quantile sketch: per-nation sketches of customer "
    "account balance merged to per-region p50/p90/p99 — the mergeable "
    "quantile twin of q_agg_hll_merge's cardinality pattern.",
)
def q_agg_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sibling of the sketch-MERGE pattern: per-nation
    KLL sketches built ONCE over exact-cents account balances, any
    coarser rollup (here: region) answered by merging sketch bytes —
    no rescan, no exact global sort. percentile_approx gives one
    number per call; a KLL sketch COLUMN is a re-aggregable asset the
    same way q_agg_hll_merge's HLL column is.

    Both levels are partial/final aggregates (one exchange each, the
    second over 25 nation rows); sketch size is O(k log n) bytes per
    group — at 100 TB the per-nation sketch table is 25 rows that
    answer every quantile question about balances without touching
    the fact table again. k=200 bounds normalized rank error at
    ~1.65% (Datasketches default, certified in the property test)."""
    t = load_tables(spark, sf_dir)
    per_nation = (
        t["customer"]
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_regionkey", "n_name")
        .agg(
            F.kll_sketch_agg_bigint(cents("c_acctbal"), 200).alias("sk"),
            F.count("*").alias("n_cust"),
        )
    )
    merged = per_nation.groupBy("n_regionkey").agg(
        F.kll_merge_agg_bigint("sk").alias("msk"),
        F.sum("n_cust").alias("n_customers"),
        F.count("*").alias("n_nations"),
    )
    q = lambda p: (  # noqa: E731
        F.kll_sketch_get_quantile_bigint("msk", F.lit(p)).cast("double")
        / 100.0
    )
    return merged.select(
        "n_regionkey",
        "n_customers",
        "n_nations",
        q(0.5).alias("p50_acctbal"),
        q(0.9).alias("p90_acctbal"),
        q(0.99).alias("p99_acctbal"),
    )


@query(
    "q_agg_trimmed_mean",
    oracle="""
        WITH th AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.10) AS lo,
                   quantile_cont(l_extendedprice, 0.90) AS hi
            FROM lineitem GROUP BY 1
        ),
        j AS (
            SELECT l.l_returnflag,
                   CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
                   l.l_extendedprice AS v, th.lo, th.hi
            FROM lineitem l JOIN th USING (l_returnflag)
        )
        SELECT l_returnflag,
               round(CAST(sum(CASE WHEN v >= lo AND v <= hi
                                   THEN cents END) AS DOUBLE)
                     / count(CASE WHEN v >= lo AND v <= hi THEN 1 END)
                     / 100.0, 6) AS trimmed_mean,
               round(CAST(sum(CASE WHEN v < lo
                                   THEN CAST(round(lo * 100) AS BIGINT)
                                   WHEN v > hi
                                   THEN CAST(round(hi * 100) AS BIGINT)
                                   ELSE cents END) AS DOUBLE)
                     / count(*) / 100.0, 6) AS winsorized_mean,
               CAST(count(CASE WHEN v >= lo AND v <= hi THEN 1 END)
                    AS BIGINT) AS n_kept,
               CAST(count(*) AS BIGINT) AS n
        FROM j GROUP BY 1
    """,
    doc="10% trimmed and winsorized means of extended price per return "
    "flag — the robust-location pair (drop vs clamp the tails) beside "
    "q_anomaly_mad's robust-spread MAD; exact-cents interior sums, "
    "interpolated decile thresholds identical on both engines.",
)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed mean drops values outside [p10, p90]; winsorized mean
    clamps them to the thresholds — both immune to tail corruption
    that drags a plain mean. Determinism: the thresholds are the same
    h=(n−1)p interpolation on both engines (identical doubles), the
    comparisons against them are identical, and the interior/clamped
    sums run in exact integer cents (clamped values quantize the
    SAME threshold double on both sides) with one division at the end.

    Scale shape: one percentile aggregate at group cardinality
    (sort-per-group over categories — the exact-percentile trade
    q_agg_percentile documents), thresholds broadcast back, then one
    partial/final conditional-sum aggregate over the scan."""
    t = load_tables(spark, sf_dir)
    th = t["lineitem"].groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.10).alias("lo"),
        F.percentile("l_extendedprice", 0.90).alias("hi"),
    )
    v = F.col("l_extendedprice")
    inside = (v >= F.col("lo")) & (v <= F.col("hi"))
    c = cents("l_extendedprice")
    clamped = (
        F.when(v < F.col("lo"), F.round(F.col("lo") * 100, 0).cast("long"))
        .when(v > F.col("hi"), F.round(F.col("hi") * 100, 0).cast("long"))
        .otherwise(c)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(th), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.when(inside, c)).cast("double")
                / F.count(F.when(inside, 1))
                / 100.0,
                6,
            ).alias("trimmed_mean"),
            F.round(
                F.sum(clamped).cast("double") / F.count("*") / 100.0, 6
            ).alias("winsorized_mean"),
            F.count(F.when(inside, 1)).alias("n_kept"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q_agg_theta_sets",
    rows_only_reason="Theta sketch bytes and estimates are Spark-specific "
    "(Datasketches ThetaSketch); no DuckDB twin. Set-op estimate error "
    "vs the exact distinct counts is bounded in tests/test_rowsonly.py.",
    doc="Theta-sketch SET ALGEBRA over customer activity: union, "
    "intersection, and difference cardinality estimates between the "
    "early and late halves of the order history — the sketch family's "
    "set-op member beside HLL (union-only) and KLL (quantiles).",
)
def q_agg_theta_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What HLL cannot do: estimate |A∩B| and |A\\B| WITHOUT a join or
    a second scan. Each period aggregates its customer set into one
    theta sketch (map-side combinable, bounded k entries per task);
    the set algebra then runs on the two sketch blobs — retained
    customers (∩), churned (early \\ late), acquired (late \\ early) —
    in a 1-row expression. At 100 TB the same two-sketch table answers
    every period-pair question with zero fact rescans; per-period
    sketches could equally be stored per day and theta_union_agg'd to
    any window.

    Plan: one conditional aggregate over the scan (two sketch
    accumulators), one 1-row projection of the estimates."""
    t = load_tables(spark, sf_dir)
    x = t["orders"].select(
        "o_custkey",
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .alias("early"),
    )
    a = x.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN early THEN o_custkey END)"
        ).alias("sk_early"),
        F.expr(
            "theta_sketch_agg(CASE WHEN NOT early THEN o_custkey END)"
        ).alias("sk_late"),
    )
    return a.select(
        F.expr("theta_sketch_estimate(sk_early)").cast("bigint")
        .alias("est_early"),
        F.expr("theta_sketch_estimate(sk_late)").cast("bigint")
        .alias("est_late"),
        F.expr("theta_sketch_estimate(theta_union(sk_early, sk_late))")
        .cast("bigint")
        .alias("est_union"),
        F.expr(
            "theta_sketch_estimate(theta_intersection(sk_early, sk_late))"
        )
        .cast("bigint")
        .alias("est_retained"),
        F.expr("theta_sketch_estimate(theta_difference(sk_early, sk_late))")
        .cast("bigint")
        .alias("est_churned"),
        F.expr("theta_sketch_estimate(theta_difference(sk_late, sk_early))")
        .cast("bigint")
        .alias("est_acquired"),
    )


@query(
    "q_agg_extremes_by",
    oracle="""
        WITH base AS (
            SELECT l_returnflag,
                   l_orderkey, l_linenumber,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                   CAST(round(l_extendedprice * 100) AS BIGINT) * 68719476736
                     + l_orderkey * 8 + l_linenumber AS packed
            FROM lineitem
        )
        SELECT l_returnflag,
               round(max(pc) / 100.0, 2)          AS max_price,
               max_by(l_orderkey, packed)         AS top_orderkey,
               max_by(l_linenumber, packed)       AS top_linenumber,
               round(min(pc) / 100.0, 2)          AS min_price,
               min_by(l_orderkey, packed)         AS bottom_orderkey,
               CAST(count(*) AS BIGINT)           AS n_rows
        FROM base GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="max_by/min_by (argmax) aggregates: the order line holding each "
    "group's price extremes, tie-broken deterministically via a packed "
    "unique sort key.",
)
def q_agg_extremes_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin as a SINGLE aggregation pass — `max_by`/`min_by`
    carry the witness row's columns along with the extreme, replacing
    the two-pass window-rank idiom (q_topk_group) when only the top-1
    witness is needed.

    Determinism: both engines leave argmax ties unspecified, so the
    comparison value is made UNIQUE by packing (price_cents, orderkey,
    linenumber) into one int64: pc·2^36 + orderkey·8 + linenumber.
    Bounds: pc < 2^26 (max extendedprice ~1.1e5 → 1.1e7 cents) and
    orderkey·8 + linenumber < 2^36 (orderkey < 2^33 ≈ 8.6e9, i.e. TPC-H
    sf ~1400), so packed < 2^62 — exact int64, no collision, identical
    winner on every engine. At larger scale, widen the shift or switch
    the comparison value to a struct (Spark max_by accepts orderable
    structs; the packed-int form is used here because DuckDB's
    arg_max/struct ordering is not guaranteed identical).

    Scale shape: one partial/final hash aggregate over the fact scan —
    max_by partials are (value, packed) pairs, map-side combinable,
    constant state per group; no shuffle beyond the |groups|-row
    exchange."""
    t = load_tables(spark, sf_dir)
    pc = cents("l_extendedprice")
    packed = (
        pc * F.lit(68719476736)
        + F.col("l_orderkey") * F.lit(8)
        + F.col("l_linenumber")
    )
    base = t["lineitem"].select(
        "l_returnflag", "l_orderkey", "l_linenumber",
        pc.alias("pc"), packed.alias("packed"),
    )
    return (
        base.groupBy("l_returnflag")
        .agg(
            F.round(F.max("pc") / 100.0, 2).alias("max_price"),
            F.max_by("l_orderkey", "packed").alias("top_orderkey"),
            F.max_by("l_linenumber", "packed").alias("top_linenumber"),
            F.round(F.min("pc") / 100.0, 2).alias("min_price"),
            F.min_by("l_orderkey", "packed").alias("bottom_orderkey"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_percentile_weighted",
    oracle="""
        WITH base AS (
            SELECT l_returnflag AS rf,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                   CAST(round(l_quantity) AS BIGINT) AS w,
                   l_orderkey, l_linenumber
            FROM lineitem
        ), cum AS (
            SELECT rf, pc, w,
                   sum(w) OVER (PARTITION BY rf
                                ORDER BY pc, l_orderkey, l_linenumber
                                ROWS UNBOUNDED PRECEDING) AS cw,
                   sum(w) OVER (PARTITION BY rf) AS tw
            FROM base
        )
        SELECT rf AS l_returnflag,
               round(min(CASE WHEN 4 * cw >= tw     THEN pc END) / 100.0, 2)
                   AS w_p25,
               round(min(CASE WHEN 2 * cw >= tw     THEN pc END) / 100.0, 2)
                   AS w_median,
               round(min(CASE WHEN 4 * cw >= 3 * tw THEN pc END) / 100.0, 2)
                   AS w_p75,
               CAST(any_value(tw) AS BIGINT) AS total_weight,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM cum GROUP BY rf
        ORDER BY rf
    """,
    doc="Weighted quantiles (quantity-weighted price percentiles) via "
    "integer running-weight cutoffs — no float quantile semantics to "
    "disagree on.",
)
def q_percentile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted percentile: the smallest value whose running weight
    reaches q·W — the inventory-weighted price points percentile_cont
    cannot express (neither engine has a weighted quantile builtin).

    Determinism: weights and prices are exact int64 (cents / rounded
    quantity); the cutoff predicates are INTEGER inequalities
    (4·cw ≥ tw etc. — no q·W float product), and the intra-group order
    is made total by (pc, orderkey, linenumber). Every engine computes
    the identical witness row.

    Scale shape: one partitioned window (running sum per returnflag —
    range-partitioned by the groupBy key, no global ordering), then a
    partial/final aggregate. The window is the unavoidable sort; at
    100 TB it is a per-group sort-merge identical to any percentile
    computation, with integer state only."""
    t = load_tables(spark, sf_dir)
    base = t["lineitem"].select(
        F.col("l_returnflag").alias("g"),
        cents("l_extendedprice").alias("v"),
        F.round("l_quantity").cast("bigint").alias("w"),
        F.col("l_orderkey").alias("o1"),
        F.col("l_linenumber").alias("o2"),
    )
    wq = weighted_quantiles(
        base, [("q25", 1, 4), ("q50", 1, 2), ("q75", 3, 4)]
    )
    return wq.select(
        F.col("g").alias("l_returnflag"),
        F.round(F.col("q25") / 100.0, 2).alias("w_p25"),
        F.round(F.col("q50") / 100.0, 2).alias("w_median"),
        F.round(F.col("q75") / 100.0, 2).alias("w_p75"),
        "total_weight",
        "n_rows",
    ).orderBy("l_returnflag")


def weighted_quantiles(
    base: DataFrame, fracs: list[tuple[str, int, int]]
) -> DataFrame:
    """The engine behind q_percentile_weighted (and api.weighted_quantile):
    for each group g, the smallest exact-int value v whose running
    weight cw satisfies den·cw ≥ num·tw — an INTEGER inequality, never
    a float q·W product. ``base`` must carry (g, v, w, o1, o2) with
    exact-int v/w and a total (v, o1, o2) tiebreak order; ``fracs`` is
    [(out_name, num, den), ...] with num/den the quantile fraction.

    Scale shape: the quantile witness is a VALUE, not a row, so the
    running weight is computed at (g, v) grain — one partial/final
    aggregate collapses the fact table to the value domain (row-grain
    tie-break columns o1/o2 are accepted for caller convenience but
    never shuffled), then ordering.global_running_sum under the total
    order (g, v) — range-partitioned two-pass, NEVER a per-group
    window (a per-group window collapses to an Exchange
    SinglePartition sort whenever groups are few or skewed — a global
    weighted median, g = '_all', is the common case; measured 78.7 s
    window → 53.7 s row-grain running sum → 2.8 s value-grain at 70M
    rows, tools/agg_bench.py). Per-group cumsums fall out by
    subtracting each group's preceding-groups offset, computed on the
    |groups|-row totals table and broadcast back."""
    from ..ordering import global_running_sum

    vg = base.groupBy("g", "v").agg(
        F.sum("w").alias("wv"), F.count("*").alias("nv")
    )
    order = [F.col("g"), F.col("v")]
    run = global_running_sum(vg, order, F.col("wv"), alias="_cwg")
    gtot = vg.groupBy("g").agg(
        F.sum("wv").alias("tw"), F.sum("nv").alias("n_rows")
    )
    w_goff = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)
    goff = gtot.select(
        "g", "tw", "n_rows",
        F.coalesce(F.sum("tw").over(w_goff), F.lit(0)).alias("_goff"),
    )
    cum = run.join(F.broadcast(goff), "g").select(
        "g", "v", "tw", "n_rows",
        (F.col("_cwg") - F.col("_goff")).alias("cw"),
    )
    aggs = [
        F.min(
            F.when(
                F.lit(den) * F.col("cw") >= F.lit(num) * F.col("tw"),
                F.col("v"),
            )
        ).alias(name)
        for name, num, den in fracs
    ]
    return cum.groupBy("g").agg(
        *aggs,
        F.any_value("tw").alias("total_weight"),
        F.any_value("n_rows").alias("n_rows"),
    )


@query(
    "q_agg_bitmap_distinct",
    oracle="""
        WITH bits AS (
            SELECT l_returnflag,
                   l_partkey // 63 AS bucket,
                   bit_or(CAST(1 AS BIGINT) << CAST(l_partkey % 63 AS INTEGER))
                       AS bm
            FROM lineitem
            GROUP BY 1, 2
        )
        SELECT l_returnflag,
               CAST(sum(bit_count(bm)) AS BIGINT) AS n_distinct_bitmap,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM bits GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Exact distinct count via 64-bit bitmap buckets (roaring-lite): "
    "bucket = key div 63, OR the bit masks per bucket, popcount-sum — "
    "the scale path for exact COUNT(DISTINCT) on dense integer keys.",
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) without carrying raw keys through the
    final exchange — the bitmap-index trick every warehouse uses for
    dense integer domains: the first aggregate compresses up to 63
    distinct keys into ONE int64 mask (63, not 64: DuckDB's signed
    left-shift rejects 1 << 63, and the sign bit buys nothing) (map-side combinable: OR is
    idempotent/associative/commutative), the second sums popcounts.

    Vs q_agg_distinct (expand + count-distinct: shuffles one row per
    distinct key) and q_agg_approx_distinct (HLL: approximate), this is
    EXACT with a shuffle bounded by |key domain|/64 rows per group —
    at 100 TB with a dense surrogate-key domain that is a 63×
    reduction of the distinct exchange, and the masks merge across
    partitions/levels like any sketch (same two-level pattern as
    q_agg_hll_merge, but lossless).

    Determinism: pure integer bit algebra — no floats anywhere.
    shiftleft is evaluated via F.expr because the Python DSL binds the
    shift amount as a literal int only."""
    t = load_tables(spark, sf_dir)
    bits = (
        t["lineitem"]
        .select(
            "l_returnflag",
            (F.col("l_partkey") / 63).cast("bigint").alias("bucket"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "CAST(l_partkey % 63 AS INT))"
            ).alias("mask"),
        )
        .groupBy("l_returnflag", "bucket")
        .agg(F.bit_or("mask").alias("bm"))
    )
    return (
        bits.groupBy("l_returnflag")
        .agg(
            F.sum(F.bit_count("bm")).cast("bigint")
            .alias("n_distinct_bitmap"),
            F.count("*").alias("n_buckets"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_bool",
    oracle="""
        SELECT l_returnflag,
               CAST(bool_and(l_discount <= 0.05) AS INTEGER)
                   AS all_low_disc,
               CAST(bool_or(l_tax > 0.07) AS INTEGER)  AS any_high_tax,
               CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END)
                    AS BIGINT)                         AS n_zero_disc,
               CAST(count(*) AS BIGINT)                AS n_rows
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Boolean aggregates: bool_and / bool_or / conditional count per "
    "group — the EVERY/ANY SQL aggregate family (emitted as 0/1 "
    "integers to pin the cross-engine dtype).",
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY/ANY — the predicate-aggregate corner of §2.4: does every
    row satisfy P, does any, how many. The comparisons are on 2-dp
    fixture decimals whose doubles are engine-identical; the aggregate
    state is one bit (bool_and/bool_or are trivially map-side
    combinable), so this is the cheapest possible partial/final
    shape."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_discount") <= 0.05)
            .cast("int")
            .alias("all_low_disc"),
            F.bool_or(F.col("l_tax") > 0.07)
            .cast("int")
            .alias("any_high_tax"),
            F.sum(
                F.when(F.col("l_discount") == 0, 1).otherwise(0)
            ).cast("bigint").alias("n_zero_disc"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_grouping_id",
    oracle="""
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT)
                   AS gid,
               CASE CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT)
                    WHEN 0 THEN 'nation' WHEN 1 THEN 'region'
                    ELSE 'grand_total' END AS level,
               CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    doc="grouping_id over a ROLLUP: the bitmask that tells subtotal "
    "rows apart from genuine NULL group values — labeled per level "
    "(nation / region / grand_total).",
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_agg_rollup leaves subtotal rows marked only by NULLs — which
    is ambiguous the moment a real NULL key exists. grouping_id() is
    the disambiguator (bit i set ⇔ column i is rolled up), and every
    BI tool keys its subtotal rendering on it. Emitted both raw and
    as a human-readable level label.

    Determinism: pure integer bitmask + exact-cents money sum
    (money_sum), no float aggregation order anywhere.

    Scale shape: identical to q_agg_rollup — Spark expands the rollup
    into one Expand + hash aggregate (rows×levels map-side, combined
    before the exchange); the two broadcast dim joins stay broadcast."""
    t = load_tables(spark, sf_dir)
    gid = F.grouping_id().cast("bigint")
    return (
        t["customer"]
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"]),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .rollup("r_name", "n_name")
        .agg(
            gid.alias("gid"),
            F.when(gid == 0, "nation")
            .when(gid == 1, "region")
            .otherwise("grand_total")
            .alias("level"),
            F.count("*").alias("n_customers"),
            money_sum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "q_agg_regr",
    oracle="""
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 6)
                   AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4)
                   AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)
                   AS n,
               round(regr_avgx(l_extendedprice, l_quantity), 6)
                   AS avg_x,
               round(regr_avgy(l_extendedprice, l_quantity), 4)
                   AS avg_y
        FROM lineitem GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="SQL-standard linear-regression aggregates (regr_slope / "
    "intercept / r2 / count / avgx / avgy) per group — the declarative "
    "OLS surface both engines implement natively.",
)
def q_agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGR_* family from SQL:2003 — one aggregate call per
    statistic instead of hand-assembled moment algebra (q_ols_daily /
    q_ols_multi2 keep the exact-integer forms for oracle-critical
    pipelines; this key pins that the NATIVE aggregates agree across
    engines at the documented rounding, which certifies them for
    interactive use).

    Determinism: both engines accumulate float moments in their own
    order — the same exposure q_agg_corr accepts — absorbed at 6 dp
    (4 dp for the price-scaled intercept/avgy, ~1e5 magnitudes).

    Scale shape: one partial/final hash aggregate; regr_* partials are
    constant-size moment tuples."""
    t = load_tables(spark, sf_dir)
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.regr_count(y, x).cast("bigint").alias("n"),
            F.round(F.regr_avgx(y, x), 6).alias("avg_x"),
            F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_mean_family",
    oracle="""
        WITH x AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity) AS BIGINT) AS q
            FROM lineitem WHERE l_quantity >= 1
        ), r AS (
            SELECT l_returnflag, q,
                   CAST(round(1000000000000.0 / q) AS BIGINT) AS rq
            FROM x
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(CAST(q AS DOUBLE)), 6) AS mean_arith,
               round(exp(avg(ln(CAST(q AS DOUBLE)))), 4) AS mean_geo,
               round(count(*) * 1000000000000.0
                     / CAST(sum(rq) AS BIGINT), 4) AS mean_harm
        FROM r GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="The Pythagorean mean family per group: arithmetic, geometric "
    "(exp of mean log), harmonic (reciprocals pinned to an exact "
    "integer picolattice before summing) — AM >= GM >= HM by "
    "construction.",
)
def q_agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-style metrics need the right mean: growth factors compose
    geometrically (GM), speeds/rates over fixed work harmonically
    (HM); reporting AM for either overstates. All three from one pass.

    Determinism: the quantities are exact small ints; GM is
    exp(avg(ln(int))) — ln on bit-identical inputs, 4-dp absorption
    (the q_text_perplexity rule); HM's reciprocal SUM is the float
    hazard (accumulation order), so each 1/q is pinned to the exact
    integer 1e12 lattice FIRST (q ≤ 50 ⇒ round(1e12/q) exact in
    int64, relative error ≤ 5e-14 per term) and the sum is integer —
    the q_sample_temperature rule.

    Scale shape: one partial/final hash aggregate."""
    t = load_tables(spark, sf_dir)
    q = F.round("l_quantity").cast("bigint")
    base = (
        t["lineitem"]
        .filter(F.col("l_quantity") >= 1)
        .select(
            "l_returnflag",
            q.alias("q"),
            F.round(F.lit(1000000000000.0) / q).cast("bigint").alias("rq"),
        )
    )
    return (
        base.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("q").cast("double")), 6).alias("mean_arith"),
            F.round(
                F.exp(F.avg(F.log(F.col("q").cast("double")))), 4
            ).alias("mean_geo"),
            F.round(
                F.count("*") * 1000000000000.0
                / F.sum("rq").cast("bigint"),
                4,
            ).alias("mean_harm"),
        )
        .orderBy("l_returnflag")
    )
